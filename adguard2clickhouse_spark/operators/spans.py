"""Repeated-span scrubbing: substring-level dedup, distributed.

Document-level dedup misses the dominant contamination mode in web
corpora: long token runs (licenses, navigation chrome, quoted posts)
repeated across otherwise-distinct documents. The exact-substring
approach (suffix arrays over the concatenated corpus) doesn't
distribute; this operator gets the same effect with shuffle-friendly
primitives:

1. hash every positional k-gram (k=5 default);
2. count corpus-wide occurrences per hash — a k-gram seen ≥ min_df
   times anywhere (another doc OR a repeat in the same doc) is
   "duplicated";
3. maximal runs of consecutive duplicated positions, found per doc
   with the classic gaps-and-islands trick (pos − row_number), become
   spans; runs shorter than min_span tokens are kept (min_span − k + 1
   consecutive duplicated k-gram starts cover exactly min_span
   tokens);
4. tokens covered by any qualifying span are dropped and the document
   is reassembled in position order.

Every step is an explode / hash-keyed join / per-doc window — no
all-pairs, no driver state; the only corpus-wide structure is the
k-gram frequency table (hash → count), the same inverted-index
skeleton as the Jaccard/contamination operators. ``portable=True``
hashes k-grams with the 60-bit md5 form so the ENTIRE pipeline —
hashing, frequency threshold, islands, coverage, reassembly — replays
in DuckDB under the hash gate (x4_span_scrub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from adguard2clickhouse_spark.operators.dedup import (
    _kgram_hash_at,
    _kgram_md5_at,
    _shingle_starts,
)


def repeated_span_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_span: int = 8,
    min_df: int = 2,
    portable: bool = False,
) -> DataFrame:
    """(id, n_tokens, n_removed, cleaned) — documents with every
    repeated span of ≥ ``min_span`` tokens removed. ``cleaned`` is the
    surviving tokens joined by single spaces (whitespace-normalizing,
    like every tokenized path here)."""
    if min_span < k:
        raise ValueError("min_span must be ≥ k")
    min_run = min_span - k + 1

    toks = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    )
    hash_at = _kgram_md5_at if portable else _kgram_hash_at
    from pyspark.storagelevel import StorageLevel

    # DISK_ONLY, not the default MEMORY_AND_DISK: kg is the CORPUS-
    # SCALE exploded positional k-gram frame (one row per token
    # position — ~1e9 rows at sf100, larger than the corpus itself),
    # and the r13 default-8GB sweep caught the memory-backed cache
    # killing the query with a heap OOM at that size (columnar batch
    # build + the window sort racing for the same 8 GB; GCLocker
    # humongous-allocation churn even when it survived —
    # BENCH_sf100_default_session_r13.json, reproduced dedicated).
    # The frame feeds two consumers (the df filter and the join), so
    # it must not recompute — but at 100 TB an in-memory cache of a
    # larger-than-corpus frame can never fit ANY heap; local-disk
    # blocks are the only storage level that scales with it. Measured
    # at sf100/8 GB: OOM → 164 s; sf10 wall 36.3 → 29.4 s (the GC
    # churn cost more than the disk round-trip even when it survived).
    # Codegen k-gram hashing (r14, the winnow lesson): explode the
    # 1-based START positions and hash in a regular projection instead
    # of posexploding an interpreted-HOF-built array — Spark never
    # codegens transform() lambdas, and the interpreted per-position
    # tree measured ~40× the identical codegen'd expression
    # (BENCH_winnow_r14.json). Values and positions are identical
    # (start position IS the old posexplode index + 1); no new
    # exchange — the explode was already here.
    kg = (
        toks.select(
            "_id", "_toks",
            F.explode(_shingle_starts(F.col("_toks"), k)).alias("_p"),
        )
        .select(
            "_id", "_p", hash_at(F.col("_toks"), F.col("_p"), k).alias("_h")
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        dup = kg.groupBy("_h").agg(F.count(F.lit(1)).alias("_c")).filter(
            F.col("_c") >= min_df
        )
        dp = kg.join(dup.select("_h"), "_h").select("_id", "_p")

        w = Window.partitionBy("_id").orderBy("_p")
        runs = dp.withColumn("_g", F.col("_p") - F.row_number().over(w))
        spans = (
            runs.groupBy("_id", "_g")
            .agg(F.min("_p").alias("_s"), F.max("_p").alias("_e"), F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= min_run)
        )
        covered = spans.select(
            "_id", F.explode(F.sequence(F.col("_s"), F.col("_e") + (k - 1))).alias("_p")
        ).distinct()

        tok = toks.select(
            "_id", F.posexplode(F.col("_toks")).alias("_p0", "_tok")
        ).select("_id", (F.col("_p0") + 1).alias("_p"), "_tok")
        kept = tok.join(covered, ["_id", "_p"], "left_anti")

        n_tok = toks.select("_id", F.size("_toks").cast("long").alias("n_tokens"))
        cleaned = kept.groupBy("_id").agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_tok"))),
                    lambda s: s["_tok"],
                ),
            ).alias("cleaned"),
            F.count(F.lit(1)).cast("long").alias("_n_kept"),
        )
        out = (
            n_tok.join(cleaned, "_id", "left")
            .select(
                F.col("_id").alias(id_col),
                "n_tokens",
                (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
                    "n_removed"
                ),
                F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        kg.unpersist()
    return out
