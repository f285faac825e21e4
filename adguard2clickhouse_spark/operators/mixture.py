"""Corpus mixture planning (brief §extensions: deciding how much of
each source/language goes into a training mix, then drawing that
sample reproducibly).

Training mixes are usually specified as temperature-scaled source
weights: w_s ∝ c_s^(1/T) where c_s is the source's size. T = 1 is
proportional sampling, T → ∞ is uniform, T < 1 upweights the head.
This module fixes T = 1/2 — i.e. w_s ∝ c_s² — because squaring is
*integer* arithmetic: every weight, permille share, and quota below
is computed in exact integer math on both Spark and DuckDB, so the
whole plan (and the sample drawn from it) sits under the exact
value-hash oracle gate. Fractional temperatures need pow(), which is
not bit-identical across engines; the structure is the same.

The sample draw reuses the md5-rank idiom from operators/sampling.py:
rank docs inside each source by md5(doc_id) — a stable pseudo-random
order — and keep the first quota_s. Deterministic across runs,
partitionings, and engines.

Scale: the plan table is |sources| rows (driver-safe by definition);
the draw is one shuffle on the source key with a per-stratum bounded
sort, same envelope as stratified_sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mixture_quotas(
    df: DataFrame,
    strata_col: str = "source",
    budget: int = 200,
) -> DataFrame:
    """Per-stratum sampling plan: (source, n_docs, weight_permille,
    quota). weight_permille = floor(1000·n²/Σn²); quota =
    floor(budget·n²/Σn²) capped at n_docs. All-integer.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    sq = counts.withColumn("_w", F.col("n_docs") * F.col("n_docs"))
    # Σn² over a |sources|-row relation: an unpartitioned window here
    # is a single task over a handful of rows, not a corpus-wide sort.
    tot = Window.partitionBy()
    return sq.select(
        strata_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.floor((F.col("_w") * 1000) / F.sum("_w").over(tot))
        .cast("long")
        .alias("weight_permille"),
        F.least(
            F.floor((F.col("_w") * budget) / F.sum("_w").over(tot)),
            F.col("n_docs"),
        )
        .cast("long")
        .alias("quota"),
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str = "source",
    budget: int = 200,
    id_col: str = "doc_id",
) -> DataFrame:
    """Draw the mixture: md5-ranked top-quota_s docs per stratum.

    Returns (doc_id, source, rnk, quota) for the selected docs —
    rnk ≤ quota by construction. The quota relation is tiny and
    broadcasts into the rank filter.
    """
    quotas = mixture_quotas(df, strata_col, budget).select(strata_col, "quota")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(id_col, strata_col).withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )
    return ranked.join(F.broadcast(quotas), strata_col).filter(
        F.col("rnk") <= F.col("quota")
    ).select(id_col, strata_col, "rnk", "quota")


def interleave_sources(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic source-interleaved training order: documents of
    every source round-robin through the global sequence, so a training
    run that consumes positions 0..k sees each source at its corpus
    proportion from the very first batch — without any global sort.

    Position is ARITHMETIC, not a global window: doc at per-source
    md5-rank r (1-based, the stable pseudo-random order shared with
    sampling.py) from the source with alphabetical index i (0-based,
    among k sources) gets ``pos = (r-1)·k + i``. Per-source windows
    partition by the stratum (bounded sorts); the source index comes
    from a k-row broadcast. Unequal source sizes leave holes past the
    smallest source's tail — consumers order by pos, and a hole is
    just an absent position (documented contract; no re-compaction
    pass, which would need exactly the global sort this avoids).

    Returns (id, strata, src_rank, pos).
    """
    w = Window.partitionBy(strata_col).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    idx_w = Window.orderBy(strata_col)
    # k (the source count) rides along IN the broadcast frame as a
    # whole-frame window count, so building the returned DataFrame is
    # fully lazy — no driver-side sources.count() job (the window is
    # over a k-row frame, trivially bounded).
    sources = (
        df.select(strata_col).distinct()
        .select(
            strata_col,
            (F.row_number().over(idx_w) - 1).alias("_src_idx"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("_n_src"),
        )
    )
    ranked = df.select(F.col(id_col), F.col(strata_col)).withColumn(
        "src_rank", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(sources), strata_col)
        .select(
            id_col,
            strata_col,
            F.col("src_rank").cast("long").alias("src_rank"),
            ((F.col("src_rank") - 1) * F.col("_n_src") + F.col("_src_idx"))
            .cast("long")
            .alias("pos"),
        )
    )


def upsample_with_replacement(
    df: DataFrame,
    targets: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic WITH-replacement draw: for each stratum, emit
    exactly ``target`` rows (``targets``: (strata, target) — may exceed
    the stratum size, the oversampling a rare source needs to hit its
    mixture weight across epochs). Draw i of a stratum with n docs maps
    to the md5-ranked document at position
    ``(md5-int(stratum ∥ '#' ∥ i) mod n) + 1`` — a pure integer
    function of (stratum, i, n), so the sample is reproducible across
    runs, partitionings, and engines (exact SQL twin in the oracle).

    Scale shape: draws explode from the k-row targets table (never from
    the corpus), ranks are one per-stratum window, and the draw⋈doc
    join is an equi-join on (stratum, position). Returns
    (draw_id, id, strata, pos) with draw_id = the 1-based draw index.
    """
    n_per = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    draws = (
        targets.join(n_per, strata_col)
        .select(
            strata_col,
            "_n",
            F.explode(F.sequence(F.lit(1), F.col("target"))).alias("draw_id"),
        )
        .select(
            strata_col,
            "draw_id",
            (
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    "#",
                                    F.col(strata_col),
                                    F.col("draw_id").cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.col("_n"),
                )
                + 1
            ).alias("pos"),
        )
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(id_col, strata_col).withColumn(
        "pos", F.row_number().over(w).cast("long")
    )
    return draws.join(ranked, [strata_col, "pos"]).select(
        F.col("draw_id").cast("long").alias("draw_id"),
        F.col(id_col),
        F.col(strata_col),
        F.col("pos").cast("long").alias("pos"),
    )
