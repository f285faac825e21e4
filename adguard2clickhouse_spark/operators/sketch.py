"""Distributed heavy-hitters: Misra-Gries candidates + exact recount.

The two-pass frequent-items scheme every large-scale token/URL/domain
frequency audit needs:

1. **Candidate pass** — each Arrow batch runs a k-counter Misra-Gries
   summary (`mapInPandas`). MG's guarantee: any value with global
   frequency > n/k exceeds n_b/k in at least one batch (averaging),
   so it appears in that batch's counter set. The union of per-batch
   candidate sets therefore has NO false negatives; its size is
   ≤ k × batches, independent of n.
2. **Exact pass** — recount only the candidates (broadcast semi join)
   and keep those strictly above the n/k threshold. False positives
   from pass 1 die here, so the output is EXACT — which is why this
   sketch sits under the DuckDB hash gate (x4_heavy_hitters) instead
   of a rows-only check.

Scale shape: pass 1 is map-only (no shuffle, bounded memory k per
batch); pass 2 shuffles only rows matching ~k candidates. The full
groupBy-the-world alternative shuffles every distinct value — at
100 TB of tokens that is the difference between a broadcast of a few
hundred candidates and a multi-TB exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_batches(col: str, k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counters: dict = {}
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
            yield pd.DataFrame({col: list(counters.keys())})

    return gen


def hll_rollup(
    df: DataFrame,
    key_col: str,
    group_col,
    lg_k: int = 14,
    out_est: str = "est_distinct",
):
    """Per-group Apache DataSketches HLL distinct estimates PLUS the
    cross-group union — the mergeable-rollup shape exact distinct can't
    do. Returns ``(per_group, total)`` DataFrames.

    Why this is the 100 TB distinct path: ``count_distinct`` shuffles
    every distinct key once per grouping it appears in, and a
    month-over-day rollup re-scans the raw data per granularity. An HLL
    sketch is a fixed ≤ (2^lg_k)·6-bit register array with max-merge
    semantics: partial aggregation combines sketches map-side (the
    shuffle carries one sketch per group per task, not keys), and
    coarser granularities fold FROM THE SKETCHES via ``hll_union_agg``
    without touching the raw table again. Registers are identical
    whether built whole or unioned from partitions, so the rollup is
    exactly consistent with a direct sketch of the union — asserted in
    tests (est error gate vs exact lives there too; DuckDB's HLL is a
    different implementation, hence rows-only at the driver).
    """
    grouped = df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("_sk")
    )
    per_group = grouped.withColumn(
        out_est, F.hll_sketch_estimate("_sk")
    ).drop("_sk")
    total = grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk", F.lit(False))).alias(out_est)
    )
    return per_group, total


def heavy_hitters(
    df: DataFrame, col: str, k: int = 1000, out_count: str = "cnt"
) -> DataFrame:
    """Exact values of ``col`` with frequency strictly greater than
    n/k, plus their exact counts. ``k`` bounds sketch memory AND sets
    the threshold — pick k ≥ 1/target_support."""
    vals = df.select(col)
    cand = (
        vals.mapInPandas(_mg_batches(col, k), schema=vals.schema)
        .distinct()
    )
    total = vals.agg(F.count(F.lit(1)).alias("_n"))
    return (
        vals.join(F.broadcast(cand), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(out_count))
        .crossJoin(F.broadcast(total))
        .filter(F.col(out_count) * k > F.col("_n"))
        .drop("_n")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimates
# ---------------------------------------------------------------------------

def _cms_hash(col, row: int, width: int, portable: bool):
    """Row-`row` bucket index in [0, width). Portable form = first 15
    hex chars of md5(value ∥ '#row') as a long (replays verbatim in
    DuckDB); fast form = xxhash64 seeded by row. Both are fixed maps,
    so sketches built anywhere merge cell-wise."""
    if portable:
        h = F.conv(
            F.substring(F.md5(F.concat_ws("#", col.cast("string"), F.lit(str(row)))), 1, 15),
            16,
            10,
        ).cast("long")
    else:
        h = F.xxhash64(col, F.lit(row))
    return F.pmod(h, F.lit(width))


def countmin_build(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Build a Count-Min sketch of ``col``'s frequencies: ``depth``
    hash rows × ``width`` buckets, each cell the count of values
    hashing into it. Returns (row, bucket, cell_count) — at most
    depth·width rows regardless of input size.

    The classic mergeable frequency summary (Cormode/Muthukrishnan,
    J. Algorithms 2005): estimates overcount only (est ≥ true;
    est ≤ true + εN with ε = e/width at the usual depth), and two
    sketches over disjoint data merge by cell-wise addition — the
    property that lets 1000 executors each sketch their shard and a
    coordinator fold the results without ever shuffling raw values.

    Scale shape: one explode to ``depth`` rows per input row, one
    partial-aggregated groupBy over at most depth·width cells — the
    shuffle moves bounded partial cells, never values. With
    ``portable=True`` the whole build replays in DuckDB, so the sketch
    itself sits under the driver's exact hash gate (x6_countmin).
    """
    c = F.col(col)
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_hash(c, r, width, portable).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("_rb")
    )
    return (
        rows.select("_rb.row", "_rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def countmin_estimate(
    cells: DataFrame,
    keys: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Point-frequency estimates for ``keys[col]`` from a sketch built
    with the same (width, depth, portable) parameters: est = min over
    rows of the addressed cell (absent cell = 0). The key side carries
    its depth probe coordinates; the sketch side is ≤ depth·width rows,
    so the join broadcasts the SKETCH — estimates for any number of
    keys stream past it without a shuffle."""
    c = F.col(col)
    probes = keys.select(
        c,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_hash(c, r, width, portable).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("_rb"),
    ).select(c, "_rb.row", "_rb.bucket")
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cell_count"), F.lit(0))).alias("est_count"))
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col,
    k: int = 64,
    out_est: str = "est_distinct",
) -> DataFrame:
    """K-minimum-values distinct sketch, engine-portable and therefore
    HASH-GATED — the property HLL can't give (DuckDB's HLL registers
    differ from DataSketches'). Each key hashes to a 60-bit integer
    (md5 first 15 hex chars — the repo's portable-hash convention);
    per group the k smallest distinct hashes are kept and the
    estimator is the classic (k-1)·2⁶⁰ div h_k (integer div, exact
    cross-engine). Groups with < k distinct keys report their exact
    distinct count.

    Scale shape: the per-group state is bounded O(k) at EVERY stage.
    distinct() dedups (group, hash) with map-side partial aggregation
    (hashes — 8 bytes — shuffle, never keys); a row_number window
    ordered by hash keeps the k smallest per group via Spark's
    SORT-BASED window operator, which spills to disk — a group with
    hundreds of millions of distinct keys (the regime KMV targets)
    sorts externally instead of materializing an O(distinct) array in
    one aggregation-buffer row; only the ≤k survivors reach
    collect_list, so the output array and its buffer are k-bounded.
    KMV sketches are mergeable (union = k smallest of the
    concatenation), so the same state can ride the aggregating sink if
    needed.

    Returns (group, n_kept, kth_hash, est_distinct) — all integers.
    """
    from pyspark.sql.window import Window

    g = F.col(group_col) if isinstance(group_col, str) else group_col
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy("_g").orderBy("_h")
    hashes = (
        df.select(g.alias("_g"), h.alias("_h"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("_g")
        .agg(F.array_sort(F.collect_list("_h")).alias("_mins"))
    )
    n_kept = F.size("_mins")
    kth = F.element_at("_mins", n_kept)
    two60 = F.lit(1 << 60)
    est = F.when(n_kept < F.lit(k), n_kept.cast("long")).otherwise(
        F.expr(f"CAST((({k} - 1) * CAST({1 << 60} AS DECIMAL(38,0))) div _kth AS BIGINT)")
    )
    return (
        hashes.withColumn("_kth", kth)
        .select(
            F.col("_g").alias(group_col if isinstance(group_col, str) else "group"),
            n_kept.cast("long").alias("n_kept"),
            F.col("_kth").alias("kth_hash"),
            est.alias(out_est),
        )
    )
