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
