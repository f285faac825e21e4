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
