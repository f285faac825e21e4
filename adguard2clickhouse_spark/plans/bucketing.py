"""Bucketed (co-located) table layout — the pre-paid shuffle.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both
sides on the key. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions rows into a fixed bucket count
recorded in the catalog, and every later equi-join or aggregation on
the key reads co-located buckets with NO Exchange in the plan —
verified by tests/test_bucketing.py, which asserts the join plan is
exchange-free. ``sortBy`` within buckets additionally removes the
per-task Sort below a SortMergeJoin when
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (Spark ≥3
ignores scan ordering by default; the residual in-task sort of one
bucket is cheap and spill-free either way).

This is the Spark-native analog of the reference's ClickHouse
ORDER-BY-key MergeTree layout (README.md DDL: tables keyed by their
group column): storage pre-organized for its dominant access path.

Bucket-count discipline at scale: both join sides must use the SAME
bucket count (or integer multiples, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); pick
n_buckets so one bucket of the bigger table ≈ one task's worth
(128-512 MB), and keep it a power of two so future re-bucketing
splits evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Files land under ``spark.sql.warehouse.dir``; bucketing metadata
    lives in the session catalog, which is what lets the planner elide
    the exchange on later joins/aggregations keyed on ``bucket_col``.
    """
    # Align the write partitioning with the bucket function (same hash,
    # same modulus) so every bucket is written by exactly one task →
    # one file per bucket. That single-file property is what lets the
    # planner trust the sortBy order and drop the Sort under a
    # SortMergeJoin (multi-file buckets only elide the Exchange); it
    # also caps file count at n_buckets instead of tasks×buckets.
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str) -> bool:
    """True when both catalog tables exist (the co-located join path is
    available); callers fall back to the plain shuffled join otherwise."""
    cat = spark.catalog
    return cat.tableExists(table_a) and cat.tableExists(table_b)
