"""Footer-statistics table stats — metadata-only min/max/count.

Parquet footers already store row counts and per-column min/max; the
V2 parquet source pushes MIN/MAX/COUNT aggregates into the scan
(``PushedAggregation``), answering them from footer statistics without
decoding a single data page. At 100 TB that is the difference between
a listing-speed metadata query and a full-table scan — the freshness
check, partition audit, and ingest reconciliation primitive.

The V1 reader (Spark's default) ignores
``spark.sql.parquet.aggregatePushdown``; the V2 source honors it, so
this module flips ``spark.sql.sources.useV1SourceList`` around the
read only. The source choice binds when the DataFrame is created, so
restoring the conf immediately afterwards is safe — asserted by the
plan test, which requires ``PushedAggregation`` in the final plan.

Pushdown is all-or-nothing: ONE column whose footer stats can't
answer exactly (timestamps, nested types) silently degrades the whole
aggregate to a normal scan. Results are identical either way — only
the cost changes — which is why the plan gate, not a value check,
guards the fast path, and why callers should pass footer-friendly
(integer/decimal/string) columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import scoped_conf

_V1_LIST_CONF = "spark.sql.sources.useV1SourceList"


def parquet_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """(n_rows, min_<c>, max_<c>…) for a parquet path, planned against
    the V2 source so the aggregate pushes into the scan.

    Both confs are scoped: the source choice AND the pushdown flag bind
    when the DataFrame is created, so restoring them immediately after
    the read leaves the caller's session untouched (plan test asserts
    ``PushedAggregation`` survives the restore).
    """
    with scoped_conf(
        spark,
        {_V1_LIST_CONF: "", "spark.sql.parquet.aggregatePushdown": "true"},
    ):
        df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.agg(*aggs)
