"""Retention and targeted deletion — the compliance primitives a
100 TB fact table needs.

- ``delete_rows``: right-to-be-forgotten. Deleting one user from a
  petabyte table must not rewrite the table: find the partitions that
  actually contain matching rows (partition-pruned scan, small driver
  pull of partition VALUES only), then dynamic-partition-overwrite
  exactly those partitions with the surviving rows. Untouched
  partitions keep their files byte-for-byte (asserted in tests).
- ``expire_partitions``: TTL sweep. Dropping data past its retention
  window is a partition-directory delete — a metadata operation, no
  data read at all. Returns the dropped partition values.

Both lean on the same layout contract the ingest side already writes
(``partitionBy(date)`` in streaming/pipeline.py): partition columns
are the unit of deletion.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def delete_rows(
    spark: SparkSession,
    path: str,
    predicate: Column,
    partition_col: str,
) -> list:
    """Remove rows matching ``predicate`` from the parquet table at
    ``path`` (partitioned by ``partition_col``), rewriting ONLY the
    partitions that contain matches. Returns the affected partition
    values (empty list → nothing touched)."""
    from adguard2clickhouse_spark.plans.compaction import overwrite_partitions

    df = spark.read.parquet(path)
    affected = [
        r[0]
        for r in df.filter(predicate).select(partition_col).distinct().collect()
    ]
    if not affected:
        return []
    surviving = df.filter(F.col(partition_col).isin(affected)).filter(
        ~predicate
    )
    overwrite_partitions(surviving, path, [partition_col])
    return affected


def expire_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_predicate: Column,
) -> list:
    """Drop whole partition directories whose value fails
    ``keep_predicate`` (evaluated against the distinct partition
    values — a metadata-only listing, no data scan). Returns the
    dropped values."""
    df = spark.read.parquet(path)
    vals = df.select(partition_col).distinct()
    # partition-type inference may surface dates/ints — the directory
    # name is the string rendering, so compare and delete by string
    dropped = [
        r[0]
        for r in vals.filter(~keep_predicate)
        .select(F.col(partition_col).cast("string"))
        .collect()
    ]
    if not dropped:
        return []
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    for v in dropped:
        p = jvm.org.apache.hadoop.fs.Path(path, f"{partition_col}={v}")
        fs.delete(p, True)
    return dropped
