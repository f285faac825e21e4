"""Small-file compaction — the table-maintenance pass every
streaming-written lakehouse table needs.

Micro-batch appends (streaming/pipeline.py writes per-epoch files) and
fine-grained partitioning accumulate files far below the scan-optimal
size; at 100 TB the driver's file listing and the per-file open cost
dominate reads long before the bytes do. Compaction rewrites a table
to ~target-sized files without changing its rows — the OPTIMIZE of the
lakehouse formats, expressed as a plain read → repartition → rewrite.

Rewrite safety: the output goes to a NEW directory; atomically swapping
it over the old one is the caller's (or the table format's) job — this
module never deletes source data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import scoped_conf


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[DataFrame, int]:
    """(dataframe, n_target_files) for a parquet directory: file count
    chosen from the ACTUAL on-disk byte size (Hadoop listing, no driver
    re-scan of data), never below 1."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, int((total + target_file_bytes - 1) // target_file_bytes))
    return spark.read.parquet(path), n


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Rewrite ``path`` into ``out_path`` as ~target-sized files;
    returns the file count written. ``sort_col`` re-establishes an
    in-file ordering (min/max row-group pruning) that per-epoch
    appends fragment."""
    df, n = plan_compaction(spark, path, target_file_bytes)
    out = df.repartition(n)
    if sort_col is not None:
        out = df.repartitionByRange(n, F.col(sort_col)).sortWithinPartitions(sort_col)
    out.write.mode("overwrite").parquet(out_path)
    return n


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent partition-level backfill: rewrite ONLY the partitions
    present in ``df``, leaving every other partition untouched (dynamic
    partition overwrite). This is the re-run primitive for daily
    pipelines at 100 TB — re-processing one bad day replaces one
    directory, not the table; Spark's default (static) overwrite mode
    would truncate everything first.

    The conf flips around the write only and is restored afterwards —
    callers' own writes keep their session semantics.
    """
    spark = df.sparkSession
    with scoped_conf(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
