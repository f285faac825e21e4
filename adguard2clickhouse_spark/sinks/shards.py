"""Training-shard export: the write side of a curation pipeline.

Emits the curated corpus as split-partitioned parquet shards with a
bounded per-file record count, plus a manifest the training stack can
trust without re-scanning the data. The layout knobs are the ones that
matter at 100 TB:

- ``partitionBy(split)`` → train/val/test are partition directories;
  a reader of one split never lists the others' files.
- ``maxRecordsPerFile`` → shard size is bounded no matter how large a
  partition's task output is; data loaders get uniform work units.
- ``repartition(n_shards, shard_key)`` before the write → shard count
  is chosen, not an accident of upstream parallelism, and a stable
  shard key (id hash) makes the assignment reproducible.

The manifest is computed FROM THE WRITTEN FILES (read-back grouped by
``input_file_name``), not from the writer's intent — counts in the
manifest are what a loader will actually see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    split_col: str = "split",
    id_col: str = "doc_id",
    n_shards_per_split: int = 8,
    max_records_per_file: int = 100_000,
) -> None:
    """Write ``df`` as ``path/{split=...}/part-*.parquet`` with at most
    ``max_records_per_file`` rows per file and a deterministic
    id-hash spread over ``n_shards_per_split`` tasks per split."""
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards_per_split))
    (
        df.repartition(n_shards_per_split, shard)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(split_col)
        .parquet(path)
    )


def shard_manifest(
    spark: SparkSession, path: str, split_col: str = "split", id_col: str = "doc_id"
) -> DataFrame:
    """One row per written file: (split, file, n_rows, min_id, max_id).
    Distributed read-back — no driver-side file listing or footer
    walking; the counts are exactly what a loader will read."""
    return (
        spark.read.parquet(path)
        .select(split_col, F.col(id_col), F.input_file_name().alias("file"))
        .groupBy(split_col, "file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )
