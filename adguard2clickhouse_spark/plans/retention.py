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
    values (empty list → nothing touched).

    **Non-atomic commit window**: plain parquet has no transaction
    log, and Spark's dynamic partition overwrite deletes an affected
    partition directory before renaming its staged replacement in. A
    crash inside that window loses the partition's surviving rows (the
    to-be-forgotten rows are gone either way — a re-run converges).
    Acceptable for this harness; production RTBF at 100 TB belongs on
    a table format with atomic commits (Delta/Iceberg DELETE) or a
    stage-and-swap layer above this call."""
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
    values whose directories were actually deleted.

    Directory names are built with Spark's own partition-path escaping
    (``ExternalCatalogUtils.escapePathName`` — space, ``:``, ``%`` etc.
    are percent-encoded on disk), so a value like ``"a b:c"`` maps to
    the real ``day=a%20b%3Ac`` directory instead of silently missing
    it; values whose directory is absent are NOT reported as dropped."""
    df = spark.read.parquet(path)
    vals = df.select(partition_col).distinct()
    # partition-type inference may surface dates/ints — the directory
    # name is the string rendering, so compare and delete by string
    candidates = [
        r[0]
        for r in vals.filter(~keep_predicate)
        .select(F.col(partition_col).cast("string"))
        .collect()
    ]
    if not candidates:
        return []
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    dropped = []
    for v in candidates:
        if v is None:
            dirname = f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
        else:
            dirname = f"{partition_col}={_escape_path_name(jvm, v)}"
        p = jvm.org.apache.hadoop.fs.Path(path, dirname)
        if fs.exists(p) and fs.delete(p, True):
            dropped.append(v)
    return dropped


def _escape_path_name(jvm, value: str) -> str:
    """Spark's partition-directory escaping. Prefer the JVM's own
    ``ExternalCatalogUtils.escapePathName`` (bit-exact with what the
    writer produced); fall back to a faithful Python twin of the same
    Hive rule set if the internal class moves."""
    try:
        return (
            jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(value)
        )
    except Exception:
        needs_escape = set('"#%\'*/:=?\\\x7f{[]^')
        out = []
        for ch in value:
            if ch in needs_escape or ord(ch) < 32:
                out.append("%%%02X" % ord(ch))
            else:
                out.append(ch)
        return "".join(out)
