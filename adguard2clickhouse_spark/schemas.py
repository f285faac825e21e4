"""Declared schemas for the pipeline.

The reference parses its input dynamically (``json.loads`` with
subscript access, /root/reference/src/collector.py:16-26) and declares
its output schema only in ClickHouse DDL (/root/reference/README.md:4-22).
We declare both ends: a ``StructType`` for ``from_json`` on the source
(PERMISSIVE mode reproduces the reference's per-line try/except
dead-letter semantics, collector.py:76-78) and the ``log2`` fact schema
on the sink.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: one AdGuard Home query-log JSON line (SURVEY.md §1.3).
# Field-by-field source: /root/reference/src/collector.py:16-30.
# ---------------------------------------------------------------------------
QUERYLOG_SCHEMA = T.StructType(
    [
        T.StructField("T", T.StringType()),          # ISO-8601 ts   (collector.py:17)
        T.StructField("QH", T.StringType()),         # hostname      (collector.py:18)
        T.StructField("QT", T.StringType()),         # query type    (collector.py:19)
        T.StructField("QC", T.StringType()),         # query class   (collector.py:20)
        T.StructField("CP", T.StringType()),         # client proto  (collector.py:21)
        T.StructField("Upstream", T.StringType()),   # optional      (collector.py:22)
        T.StructField("IP", T.StringType()),         # client IP     (collector.py:23)
        T.StructField(                               # optional      (collector.py:24)
            "Result",
            T.StructType([T.StructField("IsFiltered", T.BooleanType())]),
        ),
        T.StructField("Elapsed", T.LongType()),      # latency ns    (collector.py:25)
        T.StructField("Cached", T.BooleanType()),    # optional      (collector.py:26)
        T.StructField("Answer", T.StringType()),     # b64 DNS pkt   (collector.py:30)
    ]
)

# ---------------------------------------------------------------------------
# Output: the `log2` fact table (ClickHouse DDL /root/reference/README.md:4-22;
# type mapping SURVEY.md §1.2). Column order matches the reference insert
# list (collector.py:74-75).
# ---------------------------------------------------------------------------
LOG2_SCHEMA = T.StructType(
    [
        T.StructField("date_time", T.TimestampType()),
        T.StructField("QH", T.StringType()),
        T.StructField("QT", T.StringType()),
        T.StructField("QC", T.StringType()),
        T.StructField("CP", T.StringType()),
        T.StructField("Upstream", T.StringType()),
        T.StructField("IP", T.StringType()),
        T.StructField("IsFiltered", T.BooleanType()),
        T.StructField("Elapsed", T.LongType()),
        T.StructField("Cached", T.BooleanType()),
        T.StructField("rcode", T.IntegerType()),
        T.StructField("rdatas", T.ArrayType(T.StringType())),
        T.StructField("rdatas6", T.ArrayType(T.StringType())),
        T.StructField("cnames", T.ArrayType(T.StringType())),
    ]
)

LOG2_COLUMNS = [f.name for f in LOG2_SCHEMA.fields]

# Result struct of the DNS answer parser (SURVEY.md §2.10).
DNS_ANSWER_SCHEMA = T.StructType(
    [
        T.StructField("rcode", T.IntegerType()),
        T.StructField("rdatas", T.ArrayType(T.StringType())),
        T.StructField("rdatas6", T.ArrayType(T.StringType())),
        T.StructField("cnames", T.ArrayType(T.StringType())),
    ]
)
