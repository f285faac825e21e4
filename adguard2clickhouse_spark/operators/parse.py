"""The per-record parse/transform pipeline (SURVEY.md §2.2 P1-P11, §2.3 K3).

Reference behavior being re-expressed (all /root/reference/src/collector.py):
  - json.loads per line                       :16   → from_json (PERMISSIVE)
  - required-key projection (KeyError→skip)   :17-25 → null-check split
  - optional keys with defaults               :22,24,26 → coalesce
  - ISO-8601 timestamp parse                  :17   → to_timestamp
  - base64 + DNS packet decode                :29-41 → dnswire.parse_dns_answer
  - per-line try/except dead-letter           :76-78 → _corrupt_record routing

Everything except the DNS decode is Spark built-ins, so Catalyst keeps
the whole projection in one codegen stage; the DNS decode is a single
Arrow-batched UDF column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adguard2clickhouse_spark.operators.dnswire import parse_dns_answer
from adguard2clickhouse_spark.schemas import LOG2_COLUMNS, QUERYLOG_SCHEMA

# Keys the reference reads with subscript access — absence raised
# KeyError and dead-lettered the line (collector.py:17-25,30).
_REQUIRED = ["T", "QH", "QT", "QC", "CP", "IP", "Elapsed", "Answer"]

_CORRUPT = "_corrupt_record"


def _schema_with_corrupt() -> T.StructType:
    return T.StructType(
        list(QUERYLOG_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )


def parse_querylog_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw text lines → wide parsed frame with validity markers.

    Returns every input line with columns: the 14 log2 columns, plus
    ``_raw`` (original line) and ``_valid`` (boolean). Split it with
    :func:`split_dead_letter`. Works identically on batch and
    streaming DataFrames (same expressions, no state).
    """
    j = F.from_json(
        F.col(value_col),
        _schema_with_corrupt(),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    df = lines.withColumn("_j", j)
    dns = parse_dns_answer(F.col("_j.Answer"))

    parsed = df.select(
        F.col(value_col).alias("_raw"),
        F.col(f"_j.{_CORRUPT}").alias(_CORRUPT),
        # try_to_timestamp: ANSI-safe — malformed timestamps become null
        # and route to dead-letter instead of failing the job (P5 + K3).
        F.try_to_timestamp(F.col("_j.T")).alias("date_time"),
        F.col("_j.QH").alias("QH"),                          # P2
        F.col("_j.QT").alias("QT"),
        F.col("_j.QC").alias("QC"),
        F.col("_j.CP").alias("CP"),
        F.coalesce("_j.Upstream", F.lit("")).alias("Upstream"),          # P3
        F.col("_j.IP").alias("IP"),
        F.coalesce("_j.Result.IsFiltered", F.lit(False)).alias("IsFiltered"),  # P4
        F.col("_j.Elapsed").alias("Elapsed"),
        F.coalesce("_j.Cached", F.lit(False)).alias("Cached"),           # P3
        dns.alias("_dns"),                                   # P6-P10
        *[F.col(f"_j.{k}").isNotNull().alias(f"_has_{k}") for k in _REQUIRED],
    )

    required_ok = F.lit(True)
    for k in _REQUIRED:
        required_ok = required_ok & F.col(f"_has_{k}")

    return parsed.select(
        "_raw",
        (
            F.col(_CORRUPT).isNull()
            & required_ok
            & F.col("date_time").isNotNull()   # unparseable timestamp → dead-letter
            & F.col("_dns.rcode").isNotNull()  # bad packet → dead-letter (K3)
        ).alias("_valid"),
        "date_time",
        "QH",
        "QT",
        "QC",
        "CP",
        "Upstream",
        "IP",
        "IsFiltered",
        "Elapsed",
        "Cached",
        F.col("_dns.rcode").alias("rcode"),
        F.col("_dns.rdatas").alias("rdatas"),
        F.col("_dns.rdatas6").alias("rdatas6"),
        F.col("_dns.cnames").alias("cnames"),
    )


def split_dead_letter(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(log2 rows in insert-column order P11, dead-letter raw lines K3)."""
    good = parsed.filter("_valid").select(*LOG2_COLUMNS)
    dead = parsed.filter(~F.col("_valid")).select(F.col("_raw").alias("raw_line"))
    return good, dead


def parse_querylog(lines: DataFrame, value_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """One-call convenience: raw lines → (log2 DataFrame, dead letters)."""
    return split_dead_letter(parse_querylog_lines(lines, value_col))
