"""PII scrubbing for training-data curation (brief §extensions: the
redaction pass every pretraining pipeline runs before tokenization).

Pure regexp built-ins — whole-stage codegen, no UDF, no shuffle; the
scrubber is a narrow projection that composes with the parquet scan.
Patterns are written in the Java-regex ∩ RE2 common subset (no
lookarounds, ASCII classes only) so the DuckDB oracle can replay them
byte-for-byte and the hash gate covers the actual redaction semantics.

Counts are taken SEQUENTIALLY (each pattern counted on the text as
left by the previous redaction), which makes the ordering part of the
contract: an SSN already replaced by <SSN> can't also be counted as a
phone number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order. Email first (its
# local part may contain digits that later patterns would chew on),
# SSN before IPv4/phone (three digit groups look phone-ish), IPv4
# before phone (dotted quads are digit runs).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b|\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted, n_email, n_ssn, n_ipv4, n_phone).

    ``redacted`` is the text with every match replaced by its token;
    the per-kind counts are exact match counts at the point in the
    sequence where that pattern ran.
    """
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pattern)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pattern, repl)
    return df.select(F.col(id_col), cur.alias("redacted"), *counts)


def redacted_text(col: Column | str) -> Column:
    """The redaction chain alone, as a column expression — compose it
    into wider projections (no forced narrow select, no join-back)."""
    cur: Column = F.col(col) if isinstance(col, str) else col
    for _name, pattern, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pattern, repl)
    return cur


def pii_oracle_sql(source_expr: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`scrub_pii` over ``source_expr`` (a SQL
    expression yielding the text). DuckDB's regexp_replace is
    first-match-only without the 'g' flag — Spark's is global, so the
    flag is load-bearing."""
    cur = source_expr
    count_cols = []
    for name, pattern, repl in PII_PATTERNS:
        # standard-SQL string literal: backslashes pass through verbatim,
        # only quotes need doubling.
        pat_sql = pattern.replace("'", "''")
        count_cols.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat_sql}')) AS BIGINT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat_sql}', '{repl}', 'g')"
    cols = ",\n  ".join([id_col, f"{cur} AS redacted"] + count_cols)
    return cols
