"""The eight reference aggregates (SURVEY.md §2.5 A1-A8).

Each ClickHouse materialized view + SummingMergeTree pair
(/root/reference/README.md:24-189) is one declarative
``groupBy().agg()`` here. Expressed on built-ins only, so Catalyst
plans partial (map-side) + final aggregation automatically — the exact
distributed analog of the MV-delta + background-merge design, and the
shape that scales: one shuffle on the group key per aggregate, no
Python, no state.

These functions take any DataFrame with log2 columns; they run
identically over a batch read, a micro-batch inside foreachBatch
(streaming delta computation — see streaming/pipeline.py), or a full
table scan (exact re-aggregation read, §2.8 C2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adguard2clickhouse_spark.functions import is_ipv4_string, is_ipv6_string, tld


def blocked_domains(log2: DataFrame) -> DataFrame:
    """A1 — blocked query count per domain (README.md:25-40)."""
    return (
        log2.filter(F.col("IsFiltered"))
        .groupBy("QH")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def visited_domains(log2: DataFrame) -> DataFrame:
    """A2 — allowed query count per domain (README.md:173-188)."""
    return (
        log2.filter(~F.col("IsFiltered"))
        .groupBy("QH")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def clients_stats(log2: DataFrame) -> DataFrame:
    """A3 — visited/blocked conditional double-count per client
    (README.md:45-62): ``sum(if(IsFiltered,0,1))``, ``sum(if(IsFiltered,1,0))``."""
    return log2.groupBy("IP").agg(
        F.sum(F.when(~F.col("IsFiltered"), 1).otherwise(0)).alias("visited"),
        F.sum(F.when(F.col("IsFiltered"), 1).otherwise(0)).alias("blocked"),
    )


def qt_stats(log2: DataFrame) -> DataFrame:
    """A4 — count per query type (README.md:67-81)."""
    return log2.groupBy("QT").agg(F.count(F.lit(1)).alias("count"))


def rcode_stats(log2: DataFrame) -> DataFrame:
    """A5 — count per DNS response code (README.md:86-100)."""
    return log2.groupBy("rcode").agg(F.count(F.lit(1)).alias("count"))


def stats2(log2: DataFrame, bucket: str = "10 minutes") -> DataFrame:
    """A6 — per-client, per-10-minute blocked/visited
    (README.md:105-128; bucketing via toStartOfInterval at :122).

    Uses ``window()`` — the streaming-compatible tumbling window — and
    exposes the bucket start as ``date_time`` like the reference table.
    """
    return (
        log2.groupBy(F.col("IP"), F.window("date_time", bucket).alias("_w"))
        .agg(
            F.sum(F.when(F.col("IsFiltered"), 1).otherwise(0)).alias("blocked"),
            F.sum(F.when(~F.col("IsFiltered"), 1).otherwise(0)).alias("visited"),
        )
        .select(
            "IP",
            F.col("_w.start").alias("date_time"),
            "blocked",
            "visited",
        )
    )


def _real_domain(qh) -> F.Column:
    """F3 (README.md:148): more than one dot-segment and not an IP literal."""
    c = F.col(qh) if isinstance(qh, str) else qh
    return (
        (F.size(F.split(c, r"\.")) > 1)
        & ~is_ipv4_string(c)
        & ~is_ipv6_string(c)
    )


def tld_stats(log2: DataFrame) -> DataFrame:
    """A7 — count per top-level domain (README.md:132-148).

    ``arrayRotateRight(splitByChar('.',QH),1)[1]`` rewritten to
    ``element_at(split(QH,'\\.'), -1)`` (see functions/strings.py:tld).
    """
    return (
        log2.filter(_real_domain("QH"))
        .groupBy(tld("QH").alias("tld"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def upstream_stats(log2: DataFrame) -> DataFrame:
    """A8 — count per upstream resolver (README.md:153-158).

    The reference MV body (README.md:159-168) is a copy-paste of
    tld_stats — a reference bug (SURVEY.md §2.5 A8). We implement the
    evident intent of the upstream_stats table DDL.
    """
    return log2.groupBy("Upstream").agg(F.count(F.lit(1)).alias("count"))


ALL_AGGREGATES = {
    "blocked_domains": blocked_domains,
    "visited_domains": visited_domains,
    "clients_stats": clients_stats,
    "qt_stats": qt_stats,
    "rcode_stats": rcode_stats,
    "stats2": stats2,
    "tld_stats": tld_stats,
    "upstream_stats": upstream_stats,
}

# Additive ("SummingMergeTree") key/measure split per aggregate — used
# by the summing sink to fold partial results across micro-batches
# (§2.8 C2). stats2's key includes the bucket timestamp.
AGGREGATE_KEYS = {
    "blocked_domains": ["QH"],
    "visited_domains": ["QH"],
    "clients_stats": ["IP"],
    "qt_stats": ["QT"],
    "rcode_stats": ["rcode"],
    "stats2": ["IP", "date_time"],
    "tld_stats": ["tld"],
    "upstream_stats": ["Upstream"],
}
