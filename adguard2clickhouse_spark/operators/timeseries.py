"""Time-series profile similarity (brief §extensions; pattern follows
the distributed time-series similarity-search literature, e.g. "Time
Series Similarity Search for Streaming Data in Distributed Systems",
EDBT 2019 — PAA reduction before distance ranking).

Pipeline:

1. ``hourly_profiles`` — each (user, day) becomes a fixed 24-slot
   integer vector of hourly activity (permille-scaled value sums;
   missing hours are genuine zeros). Built entirely from built-ins:
   one groupBy to hourly sums, one map_from_entries per series, a
   sequence-transform to densify — no pivot, no UDF, one shuffle.
2. ``paa`` — piecewise aggregate approximation: the 24 slots average
   into ``segments`` equal blocks (integer floor). PAA is the classic
   dimensionality reduction that keeps Euclidean lower-bounding — at
   corpus scale you band/bucket on PAA words first and verify exactly
   within candidates, same skeleton as the MinHash/LSH operators.
3. ``ts_topk`` — exact top-k nearest series to a query vector by
   squared Euclidean distance on the PAA segments (integer math end
   to end → cross-engine exact). TakeOrderedAndProject, ties on key.

Scale shape: profiles are (n_users × n_days) rows of ``segments``
ints — thousands of times smaller than the raw events; the ranking
scan is linear with a top-k heap, never a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_profiles(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(key, day, profile): profile = 24 hourly floor(sum(value)·1000)
    slots, zeros where the hour had no events."""
    hourly = (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.to_date(ts_col).alias("day"),
            F.hour(ts_col).alias("_h"),
        )
        .agg(F.floor(F.sum(value_col) * 1000).cast("long").alias("_v"))
    )
    dense = (
        hourly.groupBy("key", "day")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_h"), F.col("_v")))
            ).alias("_m")
        )
        .select(
            "key",
            "day",
            F.transform(
                F.sequence(F.lit(0), F.lit(23)),
                lambda h: F.coalesce(F.element_at(F.col("_m"), h), F.lit(0)),
            ).alias("profile"),
        )
    )
    return dense


def paa(df: DataFrame, col: str = "profile", segments: int = 6) -> DataFrame:
    """Replace ``col`` with its ``segments``-block integer PAA: block i
    is floor(mean of its slots). 24 must divide evenly."""
    width = 24 // segments
    assert width * segments == 24, "segments must divide 24"
    blocks = F.transform(
        F.sequence(F.lit(0), F.lit(segments - 1)),
        # floor, not cast-truncation: slot sums can be negative and
        # truncation-toward-zero would disagree with the SQL floor
        lambda i: F.floor(
            F.aggregate(
                F.slice(F.col(col), i * width + 1, width),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            / width
        ).cast("long"),
    )
    return df.withColumn(col, blocks)


def ts_topk(
    profiles: DataFrame,
    query: list[int],
    k: int = 5,
    col: str = "profile",
) -> DataFrame:
    """Exact top-k most-similar series to ``query`` by squared
    Euclidean distance over the integer segments. Linear scan +
    TakeOrderedAndProject; ties break on (day, key)."""
    q = F.array(*[F.lit(int(x)) for x in query])
    dist = F.aggregate(
        F.zip_with(F.col(col), q, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        # zip_with pads a length mismatch with nulls, which would turn
        # dist2 NULL and sort differently per engine — exclude such
        # rows explicitly rather than ranking garbage
        profiles.filter(F.size(F.col(col)) == len(query))
        .select("key", "day", dist.alias("dist2"))
        .orderBy(F.asc("dist2"), F.asc("day"), F.asc("key"))
        .limit(k)
    )
