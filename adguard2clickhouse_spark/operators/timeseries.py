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


def seasonal_naive_residuals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Seasonal-naive forecasting baseline: each observation is
    predicted by its (key, hour-of-week) slot's integer-permille mean,
    and the residual is what anomaly detection actually consumes (pair
    with the median/MAD flagger for a robust detector). All integer:
    value_permille = floor(value·1000), baseline = floor(Σ/n) over the
    slot — floor (not truncate: Spark's DIV truncates toward zero and
    would disagree with floor-semantics engines on negative sums), so
    the baseline is identical on any engine.

    One hash exchange on (key, hour_of_week); the slot aggregate rides
    a window over that partitioning, so baseline and residual come out
    of a single pass. Returns (id, key, hour_of_week, value_permille,
    baseline_permille, resid_permille).
    """
    from pyspark.sql.window import Window

    vp = F.floor(F.col(value_col) * 1000).cast("long")
    how = (
        (F.dayofweek(ts_col) - 1) * 24 + F.hour(ts_col)
    ).cast("int").alias("hour_of_week")
    w = Window.partitionBy(key_col, "hour_of_week")
    base = F.floor(F.col("slot_sum") / F.col("slot_n")).cast("long")
    return (
        df.select(
            F.col(id_col), F.col(key_col), how, vp.alias("value_permille")
        )
        .withColumn("slot_sum", F.sum("value_permille").over(w))
        .withColumn("slot_n", F.count(F.lit(1)).over(w))
        .select(
            id_col,
            key_col,
            "hour_of_week",
            "value_permille",
            base.alias("baseline_permille"),
            (F.col("value_permille") - base).cast("long").alias("resid_permille"),
        )
    )
