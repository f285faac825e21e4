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
    slots, zeros where the hour had no events.

    Interpreted-HOF audit, NEGATIVE result (r15, VERDICT r14 #3 —
    x13_ts_similarity at 166 s was a flagged sf100 candidate): the
    codegen twin (one groupBy(key,day) with 24 conditional F.sum
    slots → F.array, eliminating both this transform() AND the
    second shuffle) measured bit-identical on all 4,008,300 sf10
    profiles but SLOWER — 31.5 s vs 27.2 s end-to-end — because 24
    wide aggregation-buffer slots per group cost more than the
    interpreted 24-element transform they replace; unlike winnow/BPE
    the lambda here does one map lookup per element, not real work.
    Keep this form; the audit rule is "rewrite where the lambda does
    per-element WORK", and this site is the counter-example."""
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


def lttb(
    df: DataFrame,
    t_col: str = "t",
    v_col: str = "v",
    n_buckets: int = 20,
    by=None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (the parallel
    bucket-average variant; ClickHouse ships the same family as
    ``largestTriangleThreeBuckets``): per group, keep the first and
    last points plus, from each of ``n_buckets`` equal-count interior
    buckets, the point forming the largest triangle with the
    NEIGHBORING BUCKETS' AVERAGES. Classic LTTB anchors the triangle
    on the previously *selected* point, which is sequential by
    construction; anchoring on the left bucket's average instead makes
    every bucket's argmax independent — fully parallel, one shuffle on
    the group key — at a visually negligible quality cost (the anchors
    differ from the selected points by at most the bucket spread).

    Exactness: with integer ``t_col``/``v_col`` (epoch micros, cents)
    the area comparison is pure integer arithmetic — the shared
    denominator cl²·cr is dropped and the numerator
    |(Stl·cr − Str·cl)(v·cl − Svl) − (Stl − t·cl)(Svr·cl − Svl·cr)|
    is computed in decimal(38,0) (DuckDB twin: HUGEINT), so the
    selected points replay bit-identically cross-engine. The numerator
    is built entirely from differences, so it is EXACTLY invariant
    under per-group translation of t and v — each group is therefore
    rebased to (t − min t, v − min v) before the arithmetic (ADVICE
    r7: on absolute epoch-micros × cents the 38-digit bound was
    reachable and non-ANSI decimal overflow silently NULLed the area,
    degrading the pick to min-t while the HUGEINT oracle kept the true
    argmax). After rebasing, overflow needs span_t · span_v ·
    count² ≈ 10³⁸ — if a pathological series still hits it the area
    raises (``raise_error``) instead of silently mis-picking. Rows
    with a NULL t or v are dropped up front (they are unplottable and
    would otherwise NULL-poison the sums).

    Requires distinct ``t_col`` per group (pre-aggregate duplicates);
    ties in area break to the smaller t; buckets left empty by short
    series simply emit nothing, and each bucket anchors on the NEAREST
    NON-EMPTY bucket on either side (the endpoints ride along as
    1-point pseudo-buckets −1 and ``n_buckets``, so both anchors
    always exist). Returns (by…, t, v).

    Plan shape: ONE role-tagged frame (endpoints are buckets −1/nb,
    interior points their equal-count bucket), ONE groupBy to the
    per-bucket (Σt, Σv, n) anchors, lag/lead over the bucket axis for
    the neighbor anchors (no self-joins), one big-side join of the
    points against that tiny anchor frame, one pick-window. The anchor
    frame is ``localCheckpoint(eager=False)``-ed — it is ≤ n_buckets+2
    rows per group and feeds two consumers (the join and the endpoint
    rows); without the cut, per-branch column pruning de-canonicalizes
    the shared subplan and the whole input pipeline re-executes per
    consumer. Net: the input lineage runs twice (anchor pass + point
    pass), exactly like any stats-then-transform operator.

    Interpreted-HOF audit (r15, VERDICT r14 #3 — the 118 s sf100 wall
    made this a flagged candidate): this operator contains NO
    higher-order-function lambdas; the wall is the double input pass ×
    two window sorts × the decimal(38,0) area arithmetic over 100M
    events, all codegen'd. Nothing to rewrite under the HOF rule.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    g = [by] if isinstance(by, str) else list(by or [])
    from pyspark.sql.window import Window

    w = Window.partitionBy(*g).orderBy(F.col("_t"))
    wall = Window.partitionBy(*g)
    pts = df.select(
        *g, F.col(t_col).alias("_t"), F.col(v_col).alias("_v")
    ).filter(F.col("_t").isNotNull() & F.col("_v").isNotNull())
    bucketed = (
        pts.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(wall))
        # per-group rebase: the area numerator is translation-invariant,
        # so working in (_t−min, _v−min) keeps decimal(38,0) far from
        # its bound without changing any pick (see docstring)
        .withColumn("_t0", F.min("_t").over(wall))
        .withColumn("_v0", F.min("_v").over(wall))
        .withColumn("_tr", F.col("_t") - F.col("_t0"))
        .withColumn("_vr", F.col("_v") - F.col("_v0"))
        .withColumn(
            "_b",
            F.when(F.col("_rn") == 1, F.lit(-1))
            .when(F.col("_rn") == F.col("_cnt"), F.lit(n_buckets))
            .otherwise(
                F.floor(
                    (F.col("_rn") - 2)
                    * F.lit(n_buckets)
                    / F.greatest(F.col("_cnt") - 2, F.lit(1))
                )
            )
            .cast("long"),
        )
    )
    aggs = (
        bucketed.groupBy(*g, "_b")
        .agg(
            F.sum("_tr").alias("_st"),
            F.sum("_vr").alias("_sv"),
            F.count(F.lit(1)).alias("_c"),
            # group constants, carried so the endpoint pseudo-buckets
            # can emit ORIGINAL coordinates (their sums are rebased)
            F.min("_t0").alias("_t0"),
            F.min("_v0").alias("_v0"),
        )
        .localCheckpoint(eager=False)
    )
    wb = Window.partitionBy(*g).orderBy(F.col("_b"))
    anch = aggs.select(
        *g,
        "_b",
        "_st",
        "_sv",
        "_t0",
        "_v0",
        F.lag("_st").over(wb).alias("_stl"),
        F.lag("_sv").over(wb).alias("_svl"),
        F.lag("_c").over(wb).alias("_cl"),
        F.lead("_st").over(wb).alias("_str"),
        F.lead("_sv").over(wb).alias("_svr"),
        F.lead("_c").over(wb).alias("_cr"),
    )
    interior = bucketed.filter(
        (F.col("_b") >= 0) & (F.col("_b") < n_buckets)
    ).select(*g, "_b", "_t", "_v", "_tr", "_vr")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = F.abs(
        (d(F.col("_stl")) * d(F.col("_cr")) - d(F.col("_str")) * d(F.col("_cl")))
        * (d(F.col("_vr")) * d(F.col("_cl")) - d(F.col("_svl")))
        - (d(F.col("_stl")) - d(F.col("_tr")) * d(F.col("_cl")))
        * (d(F.col("_svr")) * d(F.col("_cl")) - d(F.col("_svl")) * d(F.col("_cr")))
    )
    # anchors are never NULL for interior rows (the endpoint pseudo-
    # buckets guarantee a neighbor on both sides) and NULL t/v rows
    # were dropped — a NULL numerator can only be non-ANSI decimal
    # overflow, which must fail loudly, not mis-pick as min-t.
    num = F.when(num.isNotNull(), num).otherwise(
        F.raise_error(
            F.lit(
                "lttb: decimal(38,0) area overflow even after per-group "
                "rebase — pre-scale t/v to smaller units"
            )
        ).cast("decimal(38,0)")
    )
    wpick = Window.partitionBy(*g, "_b").orderBy(
        F.col("_area").desc_nulls_last(), F.col("_t").asc()
    )
    picked = (
        interior.join(
            anch.select(
                *g, "_b", "_stl", "_svl", "_cl", "_str", "_svr", "_cr"
            ),
            [*g, "_b"],
        )
        .withColumn("_area", num)
        .withColumn("_pk", F.row_number().over(wpick))
        .filter(F.col("_pk") == 1)
    )
    endpoints = anch.filter(
        (F.col("_b") == -1) | (F.col("_b") == n_buckets)
    ).select(
        *g,
        (F.col("_st") + F.col("_t0")).alias("_t"),
        (F.col("_sv") + F.col("_v0")).alias("_v"),
    )
    out_cols = [*g, F.col("_t").alias(t_col), F.col("_v").alias(v_col)]
    return endpoints.select(*out_cols).unionByName(picked.select(*out_cols))
