"""ClickHouse interval/series aggregate analogs: ``maxIntersections``
(+Position), ``intervalLengthSum``, ``deltaSum``, and ``WITH FILL``.

These are the event-analytics aggregates the reference's target system
exposes for interval workloads (concurrent-session peaks, total active
time, monotone-counter deltas, gap-free time axes). ClickHouse computes
each as a parametric aggregate state over sorted per-group buffers; the
Spark-first twins below are pure built-in expressions — sort-window
sweeps and gaps-and-islands, shuffle-on-the-group-key end to end, no
per-group UDF state — so they scale exactly like any keyed window
aggregate: one hash exchange on the group key, sorted once, every
downstream window/groupBy reusing that partitioning.

Semantics notes (documented, not inherited from ClickHouse bit-for-bit):

- ``max_intersections`` treats intervals as CLOSED [start, end]: at a
  tie timestamp, starts are swept before ends, so touching intervals
  [1,2] and [2,3] intersect (count 2 at t=2). ClickHouse's
  maxIntersections has the same +1/-1 sweep shape.
- ``interval_length_sum`` unions closed intervals per group (overlap
  and touch both merge) and returns the summed union length — the
  gaps-and-islands form, exact in whatever integer unit the caller
  encodes the bounds in.
- ``delta_sum`` sums the POSITIVE differences of consecutive values in
  ``order_col`` order (ClickHouse deltaSumTimestamp's ordered form;
  plain deltaSum depends on storage order, which a distributed engine
  must not).
- ``with_fill`` materializes the missing keys of an equally-stepped
  axis (ClickHouse ``ORDER BY … WITH FILL STEP s``) as a sequence
  explode + left join, with caller-supplied defaults for the value
  columns. The axis bounds are a 1-row aggregate broadcast — in-plan,
  never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _group(by) -> list:
    if by is None:
        return []
    return [by] if isinstance(by, str) else list(by)


def max_intersections(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    by=None,
) -> DataFrame:
    """``maxIntersections(start, end)`` + ``maxIntersectionsPosition``
    per ``by`` group: the maximum number of simultaneously-open closed
    intervals, and the earliest sweep point where that maximum is
    reached. Returns (by…, max_intersections LONG, at <start type>).

    Plan: explode each interval to (+1 at start, −1 at end) points,
    running sum over a (t, −delta) sort window (starts first at ties ⇒
    closed-interval semantics), then a same-key max window + filter +
    min — one hash exchange on the group key, the follow-up window and
    groupBy reuse it. Rows with a NULL bound are dropped (an unbounded
    interval has no finite sweep point).
    """
    g = _group(by)
    pts = (
        df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .select(
            *g,
            F.explode(
                F.array(
                    F.struct(
                        F.col(start_col).alias("_t"), F.lit(1).alias("_d")
                    ),
                    F.struct(
                        F.col(end_col).alias("_t"), F.lit(-1).alias("_d")
                    ),
                )
            ).alias("_p"),
        )
        .select(*g, F.col("_p._t").alias("_t"), F.col("_p._d").alias("_d"))
    )
    w_sweep = (
        Window.partitionBy(*g)
        .orderBy(F.col("_t"), F.col("_d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("_run", F.sum("_d").over(w_sweep))
    w_all = Window.partitionBy(*g)
    peak = run.withColumn("_peak", F.max("_run").over(w_all))
    return (
        peak.filter(F.col("_run") == F.col("_peak"))
        .groupBy(*g)
        .agg(
            F.max("_peak").cast("long").alias("max_intersections"),
            F.min("_t").alias("at"),
        )
    )


def interval_length_sum(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    by=None,
) -> DataFrame:
    """``intervalLengthSum(start, end)`` per ``by`` group: the total
    length of the UNION of the group's closed intervals — overlaps
    counted once, touching intervals merged, zero-length intervals
    contributing 0 but still merging islands they touch. Returns
    (by…, interval_length_sum <numeric>).

    Plan: classic gaps-and-islands — sort by (start, end), a new
    island begins where start exceeds the running max of previous
    ends, islands numbered by a cumulative sum, then per-island
    max(end) − min(start), summed per group. One hash exchange on the
    group key; both windows and both groupBys reuse it.
    """
    g = _group(by)
    w = Window.partitionBy(*g).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        F.when(prev_max_end.isNull(), 1)
        .when(F.col(start_col) > prev_max_end, 1)
        .otherwise(0)
    )
    islands = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).withColumn(
        "_isl",
        F.sum(new_island).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_island = islands.groupBy(*g, "_isl").agg(
        (F.max(end_col) - F.min(start_col)).alias("_len")
    )
    return per_island.groupBy(*g).agg(
        F.sum("_len").alias("interval_length_sum")
    )


def delta_sum(
    df: DataFrame,
    value_col: str = "value",
    order_col="ts",
    by=None,
) -> DataFrame:
    """``deltaSumTimestamp(value, ts)`` analog per ``by`` group: the
    sum of POSITIVE differences between consecutive values in
    ``order_col`` order — the monotone-counter restart-tolerant total
    (a counter that resets contributes only its increases). Returns
    (by…, delta_sum <value type>). ``order_col`` may be a list; pass a
    tie-breaking suffix (e.g. an id) whenever the primary order column
    can repeat within a group — lag over a tied sort is otherwise
    nondeterministic.

    One sort window on the group key, lag, greatest(diff, 0), sum —
    a single hash exchange, groupBy reuses it.
    """
    g = _group(by)
    w = Window.partitionBy(*g).orderBy(*[F.col(c) for c in _group(order_col)])
    prev = F.lag(F.col(value_col)).over(w)
    inc = F.when(
        prev.isNotNull() & (F.col(value_col) > prev),
        F.col(value_col) - prev,
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_inc", inc)
        .groupBy(*g)
        .agg(F.sum("_inc").alias("delta_sum"))
    )


def with_fill(
    df: DataFrame,
    fill_col: str,
    step,
    partition_cols=None,
    defaults: dict | None = None,
    max_axis_rows: int | None = 10_000_000,
) -> DataFrame:
    """``ORDER BY fill_col WITH FILL STEP step`` analog: materialize
    every missing step of the ``fill_col`` axis between the GLOBAL min
    and max (per the whole frame, ClickHouse's default FROM/TO), for
    every distinct combination of ``partition_cols``; SYNTHESIZED rows
    take ``defaults[col]`` (or NULL) for the remaining columns —
    original rows keep their values, including genuine NULLs
    (ClickHouse WITH FILL defaults apply only to fill rows it
    interleaves, never to source rows).

    ``step`` is a Column literal: ``F.lit(1)`` for integer axes,
    ``F.expr("interval 1 day")`` for date axes — anything
    ``F.sequence`` accepts.

    ``max_axis_rows`` guards the axis explode: wide bounds × many
    partition tuples silently materialize (hi−lo)/step·n_partitions
    rows before the join (one stray 1970 timestamp in a microsecond
    axis = trillions). The guard collects one 1-row bounds probe off a
    checkpointed copy of the same per-partition min/max aggregate the
    axis needs anyway, then asks Spark (never the driver — interval
    step values don't convert to Python) whether
    ``lo + allowed·step ≤ hi`` for allowed = cap // n_partitions, and
    raises with the offending bounds when it holds. Works for every
    step type ``sequence`` accepts. Pass ``None`` to skip the guard
    entirely (the original fully in-plan form: bounds ride a 1-row
    broadcast, no driver action).

    Plan: ONE per-partition min/max aggregate feeds both the distinct
    partition tuples and the global axis bounds (collected by the
    guard probe and inlined as literals; or, when the guard is off,
    re-aggregated to 1 row and broadcast). The axis is one
    ``sequence`` explode per partition tuple and the fill is a full
    join on (partition…, fill) — broadcastable whenever the filled
    axis is small, AQE decides. Callers filling a large raw frame
    should pre-aggregate (as a fill axis practically always is) or
    persist upstream — the stats pass re-executes the input lineage
    once.
    """
    g = _group(partition_cols)
    defaults = defaults or {}
    per_part = df.groupBy(*g).agg(
        F.min(fill_col).alias("_plo"), F.max(fill_col).alias("_phi")
    )
    if max_axis_rows is not None:
        # Materialize the (small: one row per partition tuple) stats
        # frame once — the probe action below and the axis side of the
        # final plan both read it, so df's lineage executes once for
        # the checkpoint instead of once per consumer.
        per_part = per_part.localCheckpoint(eager=True)
        probe = per_part.agg(
            F.min("_plo").alias("_lo"),
            F.max("_phi").alias("_hi"),
            F.count(F.lit(1)).alias("_np"),
        ).first()
        if probe._lo is None:
            # empty input (or all-NULL axis): nothing to fill
            return df.select(*g, fill_col, *[
                c for c in df.columns if c != fill_col and c not in g
            ])
        # Axis-length check WITHOUT collecting the step value: interval
        # steps don't convert to Python (YearMonthIntervalType crashes
        # .first()), but `lo + allowed·step < hi` is arithmetic Spark
        # evaluates JVM-side for every sequence-compatible step type
        # (numeric, day-time and year-month intervals over dates and
        # timestamps). One partition's axis exceeds `allowed` elements
        # iff that holds with allowed = max_axis_rows // n_partitions.
        # try_* arithmetic makes an overflowing allowed·step mean "the
        # cap lies beyond the type's range" — hi is representable, so
        # the axis can't be over — instead of an ANSI abort.
        #
        # Step sign first (ADVICE r9): a zero/negative step makes
        # lo + allowed·step ≤ hi trivially true and the guard would
        # raise its cap-violation message for what is really an
        # invalid step. Same JVM-side trick (never collect the step —
        # interval types don't convert): lo + step ≤ lo ⟺ step ≤ 0.
        # NULL (lo + step overflowed the type) falls through to the
        # over-check, which handles that case via try arithmetic.
        # Both predicates evaluate as two columns of ONE range(1) job —
        # the guard stays a single bounded driver action, checked in
        # order (sign before cap) on the returned row.
        allowed = max(max_axis_rows // max(probe._np, 1), 1)
        checks = (
            df.sparkSession.range(1)
            .select(
                (F.try_add(F.lit(probe._lo), step) <= F.lit(probe._lo))
                .alias("_nonpos"),
                F.coalesce(
                    F.try_add(
                        F.lit(probe._lo),
                        F.try_multiply(step, F.lit(allowed)),
                    )
                    <= F.lit(probe._hi),
                    F.lit(False),
                ).alias("_over"),
            )
            .first()
        )
        if checks["_nonpos"] is True:
            raise ValueError(
                "with_fill: step must be positive — the fill axis runs "
                f"from min to max of {fill_col!r} "
                f"({probe._lo!r}..{probe._hi!r}), so sequence() requires "
                "a step that moves forward; got a zero or negative step"
            )
        if checks["_over"]:
            raise ValueError(
                f"with_fill axis would exceed max_axis_rows="
                f"{max_axis_rows:,}: more than {allowed:,} steps per "
                f"partition tuple across {probe._np} partition tuples "
                f"(bounds {probe._lo!r}..{probe._hi!r}); use a coarser "
                "step, clamp the axis bounds upstream, or raise/"
                "disable max_axis_rows"
            )
        axis = per_part.select(*g).select(
            *g,
            F.explode(
                F.sequence(F.lit(probe._lo), F.lit(probe._hi), step)
            ).alias(fill_col),
        )
    else:
        bounds = per_part.agg(
            F.min("_plo").alias("_lo"), F.max("_phi").alias("_hi")
        )
        axis = (
            per_part.select(*g)
            .crossJoin(F.broadcast(bounds))
            .select(
                *g,
                F.explode(
                    F.sequence(F.col("_lo"), F.col("_hi"), step)
                ).alias(fill_col),
            )
        )
    value_cols = [c for c in df.columns if c != fill_col and c not in g]
    # FULL join, not left: ClickHouse WITH FILL interleaves fill rows
    # with the original rows — a source row whose fill value is off
    # the step grid (hi − lo not a multiple of step) must survive,
    # not be silently dropped by an axis-driven left join. The marker
    # column distinguishes "no source row matched this axis point"
    # (synthesized → default) from "source row with a genuine NULL
    # value" (kept as NULL) — coalesce on the value itself conflated
    # the two.
    src = df.withColumn("__wf_src__", F.lit(True))
    filled = axis.join(src, [*g, fill_col], "full")
    synthesized = F.col("__wf_src__").isNull()
    return filled.select(
        *g,
        fill_col,
        *[
            F.when(synthesized, F.lit(defaults[c]))
            .otherwise(F.col(c))
            .alias(c)
            if c in defaults
            else F.col(c)
            for c in value_cols
        ],
    )
