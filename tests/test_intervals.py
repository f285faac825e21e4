"""ClickHouse interval/series analogs (operators/intervals.py):
maxIntersections sweep semantics, union-length islands, positive-delta
sums, WITH FILL axis materialization."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from adguard2clickhouse_spark.operators.intervals import (
    delta_sum,
    interval_length_sum,
    max_intersections,
    with_fill,
)


def test_max_intersections_hand_cases(spark):
    """Closed-interval sweep: touching intervals intersect (starts
    sweep before ends at ties); the reported position is the EARLIEST
    point reaching the peak; NULL bounds are dropped."""
    rows = [
        # g=a: [1,4],[2,6],[5,8],[4,4] -> peak 3 at t=4 ([1,4],[2,6],[4,4])
        ("a", 1, 4), ("a", 2, 6), ("a", 5, 8), ("a", 4, 4),
        # g=b: disjoint [1,2],[3,4] -> peak 1 at t=1
        ("b", 1, 2), ("b", 3, 4),
        # g=c: touching [1,2],[2,3] -> closed semantics: peak 2 at t=2
        ("c", 1, 2), ("c", 2, 3),
        ("c", None, 9),  # dropped
    ]
    df = spark.createDataFrame(rows, "g STRING, start LONG, end LONG")
    out = {
        r.g: (r.max_intersections, r.at)
        for r in max_intersections(df, by="g").collect()
    }
    assert out == {"a": (3, 4), "b": (1, 1), "c": (2, 2)}, out


def test_interval_length_sum_hand_cases(spark):
    """Union length: overlaps counted once, touching merges, nested
    absorbs, zero-length contributes 0, disjoint adds."""
    rows = [
        # g=a: [1,4]+[2,6] overlap -> [1,6]=5; [8,9]=1 -> 6
        ("a", 1, 4), ("a", 2, 6), ("a", 8, 9),
        # g=b: [1,2]+[2,3] touch -> [1,3] = 2
        ("b", 1, 2), ("b", 2, 3),
        # g=c: [1,10] nests [2,3]; [5,5] zero-length inside -> 9
        ("c", 1, 10), ("c", 2, 3), ("c", 5, 5),
    ]
    df = spark.createDataFrame(rows, "g STRING, start LONG, end LONG")
    out = {
        r.g: r.interval_length_sum
        for r in interval_length_sum(df, by="g").collect()
    }
    assert out == {"a": 6, "b": 2, "c": 9}, out


def test_delta_sum_hand_cases(spark):
    """Only positive consecutive diffs count: a counter 0->5->3->7
    contributes 5+4; a monotone 1->2->3 contributes 2; a single row 0."""
    rows = [
        ("a", 1, 0), ("a", 2, 5), ("a", 3, 3), ("a", 4, 7),
        ("b", 1, 1), ("b", 2, 2), ("b", 3, 3),
        ("c", 1, 42),
    ]
    df = spark.createDataFrame(rows, "g STRING, ts LONG, value LONG")
    out = {r.g: r.delta_sum for r in delta_sum(df, by="g").collect()}
    assert out == {"a": 9, "b": 2, "c": 0}, out


def test_with_fill_integer_axis(spark):
    """Missing steps materialize with defaults for every partition;
    the axis spans the GLOBAL min..max, so a partition missing the
    edges gets them filled too."""
    rows = [("x", 1, 10), ("x", 3, 30), ("y", 2, 99)]
    df = spark.createDataFrame(rows, "k STRING, t LONG, n LONG")
    out = with_fill(
        df, "t", F.lit(1), partition_cols=["k"], defaults={"n": 0}
    )
    got = {(r.k, r.t): r.n for r in out.collect()}
    assert got == {
        ("x", 1): 10, ("x", 2): 0, ("x", 3): 30,
        ("y", 1): 0, ("y", 2): 99, ("y", 3): 0,
    }, got


def test_with_fill_date_axis_no_partition(spark):
    d = datetime.date
    rows = [(d(2024, 1, 1), 5), (d(2024, 1, 4), 7)]
    df = spark.createDataFrame(rows, "day DATE, n LONG")
    out = with_fill(df, "day", F.expr("interval 1 day"), defaults={"n": 0})
    got = {r.day: r.n for r in out.collect()}
    assert got == {
        d(2024, 1, 1): 5, d(2024, 1, 2): 0,
        d(2024, 1, 3): 0, d(2024, 1, 4): 7,
    }, got


def test_with_fill_keeps_genuine_nulls_in_source_rows(spark):
    """ADVICE r8: defaults apply only to SYNTHESIZED fill rows
    (ClickHouse WITH FILL interleaves fill rows; it never rewrites a
    source row). A source row with a real NULL measure must stay NULL,
    while the missing axis point still takes the default."""
    rows = [("x", 1, 10), ("x", 3, None)]
    df = spark.createDataFrame(rows, "k STRING, t LONG, n LONG")
    out = with_fill(df, "t", F.lit(1), partition_cols=["k"], defaults={"n": 0})
    got = {(r.k, r.t): r.n for r in out.collect()}
    assert got == {("x", 1): 10, ("x", 2): 0, ("x", 3): None}, got


def test_with_fill_axis_guard_trips(spark):
    """One stray wide bound must raise, not materialize the axis:
    integer axis spanning 10^9 with step 1 exceeds the default cap."""
    df = spark.createDataFrame(
        [("x", 0, 1), ("x", 1_000_000_000, 2)], "k STRING, t LONG, n LONG"
    )
    with pytest.raises(ValueError, match="max_axis_rows"):
        with_fill(df, "t", F.lit(1), partition_cols=["k"], defaults={"n": 0})


def test_with_fill_axis_guard_counts_partition_tuples(spark):
    """The estimate is per-partition length × partition count: 3
    partitions × 500k-step axis > 1M cap even though one partition's
    axis alone is under it."""
    rows = [(f"p{i}", t, 1) for i in range(3) for t in (0, 500_000)]
    df = spark.createDataFrame(rows, "k STRING, t LONG, n LONG")
    with pytest.raises(ValueError, match="partition tuples"):
        with_fill(
            df, "t", F.lit(1), partition_cols=["k"],
            defaults={"n": 0}, max_axis_rows=1_000_000,
        )
    # same data passes with the cap raised
    out = with_fill(
        df, "t", F.lit(1), partition_cols=["k"],
        defaults={"n": 0}, max_axis_rows=2_000_000,
    )
    assert out.count() == 3 * 500_001


def test_with_fill_guard_off_is_fully_in_plan(spark):
    """max_axis_rows=None keeps the original no-driver-collect form
    and identical results."""
    rows = [("x", 1, 10), ("x", 3, 30)]
    df = spark.createDataFrame(rows, "k STRING, t LONG, n LONG")
    out = with_fill(
        df, "t", F.lit(1), partition_cols=["k"],
        defaults={"n": 0}, max_axis_rows=None,
    )
    got = {(r.k, r.t): r.n for r in out.collect()}
    assert got == {("x", 1): 10, ("x", 2): 0, ("x", 3): 30}, got


def test_with_fill_empty_input(spark):
    df = spark.createDataFrame([], "k STRING, t LONG, n LONG")
    assert with_fill(
        df, "t", F.lit(1), partition_cols=["k"], defaults={"n": 0}
    ).count() == 0


def test_with_fill_preserves_off_grid_rows(spark):
    """A source row whose fill value is off the step grid survives
    (ClickHouse WITH FILL interleaves fill rows with original rows);
    the grid itself still densifies from the global min."""
    rows = [("x", 1, 10), ("x", 4, 40)]
    df = spark.createDataFrame(rows, "k STRING, t LONG, n LONG")
    out = with_fill(df, "t", F.lit(2), partition_cols=["k"], defaults={"n": 0})
    got = {(r.k, r.t): r.n for r in out.collect()}
    assert got == {("x", 1): 10, ("x", 3): 0, ("x", 4): 40}, got


def test_with_fill_guard_handles_interval_steps(spark):
    """Review r9: the guard must not collect the step value — interval
    types don't convert to Python (YearMonthIntervalType crashed the
    probe's .first()). Month and day steps fill under the DEFAULT
    guard; a month axis spanning ~83k years trips it."""
    import datetime as dt

    rows = [("x", dt.date(2024, 1, 1), 1), ("x", dt.date(2024, 4, 1), 4)]
    df = spark.createDataFrame(rows, "k STRING, d DATE, n LONG")
    out = with_fill(
        df, "d", F.expr("interval 1 month"), partition_cols=["k"],
        defaults={"n": 0},
    )
    got = {r.d.month: r.n for r in out.collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 4}, got

    wide = spark.createDataFrame(
        [("x", dt.date(1900, 1, 1), 1), ("x", dt.date(9999, 1, 1), 2)],
        "k STRING, d DATE, n LONG",
    )
    with pytest.raises(ValueError, match="max_axis_rows"):
        with_fill(
            wide, "d", F.expr("interval 1 month"), partition_cols=["k"],
            defaults={"n": 0}, max_axis_rows=50_000,
        )

    day = with_fill(
        df, "d", F.expr("interval 45 day"), partition_cols=["k"],
        defaults={"n": 0},
    )
    assert day.count() == 4  # 2 source rows + Jan1+45d, Jan1+90d


def test_with_fill_nonpositive_step_raises_step_error(spark):
    """ADVICE r9: a zero/negative step makes lo + allowed·step ≤ hi
    trivially true, so the guard used to raise its cap-violation
    message for what is really an invalid step. The step-sign check
    now runs first and names the real problem."""
    df = spark.createDataFrame(
        [("x", 1, 10), ("x", 5, 20)], "k STRING, t LONG, n LONG"
    )
    for bad in (F.lit(0), F.lit(-1)):
        with pytest.raises(ValueError, match="step must be positive"):
            with_fill(df, "t", bad, partition_cols=["k"], defaults={"n": 0})


def test_with_fill_negative_interval_step_raises_step_error(spark):
    """Same check for interval steps (which never convert to Python):
    the sign probe is evaluated JVM-side."""
    import datetime

    rows = [(datetime.date(2024, 1, 1), 1), (datetime.date(2024, 1, 5), 2)]
    df = spark.createDataFrame(rows, "day DATE, n LONG")
    with pytest.raises(ValueError, match="step must be positive"):
        with_fill(df, "day", F.expr("interval -1 day"), defaults={"n": 0})
