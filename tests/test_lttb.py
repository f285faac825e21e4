"""LTTB downsampling (operators/timeseries.py::lttb): endpoint
retention, bucket-average anchors, tie and empty-neighbor rules."""

from __future__ import annotations

from adguard2clickhouse_spark.operators.timeseries import lttb


def _run(spark, rows, nb, schema="g STRING, t LONG, v LONG"):
    df = spark.createDataFrame(rows, schema)
    out = lttb(df, t_col="t", v_col="v", n_buckets=nb, by="g")
    res = {}
    for r in out.collect():
        res.setdefault(r.g, []).append((r.t, r.v))
    return {k: sorted(v) for k, v in res.items()}


def test_lttb_picks_extremes(spark):
    """6 points, 2 buckets: bucket 0 anchors on (first, avg bucket 1),
    bucket 1 on (avg bucket 0, last) — hand areas pick the spikes t=1
    (area 15 vs 5) and t=4 (15 vs 5)."""
    rows = [("a", t, v) for t, v in
            [(0, 0), (1, 10), (2, 0), (3, 0), (4, 10), (5, 0)]]
    got = _run(spark, rows, nb=2)
    assert got == {"a": [(0, 0), (1, 10), (4, 10), (5, 0)]}, got


def test_lttb_short_series(spark):
    """cnt <= 2: endpoints only, no duplicate when cnt == 1."""
    rows = [("one", 7, 3), ("two", 1, 1), ("two", 9, 2)]
    got = _run(spark, rows, nb=4)
    assert got == {"one": [(7, 3)], "two": [(1, 1), (9, 2)]}, got


def test_lttb_empty_neighbor_anchors_on_nearest(spark):
    """4 points, 3 buckets: bucket 2 is empty, so bucket 1's right
    anchor is the NEAREST non-empty bucket (the last-point
    pseudo-bucket); every interior point survives as its bucket's
    only candidate."""
    rows = [("a", t, v) for t, v in [(0, 0), (1, 5), (2, 7), (3, 0)]]
    got = _run(spark, rows, nb=3)
    assert got == {"a": [(0, 0), (1, 5), (2, 7), (3, 0)]}, got


def test_lttb_area_tie_breaks_to_smaller_t(spark):
    """Two interior candidates with symmetric areas: the smaller t
    wins. Points (1,5) and (2,-5) against anchors (0,0) and avg of
    bucket 1 = (3.5, 0) have equal |area|."""
    rows = [("a", t, v) for t, v in
            [(0, 0), (1, 5), (2, -5), (3, 0), (4, 0), (5, 0)]]
    got = _run(spark, rows, nb=2)
    assert (1, 5) in got["a"] and (2, -5) not in got["a"], got


def test_lttb_rebase_keeps_picks_translation_invariant(spark):
    """ADVICE r7: absolute epoch-micros × cents could overflow
    decimal(38,0) and silently NULL the area. The numerator is built
    from differences, so the per-group (min t, min v) rebase must
    leave every pick identical — verified by shifting the same series
    to near-epoch-max magnitudes."""
    base = [(t, (t * 37) % 11 - 5) for t in range(40)]
    rows_lo = [("a", t, v) for t, v in base]
    shift_t, shift_v = 1_700_000_000_000_000, 10_000_000_000
    rows_hi = [("a", t + shift_t, v + shift_v) for t, v in base]
    got_lo = _run(spark, rows_lo, nb=5)["a"]
    got_hi = _run(spark, rows_hi, nb=5)["a"]
    assert [(t + shift_t, v + shift_v) for t, v in got_lo] == got_hi


def test_lttb_huge_magnitudes_no_silent_mispick(spark):
    """Near the old failure mode: values at ~10^18 with large spans.
    After rebasing, spans (not absolute values) drive the arithmetic,
    so the max-area point is still found (pre-fix these areas went
    NULL and the pick degraded to min-t)."""
    t0, v0 = 1_700_000_000_000_000, 900_000_000_000_000_000
    rows = [("a", t0 + t, v0) for t in range(10)]
    # one spike mid-bucket: must be picked over its flat neighbors
    rows[5] = ("a", t0 + 5, v0 + 123_456)
    got = _run(spark, rows, nb=2)["a"]
    assert (t0 + 5, v0 + 123_456) in got, got


def test_lttb_null_tv_rows_dropped(spark):
    rows = [("a", 0, 0), ("a", None, 9), ("a", 2, None), ("a", 5, 5)]
    got = _run(spark, rows, nb=1)["a"]
    assert got == [(0, 0), (5, 5)], got
