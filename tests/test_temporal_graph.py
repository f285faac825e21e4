"""Temporal joins (as-of, range) and dup-cluster connected components:
boundary semantics, tie-breaks, convergence, completeness."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from adguard2clickhouse_spark.operators.graph import (
    connected_components,
    dedup_keep_representatives,
)
from adguard2clickhouse_spark.operators.temporal import asof_join, range_join


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def asof_data(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts(10)),       # after both snaps → latest (9:30)
            (2, 7, _ts(9, 30)),    # exactly at a snap → matches it
            (3, 7, _ts(8)),        # before any snap → null
            (4, 8, _ts(12)),       # other user, own snapshot stream
            (5, 9, _ts(12)),       # user with no snaps at all → null
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (7, _ts(9), 1.0),
            (7, _ts(9, 30), 2.0),
            (8, _ts(11), 3.0),
        ],
        "user_id LONG, ts TIMESTAMP, snap_value DOUBLE",
    )
    return left, right


def test_asof_matches_latest_at_or_before(asof_data):
    left, right = asof_data
    out = {
        r.event_id: (r.snap_value_asof, r.ts_asof)
        for r in asof_join(left, right, "ts", "user_id").collect()
    }
    assert out[1] == (2.0, _ts(9, 30))   # latest of the two
    assert out[2] == (2.0, _ts(9, 30))   # equality is inclusive
    assert out[3] == (None, None)        # nothing at-or-before
    assert out[4] == (3.0, _ts(11))      # per-user isolation
    assert out[5] == (None, None)        # user with no right rows


def test_asof_keeps_every_left_row_and_columns(asof_data):
    left, right = asof_data
    out = asof_join(left, right, "ts", "user_id")
    assert out.count() == left.count()
    assert set(out.columns) == {
        "event_id", "user_id", "ts", "snap_value_asof", "ts_asof"
    }


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

def test_range_join_half_open_boundaries(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(10, 0, 0)),            # == start → in
            (2, _ts(11, 59, 59, 999999)),  # 1µs before end → in
            (3, _ts(12, 0, 0)),            # == end → out (half-open)
            (4, _ts(9, 59, 59, 999999)),   # 1µs before start → out
        ],
        "event_id LONG, ts TIMESTAMP",
    )
    intervals = spark.createDataFrame(
        [(100, _ts(10), _ts(12))],
        "interval_id LONG, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    got = {
        r.event_id
        for r in range_join(points, intervals, "ts", "start_ts", "end_ts").collect()
    }
    assert got == {1, 2}


def test_range_join_interval_spanning_many_granules(spark):
    # 5-hour interval, 1-hour granule: points in hours 1..5 all match
    points = spark.createDataFrame(
        [(i, _ts(i, 30)) for i in range(8)], "event_id LONG, ts TIMESTAMP"
    )
    intervals = spark.createDataFrame(
        [(100, _ts(1), _ts(6))],
        "interval_id LONG, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    got = {
        r.event_id
        for r in range_join(points, intervals, "ts", "start_ts", "end_ts").collect()
    }
    assert got == {1, 2, 3, 4, 5}


def test_range_join_subsecond_interval(spark):
    # interval smaller than a granule, fractional-µs boundaries
    points = spark.createDataFrame(
        [(1, _ts(10, 0, 0, 500)), (2, _ts(10, 0, 0, 1500))],
        "event_id LONG, ts TIMESTAMP",
    )
    intervals = spark.createDataFrame(
        [(100, _ts(10, 0, 0, 400), _ts(10, 0, 0, 1000))],
        "interval_id LONG, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    got = {
        r.event_id
        for r in range_join(points, intervals, "ts", "start_ts", "end_ts").collect()
    }
    assert got == {1}


def test_range_join_with_key(spark):
    points = spark.createDataFrame(
        [(1, 7, _ts(10, 30)), (2, 8, _ts(10, 30))],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    intervals = spark.createDataFrame(
        [(100, 7, _ts(10), _ts(11))],
        "interval_id LONG, user_id LONG, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    got = {
        r.event_id
        for r in range_join(
            points, intervals, "ts", "start_ts", "end_ts", by="user_id"
        ).collect()
    }
    assert got == {1}


# ---------------------------------------------------------------------------
# connected components / transitive dedup
# ---------------------------------------------------------------------------

def test_cc_chain_and_singletons(spark):
    # chain 1-2-3-4 (diameter 3: transitive, 1 and 4 never compared),
    # pair 10-11, singletons 20, 21 — identical on the union-find fast
    # path (default) and the forced distributed loop
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21]], "doc_id LONG"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 21}
    for cap in (100_000, 0):
        got = {
            r.doc_id: r.component
            for r in connected_components(
                nodes, edges, max_collect_edges=cap
            ).collect()
        }
        assert got == want, ("fast" if cap else "iterative", got)


def test_cc_phantom_edge_endpoints_are_dropped(spark):
    """ADVICE r6: edge endpoints absent from `nodes` must not leak
    into the output (the r6 single-shuffle rewrite briefly emitted
    them). Node 99 appears only in edges: it gets no label, relays
    nothing, and the in-node endpoints keep their own components."""
    nodes = spark.createDataFrame([(1,), (2,), (5,)], "doc_id LONG")
    edges = spark.createDataFrame(
        [(1, 2), (2, 99), (99, 5)], "doc_a LONG, doc_b LONG"
    )
    for cap in (100_000, 0):  # union-find fast path AND distributed loop
        got = {
            r.doc_id: r.component
            for r in connected_components(
                nodes, edges, max_collect_edges=cap
            ).collect()
        }
        # 99 absent from output; 5 NOT merged into {1,2} via phantom relay
        assert got == {1: 1, 2: 1, 5: 5}, ("fast" if cap else "iterative", got)


def test_cc_null_edge_endpoints_are_dropped(spark):
    """ADVICE r7 (medium): an edge with a NULL endpoint — source NULL
    or an id that cast('long')s to NULL — crashed the default
    union-find fast path with TypeError (None in sorted()/min()). Both
    paths must instead drop such edges: they can relay nothing because
    NULL is not a node id."""
    nodes = spark.createDataFrame([(1,), (2,), (5,)], "doc_id LONG")
    edges = spark.createDataFrame(
        [(1, 2), (2, None), (None, 5), (None, None)],
        "doc_a LONG, doc_b LONG",
    )
    for cap in (100_000, 0):  # union-find fast path AND distributed loop
        got = {
            r.doc_id: r.component
            for r in connected_components(
                nodes, edges, max_collect_edges=cap
            ).collect()
        }
        # NULL edges dropped: 5 stays its own component, no crash
        assert got == {1: 1, 2: 1, 5: 5}, ("fast" if cap else "iterative", got)


def test_cc_uncastable_id_edge_is_dropped(spark):
    """String ids that don't parse as long become NULL under the fast
    path's cast — same drop contract, no crash."""
    nodes = spark.createDataFrame([("1",), ("2",)], "doc_id STRING")
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "not-a-number")], "doc_a STRING, doc_b STRING"
    )
    got = {
        r.doc_id: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {"1": 1, "2": 1}


def test_cc_non_convergence_raises(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id LONG")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a LONG, doc_b LONG"
    )
    with pytest.raises(RuntimeError, match="converge"):
        # force the iterative path: the union-find fast path has no
        # iteration to bound
        connected_components(nodes, edges, max_iters=1, max_collect_edges=0)


def test_dedup_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 7, 9]], "doc_id LONG, text STRING"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a LONG, doc_b LONG")
    kept = {r.doc_id for r in dedup_keep_representatives(docs, pairs).collect()}
    assert kept == {1, 7, 9}


# ---------------------------------------------------------------------------
# simhash banding completeness (the pigeonhole guarantee, brute-checked)
# ---------------------------------------------------------------------------

def test_simhash_banding_complete_vs_brute_force(spark):
    from adguard2clickhouse_spark.operators.dedup import simhash, simhash_near_pairs
    from adguard2clickhouse_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for radius in (3, 8):
        sk = simhash(docs)
        a, b = sk.alias("a"), sk.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        brute = {
            (r.doc_a, r.doc_b)
            for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .filter(ham <= radius)
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .collect()
        }
        banded = {
            (r.doc_a, r.doc_b)
            for r in simhash_near_pairs(docs, max_hamming=radius).collect()
        }
        assert banded == brute, f"radius {radius}: banding must be lossless"


def test_asof_join_property_vs_brute_force(spark):
    """Randomized as-of joins must equal the brute-force definition:
    for each left row, the right row with the max ts <= left.ts in the
    same key (None if absent)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ts_s = st.integers(min_value=0, max_value=3600)
    key_s = st.integers(min_value=0, max_value=3)

    @given(
        st.lists(st.tuples(key_s, ts_s), min_size=1, max_size=25),
        st.lists(st.tuples(key_s, ts_s), min_size=0, max_size=25),
    )
    @settings(max_examples=12, deadline=None)
    def _check(left_rows, right_rows):
        base = dt.datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [
                (i, k, base + dt.timedelta(seconds=s))
                for i, (k, s) in enumerate(left_rows)
            ],
            "event_id LONG, user_id LONG, ts TIMESTAMP",
        )
        # de-dup right per (key, ts): operator contract
        rdict = {}
        for k, s in right_rows:
            rdict[(k, s)] = float(k * 10000 + s)
        right = spark.createDataFrame(
            [
                (k, base + dt.timedelta(seconds=s), v)
                for (k, s), v in rdict.items()
            ] or [(99, base, 0.0)],
            "user_id LONG, ts TIMESTAMP, snap_value DOUBLE",
        )
        got = {
            r.event_id: r.snap_value_asof
            for r in asof_join(left, right, "ts", "user_id").collect()
        }
        for i, (k, s) in enumerate(left_rows):
            cand = [(s2, v) for (k2, s2), v in rdict.items() if k2 == k and s2 <= s]
            expect = max(cand)[1] if cand else None
            assert got[i] == expect, (i, k, s, cand)

    _check()


def _ref_pagerank(n_nodes, edges, damping=0.85, n_iters=10):
    """Pure-Python power iteration with dangling-mass redistribution —
    the textbook formulation the distributed loop must reproduce."""
    out = {}
    for u, v in edges:
        out.setdefault(u, set()).add(v)
    r = {u: 1.0 / n_nodes for u in range(n_nodes)}
    for _ in range(n_iters):
        dm = sum(r[u] for u in range(n_nodes) if not out.get(u))
        recv = {u: 0.0 for u in range(n_nodes)}
        for u, vs in out.items():
            for v in vs:
                recv[v] += r[u] / len(vs)
        r = {
            u: (1.0 - damping) / n_nodes
            + damping * (recv[u] + dm / n_nodes)
            for u in range(n_nodes)
        }
    return r


def test_pagerank_matches_reference_power_iteration(spark):
    """Hub-and-chain graph with a dangling node and a duplicate edge:
    ranks match the textbook reference to 1e-12 and sum to 1.0."""
    from adguard2clickhouse_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 1)]  # (0,1) duplicated
    n = 5  # node 4 is fully isolated (dangling)
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id LONG")
    edf = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = {r.doc_id: r.rank for r in pagerank(nodes, edf).collect()}
    ref = _ref_pagerank(n, set(edges))
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for u in range(n):
        assert abs(got[u] - ref[u]) < 1e-12, (u, got[u], ref[u])


def test_window_funnel_hand_cases(spark):
    """ClickHouse windowFunnel analog: hand-built users exercising the
    semantics corners — u2 proves anchors are maximized over (the
    earliest view's chain dies at the window edge; a later view
    reaches level 3, so a single-anchor greedy would be wrong), u5
    proves strict timestamp increase, u4 proves order matters."""
    from adguard2clickhouse_spark.operators.temporal import window_funnel

    rows = [
        # u1: clean 3-step chain
        (1, 0.0, "view"), (1, 10.0, "click"), (1, 20.0, "purchase"),
        # u2: early anchor trapped by window, later anchor completes
        (2, 0.0, "view"), (2, 200.0, "click"),
        (2, 150.0, "view"), (2, 240.0, "purchase"),
        # u3: wrong first step only
        (3, 5.0, "purchase"),
        # u4: click precedes the only view
        (4, 1.0, "click"), (4, 2.0, "view"),
        # u5: simultaneous events do not chain (strict increase)
        (5, 5.0, "view"), (5, 5.0, "click"),
    ]
    ev = spark.createDataFrame(
        [(u, float(t), e) for u, t, e in rows],
        "user_id LONG, ts DOUBLE, event_type STRING",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = window_funnel(
        ev,
        [F.col("event_type") == s for s in ("view", "click", "purchase")],
        window_seconds=100,
    )
    got = {r.user_id: r.level for r in out.collect()}
    assert got == {1: 3, 2: 3, 3: 0, 4: 1, 5: 1}, got


def _brute_funnel(rows, k, window):
    """Exhaustive per-anchor greedy reference: for every cond1 event as
    anchor, greedily chain the earliest next-cond event strictly later
    than the tip and within anchor+window; report the deepest level."""
    by_user: dict = {}
    for u, t, c in rows:
        by_user.setdefault(u, []).append((t, c))
    out = {}
    for u, evs in by_user.items():
        best = 0
        for t0, c0 in evs:
            if c0 != 0:
                continue
            tip, lvl = t0, 1
            for i in range(1, k):
                cands = [
                    t for t, c in evs
                    if c == i and t > tip and t <= t0 + window
                ]
                if not cands:
                    break
                tip, lvl = min(cands), lvl + 1
            best = max(best, lvl)
        out[u] = best
    return out


def test_window_funnel_random_vs_brute_force(spark):
    """The r9 sort-based level step must agree with the exhaustive
    per-anchor reference on dense random instances (many ties, events
    usable by several anchors, windows cutting chains mid-way)."""
    import random

    from adguard2clickhouse_spark.operators.temporal import window_funnel

    rng = random.Random(90210)
    rows = [
        (u, float(rng.randint(0, 30)), rng.randint(0, 3))
        for u in range(25)
        for _ in range(rng.randint(1, 25))
    ]
    for window in (5, 12, 100):
        want = _brute_funnel(rows, 4, window)
        ev = spark.createDataFrame(
            rows, "user_id LONG, ts DOUBLE, etype LONG"
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "etype"
        )
        out = window_funnel(
            ev, [F.col("etype") == i for i in range(4)], window_seconds=window
        )
        got = {r.user_id: r.level for r in out.collect()}
        assert got == want, (window, {
            u: (got.get(u), want.get(u))
            for u in want if got.get(u) != want.get(u)
        })


def test_retention_hand_cases(spark):
    """ClickHouse retention analog: r1 = cond1 ever, ri = cond1 AND
    condi — a user hitting cond2 without cond1 reports r2 = 0."""
    from adguard2clickhouse_spark.operators.temporal import retention

    rows = [
        (1, "signup"), (1, "purchase"),          # r = (1, 1, 0)
        (2, "purchase"), (2, "error"),           # no signup -> all 0
        (3, "signup"),                           # r = (1, 0, 0)
        (4, "signup"), (4, "purchase"), (4, "error"),  # r = (1, 1, 1)
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    out = retention(
        ev, [F.col("event_type") == s for s in ("signup", "purchase", "error")]
    )
    got = {r.user_id: (r.r1, r.r2, r.r3) for r in out.collect()}
    assert got == {
        1: (1, 1, 0),
        2: (0, 0, 0),
        3: (1, 0, 0),
        4: (1, 1, 1),
    }, got


def test_sequence_match_hand_cases(spark):
    """sequenceMatch('(?1).*(?2).*(?3)') analog: greedy chained mins.
    u2 proves greedy-from-earliest is exact (the earliest view chains
    through a LATER click than the first); u5 proves strict increase;
    u4 proves order sensitivity."""
    from adguard2clickhouse_spark.operators.temporal import sequence_match

    rows = [
        (1, 0.0, "view"), (1, 1.0, "click"), (1, 2.0, "purchase"),
        # u2: click precedes the view; a later click + purchase completes
        (2, 5.0, "click"), (2, 6.0, "view"), (2, 7.0, "click"),
        (2, 8.0, "purchase"),
        (3, 0.0, "view"), (3, 1.0, "purchase"),     # no click in between
        (4, 0.0, "purchase"), (4, 1.0, "click"), (4, 2.0, "view"),  # reversed
        (5, 0.0, "view"), (5, 0.0, "click"), (5, 1.0, "purchase"),  # ties
    ]
    ev = spark.createDataFrame(
        [(u, float(t), e) for u, t, e in rows],
        "user_id LONG, ts DOUBLE, event_type STRING",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = sequence_match(
        ev, [F.col("event_type") == s for s in ("view", "click", "purchase")]
    )
    got = {r.user_id: r.matched for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}, got


def test_sequence_count_hand_cases(spark):
    """sequenceCount('(?1).*(?2).*(?3)') analog: earliest-completion
    greedy = max number of DISJOINT matches. u2 proves non-overlap
    (interleaved candidates collapse to 1); u5 proves strict increase
    kills same-ts chains."""
    from adguard2clickhouse_spark.operators.temporal import sequence_count

    rows = [
        # u1: two clean back-to-back matches
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        (1, 3, "view"), (1, 4, "click"), (1, 5, "purchase"),
        # u2: v c v c p p -> best disjoint set is 1 ([0,4] overlaps [2,5])
        (2, 0, "view"), (2, 1, "click"), (2, 2, "view"),
        (2, 3, "click"), (2, 4, "purchase"), (2, 5, "purchase"),
        # u3: complete + incomplete tail
        (3, 0, "view"), (3, 1, "click"), (3, 2, "purchase"),
        (3, 3, "view"), (3, 4, "click"),
        # u4: never starts
        (4, 0, "click"), (4, 1, "purchase"),
        # u5: ties break the strict chain
        (5, 0, "view"), (5, 0, "click"), (5, 1, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, float(t), e) for u, t, e in rows],
        "user_id LONG, ts DOUBLE, event_type STRING",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = sequence_count(
        ev, [F.col("event_type") == s for s in ("view", "click", "purchase")]
    )
    got = {r.user_id: r.n_matches for r in out.collect()}
    assert got == {1: 2, 2: 1, 3: 1, 4: 0, 5: 0}, got


def test_sequence_count_single_cond_collapses_ties(spark):
    """k=1: each match is one event, non-overlap is strictly-after —
    so equal-timestamp events collapse to one match."""
    from adguard2clickhouse_spark.operators.temporal import sequence_count

    ev = spark.createDataFrame(
        [(1, 0.0, "view"), (1, 0.0, "view"), (1, 1.0, "view")],
        "user_id LONG, ts DOUBLE, event_type STRING",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = sequence_count(ev, [F.col("event_type") == "view"])
    assert out.collect()[0].n_matches == 2


def test_sequence_count_string_group_key(spark):
    """The output schema follows the input group-key type."""
    from adguard2clickhouse_spark.operators.temporal import sequence_count

    ev = spark.createDataFrame(
        [("a", 0.0, "view"), ("a", 1.0, "click"), ("b", 0.0, "click")],
        "user_id STRING, ts DOUBLE, event_type STRING",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = sequence_count(
        ev, [F.col("event_type") == "view", F.col("event_type") == "click"]
    )
    got = {r.user_id: r.n_matches for r in out.collect()}
    assert got == {"a": 1, "b": 0}, got


def test_sequence_ops_null_handling(spark):
    """NULL timestamps never extend a chain (count and match agree
    with the relational oracle), and a NULL group key reports 0 via
    SQL join equality — documented asymmetry with retention's pure
    groupBy, which keeps NULL as an ordinary group."""
    from adguard2clickhouse_spark.operators.temporal import (
        sequence_count,
        sequence_match,
    )

    rows = [
        (1, 0.0, "view"), (1, None, "click"),          # NULL ts can't chain
        (None, 0.0, "view"), (None, 1.0, "click"),      # NULL group key
        (2, 0.0, "view"), (2, 1.0, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id LONG, ts DOUBLE, event_type STRING"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    conds = [F.col("event_type") == s for s in ("view", "click")]
    cnt = {r.user_id: r.n_matches for r in sequence_count(ev, conds).collect()}
    assert cnt == {1: 0, None: 0, 2: 1}, cnt
    mat = {r.user_id: r.matched for r in sequence_match(ev, conds).collect()}
    assert mat == {1: 0, None: 0, 2: 1}, mat


def test_connected_components_uncastable_ids_agree_across_paths(spark):
    """Review r9: both paths must implement the same id contract —
    component labels are BIGINT, so nodes whose id doesn't cast to
    long are DROPPED (and edges touching them), identically on the
    fast (union-find) and iterative (label-propagation) paths and
    independent of ANSI mode. String-numeric ids still work."""
    from adguard2clickhouse_spark.operators.graph import connected_components

    nodes = spark.createDataFrame(
        [("1",), ("2",), ("3",), ("oops",)], ["doc_id"]
    )
    edges = spark.createDataFrame(
        [("1", "2"), ("3", "oops")], ["doc_a", "doc_b"]
    )
    expect = {("1", 1), ("2", 1), ("3", 3)}  # 'oops' dropped, edge too
    fast = {
        (r.doc_id, r.component)
        for r in connected_components(nodes, edges).collect()
    }
    iterative = {
        (r.doc_id, r.component)
        for r in connected_components(
            nodes, edges, max_collect_edges=0
        ).collect()
    }
    assert fast == expect
    assert iterative == expect
