"""Exact-output tests for the eight aggregates (SURVEY.md §2.5) on a
hand-built fact table (conftest.log2_df)."""

from __future__ import annotations

import datetime as dt

from adguard2clickhouse_spark.operators import aggregates as agg


def _as_dict(df, key_cols, val_cols):
    out = {}
    for r in df.collect():
        k = tuple(r[c] for c in key_cols)
        out[k if len(k) > 1 else k[0]] = tuple(r[c] for c in val_cols)
    return out


def test_blocked_domains(log2_df):
    got = _as_dict(agg.blocked_domains(log2_df), ["QH"], ["count"])
    assert got == {"ads.example.com": (2,), "2001:db8::2": (1,)}


def test_visited_domains(log2_df):
    got = _as_dict(agg.visited_domains(log2_df), ["QH"], ["count"])
    assert got == {
        "good.example.com": (2,),
        "nx.example.org": (1,),
        "localhost": (1,),
        "1.2.3.4": (1,),
    }


def test_clients_stats(log2_df):
    got = _as_dict(agg.clients_stats(log2_df), ["IP"], ["visited", "blocked"])
    assert got == {
        "10.0.0.1": (2, 1),
        "10.0.0.2": (1, 1),
        "10.0.0.3": (2, 1),
    }


def test_qt_stats(log2_df):
    got = _as_dict(agg.qt_stats(log2_df), ["QT"], ["count"])
    assert got == {"A": (5,), "AAAA": (2,), "PTR": (1,)}


def test_rcode_stats(log2_df):
    got = _as_dict(agg.rcode_stats(log2_df), ["rcode"], ["count"])
    assert got == {0: (6,), 3: (1,), 2: (1,)}


def test_stats2_tumbling_window(log2_df):
    got = _as_dict(
        agg.stats2(log2_df), ["IP", "date_time"], ["blocked", "visited"]
    )
    b0 = dt.datetime(2024, 1, 1, 0, 0)
    b1 = dt.datetime(2024, 1, 1, 0, 10)
    assert got == {
        ("10.0.0.1", b0): (1, 2),
        ("10.0.0.2", b0): (1, 0),
        ("10.0.0.2", b1): (0, 1),
        ("10.0.0.3", b1): (1, 2),
    }


def test_tld_stats_excludes_single_label_and_ip_literals(log2_df):
    got = _as_dict(agg.tld_stats(log2_df), ["tld"], ["count"])
    # localhost (1 label), 1.2.3.4 (IPv4), 2001:db8::2 (IPv6) excluded;
    # note '2001:db8::2' has no dot so doubly excluded.
    assert got == {"com": (4,), "org": (1,)}


def test_upstream_stats_intended_semantics(log2_df):
    got = _as_dict(agg.upstream_stats(log2_df), ["Upstream"], ["count"])
    assert got == {"8.8.8.8:53": (3,), "1.1.1.1:53": (2,), "": (3,)}


def test_additivity_invariant(log2_df):
    """SummingMergeTree contract (§2.8 C2): agg(whole) == fold(agg(parts)).

    This is the invariant that makes the foreachBatch + additive-upsert
    streaming design exact.
    """
    from pyspark.sql import functions as F

    whole = _as_dict(agg.clients_stats(log2_df), ["IP"], ["visited", "blocked"])
    part1 = agg.clients_stats(log2_df.limit(4))
    part2 = agg.clients_stats(log2_df.subtract(log2_df.limit(4)))
    folded = _as_dict(
        part1.unionByName(part2)
        .groupBy("IP")
        .agg(F.sum("visited").alias("visited"), F.sum("blocked").alias("blocked")),
        ["IP"],
        ["visited", "blocked"],
    )
    assert folded == whole


def test_domain_label_entropy_hand_computed(spark):
    """'aaaa' has zero entropy; 'abcd' has ln(4); 'aabb' has ln(2) —
    all in the floored-micro integer form the operator emits. Distinct
    domains collapse before the char explode (n_queries counts rows)."""
    import math

    from adguard2clickhouse_spark.operators.aggregates import domain_label_entropy

    rows = [
        ("aaaa.example.com",), ("aaaa.example.com",),
        ("abcd.example.com",),
        ("aabb.example.com",),
        ("1.2.3.4",),        # IP literal: excluded by the F3 predicate
        ("localhost",),      # single label: excluded
    ]
    log2 = spark.createDataFrame(rows, ["QH"])
    got = {r.label: (r.label_len, r.n_queries, r.entropy_micro)
           for r in domain_label_entropy(log2).collect()}
    assert set(got) == {"aaaa", "abcd", "aabb"}
    assert got["aaaa"] == (4, 2, 0)
    # abcd: 4 chars nc=1 each: term = floor(1e6*ln(4)) per char; sum*4 // 4
    t4 = math.floor(1e6 * math.log(4.0))
    assert got["abcd"] == (4, 1, (4 * t4) // 4)
    t2 = math.floor(1e6 * math.log(2.0))
    assert got["aabb"] == (4, 1, (2 * t2 + 2 * t2) // 4)
    # ordering sanity: random-looking > repeated
    assert got["abcd"][2] > got["aabb"][2] > got["aaaa"][2]


def test_fused_deltas_equal_per_sink_aggregates(log2_df, spark):
    """VERDICT r6 #4: the streaming fan computes all eight deltas in
    ONE grouping-sets shuffle. Each extractor's output must be row-
    and type-identical to the per-sink aggregate it replaces, on a
    frame exercising every edge (filtered/unfiltered mixes, single-
    label + IP-literal QHs excluded from tld, empty Upstream)."""
    from adguard2clickhouse_spark.operators.aggregates import (
        ALL_AGGREGATES,
        fused_aggregate_deltas,
    )

    fused, extract = fused_aggregate_deltas(log2_df)
    fused = fused.persist()
    try:
        for name, fn in ALL_AGGREGATES.items():
            want_df = fn(log2_df)
            got_df = extract[name](fused)
            assert got_df.columns == want_df.columns, name
            # dtypes, not schema: aggregate nullability differs (count
            # is non-nullable, grouping-set sums are nullable) and
            # parquet stores optional either way — types must match.
            assert got_df.dtypes == want_df.dtypes, (
                name, got_df.dtypes, want_df.dtypes)
            want = sorted(map(tuple, want_df.collect()))
            got = sorted(map(tuple, got_df.collect()))
            assert got == want, (name, got, want)
            assert want, f"{name}: fixture exercises no rows"
    finally:
        fused.unpersist()


def test_fused_deltas_single_shuffle_plan(log2_df):
    """The fusion's point is plan shape: ONE Expand + one exchange for
    all eight deltas (vs 8 exchanges), so the micro-batch is scanned
    and shuffled once per epoch."""
    from adguard2clickhouse_spark.operators.aggregates import (
        fused_aggregate_deltas,
    )

    fused, _ = fused_aggregate_deltas(log2_df)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    assert plan.count("Exchange") == 1, plan
