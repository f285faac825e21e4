"""Physical-plan regression tests — the 100 TB guarantees.

Correctness tests say the answers are right; these say the PLANS stay
right: filters reach the parquet scan, projections prune columns,
small dims broadcast, top-k never full-sorts. A regression here is a
scale bug long before it is a wall-clock bug at test SF.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def test_a1_filter_pushed_to_scan(spark, qs):
    """A1's IsFiltered pre-filter must reach the events parquet scan as
    a pushed predicate (event_type = 'error' after the bridge)."""
    plan = _physical(qs["a1_blocked_domains"](spark, SF))
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]" in plan


def test_a1_scan_prunes_columns(spark, qs):
    """The bridge projects 3 of events' columns; the scan must not read
    the rest (ts, value, event_id...)."""
    plan = _physical(qs["a1_blocked_domains"](spark, SF))
    assert "ReadSchema: struct<user_id:bigint,event_type:string,props:string>" in plan


def test_q1_partial_aggregation(spark, qs):
    """Map-side combine: HashAggregate(partial) below the exchange."""
    plan = _physical(qs["q1_pricing_summary"](spark, SF))
    assert "partial_" in plan  # partial_sum/partial_count before shuffle
    assert plan.count("Exchange") == 1  # exactly one shuffle: the final groupBy


def test_join_revenue_broadcasts_dims(spark, qs):
    """nation and region are explicitly broadcast; customer⋈orders may
    be either strategy (AQE decides from stats) but the dims must
    never shuffle."""
    plan = _physical(qs["x_join_revenue_by_nation"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_is_take_ordered_not_full_sort(spark, qs):
    """ORDER BY + LIMIT k must compile to TakeOrderedAndProject (heap
    of k per partition), not a global Sort."""
    plan = _physical(qs["x_topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_token_stats_reads_only_needed_columns(spark, qs):
    plan = _physical(qs["x4_token_stats"](spark, SF))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_semi_join_stays_semi(spark, qs):
    """EXISTS-shaped queries must stay semi joins (no row explosion)."""
    plan = _physical(qs["x_semi_join"](spark, SF))
    assert "LeftSemi" in plan


def test_media_query_defers_payload_to_udf_stage(spark, qs):
    """x5: the binary payload feeds mapInPandas directly — it must not
    appear in any exchange (payloads never shuffle)."""
    df = qs["x5_media_features"](spark, SF)
    plan = _physical(df)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line


def test_dedup_count_aggregates_hashes_not_text(spark, qs):
    """x1 groups on the 32-char md5, not the document text: the shuffle
    carries digests."""
    opt = _optimized(qs["x1_dedup_count"](spark, SF))
    assert "md5" in opt


def test_topk_cosine_no_global_window_sort(spark, qs):
    """The vector top-k must heap-select before ranking — the rank
    window may only ever see k rows (GlobalLimit above it), never the
    full corpus."""
    plan = _physical(qs["x3_topk_cosine"](spark, SF))
    assert "TakeOrderedAndProject" in plan
