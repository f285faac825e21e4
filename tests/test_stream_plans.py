"""Streaming plan-budget gate (VERDICT r7 ask #5 / r8 carry #6).

The batch queries are shuffle-gated by tests/plan_budgets.json via a
dry ``executedPlan`` count; streaming plans only exist per micro-batch,
so this gate EXECUTES each of the six streaming gate queries at the
correctness SF with the entry module's observer seam installed and
checks, from the terminated query's own artifacts
(``StreamingQueryProgress`` + the last micro-batch's physical plan):

- the per-epoch Exchange count stays within the recorded budget — a
  refactor that adds a shuffle to a streaming plan pays it on EVERY
  trigger forever, the worst place to regress;
- the stateful-operator set is exactly the recorded one — an extra
  state store is per-epoch state-store IO plus checkpoint growth;
- zero rows dropped by watermark — every gate fixture is constructed
  with nothing late, so a drop means the watermark arithmetic moved.

Regenerate budgets with scripts/gen_stream_budgets.py when a plan
intentionally changes.
"""

from __future__ import annotations

import json
import pathlib

import pytest

import __spark_entry__ as entrymod
from adguard2clickhouse_spark.plans.streamaudit import audit_streaming_query

SF = "/root/testdata/sf0.001"

STREAMING_QUERIES = [
    "a6_stats2_stream",
    "c1_stream_pipeline",
    "e_sessions_native_stream",
    "e_sessions_stream",
    "e_stream_dedup",
    "e_stream_interval_join",
]


def _budgets() -> dict:
    return json.loads(
        (pathlib.Path(__file__).parent / "plan_budgets.json").read_text()
    )


def test_all_streaming_queries_have_budgets():
    budgets = _budgets()
    missing = [q for q in STREAMING_QUERIES if q not in budgets]
    assert not missing, f"streaming queries without a budget: {missing}"
    malformed = [
        q for q in STREAMING_QUERIES
        if q in budgets and not isinstance(budgets[q], dict)
    ]
    assert not malformed, f"streaming budgets must be dicts: {malformed}"


@pytest.mark.parametrize("name", STREAMING_QUERIES)
def test_streaming_budget_holds(spark, name):
    budget = _budgets()[name]
    audits: dict[str, dict] = {}

    def observer(qname, query):
        audits[qname] = audit_streaming_query(query)

    entrymod._STREAM_OBSERVER = observer
    try:
        df = entrymod.queries()[name](spark, SF)
        rows = df.count()
    finally:
        entrymod._STREAM_OBSERVER = None

    assert name in audits, "query did not report to the observer seam"
    a = audits[name]
    assert rows > 0, "gate query returned no rows — fixture broke"
    assert a["epochs"] >= 1, "no progress recorded"
    assert a["exchanges"] <= budget["exchanges"], (
        f"{name}: per-epoch Exchange count {a['exchanges']} exceeds "
        f"budget {budget['exchanges']} — a new shuffle in a streaming "
        "plan repeats every trigger; regenerate budgets only if the "
        "extra exchange is intentional"
    )
    assert a["state_operators"] == budget["state_operators"], (
        f"{name}: stateful operators {a['state_operators']} != recorded "
        f"{budget['state_operators']}"
    )
    assert a["rows_dropped_by_watermark"] == budget[
        "rows_dropped_by_watermark"
    ], (
        f"{name}: {a['rows_dropped_by_watermark']} rows dropped by "
        "watermark on a fixture built with nothing late"
    )
