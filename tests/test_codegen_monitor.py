"""Codegen class-cache health surfacing (VERDICT r12 #4).

The cache-size conf is a JVM static and its failure mode is silent
(~33% sweep slowdown, zero errors — BENCH_codegen_cache_r12.json), so
the engine now exposes the CodegenMetrics-based steady-state check the
r12 root-cause analysis used. These tests pin both directions:

- a deliberately UNDERSIZED cache trips the warning (fresh JVM via
  subprocess — the cache is a JVM static, so the shared pytest session
  cannot host this leg);
- the engine's default sizing does NOT warn on a repeated identical
  workload in the shared session.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_steady_state_clean_on_default_sized_cache(spark):
    from adguard2clickhouse_spark.streaming.monitor import (
        CodegenSteadyStateCheck,
        codegen_cache_snapshot,
    )

    # Rebuild the DataFrame per pass: a plan object memoizes its own
    # compiled classes, so only a FRESH identical plan exercises the
    # cache (the shape of a real repeated workload — bench reps,
    # streaming epochs, a dashboard re-issuing the same query).
    def build():
        return spark.range(0, 10_000).selectExpr(
            "sum(id * 3 + 7) as s", "count(*) as n", "avg(id) as a"
        )

    build().collect()  # fill the cache with this plan's classes
    snap = codegen_cache_snapshot(spark)
    assert snap["compile_count"] > 0  # the collect above compiled
    assert snap["cache_entries"] > 0
    chk = CodegenSteadyStateCheck(spark).begin()
    build().collect()  # identical source -> cache hit, zero compiles
    warning = chk.end()
    assert warning is None, warning
    assert chk.delta["steady_state_compiles"] == 0


_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from adguard2clickhouse_spark.session import get_spark
from adguard2clickhouse_spark.streaming.monitor import CodegenSteadyStateCheck

spark = get_spark(
    app_name="codegen-undersized",
    master="local[2]",
    shuffle_partitions=2,
    extra_conf={{"spark.sql.codegen.cache.maxEntries": "2"}},
)
spark.sparkContext.setLogLevel("ERROR")
# 12 DISTINCT plans (the literal lands in the generated code) cycling
# through a 2-entry cache: every repetition must re-Janino-compile.
# Plans are REBUILT per pass — a plan object memoizes its compiled
# classes, so only fresh plans exercise the cache.
def build(i):
    return spark.range(0, 1000).selectExpr(
        "sum(id + %d) as s" % i, "count(*) as n"
    )

for i in range(12):
    build(i).collect()
chk = CodegenSteadyStateCheck(spark).begin()
for i in range(12):
    build(i).collect()
w = chk.end()
print("RESULT:" + ("WARN" if w else "CLEAN"))
print("DELTA:%d" % chk.delta["steady_state_compiles"])
assert w is None or "CODEGEN-CACHE-THRASH" in w
spark.stop()
"""


def test_undersized_cache_trips_warning():
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RESULT:WARN" in out.stdout, out.stdout + out.stderr[-1000:]
    delta = int(
        [l for l in out.stdout.splitlines() if l.startswith("DELTA:")][0][6:]
    )
    assert delta > 0
