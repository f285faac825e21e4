"""Diagnose the in-session slowdown of x2_ngram_jaccard (and friends).

BENCH_profile_njac_r12.json adjudicated the 1.9-vs-1.2 s gap between
full-bench sessions and dedicated sessions as SESSION STATE, not plan
movement. This script pins the mechanism: block-manager debt
(localCheckpoint RDDs + evicted cache blocks pile up because the
ContextCleaner's periodic GC defaults to every 30 min — far longer
than a bench session) vs plain JVM heap fragmentation.

Protocol: the exact bench.py loop (same queries, same order, same
noop sink), instrumented — before every rep of every query we record
the block-manager RDD count and driver-JVM heap; variant "gc" calls
System.gc() after each query (forcing ContextCleaner's weak refs to
flush), variant "none" is the control. If "gc" recovers the
dedicated-session number, the debt is collectable garbage and the
right fix is spark.cleaner.periodicGC.interval (a session config),
not query code.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from adguard2clickhouse_spark.session import get_spark
from bench import BENCH_QUERIES, REPS


def run_session(variant: str, sf_dir: str) -> dict:
    spark = get_spark(app_name=f"profile-session-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc

    def heap_mb() -> float:
        rt = jvm.java.lang.Runtime.getRuntime()
        return round((rt.totalMemory() - rt.freeMemory()) / 1e6, 1)

    def rdd_blocks() -> int:
        return len(jsc.sc().getRDDStorageInfo())

    warm_dir = "/root/testdata/sf0.001"
    for name in BENCH_QUERIES:
        qs[name](spark, warm_dir).write.mode("overwrite").format("noop").save()

    runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    state: list[dict] = []
    for rep in range(REPS):
        for name in BENCH_QUERIES:
            state.append(
                {
                    "rep": rep,
                    "query": name,
                    "heap_mb": heap_mb(),
                    "cached_rdds": rdd_blocks(),
                }
            )
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs[name].append(round(time.time() - t0, 3))
            if variant == "gc":
                jvm.java.lang.System.gc()
    spark.stop()
    return {
        "variant": variant,
        "medians": {n: round(statistics.median(r), 3) for n, r in runs.items()},
        "total": round(sum(statistics.median(r) for r in runs.values()), 3),
        "runs": runs,
        "state_before_each": state,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = [run_session(v, sf_dir) for v in sys.argv[1:] or ["none", "gc"]]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
