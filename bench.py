"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The query set spans every execution shape the engine has: the
reference-parity aggregate fan (scan+filter+groupBy), the streaming
parse path (JSON + the Arrow DNS UDF), joins/windows, and the
extension operators (dedup joins, similarity search). Each query is
executed to completion (count() forces the full plan; results are not
collected to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from adguard2clickhouse_spark.session import get_spark

BENCH_QUERIES = [
    # reference parity — the 8-aggregate fan over the bridged stream
    "a1_blocked_domains",
    "a3_clients_stats",
    "a6_stats2",
    "a7_tld_stats",
    # the one custom-UDF hot path: Arrow DNS wire parsing at volume
    "p7_dns_parse",
    # relational shapes
    "q1_pricing_summary",
    "x_join_revenue_by_nation",
    "x_window_rank",
    "e_sessions",
    # training-data extensions
    "x1_dedup_count",
    "x2_ngram_jaccard",
    "x2_minhash_lsh",
    "x3_topk_cosine",
    "x4_quality",
]

# Round-1 per-query seconds (BENCH_r01.json, sf0.1, local[32]) — the
# frozen comparison base. Any query regressing past 2× its r1 time is
# flagged on stderr so a perf regression can't hide inside the total.
R1_BASE = {
    "a1_blocked_domains": 0.361,
    "a3_clients_stats": 0.268,
    "a6_stats2": 0.554,
    "a7_tld_stats": 1.18,
    "p7_dns_parse": 0.775,
    "q1_pricing_summary": 0.312,
    "x_join_revenue_by_nation": 0.533,
    "x_window_rank": 0.477,
    "e_sessions": 0.281,
    "x1_dedup_count": 0.387,
    "x2_ngram_jaccard": 2.157,
    "x2_minhash_lsh": 1.492,
    "x3_topk_cosine": 0.541,
    "x4_quality": 0.197,
}


# Frozen calibration reference: host_calibration_sec recorded in
# BENCH_r02.json (1.339 s for the fixed md5 workload below). A round's
# value_normalized = value × (CALIBRATION_REF / this_run_calibration)
# expresses the total "as if" run on the r2 host, making cross-round
# comparison immune to the sandbox's ~50% day-to-day drift. The raw
# value is always reported alongside.
CALIBRATION_REF = 1.339


def _calibrate() -> float:
    """Fixed single-core workload (200k md5 digests of a 4 KiB buffer),
    measured in seconds. The query list and warmup are frozen across
    rounds, but the HOST is not — cross-round comparisons of the query
    total should be read against this number (verified drift: the
    unchanged r1 code measured 9.5 s at the r1 snapshot and 14.2 s
    re-run later the same day under background load)."""
    import hashlib

    buf = b"x" * 4096
    t0 = time.time()
    for _ in range(200_000):
        hashlib.md5(buf).hexdigest()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    calibration = _calibrate()

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # JVM/codegen warmup: run every headline query once at sf0.001
    # (500-row tables, NOT the benchmarked SF) so the measured runs
    # aren't billed one-time JIT + whole-stage-codegen compilation —
    # the minhash signature stage alone costs ~6 s of codegen cold.
    # Same plan shapes, different data; standard steady-state practice.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in BENCH_QUERIES:
            qs[name](spark, warm_dir).count()
    else:
        spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.count()  # executes the full plan without driver collect
        timings[name] = round(time.time() - t0, 3)

    if sf == 0.1:
        for name, secs in timings.items():
            base = R1_BASE.get(name)
            if base and secs > 2 * base:
                print(
                    f"PERF-REGRESSION {name}: {secs:.3f}s vs r1 {base:.3f}s (>2x)",
                    file=sys.stderr,
                )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "host_calibration_sec": calibration,
                "calibration_ref_sec": CALIBRATION_REF,
                "value_normalized": round(total * (CALIBRATION_REF / calibration), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
