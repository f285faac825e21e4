"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The query set spans every execution shape the engine has: the
reference-parity aggregate fan (scan+filter+groupBy), the streaming
parse path (JSON + the Arrow DNS UDF), joins/windows, and the
extension operators (dedup joins, similarity search). Each query is
executed to COMPLETION via the noop sink (r11 — every output column
evaluates JVM-side, nothing is collected to the driver; the previous
count() let Catalyst prune final projections, see the R1_BASE note).

Measurement protocol (round 5): each query runs REPS times inside the
one JVM, interleaved round-robin (r1 of every query, then r2, then r3)
so a transient host-load spike degrades one *rep* of many queries
rather than all reps of one query. The reported per-query number is
the MEDIAN of the reps; "value" is the sum of medians. The host's
throughput drifts ~±35-45% between runs minutes apart (measured across
rounds 1-4), so single-shot numbers were adjudication-proof — medians
inside one session are the committed evidence. Raw per-rep timings are
kept in "runs" for forensics, and per-query normalized values
("queries_normalized", median × calibration ratio) let cross-round
per-query comparison survive host drift.
"""

from __future__ import annotations

import json
import os
import statistics
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

REPS = 3

# Frozen per-query regression bases, in NORMALIZED seconds.
# Provenance chain (each re-freeze is a method change, never a quiet
# lowering of the bar):
# - r1 bases: measured under df.count(), which lets Catalyst prune
#   final projections — the per-query method bridge is
#   BENCH_sink_method_r11.json (x4_quality under-measured ~2.1×,
#   e_sessions ~1.6×); comparing full-plan medians against them in
#   RAW seconds produced a spurious PERF-REGRESSION flag in the
#   official r11 run.
# - r12 first freeze (VERDICT r11 #1): medians of three noop-method
#   sessions, normalized (BENCH_r12_base_runs.json "pre_codegen_fix").
#   Those sessions unknowingly paid ~150 Janino recompiles per rep:
#   the default 100-entry codegen class cache evicts the 14 queries'
#   154 generated classes every sweep (BENCH_codegen_cache_r12.json).
# - r12 second freeze (current values): same protocol after
#   session.py sized the cache (steady state compiles zero during
#   measured reps) — per-query MEDIAN of three fresh full sessions
#   (each itself median-of-REPS), recorded with raw runs in
#   BENCH_r12_base_runs.json "post_codegen_fix". Sum 6.484 (was
#   8.507). Flags compare the current run's NORMALIZED value
#   (median × calibration ratio, see CALIBRATION_REF) so host drift
#   can neither hide nor invent a regression; regression_flags() is
#   pure and unit-tested (tests/test_hygiene.py): a genuine 2×
#   slowdown still trips.
FROZEN_BASE_NORMALIZED = {
    "a1_blocked_domains": 0.205,
    "a3_clients_stats": 0.174,
    "a6_stats2": 0.357,
    "a7_tld_stats": 0.676,
    "p7_dns_parse": 0.760,
    "q1_pricing_summary": 0.287,
    "x_join_revenue_by_nation": 0.297,
    "x_window_rank": 0.288,
    "e_sessions": 0.284,
    "x1_dedup_count": 0.322,
    "x2_ngram_jaccard": 1.343,
    "x2_minhash_lsh": 0.959,
    "x3_topk_cosine": 0.288,
    "x4_quality": 0.244,
}


def regression_flags(
    queries_normalized: dict[str, float],
    base: dict[str, float] | None = None,
    factor: float = 2.0,
) -> list[str]:
    """Queries whose normalized time exceeds ``factor`` × their frozen
    base — the per-query bar that keeps a regression from hiding
    inside the total. Pure function so the trip condition is
    unit-testable."""
    base = FROZEN_BASE_NORMALIZED if base is None else base
    return [
        f"PERF-REGRESSION {name}: normalized {secs:.3f}s vs frozen base "
        f"{base[name]:.3f}s (>{factor:g}x)"
        for name, secs in queries_normalized.items()
        if name in base and secs > factor * base[name]
    ]


# Frozen calibration reference: host_calibration_sec recorded in
# BENCH_r02.json (1.339 s for the fixed md5 workload below). A round's
# value_normalized = value × (CALIBRATION_REF / this_run_calibration)
# expresses the total "as if" run on the r2 host, making cross-round
# comparison immune to the sandbox's day-to-day drift. The raw value is
# always reported alongside. The calibration itself is a median of 3
# (it was measured at 1.38-2.02 s across back-to-back r4 judge runs —
# a single-shot scalar was amplifying the very noise it existed to
# cancel).
CALIBRATION_REF = 1.339


def _calibrate() -> float:
    """Median of 3 runs of a fixed single-core workload (200k md5
    digests of a 4 KiB buffer), in seconds."""
    import hashlib

    buf = b"x" * 4096
    samples = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(200_000):
            hashlib.md5(buf).hexdigest()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


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
            qs[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
    else:
        spark.range(1000).selectExpr("sum(id)").collect()

    # Interleaved reps: all queries once, then again, REPS times total.
    # The final rep runs under the codegen steady-state check: by then
    # every plan has compiled once, so ANY Janino compile during it
    # means the class cache is undersized for the catalog — the silent
    # ~33% failure mode of BENCH_codegen_cache_r12.json, now asserted
    # on every bench run instead of rediscovered by wall clock
    # (VERDICT r12 #4).
    from adguard2clickhouse_spark.streaming.monitor import (
        CodegenSteadyStateCheck,
    )

    codegen_chk = None
    runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _rep in range(REPS):
        if _rep == REPS - 1:
            codegen_chk = CodegenSteadyStateCheck(spark).begin()
        for name in BENCH_QUERIES:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            # noop sink: executes the COMPLETE plan (every output
            # column) JVM-side with no driver collect. count() is NOT
            # a full execution — Catalyst prunes final projections and
            # unreferenced aggregate values under it (caught r11; see
            # the R1_BASE method note + BENCH_sink_method_r11.json).
            df.write.mode("overwrite").format("noop").save()
            runs[name].append(round(time.time() - t0, 3))

    codegen_warning = codegen_chk.end() if codegen_chk is not None else None
    if codegen_warning:
        print(codegen_warning, file=sys.stderr)

    timings = {name: round(statistics.median(r), 3) for name, r in runs.items()}

    norm = CALIBRATION_REF / calibration
    if sf == 0.1:
        for flag in regression_flags(
            {name: secs * norm for name, secs in timings.items()}
        ):
            print(flag, file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": REPS,
                "sink": "noop",  # full-plan execution; r1-r10 used count()
                "runs": runs,
                "host_calibration_sec": calibration,
                "calibration_ref_sec": CALIBRATION_REF,
                "value_normalized": round(total * norm, 3),
                "codegen_steady_state": (
                    codegen_chk.delta if codegen_chk is not None else None
                ),
                "queries_normalized": {
                    name: round(secs * norm, 3) for name, secs in timings.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
