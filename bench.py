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

Measurement protocol (round 5, hardened round 14): each query runs
REPS times inside one JVM, interleaved round-robin (r1 of every query,
then r2, then r3) so a transient host-load spike degrades one *rep* of
many queries rather than all reps of one query. The per-session
per-query number is the MEDIAN of the reps.

Round 14 (VERDICT r13 #1 — the stamp protocol): the STAMP is now the
median of N_SESSIONS (default 3) FRESH JVM sessions, matching the
frozen bars' own provenance (they were always medians of three
sessions; the stamp was a single session, which made round-over-round
comparison a coin flip — r13 stamped its worst of three recorded
sessions, +31% on pure host noise). Each session additionally runs one
DISCARDED full sweep at the measured SF before its counted reps, so
first reps are not billed cold page-cache + JIT (r13's stamped first
reps ran 2-6× its dev runs). The orchestrator spawns the sessions as
subprocesses (true fresh JVMs), aggregates per-query MEDIAN-of-session
-medians, and reports every session's raw/normalized total +
calibration under "sessions" for forensics. "value" remains the sum of
per-query medians — the same statistic as r5-r13, computed over a
noise-resistant sample. Set SPARK_GRAFT_BENCH_SESSIONS=1 for the old
single-session behavior while iterating.

Round 15 (VERDICT r14 #1 — the stamp must be machine-readable): the
FINAL stdout line is now the COMPACT stamp only (metric, value,
normalized values, per-query medians, session totals — budgeted under
FINAL_LINE_BUDGET=1900 chars so the driver's 2000-char tail capture
can never truncate it again); the bulky per-session forensics
("sessions" with per-query runs and calibrations) move to a PRECEDING
stdout line and a sibling BENCH_sessions_detail_last.json. r14's final
line embedded the forensics inline and overflowed the capture, so the
official BENCH_r14.json stamped "parsed": null.
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


# r14 diagnostic reference for the 32-process calibration below:
# median of 5 back-to-back probes on the r14 build host (0.768-0.807,
# the round that established the probe). Used only for the
# "value_normalized_mc" DIAGNOSTIC — the official value_normalized
# keeps the r2 single-core chain for cross-round continuity.
CALIBRATION_MC_REF = 0.794


def _calibrate_mc(threads: int = 32) -> float:
    """Median of 3 runs of the SAME md5 workload fanned across 32
    threads (hashlib releases the GIL for >2 KiB buffers), in seconds.

    Why (r14, VERDICT r13 #1/#2 root cause): the single-core probe
    cannot see multi-core contention — in the r13/r14 sessions it
    measured the host 10-18% FASTER than the r2 reference while the
    32-thread Spark sweeps measured the SAME raw walls as r12, so the
    normalization itself injected a spurious +10-18%. This probe
    exercises the resource Spark local[32] actually saturates; its
    per-session value is recorded so future rounds can separate
    "host got slower" from "single-core probe drifted".

    Processes, not threads: although hashlib releases the GIL while
    hashing, the per-iteration Python bookkeeping still serializes 32
    threads into a GIL convoy (measured: the thread form ran >100×
    slower than the arithmetic wall). Fork-based workers measure the
    cores, not the GIL."""
    import multiprocessing as mp

    samples = []
    ctx = mp.get_context("fork")
    for _ in range(3):
        procs = [
            ctx.Process(target=_mc_worker, args=(100_000,))
            for _ in range(threads)
        ]
        t0 = time.time()
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def _mc_worker(iters: int) -> None:
    import hashlib

    buf = b"x" * 4096
    for _ in range(iters):
        hashlib.md5(buf).hexdigest()


def run_session(sf_dir: str, sf: float) -> dict:
    """One fresh-session measurement: calibrate, warm (codegen at
    sf0.001 + one DISCARDED full sweep at the measured SF), then REPS
    interleaved counted sweeps. Returns the session dict (no I/O)."""
    calibration = _calibrate()
    calibration_mc = _calibrate_mc()

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

    # Discarded full sweep AT THE MEASURED SF (r14, VERDICT r13 #2):
    # warms the page cache for the sf parquet and finishes any
    # data-dependent JIT the sf0.001 warmup couldn't reach. r13's
    # stamped session ran cold — its first reps were 2-6× the dev
    # sessions' (a1 2.121 s vs 0.381 s); median-of-reps absorbed it
    # per query but the whole session measured high.
    for name in BENCH_QUERIES:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

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
    total = round(sum(timings.values()), 3)
    session = {
        "value": total,
        "queries": timings,
        "runs": runs,
        "host_calibration_sec": calibration,
        "host_calibration_mc_sec": calibration_mc,
        "value_normalized": round(total * norm, 3),
        "value_normalized_mc": round(
            total * CALIBRATION_MC_REF / calibration_mc, 3
        ),
        "codegen_steady_state": (
            codegen_chk.delta if codegen_chk is not None else None
        ),
        "queries_normalized": {
            name: round(secs * norm, 3) for name, secs in timings.items()
        },
    }
    spark.stop()
    return session


def aggregate_sessions(sessions: list[dict], sf: float) -> dict:
    """Median-of-sessions stamp (r14 protocol, VERDICT r13 #1): the
    per-query stamped number is the MEDIAN across sessions of each
    session's median-of-reps; "value" is the sum of those medians —
    the same statistic as r5-r13, over a noise-resistant sample. Pure
    function (unit-tested in tests/test_hygiene.py)."""
    queries = {
        name: round(
            statistics.median(s["queries"][name] for s in sessions), 3
        )
        for name in BENCH_QUERIES
    }
    queries_normalized = {
        name: round(
            statistics.median(
                s["queries_normalized"][name] for s in sessions
            ),
            3,
        )
        for name in BENCH_QUERIES
    }
    total = round(sum(queries.values()), 3)
    return {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "reps": REPS,
        "sink": "noop",  # full-plan execution; r1-r10 used count()
        "protocol": "median_of_sessions",  # r14; r1-r13 stamped 1 session
        "n_sessions": len(sessions),
        "host_calibration_sec": round(
            statistics.median(s["host_calibration_sec"] for s in sessions), 3
        ),
        "host_calibration_mc_sec": round(
            statistics.median(
                s.get("host_calibration_mc_sec", 0.0) for s in sessions
            ),
            3,
        ),
        "calibration_ref_sec": CALIBRATION_REF,
        "calibration_mc_ref_sec": CALIBRATION_MC_REF,
        "value_normalized": round(sum(queries_normalized.values()), 3),
        # diagnostic (r14): the 32-thread normalization — tracks the
        # resource local[32] saturates; see _calibrate_mc docstring
        "value_normalized_mc": round(
            statistics.median(
                s.get("value_normalized_mc", 0.0) for s in sessions
            ),
            3,
        ),
        "queries_normalized": queries_normalized,
        "session_totals": [s["value"] for s in sessions],
        "session_totals_normalized": [s["value_normalized"] for s in sessions],
        "sessions": sessions,
    }


# The driver records only the last ~2000 chars of stdout and parses the
# final line as the official stamp. r14's final line embedded the full
# per-session forensics ("sessions": per-query runs + calibrations) and
# overflowed that capture — BENCH_r14.json recorded "parsed": null, so
# the round had no machine-readable headline (VERDICT r14 #1). The
# budget leaves ~100 chars of headroom under the capture; the compact
# line is ~1,200 chars with today's 14 queries, so the trim ladder is
# belt-and-braces for future query growth, and test_hygiene.py asserts
# the realistic-line size stays under budget.
FINAL_LINE_BUDGET = 1900

# Dropped one at a time, in order, if the final line ever exceeds the
# budget. Never dropped: metric/value/unit/queries/sf (the driver
# contract) and value_normalized/protocol/n_sessions (the judge's
# cross-round chain).
_TRIMMABLE = [
    "session_totals_normalized",
    "session_totals",
    "host_calibration_mc_sec",
    "calibration_mc_ref_sec",
    "value_normalized_mc",
    "queries_normalized",
]


def split_stamp(result: dict) -> tuple[dict, dict]:
    """Split the aggregate into (compact, detail): ``compact`` is the
    final stdout line the driver parses (guaranteed under
    FINAL_LINE_BUDGET chars), ``detail`` carries the bulky per-session
    forensics and is emitted on a PRECEDING stdout line + a sibling
    file, where truncation is harmless. Pure function (unit-tested)."""
    detail = {
        "metric": "headline_queries_sessions_detail",
        "sessions": result.get("sessions", []),
    }
    compact = {k: v for k, v in result.items() if k != "sessions"}
    for key in _TRIMMABLE:
        if len(json.dumps(compact)) <= FINAL_LINE_BUDGET:
            break
        if key in compact:
            detail[key] = compact.pop(key)
    return compact, detail


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    if os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        # child mode: one fresh-JVM session, JSON on the last line
        print(json.dumps(run_session(sf_dir, sf)))
        return

    n_sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "3"))
    # Wall budget for the whole stamp: if the NEXT session would
    # plausibly overrun it (estimated from the slowest session so
    # far), aggregate what we have instead of risking an external
    # kill that leaves NO stamp at all. A 1-session stamp is the
    # r1-r13 protocol — degraded, still valid; n_sessions in the
    # artifact says which.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "540"))
    if n_sessions <= 1:
        sessions = [run_session(sf_dir, sf)]
    else:
        # Fresh JVM per session: subprocess re-invokes this file with
        # SPARK_GRAFT_BENCH_CHILD=1. Sequential, never parallel — the
        # sessions must not contend with each other.
        import subprocess

        t_start = time.time()
        sessions = []
        for i in range(n_sessions):
            elapsed = time.time() - t_start
            if sessions and elapsed + max(
                s.get("_wall_s", 0.0) for s in sessions
            ) > budget_s:
                print(
                    f"bench: stopping after {len(sessions)} sessions — "
                    f"elapsed {elapsed:.0f}s + a further session would "
                    f"exceed SPARK_GRAFT_BENCH_BUDGET_S={budget_s:.0f}",
                    file=sys.stderr,
                )
                break
            env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
            )
            sys.stderr.write(proc.stderr)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"bench session {i + 1}/{n_sessions} failed "
                    f"(rc={proc.returncode}); stdout tail: "
                    f"{proc.stdout[-2000:]}"
                )
            session = json.loads(proc.stdout.strip().splitlines()[-1])
            session["_wall_s"] = round(time.time() - t0, 1)
            sessions.append(session)

    result = aggregate_sessions(sessions, sf)
    if sf == 0.1:
        for flag in regression_flags(result["queries_normalized"]):
            print(flag, file=sys.stderr)

    # Compact final line (driver-parsed) + per-session forensics on a
    # preceding line and a sibling file — see FINAL_LINE_BUDGET.
    compact, detail = split_stamp(result)
    try:
        detail_path = Path(__file__).resolve().parent / (
            "BENCH_sessions_detail_last.json"
        )
        detail_path.write_text(json.dumps(detail, indent=1))
    except OSError as exc:  # read-only checkout: stdout line still has it
        print(f"bench: could not write sessions detail file: {exc}",
              file=sys.stderr)
    print(json.dumps(detail))
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
