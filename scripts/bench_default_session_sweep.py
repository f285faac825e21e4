"""Default-memory robustness sweep at a given SF (VERDICT r12 #3).

The r12 lesson: only DEFAULT-memory sessions surface estimate-blind
plans — every planner hazard found this build (static broadcast of a
corpus-scaled frame, AQE-invisible join-output expansion) completed
fine on the 48 GB sessions the scale scripts used and OOM'd on the
8 GB session a user actually gets. r12 swept the 24 family
representatives at sf10; this script repeats the protocol at the next
decade (sf100: 600M lineitem / 15M events / 5M documents / 2M
embeddings on this host).

Protocol difference from r12 (deliberate): each query runs in its OWN
subprocess with a fresh default ``get_spark()`` session and a hard
wall-clock budget. At sf100 a silent multi-hour plan is itself a
finding — the budget converts it into a recorded ``exceeded_budget``
row instead of stalling the sweep, and per-query isolation means one
executor OOM cannot poison the session for the remaining queries.
Refusals from the candidate guards count as success WHEN the message
carries the measured mass and the named alternatives (that is the
designed behavior at corpus-bomb scale); they are recorded verbatim.

Usage:
    python scripts/bench_default_session_sweep.py \
        [--sf-dir .localdata/sf100] [--timeout 1800] \
        [--out BENCH_sf100_default_session_r13.json] [query ...]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The same 24 family representatives as BENCH_sf10_default_session_r12
REPRESENTATIVES = [
    "a1_blocked_domains",
    "a6_stats2",
    "p7_dns_parse",
    "q1_pricing_summary",
    "x_join_revenue_by_nation",
    "x_window_rank",
    "e_sessions",
    "e_window_funnel",
    "x1_dedup_count",
    "x1_dedup_clusters",
    "x2_minhash_lsh",
    "x2_winnow_fingerprints",
    "x3_ivf_topk",
    "x3_topk_cosine",
    "x4_quality",
    "x4_span_scrub",
    "x4_bm25_topk",
    "x6_hll_rollup",
    "x6_heavy_hitters",
    "x8_contamination",
    "x9_sequence_pack",
    "x7_split_leakage_safe",
    "x10_curation_pipeline",
    "x12_pagerank",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, {scripts!r})
import __spark_entry__ as entrymod
from adguard2clickhouse_spark.session import get_spark
from benchlib import force_count

name, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="default-sweep-" + name)  # DEFAULT memory
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
t0 = time.time()
try:
    rows = force_count(qs[name](spark, sf_dir))
    print("SWEEP_RESULT:" + json.dumps(
        {{"rows": int(rows), "wall_s": round(time.time() - t0, 1),
          "status": "ok"}}))
except ValueError as e:
    msg = str(e)
    if "candidate pairs" in msg or "max_candidate_pairs" in msg:
        print("SWEEP_RESULT:" + json.dumps(
            {{"wall_s": round(time.time() - t0, 1), "status": "refused",
              "message": msg[:500]}}))
    else:
        raise
"""


def run_query(name: str, sf_dir: str, timeout: int) -> dict:
    child = _CHILD.format(repo=str(REPO), scripts=str(REPO / "scripts"))
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", child, name, sf_dir],
            capture_output=True, text=True, cwd=str(REPO), timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {
            "status": "exceeded_budget",
            "wall_s": round(time.time() - t0, 1),
            "budget_s": timeout,
        }
    for line in out.stdout.splitlines():
        if line.startswith("SWEEP_RESULT:"):
            return json.loads(line[len("SWEEP_RESULT:"):])
    return {
        "status": "error",
        "wall_s": round(time.time() - t0, 1),
        "stderr_tail": out.stderr[-1500:],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=str(REPO / ".localdata" / "sf100"))
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument(
        "--out", default=str(REPO / "BENCH_sf100_default_session_r13.json")
    )
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or REPRESENTATIVES

    results, findings = {}, []
    for name in names:
        print(f"== {name} ==", file=sys.stderr, flush=True)
        r = run_query(name, args.sf_dir, args.timeout)
        results[name] = r
        print(f"   {json.dumps(r)[:200]}", file=sys.stderr, flush=True)
        if r["status"] not in ("ok", "refused"):
            findings.append(f"{name}: {r['status']}")
        # checkpoint after every query so a killed sweep loses nothing
        Path(args.out).write_text(json.dumps({
            "metric": "default_session_robustness_sweep",
            "sf_dir": args.sf_dir,
            "why": (
                "only default-memory sessions surface estimate-blind "
                "plans (the r12 broadcast/band-join lesson); r12 swept "
                "sf10, this is the next decade on the session a user "
                "actually gets"
            ),
            "protocol": (
                "one subprocess per query, fresh DEFAULT get_spark "
                f"session (8g driver), force_count full-plan wall, "
                f"{args.timeout}s hard budget per query; guard refusals "
                "with sized guidance count as designed behavior"
            ),
            "results": results,
            "findings": findings,
        }, indent=1))
    print(json.dumps({"done": len(results), "findings": findings}))


if __name__ == "__main__":
    main()
