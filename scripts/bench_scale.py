"""Scaling bench: measure headline + dedup/ANN queries at sf0.1 AND a
10x replica (scripts/gen_scale.py), and record per-query ratios.

The point: convert the "this plan survives 100x" assertions in
tests/test_plans.py into a measured scaling slope. 10x data through a
linear plan on a fixed 32-core host should cost <= ~10x wall-clock
plus shuffle overhead; the flag threshold is 15x. A query over that
either gets a plan fix or an explicit written explanation of its
super-linear term in the output JSON.

Writes BENCH_sf1.json at the repo root:
  {"sf_base": 0.1, "sf_big": 1.0, "queries":
     {name: {"sec_base": s, "sec_big": s, "ratio": r}}, ...}

Usage: python scripts/bench_scale.py [--big /root/repo/.localdata/sf1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from benchlib import force_count  # noqa: E402

from adguard2clickhouse_spark.session import get_spark
from bench import BENCH_QUERIES, _calibrate, CALIBRATION_REF

# The dedup/ANN family whose scale story is the round-4 headline; the
# rest of BENCH_QUERIES covers the aggregate/join/window shapes.
EXTRA = [
    "x1_dedup_clusters",
    "x3_ivf_topk",
    "x2_embedding_dup_lsh_reroute95",
    "x2_ngram_jaccard_capped",
]

# Queries with a KNOWN super-linear term, with the explanation the
# flag demands. Anything else over the threshold is a defect. Notes
# are attached to the output even when the query lands under the
# threshold, so the scaling slope reads with its cause.
EXPECTED_SUPERLINEAR: dict[str, str] = {
    "x2_embedding_dup_lsh_reroute95": (
        "fixed 6-bit signatures put n/2^bits vectors per bucket, so "
        "candidate pairs grow ~n^2 — quadratic BY DESIGN of the demo "
        "form (measured 9.9x wall at 10x data). Its candidate-mass "
        "guard never trips at these corpus sizes (worst-case bound "
        "8e8 < the 2e9 default cap at 20k vectors), so the reroute "
        "contract in its name engages only beyond that; the linear "
        "production policy is the auto-bits + bucket-capped twin "
        "(x2_embedding_dup_lsh_capped, measured alongside)."
    ),
    "x2_ngram_jaccard": (
        "exact (uncapped) Jaccard carries an inherent sum(df^2) term: "
        "a 10x corpus has 10x the occurrences of every hot shingle, so "
        "the inverted-index join on those shingles grows ~100x. This is "
        "a property of the exact semantics, not the plan; the scale "
        "path is max_df (x2_ngram_jaccard_capped, measured alongside), "
        "which bounds per-shingle join width and scales linearly."
    ),
}


def run_all(spark, qs, names, sf_dir):
    out = {}
    for name in names:
        t0 = time.time()
        force_count(qs[name](spark, sf_dir))
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/.localdata/sf1")
    ap.add_argument("--threshold", type=float, default=15.0)
    args = ap.parse_args()

    calibration = _calibrate()
    spark = get_spark(app_name="bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = BENCH_QUERIES + EXTRA

    # warmup at sf0.001 (JIT + codegen, not billed to either SF)
    for name in names:
        force_count(qs[name](spark, "/root/testdata/sf0.001"))

    print("== base (sf0.1) ==", file=sys.stderr)
    base = run_all(spark, qs, names, args.base)
    print("== big (sf1) ==", file=sys.stderr)
    big = run_all(spark, qs, names, args.big)

    queries = {}
    flagged = []
    for name in names:
        ratio = round(big[name] / base[name], 2) if base[name] > 0 else None
        entry = {"sec_base": base[name], "sec_big": big[name], "ratio": ratio}
        expl = EXPECTED_SUPERLINEAR.get(name)
        if expl:
            entry["superlinear_explained"] = expl
        if ratio is not None and ratio > args.threshold and not expl:
            flagged.append(name)
            entry["flag"] = f"ratio {ratio} > {args.threshold}"
        queries[name] = entry

    result = {
        "metric": "scaling_ratio_sf1_vs_sf0.1",
        "sf_base": 0.1,
        "sf_big": 1.0,
        "data_mult": 10,
        "threshold": args.threshold,
        "host_calibration_sec": calibration,
        "calibration_ref_sec": CALIBRATION_REF,
        "total_base_sec": round(sum(base.values()), 3),
        "total_big_sec": round(sum(big.values()), 3),
        "total_ratio": round(sum(big.values()) / sum(base.values()), 2),
        "queries": queries,
        "flagged": flagged,
    }
    out_path = Path(__file__).resolve().parent.parent / "BENCH_sf1.json"
    out_path.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
