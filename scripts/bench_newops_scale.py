"""Scaling ladder for the r12-new operators: measure at sf0.1 and the
10x replica, record ratios (same protocol/threshold as bench_scale.py).

The four newest registered document operators have correctness gates
but no scale datapoint yet:

- x7_split_leakage_safe — near-dup closure + cluster-keyed split
  (one label-propagation round set + id equi-join);
- x4_span_scrub — positional k-gram hashing, corpus-wide k-gram
  frequency, per-doc gaps-and-islands, reassembly (explode-heavy:
  ~n_tokens rows per doc through two exchanges);
- x8_contamination — n-gram overlap of the corpus against a
  benchmark set (inverted-index join);
- x9_sequence_pack — greedy first-fit token packing via
  applyInPandas over salted bins.

A 10x corpus through each should cost <= ~10x wall on a fixed host;
15x flags a defect unless a written superlinear explanation is
attached (none of these carries an inherent df^2 term at the replica's
marker construction — cross-copy shingles collapse by design, see
gen_scale.py — so the expectation is genuinely linear-ish).

Every wall is a FULL-plan execution (benchlib.force_count: hash of
every output column + row count — rows-returned recorded, a fast
empty result is VOID per the r5 rule).

Usage: python scripts/bench_newops_scale.py [--big /root/repo/.localdata/sf1]
Writes BENCH_newops_scale_r12.json at the repo root.
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
from bench import CALIBRATION_REF, _calibrate

NAMES = [
    "x7_split_leakage_safe",
    "x4_span_scrub",
    "x8_contamination",
    "x9_sequence_pack",
]

EXPECTED_SUPERLINEAR: dict[str, str] = {}


def run_all(spark, qs, sf_dir, reps=3):
    out = {}
    for name in NAMES:
        walls, rows = [], None
        for _ in range(reps):
            t0 = time.time()
            rows = force_count(qs[name](spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        walls.sort()
        out[name] = {"sec": walls[len(walls) // 2], "rows": rows, "walls": walls}
        print(f"  {name}: {out[name]}", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/.localdata/sf1")
    ap.add_argument("--threshold", type=float, default=15.0)
    args = ap.parse_args()

    calibration = _calibrate()
    spark = get_spark(app_name="bench_newops_scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    for name in NAMES:  # JIT/codegen warmup, billed to neither SF
        force_count(qs[name](spark, "/root/testdata/sf0.001"))

    print("== base (sf0.1) ==", file=sys.stderr)
    base = run_all(spark, qs, args.base)
    print("== big (sf1) ==", file=sys.stderr)
    big = run_all(spark, qs, args.big)

    queries, flagged = {}, []
    for name in NAMES:
        assert big[name]["rows"] > 0, f"{name} returned 0 rows at sf1 - run VOID"
        # max() guard: the per-query medians are rounded to 3 decimals,
        # so a sub-millisecond base wall becomes 0.0 and the division
        # would kill the whole ladder AFTER both sweeps completed
        # (ADVICE r12). A 1 ms floor only ever understates the ratio.
        ratio = round(big[name]["sec"] / max(base[name]["sec"], 0.001), 2)
        entry = {
            "sec_base": base[name]["sec"],
            "sec_big": big[name]["sec"],
            "rows_base": base[name]["rows"],
            "rows_big": big[name]["rows"],
            "ratio": ratio,
            "walls_base": base[name]["walls"],
            "walls_big": big[name]["walls"],
        }
        if name in EXPECTED_SUPERLINEAR:
            entry["superlinear_explained"] = EXPECTED_SUPERLINEAR[name]
        elif ratio > args.threshold:
            flagged.append(name)
            entry["flag"] = f"ratio {ratio} > {args.threshold}"
        queries[name] = entry

    result = {
        "metric": "newops_scaling_ratio_sf1_vs_sf0.1",
        "sf_base": 0.1,
        "sf_big": 1.0,
        "data_mult": 10,
        "threshold": args.threshold,
        "protocol": "one steady-codegen session, median-of-3 full-plan walls per (query, SF), warmup at sf0.001",
        "host_calibration_sec": calibration,
        "calibration_ref_sec": CALIBRATION_REF,
        "queries": queries,
        "flagged": flagged,
    }
    out_path = Path(__file__).resolve().parent.parent / "BENCH_newops_scale_r12.json"
    out_path.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
