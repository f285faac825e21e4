"""Four-decade scale run for the reworked window_funnel (r9).

The r7 per-level-join funnel was never measured past sf10 (it was
per-group quadratic on a hot key — 215 s at one 200k-event group — so
a fourth decade was pointless). After the sort-based next-event
rework (one union + one DESC sort + running-min frame per level,
O(anchors+events) rows per group), this measures e_window_funnel on
events replicas at sf0.1 -> sf1 -> sf10 -> sf100 (100k -> 100M rows)
with the family protocol: one 48g session, warmup at sf0.001, per-SF
walls interleaved median-of-3, rows recorded (zero rows voids the
run), per-decade ratios flagged above slack x the data multiple.

The sf100 replica is the bench_util events table (gen_scale
replicate_sql at mult=1000 — same generator and key offsets as every
other decade, so group count scales while per-group series stay
constant-size: the embarrassingly-parallel shape, expect ratio <= the
multiple once compute-bound).

Usage: python scripts/bench_funnel_scale.py [--reps 3]
Writes BENCH_funnel_scale_r9.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from bench import CALIBRATION_REF, _calibrate  # noqa: E402

SFS = [
    ("sf0.1", "/root/testdata/sf0.1", 1),
    ("sf1", str(REPO / ".localdata" / "sf1"), 10),
    ("sf10", str(REPO / ".localdata" / "sf10"), 100),
    ("sf100", str(REPO / ".localdata" / "sf100util"), 1000),
]
NAME = "e_window_funnel"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--slack", type=float, default=1.2)
    ap.add_argument("--out", default="BENCH_funnel_scale_r9.json")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from benchlib import force_count  # noqa: E402
    from adguard2clickhouse_spark.session import get_spark

    calibration = _calibrate()
    spark = get_spark(app_name="bench_funnel_scale")
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()[NAME]
    force_count(q(spark, "/root/testdata/sf0.001"))  # codegen warmup

    walls = {tag: [] for tag, _, _ in SFS}
    rows = {}
    for rep in range(args.reps):
        for tag, sf_dir, _ in SFS:
            t0 = time.time()
            n = force_count(q(spark, sf_dir))
            walls[tag].append(round(time.time() - t0, 3))
            rows[tag] = n
            print(f"rep{rep} {tag}: {walls[tag][-1]}s ({n} rows)",
                  file=sys.stderr)
            if n == 0:
                raise SystemExit(f"VOID RUN: 0 rows at {tag}")

    entry, flagged = {}, []
    med = {tag: round(statistics.median(walls[tag]), 3) for tag, _, _ in SFS}
    for tag, _, _ in SFS:
        entry[f"sec_{tag}"] = med[tag]
        entry[f"walls_{tag}"] = walls[tag]
        entry[f"rows_{tag}"] = rows[tag]
    for (t0_, _, m0), (t1_, _, m1) in zip(SFS, SFS[1:]):
        mult = m1 // m0
        r = round(med[t1_] / med[t0_], 2) if med[t0_] > 0 else None
        entry[f"ratio_{t1_}_vs_{t0_}"] = r
        if r is not None and r > args.slack * mult:
            flagged.append(f"{t0_}->{t1_} ratio {r} > {args.slack}x{mult}")

    result = {
        "metric": "funnel_scaling",
        "protocol": (
            f"one 48g session, median-of-{args.reps} per SF interleaved, "
            "rows recorded, zero-rows voids the run"
        ),
        "host_calibration_sec": calibration,
        "calibration_ref_sec": CALIBRATION_REF,
        "slack": args.slack,
        "query": NAME,
        "decades": entry,
        "flagged": flagged,
    }
    (REPO / args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
