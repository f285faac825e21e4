"""Scale probe for the ClickHouse event-analytics analog family
(round 7 additions): windowFunnel, retention, sequenceMatch/Count,
sumMap, maxIntersections, intervalLengthSum, deltaSum, WITH FILL,
LTTB — per-decade wall ratios at sf0.1 -> sf1 -> sf10 on the
gen_scale replicas.

Protocol follows scripts/profile_scale_rows.py's lessons: one 48g
session, warmup pass at sf0.001, then per-SF walls interleaved
median-of-3, rows recorded (rows == 0 voids the run), flag ratios
> threshold x the data multiple. gen_scale.py offsets user_id per
copy, so GROUP COUNT scales with the data while per-group series
stay constant-size — the embarrassingly-parallel shape for every one
of these group-key operators; expect ratio ~= the data multiple once
compute-bound (cf. the r7 sf100 finding: wall ratio == multiple IS
linear on a fixed-core host).

Writes BENCH_eventops_r7.json. Usage:
    python scripts/bench_eventops.py [--skip-sf10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from bench import CALIBRATION_REF, _calibrate

QUERIES = [
    "e_window_funnel",
    "e_retention_flags",
    "e_sequence_match",
    "e_sequence_count",
    "e_summap_daily",
    "e_max_concurrent",
    "e_active_time",
    "e_delta_sum",
    "e_daily_fill",
    "e_lttb_downsample",
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1", 1),
    ("sf1", "/root/repo/.localdata/sf1", 10),
    ("sf10", "/root/repo/.localdata/sf10", 100),
]

# --fourth-decade: sf10 -> sf100 (~200M events) for the heaviest
# representatives of each plan family — the sort-window sweep, the
# grouped-stateful kernel, the Map fold, and the two-pass LTTB.
SFS_4TH = [
    ("sf10", "/root/repo/.localdata/sf10", 100),
    ("sf100", "/root/repo/.localdata/sf100", 1000),
]
QUERIES_4TH = [
    "e_max_concurrent",
    "e_sequence_count",
    "e_summap_daily",
    "e_lttb_downsample",
]


def _funnel_skew_fixture(spark, hot_n: int):
    """200 normal users × 60 events plus ONE hot user holding ``hot_n``
    qualifying events alternating across the 3 funnel conditions — the
    adversarial shape for any per-level join (anchors × events on one
    key). Deterministic, built in-plan from spark.range."""
    from pyspark.sql import functions as F

    normal = spark.range(200 * 60).select(
        (F.col("id") % 200).alias("user_id"),
        (F.col("id") * 7).alias("ts_s"),
        (F.col("id") % 3).cast("int").alias("etype"),
    )
    hot = spark.range(hot_n).select(
        F.lit(999_999).alias("user_id"),
        F.col("id").alias("ts_s"),
        (F.col("id") % 3).cast("int").alias("etype"),
    )
    return (
        normal.unionByName(hot)
        .select(
            "user_id",
            F.timestamp_seconds(F.col("ts_s")).alias("ts"),
            "etype",
        )
        .persist()
    )


def run_funnel_skew(spark, reps: int) -> dict:
    """Skewed-group window_funnel probe (VERDICT r8: the per-level join
    was per-group quadratic on a hot key and unmeasured; the r9
    sort-based level step must hold a flat-ish wall as the hot group
    grows). Records median walls at hot_n 50k/200k/800k plus the
    quadratic slope check: the 4× hot-group step must NOT cost ~16×."""
    import statistics as _st
    import time as _time

    from pyspark.sql import functions as F

    from adguard2clickhouse_spark.operators.temporal import window_funnel

    out = {}
    for hot_n in (50_000, 200_000, 800_000):
        ev = _funnel_skew_fixture(spark, hot_n)
        ev.count()
        conds = [F.col("etype") == i for i in range(3)]
        walls = []
        for _ in range(reps):
            t0 = _time.time()
            res = {
                r.user_id: r.level
                for r in window_funnel(
                    ev, conds, window_seconds=10**9, by="user_id"
                ).collect()
            }
            walls.append(round(_time.time() - t0, 3))
            assert res[999_999] == 3 and len(res) == 201, (
                "skew probe answer drifted",
                res.get(999_999),
                len(res),
            )
        ev.unpersist()
        out[f"hot{hot_n}"] = {
            "median_sec": round(_st.median(walls), 3),
            "walls": walls,
            "hot_level": 3,
            "n_groups": 201,
        }
    r1 = out["hot200000"]["median_sec"] / out["hot50000"]["median_sec"]
    r2 = out["hot800000"]["median_sec"] / out["hot200000"]["median_sec"]
    out["ratio_200k_vs_50k"] = round(r1, 2)
    out["ratio_800k_vs_200k"] = round(r2, 2)
    # quadratic would be ~16x per 4x step; linear-in-hot-group ≤ ~4x
    # plus noise. Gate generously at 6x.
    out["quadratic_gate"] = "pass" if max(r1, r2) < 6 else "FAIL"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-sf10", action="store_true")
    ap.add_argument("--fourth-decade", action="store_true")
    ap.add_argument(
        "--funnel-skew-only",
        action="store_true",
        help="run only the skewed-group window_funnel probe",
    )
    # flag superlinear only: >1.2x the decade's data multiple
    # (wall ratio == multiple IS linear scaling once compute-bound)
    ap.add_argument("--slack", type=float, default=1.2)
    ap.add_argument("--out", default="BENCH_eventops_r7.json")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from benchlib import force_count  # noqa: E402
    from adguard2clickhouse_spark.session import get_spark

    calibration = _calibrate()
    spark = get_spark(app_name="bench_eventops")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    if args.funnel_skew_only:
        skew = run_funnel_skew(spark, args.reps)
        result = {
            "metric": "funnel_skew",
            "protocol": (
                f"one session, median-of-{args.reps}, one hot group "
                "holding hot_n qualifying events alternating across 3 "
                "conditions + 200 normal groups; quadratic gate <6x "
                "per 4x hot-group step"
            ),
            "host_calibration_sec": calibration,
            "calibration_ref_sec": CALIBRATION_REF,
            "funnel_skew": skew,
        }
        (Path(__file__).resolve().parent.parent / args.out).write_text(
            json.dumps(result, indent=1) + "\n"
        )
        print(json.dumps(result))
        spark.stop()
        return

    global QUERIES
    if args.fourth_decade:
        QUERIES = QUERIES_4TH
        sfs = SFS_4TH
        args.out = "BENCH_eventops_sf100_r7.json"
    else:
        sfs = [s for s in SFS if not (args.skip_sf10 and s[0] == "sf10")]
    for name in QUERIES:  # JIT/codegen warmup
        force_count(qs[name](spark, "/root/testdata/sf0.001"))

    walls: dict[str, dict[str, list[float]]] = {
        n: {tag: [] for tag, _, _ in sfs} for n in QUERIES
    }
    rows: dict[str, dict[str, int]] = {n: {} for n in QUERIES}
    for rep in range(args.reps):  # interleave SFs within each rep
        for tag, sf_dir, _ in sfs:
            for name in QUERIES:
                t0 = time.time()
                n_rows = force_count(qs[name](spark, sf_dir))
                walls[name][tag].append(round(time.time() - t0, 3))
                rows[name][tag] = n_rows
                print(
                    f"rep{rep} {tag} {name}: {walls[name][tag][-1]}s"
                    f" ({n_rows} rows)",
                    file=sys.stderr,
                )

    queries, flagged = {}, []
    for name in QUERIES:
        entry = {}
        med = {}
        for tag, _, _ in sfs:
            med[tag] = round(statistics.median(walls[name][tag]), 3)
            entry[f"sec_{tag}"] = med[tag]
            entry[f"rows_{tag}"] = rows[name][tag]
            if rows[name][tag] == 0:
                raise SystemExit(
                    f"VOID RUN: {name} returned 0 rows at {tag}"
                )
        for (t0_, _, m0), (t1_, _, m1) in zip(sfs, sfs[1:]):
            mult = m1 // m0
            r = (
                round(med[t1_] / med[t0_], 2)
                if med[t0_] > 0
                else None
            )
            entry[f"ratio_{t1_}_vs_{t0_}"] = r
            if r is not None and r > args.slack * mult:
                if name not in flagged:
                    flagged.append(name)
                entry.setdefault("flags", []).append(
                    f"{t0_}->{t1_} ratio {r} > {args.slack}x the "
                    f"{mult}x data multiple"
                )
        queries[name] = entry

    result = {
        "metric": "eventops_scaling",
        "protocol": (
            f"one 48g session, median-of-{args.reps} per SF interleaved, "
            "rows recorded, zero-rows voids the run"
        ),
        "host_calibration_sec": calibration,
        "calibration_ref_sec": CALIBRATION_REF,
        "slack": args.slack,
        "queries": queries,
        "flagged": flagged,
        # skewed-group window_funnel probe rides along with the family
        # run (VERDICT r8 ask #3): one hot group must not go quadratic
        "funnel_skew": run_funnel_skew(spark, args.reps),
    }
    (Path(__file__).resolve().parent.parent / args.out).write_text(
        json.dumps(result, indent=1) + "\n"
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
