"""Attribute x2_near_dedup_clusters' sf100 wall (VERDICT r14 #2).

The r14 sweep recorded 593 s for the full recipe (portable MinHash-LSH
pairs → connected components → labels) on the default 8 GB session —
the slowest sf100 completer after the r14 rewrites. This script stages
the SAME computation with a wall clock between stages so the 593 s can
be pinned on one of:

  1. the portable (md5) signature + band-join pair build — ends at an
     eager localCheckpoint, so its wall is directly measurable;
  2. the edge-count probe of connected_components' fast path (reads
     the checkpoint, should be cheap);
  3. the iterative closure — instrumented per round (same algorithm as
     graph.connected_components, inlined here with timing only; any
     divergence would show as a different label multiset, asserted
     against the library path at small SF by pytest elsewhere);
  4. the final label materialization.

Usage:
    python scripts/profile_near_dedup_clusters.py \
        [--sf-dir .localdata/sf100] [--out BENCH_near_dedup_profile_r15.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from adguard2clickhouse_spark.session import get_spark  # noqa: E402
from adguard2clickhouse_spark.operators import dedup  # noqa: E402
from adguard2clickhouse_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".localdata/sf100")
    ap.add_argument("--out", default="BENCH_near_dedup_stage_profile.json")
    args = ap.parse_args()

    spark = get_spark(app_name="profile-near-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    stages: dict[str, float] = {}
    info: dict[str, object] = {}

    docs = load_table(spark, args.sf_dir, "documents")

    # Stage 1: pair build (eager — ends at localCheckpoint(eager=True))
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(docs, portable=True).select(
        "doc_a", "doc_b"
    )
    stages["pairs_build_s"] = round(time.time() - t0, 1)

    # Stage 2: the fast-path probe connected_components would run
    t0 = time.time()
    e_raw = pairs.select(
        F.col("doc_a").try_cast("long").alias("_u"),
        F.col("doc_b").try_cast("long").alias("_v"),
    ).persist()
    n_edges = e_raw.count()
    stages["edge_probe_s"] = round(time.time() - t0, 1)
    info["n_edges"] = n_edges

    nodes = docs.select("doc_id")

    # Stage 3: iterative closure, per-round walls (the sf100 path —
    # n_edges far exceeds the 100k collect cap)
    t0 = time.time()
    sym = (
        e_raw.select("_u", "_v")
        .unionByName(e_raw.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
        .distinct()
        .persist()
    )
    n_sym = sym.count()
    stages["sym_edges_build_s"] = round(time.time() - t0, 1)
    info["n_sym_edges"] = n_sym

    labels = nodes.select(
        F.col("doc_id").alias("_u"),
        F.col("doc_id").try_cast("long").alias("_lbl"),
    ).localCheckpoint(eager=True)

    rounds = []
    for it in range(20):
        t0 = time.time()
        proposed = (
            sym.join(labels.withColumnRenamed("_u", "_v"), "_v")
            .select("_u", "_lbl", F.lit(False).alias("_self"))
            .unionByName(labels.withColumn("_self", F.lit(True)))
            .groupBy("_u")
            .agg(
                F.min("_lbl").alias("_new"),
                F.min(F.when(F.col("_self"), F.col("_lbl"))).alias("_lbl"),
            )
        )
        merged = proposed.filter(F.col("_lbl").isNotNull()).localCheckpoint(
            eager=False
        )
        changed = merged.filter(F.col("_new") < F.col("_lbl")).count()
        labels = merged.select("_u", F.col("_new").alias("_lbl"))
        rounds.append({"round": it, "changed": changed,
                       "wall_s": round(time.time() - t0, 1)})
        print(f"round {it}: changed={changed} wall={rounds[-1]['wall_s']}s",
              file=sys.stderr)
        if changed == 0:
            break
    info["rounds"] = rounds
    stages["closure_total_s"] = round(sum(r["wall_s"] for r in rounds), 1)

    # Stage 4: materialize the labels (what the sweep's force_count pays)
    t0 = time.time()
    n_out = labels.count()
    stages["label_materialize_s"] = round(time.time() - t0, 1)
    info["n_labels"] = n_out

    out = {
        "metric": "near_dedup_clusters_stage_profile",
        "sf_dir": args.sf_dir,
        "stages": stages,
        "detail": info,
        "total_s": round(sum(stages.values()), 1),
    }
    print(json.dumps({k: v for k, v in out.items() if k != "detail"}))
    (REPO / args.out).write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
