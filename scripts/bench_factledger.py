"""Fact-ledger fragmentation under AUTO-compaction (r11, VERDICT r10 #1).

BENCH_factledger_r10.json established the problem and the manual fix:
200 worst-case-fragmented epoch slots (500 rows x 28 date partitions
each) degraded reads to ~17 s, and one manual 94 s compaction restored
~6.6 s. r11 wires that maintenance into the pipeline (auto-compaction
between epochs once the committed-slot count reaches
``auto_compact_min_slots``); this bench replays the SAME fragmentation
protocol with the auto policy active and records what an operator now
gets for free:

- committed-slot count over time (bounded by the threshold, not
  epoch count),
- read wall sampled every 25 epochs (stays flat instead of degrading
  linearly with slots),
- each auto-compaction's wall and fold count (the bounded maintenance
  cost, amortized across epochs instead of one deferred 94 s stop-the-
  world the r10 protocol required an operator to remember).

The trigger logic here is the same decision QuerylogPipeline.
process_batch makes per epoch (threshold on committed-slot count,
128 MB small-slot fold), driven through the sink directly so the
measurement isolates ledger maintenance from parse/UDF cost exactly
like the r10 baseline did. The end-to-end pipeline trigger is
pytest-gated (tests/test_streaming.py::
test_auto_compaction_bounds_committed_slots).

Usage: python scripts/bench_factledger.py [epochs] [rows_per_epoch]
Writes BENCH_factledger_r11.json at the repo root.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from adguard2clickhouse_spark.session import get_spark  # noqa: E402
from adguard2clickhouse_spark.sinks.facts import LedgeredFactSink  # noqa: E402

AUTO_COMPACT_MIN_SLOTS = 48  # QuerylogPipeline.__init__ default
COMPACT_SMALL_BYTES = 128 << 20


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rows_per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="factledger_r11_")
    sink = LedgeredFactSink(
        f"{tmp}/log2", partition_by=["date"], sort_within=["date_time"]
    )

    # identical shape to the r10 protocol: 28 date partitions per epoch
    def epoch_df(e: int):
        return (
            spark.range(rows_per_epoch)
            .select(
                F.date_add(
                    F.lit("2024-01-01").cast("date"),
                    (F.col("id") % 28).cast("int"),
                ).alias("date"),
                (F.lit(e) * 100000 + F.col("id")).alias("date_time"),
                F.concat(F.lit(f"e{e}-"), F.col("id").cast("string")).alias(
                    "QH"
                ),
            )
        )

    def timed_read() -> float:
        t0 = time.time()
        df = sink.read(spark)
        df.selectExpr("count(*) c", "max(date_time) m").collect()
        return round(time.time() - t0, 3)

    appends, reads, compacts, slot_counts = [], [], [], []
    for e in range(epochs):
        t0 = time.time()
        sink.append(epoch_df(e), epoch_id=e)
        appends.append(time.time() - t0)
        n_slots = len(sink._pointer()["dirs"])
        # the pipeline's between-epoch maintenance decision, verbatim
        if n_slots >= AUTO_COMPACT_MIN_SLOTS:
            t0 = time.time()
            folded = sink.compact(spark, small_bytes=COMPACT_SMALL_BYTES)
            compacts.append(
                {
                    "epoch": e,
                    "folded": folded,
                    "wall_s": round(time.time() - t0, 3),
                }
            )
            n_slots = len(sink._pointer()["dirs"])
        slot_counts.append(n_slots)
        if (e + 1) % 25 == 0:
            reads.append({"epoch": e + 1, "slots": n_slots,
                          "read_s": timed_read()})
            print(f"epoch {e + 1}: slots={n_slots} read={reads[-1]['read_s']}s",
                  flush=True)

    total_rows = sink.read(spark).count()
    assert total_rows == epochs * rows_per_epoch, total_rows
    result = {
        "metric": "factledger_auto_compaction",
        "epochs": epochs,
        "rows_per_epoch": rows_per_epoch,
        "rows_total": total_rows,
        "auto_compact_min_slots": AUTO_COMPACT_MIN_SLOTS,
        "append_wall_s_p50": round(statistics.median(appends), 3),
        "append_wall_s_p99": round(
            sorted(appends)[int(0.99 * (len(appends) - 1))], 3
        ),
        "max_committed_slots": max(slot_counts),
        "final_committed_slots": slot_counts[-1],
        "reads_over_time": reads,
        "compactions": compacts,
        "compact_wall_s_total": round(
            sum(c["wall_s"] for c in compacts), 3
        ),
        "r10_baseline": {
            "read_s_at_200_slots": [17.939, 16.768],
            "manual_compact_s": 94.437,
            "note": "BENCH_factledger_r10.json, same 28-date-partition protocol, no maintenance",
        },
        "note": "local[8]; worst-case slot fragmentation; auto policy = QuerylogPipeline defaults",
    }
    (REPO / "BENCH_factledger_r11.json").write_text(
        json.dumps(result, indent=1) + "\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
