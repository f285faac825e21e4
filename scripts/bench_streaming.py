"""Streaming ingest throughput: the reference-envelope comparison.

The reference's ceiling is one Python thread doing json.loads +
dnslib parse + one HTTP insert per log line (reference
src/collector.py:54-75) — a few thousand rows/s at best. This measures
our full topology on the same work: JSONL parse, DNS wire decode
(Arrow UDF), dead-letter split, fact append (date-partitioned parquet)
and all eight additive aggregate upserts, end to end through
Structured Streaming with checkpointing.

Usage: python scripts/bench_streaming.py [n_rows] [n_files]
Prints one JSON line: {"metric": "stream_ingest", "rows_per_s": ...}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adguard2clickhouse_spark.operators.dnswire import build_answer_b64  # noqa: E402
from adguard2clickhouse_spark.session import get_spark  # noqa: E402
from adguard2clickhouse_spark.streaming.pipeline import QuerylogPipeline  # noqa: E402


def make_lines(n: int) -> list[str]:
    answers = [
        build_answer_b64(a=["93.184.216.34"]),
        build_answer_b64(a=["1.1.1.1", "1.0.0.1"], cname=["cdn.example.net"]),
        build_answer_b64(aaaa=["2606:2800:220:1:248:1893:25c8:1946"]),
        build_answer_b64(rcode=3),
        build_answer_b64(txt=["v=spf1 include:_spf.example.com -all"]),
    ]
    lines = []
    for i in range(n):
        if i % 1009 == 0:
            lines.append("not json — dead letter")  # K3 path stays hot
            continue
        lines.append(json.dumps({
            "T": f"2024-01-01T{(i // 3600) % 24:02d}:{(i // 60) % 60:02d}:{i % 60:02d}+00:00",
            "QH": f"host{i % 5000}.tier{i % 7}.example.com",
            "QT": ("A", "AAAA", "HTTPS", "PTR")[i % 4],
            "QC": "IN",
            "CP": ("", "doh", "dot")[i % 3],
            "Upstream": f"resolver{i % 4}.example.net:53",
            "IP": f"10.{i % 4}.{i % 16}.{i % 251}",
            "Result": {"IsFiltered": i % 5 == 0},
            "Elapsed": 100_000 + (i % 900_000),
            "Cached": i % 6 == 0,
            "Answer": answers[i % len(answers)],
        }))
    return lines


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    work = Path(tempfile.mkdtemp(prefix="stream_bench_"))
    src, out = work / "src", work / "out"
    src.mkdir()
    lines = make_lines(n_rows)
    per = (len(lines) + n_files - 1) // n_files
    for f in range(n_files):
        chunk = lines[f * per : (f + 1) * per]
        if chunk:
            (src / f"querylog-{f:04d}.jsonl").write_text("\n".join(chunk) + "\n")

    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the parse/UDF/codegen path on a tiny separate run
    warm = QuerylogPipeline(spark, str(src / "../warm_src"), str(work / "warm_out"))
    (src / "../warm_src").mkdir()
    (src / "../warm_src" / "w.jsonl").write_text("\n".join(make_lines(500)) + "\n")
    warm.run_available()

    pipe = QuerylogPipeline(spark, str(src), str(out))
    t0 = time.time()
    pipe.run_available()
    wall = time.time() - t0

    n_fact = pipe.read_log2().count()
    n_dead = spark.read.parquet(str(out / "dead_letter")).count()
    assert n_fact + n_dead == n_rows, (n_fact, n_dead, n_rows)

    print(json.dumps({
        "metric": "stream_ingest",
        "rows_per_s": round(n_rows / wall, 1),
        "wall_s": round(wall, 2),
        "rows": n_rows,
        "fact_rows": n_fact,
        "dead_letters": n_dead,
        "aggregates_maintained": 8,
    }))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
