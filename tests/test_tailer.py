"""TailBridge tests (S1 parity): growing file → watched dir → stream."""

from __future__ import annotations

import json

from adguard2clickhouse_spark.sources.tailer import TailBridge


def test_partial_lines_held_back(tmp_path):
    src = tmp_path / "querylog.log"
    watch = tmp_path / "watch"
    src.write_text("line1\nline2\npart")
    b = TailBridge(str(src), str(watch))
    assert b.poll_once() == len("line1\nline2\n")
    files = sorted(p.name for p in watch.glob("chunk_*.jsonl"))
    assert files == ["chunk_00000000.jsonl"]
    assert (watch / files[0]).read_text() == "line1\nline2\n"
    # the partial tail ships only once its newline arrives
    assert b.poll_once() == 0
    with src.open("a") as f:
        f.write("ial3\nline4\n")
    assert b.poll_once() == len("partial3\nline4\n")
    assert (watch / "chunk_00000001.jsonl").read_text() == "partial3\nline4\n"


def test_offset_survives_restart(tmp_path):
    src = tmp_path / "q.log"
    watch = tmp_path / "w"
    src.write_text("a\nb\n")
    b1 = TailBridge(str(src), str(watch))
    b1.poll_once()
    with src.open("a") as f:
        f.write("c\n")
    b2 = TailBridge(str(src), str(watch))  # fresh instance, same state file
    assert b2.poll_once() == 2
    assert (watch / "chunk_00000001.jsonl").read_text() == "c\n"


def test_truncation_restarts_from_zero(tmp_path):
    src = tmp_path / "q.log"
    watch = tmp_path / "w"
    src.write_text("aaaa\nbbbb\n")
    b = TailBridge(str(src), str(watch))
    b.poll_once()
    src.write_text("x\n")  # logrotate-style truncate+rewrite
    assert b.poll_once() == 2
    assert (watch / "chunk_00000001.jsonl").read_text() == "x\n"


def test_follow_stops_after_idle(tmp_path):
    src = tmp_path / "q.log"
    watch = tmp_path / "w"
    src.write_text("a\n")
    b = TailBridge(str(src), str(watch))
    shipped = list(b.follow(poll_interval_s=0.01, stop_after_idle=2))
    assert sum(shipped) == 2


def test_bridge_feeds_streaming_pipeline(tmp_path, spark):
    """End-to-end S1: grow one file, bridge it, drain the stream."""
    from adguard2clickhouse_spark.streaming.pipeline import QuerylogPipeline

    src = tmp_path / "querylog.log"
    watch = tmp_path / "watch"
    out = tmp_path / "out"

    from adguard2clickhouse_spark.operators.dnswire import build_answer_b64

    def line(i):
        return json.dumps({
            "T": f"2024-01-01T00:00:{i:02d}+00:00", "QH": f"d{i}.example.com",
            "QT": "A", "QC": "IN", "CP": "", "IP": "10.0.0.1",
            "Result": {"IsFiltered": False}, "Elapsed": 1, "Cached": False,
            "Answer": build_answer_b64(a=["1.2.3.4"]),
        })

    src.write_text("\n".join(line(i) for i in range(5)) + "\n")
    bridge = TailBridge(str(src), str(watch))
    bridge.poll_once()
    pipe = QuerylogPipeline(spark, str(watch), str(out))
    pipe.run_available()
    assert pipe.read_log2().count() == 5

    with src.open("a") as f:
        f.write(line(5) + "\n")
    bridge.poll_once()
    pipe.run_available()
    assert pipe.read_log2().count() == 6
