"""Streaming topology tests (SURVEY.md §5 item 5): batch-vs-stream
equivalence, additivity across micro-batches, exactly-once retries."""

from __future__ import annotations

import json

import pytest

from adguard2clickhouse_spark.operators import aggregates as agg
from adguard2clickhouse_spark.operators.dnswire import build_answer_b64
from adguard2clickhouse_spark.operators.parse import parse_querylog
from adguard2clickhouse_spark.streaming.pipeline import QuerylogPipeline


def _line(i: int, minute: int, filtered: bool, qh: str, ip: str) -> str:
    return json.dumps(
        {
            "T": f"2024-01-01T00:{minute:02d}:{i % 60:02d}+00:00",
            "QH": qh,
            "QT": "A",
            "QC": "IN",
            "CP": "doh",
            "Upstream": "8.8.8.8:53",
            "IP": ip,
            "Result": {"IsFiltered": filtered},
            "Elapsed": 1000 + i,
            "Cached": False,
            "Answer": build_answer_b64(a=["1.2.3.4"] if not filtered else ["0.0.0.0"]),
        }
    )


def _corpus() -> list[list[str]]:
    """Two 'log rotations' worth of lines, plus malformed ones."""
    batch1 = [
        _line(i, minute=i % 20, filtered=i % 3 == 0, qh=f"d{i % 7}.example.com", ip=f"10.0.0.{i % 4}")
        for i in range(40)
    ] + ["garbage not json"]
    batch2 = [
        _line(i, minute=(i * 7) % 45, filtered=i % 4 == 0, qh=f"d{i % 5}.example.org", ip=f"10.0.0.{i % 3}")
        for i in range(40, 70)
    ] + [json.dumps({"T": "2024-01-01T00:00:00+00:00", "QH": "x.y", "QT": "A", "QC": "IN",
                     "CP": "", "IP": "1.1.1.1", "Elapsed": 1, "Answer": "!!bad!!"})]
    return [batch1, batch2]


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory, spark):
    src = tmp_path_factory.mktemp("qlog_src")
    out = tmp_path_factory.mktemp("qlog_out")
    batches = _corpus()

    pipe = QuerylogPipeline(spark, str(src), str(out))
    # simulate log rotation: file lands, stream drains, next file lands
    for i, lines in enumerate(batches):
        (src / f"querylog-{i:04d}.jsonl").write_text("\n".join(lines) + "\n")
        pipe.run_available()
    return src, out, pipe, batches


def test_fact_rows_and_dead_letters(run_dirs, spark):
    src, out, pipe, batches = run_dirs
    log2 = pipe.read_log2()
    assert log2.count() == 70  # 71 lines - 2 malformed + ... 40+30 valid
    dead = spark.read.parquet(str(out / "dead_letter"))
    assert dead.count() == 2


def test_stream_aggregates_equal_batch(run_dirs, spark):
    """The core MV-parity check: streaming summing-sink state ==
    one-shot batch aggregation over the same raw lines."""
    src, out, pipe, batches = run_dirs
    all_lines = [l for b in batches for l in b]
    raw = spark.createDataFrame([(l,) for l in all_lines], ["value"])
    good, _ = parse_querylog(raw)

    for name, fn in agg.ALL_AGGREGATES.items():
        expected = {tuple(r) for r in fn(good).collect()}
        got_df = pipe.read_aggregate(name)
        assert got_df is not None, name
        got = {tuple(r) for r in got_df.select(*fn(good).columns).collect()}
        assert got == expected, f"{name}: stream != batch"


def test_epoch_retry_is_noop(run_dirs, spark):
    """Retrying an already-applied epoch must not double-count."""
    src, out, pipe, batches = run_dirs
    sink = pipe.sinks["qt_stats"]
    before = {tuple(r) for r in sink.read(spark).collect()}

    raw = spark.createDataFrame([(l,) for l in batches[0]], ["value"])
    good, _ = parse_querylog(raw)
    delta = agg.qt_stats(good)

    applied_epoch = sink._pointer()["epochs"][0]
    sink.apply_delta(delta, epoch_id=applied_epoch)  # retry → no-op
    after = {tuple(r) for r in sink.read(spark).collect()}
    assert after == before

    sink.apply_delta(delta, epoch_id=999999)  # genuinely new epoch → folds
    newer = dict(sink.read(spark).collect())
    assert newer["A"] == dict(before)["A"] + 40


def test_log2_partitioned_by_date(run_dirs, spark):
    src, out, pipe, _ = run_dirs
    files = list((out / "log2").glob("date=*"))
    assert files, "expected date= partition directories"
