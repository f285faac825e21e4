"""SummingParquetSink bucketed-state + epoch high-water-mark gates
(VERDICT r2 #2).

The scale contract under test: a delta that hashes into one bucket
must leave every other bucket's data files untouched on disk — same
paths, same bytes — because an O(state) rewrite per 5-second epoch is
exactly what kills a high-cardinality aggregate (per-client per-10-min
stats2 over years). And idempotency must survive epochs older than the
tracked window via the high-water mark.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from adguard2clickhouse_spark.sinks.summing import (
    _MAX_EPOCHS_TRACKED,
    SummingParquetSink,
)


def _data_file_digests(root: str) -> dict[str, str]:
    """{relpath: sha256} for every parquet data file under root."""
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = Path(dirpath) / f
                out[str(p.relative_to(root))] = hashlib.sha256(
                    p.read_bytes()
                ).hexdigest()
    return out


def _mk_sink(tmp_path, spark, rows, n_buckets=8):
    sink = SummingParquetSink(
        str(tmp_path / "tbl"), keys=["k"], measures=["cnt"], n_buckets=n_buckets
    )
    df = spark.createDataFrame(rows, ["k", "cnt"])
    sink.apply_delta(df, epoch_id=0)
    return sink


def test_single_bucket_delta_leaves_other_buckets_byte_identical(tmp_path, spark):
    # seed with enough distinct keys that several buckets exist
    seed = [(f"key{i}", 1) for i in range(64)]
    sink = _mk_sink(tmp_path, spark, seed)
    meta0 = sink._pointer()
    assert len(meta0["buckets"]) > 1, "need multi-bucket state for this test"

    before = _data_file_digests(sink.path)

    # a delta with exactly one key → exactly one bucket touched
    delta = spark.createDataFrame([("key0", 5)], ["k", "cnt"])
    bucket_of_key0 = delta.select(
        F.pmod(F.xxhash64("k"), F.lit(sink.n_buckets)).alias("b")
    ).first()["b"]
    sink.apply_delta(delta, epoch_id=1)

    after = _data_file_digests(sink.path)
    meta1 = sink._pointer()

    touched_dir = f"b{bucket_of_key0:04d}"
    for rel, digest in before.items():
        if rel.startswith(touched_dir):
            continue  # the one rewritten bucket
        assert rel in after, f"untouched bucket file vanished: {rel}"
        assert after[rel] == digest, f"untouched bucket file rewritten: {rel}"
    # only that bucket's version advanced
    for b, v in meta0["buckets"].items():
        if int(b) != bucket_of_key0:
            assert meta1["buckets"][b] == v

    # and the fold is correct
    got = dict(sink.read(spark).collect())
    assert got["key0"] == 6 and got["key1"] == 1


def test_multi_bucket_delta_touches_only_its_buckets(tmp_path, spark):
    seed = [(f"key{i}", 1) for i in range(64)]
    sink = _mk_sink(tmp_path, spark, seed)
    before = _data_file_digests(sink.path)

    delta_rows = [("key0", 2), ("key17", 3), ("key42", 4)]
    delta = spark.createDataFrame(delta_rows, ["k", "cnt"])
    touched = {
        r["b"]
        for r in delta.select(
            F.pmod(F.xxhash64("k"), F.lit(sink.n_buckets)).alias("b")
        ).collect()
    }
    sink.apply_delta(delta, epoch_id=1)
    after = _data_file_digests(sink.path)

    touched_dirs = {f"b{b:04d}" for b in touched}
    for rel, digest in before.items():
        if any(rel.startswith(d) for d in touched_dirs):
            continue
        assert after.get(rel) == digest, f"untouched bucket rewritten: {rel}"

    got = dict(sink.read(spark).collect())
    assert got["key0"] == 3 and got["key17"] == 4 and got["key42"] == 5
    assert got["key1"] == 1


def test_epoch_high_water_mark_survives_window_eviction(tmp_path, spark):
    sink = _mk_sink(tmp_path, spark, [("a", 1)])
    # simulate a long-running stream: the tracked-epoch window has
    # rolled far past epoch 0
    meta = sink._pointer()
    meta["epochs"] = list(
        range(10_000, 10_000 + _MAX_EPOCHS_TRACKED)
    )  # window full, epoch 0 long gone
    meta["epoch_hwm"] = meta["epochs"][-1]
    sink._write_pointer(meta)

    before = dict(sink.read(spark).collect())
    # a retry of ANY epoch <= hwm must be a no-op even though it's not
    # in the tracked list
    stale = spark.createDataFrame([("a", 100)], ["k", "cnt"])
    assert sink.applied(5)
    sink.apply_delta(stale, epoch_id=5)
    assert dict(sink.read(spark).collect()) == before

    # a genuinely new epoch still folds
    sink.apply_delta(stale, epoch_id=meta["epoch_hwm"] + 1)
    assert dict(sink.read(spark).collect())["a"] == before["a"] + 100


def test_empty_delta_records_epoch(tmp_path, spark):
    sink = _mk_sink(tmp_path, spark, [("a", 1)])
    empty = spark.createDataFrame([], "k string, cnt long")
    sink.apply_delta(empty, epoch_id=7)
    assert sink.applied(7)
    # state unchanged
    assert dict(sink.read(spark).collect()) == {"a": 1}


def test_replace_preserves_epoch_history(tmp_path, spark):
    sink = _mk_sink(tmp_path, spark, [("a", 1), ("b", 2)])
    full = spark.createDataFrame([("a", 10)], ["k", "cnt"])
    sink.replace(full)
    assert dict(sink.read(spark).collect()) == {"a": 10}
    assert sink.applied(0)  # epoch history survived the swap
    # retried epoch after replace is still a no-op
    sink.apply_delta(spark.createDataFrame([("a", 99)], ["k", "cnt"]), epoch_id=0)
    assert dict(sink.read(spark).collect()) == {"a": 10}


def test_null_keys_fold(tmp_path, spark):
    sink = SummingParquetSink(
        str(tmp_path / "tbl"), keys=["k"], measures=["cnt"], n_buckets=4
    )
    df = spark.createDataFrame([(None, 1), (None, 2), ("x", 3)], "k string, cnt long")
    sink.apply_delta(df, epoch_id=0)
    sink.apply_delta(
        spark.createDataFrame([(None, 10)], "k string, cnt long"), epoch_id=1
    )
    rows = {r["k"]: r["cnt"] for r in sink.read(spark).collect()}
    assert rows[None] == 13 and rows["x"] == 3


def test_aggregating_folds_max_and_hll(tmp_path, spark):
    """The AggregatingMergeTree analog: per-measure fold spec. max
    keeps the slowest-query watermark exact across deltas; hll_union
    merges DataSketches HLL binary sketches so streaming
    count-distinct state equals a batch sketch of the union
    (registers merge exactly)."""
    from pyspark.sql import functions as F

    from adguard2clickhouse_spark.sinks.summing import SummingParquetSink

    sink = SummingParquetSink(
        str(tmp_path / "t"), keys=["Upstream"],
        measures=["n", "max_elapsed", "ip_sketch"],
        folds={"max_elapsed": "max", "ip_sketch": "hll_union"},
    )

    def delta(rows):
        df = spark.createDataFrame(rows, ["Upstream", "IP", "Elapsed"])
        return df.groupBy("Upstream").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("Elapsed").alias("max_elapsed"),
            F.hll_sketch_agg("IP").alias("ip_sketch"),
        )

    batch1 = [("up0", f"10.0.0.{i}", 100 + i) for i in range(20)]
    batch2 = [("up0", f"10.0.0.{i}", 500 - i) for i in range(10, 40)] + [
        ("up1", "10.9.9.9", 7)
    ]
    sink.apply_delta(delta(batch1), epoch_id=0)
    sink.apply_delta(delta(batch2), epoch_id=1)

    got = {
        r.Upstream: r
        for r in sink.read(spark)
        .select(
            "Upstream", "n", "max_elapsed",
            F.hll_sketch_estimate("ip_sketch").cast("long").alias("uniq"),
        )
        .collect()
    }
    assert got["up0"].n == 50
    assert got["up0"].max_elapsed == 490  # max across both deltas
    # distinct IPs in the union: 10.0.0.0..39 -> 40
    batch_est = (
        spark.createDataFrame(batch1 + batch2[:-1], ["Upstream", "IP", "Elapsed"])
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("IP")).cast("long"))
        .collect()[0][0]
    )
    assert got["up0"].uniq == batch_est  # merged state == batch sketch
    assert got["up1"].n == 1 and got["up1"].uniq == 1
    # epoch retry stays a no-op under non-sum folds
    before = {tuple(r) for r in sink.read(spark).drop("ip_sketch").collect()}
    sink.apply_delta(delta(batch2), epoch_id=1)
    after = {tuple(r) for r in sink.read(spark).drop("ip_sketch").collect()}
    assert before == after

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown fold"):
        SummingParquetSink(str(tmp_path / "bad"), ["k"], ["m"], folds={"m": "avg"})


def test_streaming_pipeline_with_hll_sink(tmp_path, spark):
    """End to end: a custom 'unique clients per domain' aggregate with
    HLL state rides the pipeline's fan-out; after two micro-batch
    rounds the sink's estimates equal a one-shot batch sketch."""
    import json as _json

    from pyspark.sql import functions as F

    from adguard2clickhouse_spark.operators.dnswire import build_answer_b64
    from adguard2clickhouse_spark.operators.parse import parse_querylog
    from adguard2clickhouse_spark.sinks.summing import SummingParquetSink
    from adguard2clickhouse_spark.streaming.pipeline import QuerylogPipeline

    def line(i):
        return _json.dumps({
            "T": f"2024-01-01T00:00:{i % 60:02d}+00:00",
            "QH": f"d{i % 3}.example.com", "QT": "A", "QC": "IN", "CP": "",
            "Upstream": "u", "IP": f"10.5.0.{i % 7}",
            "Result": {}, "Elapsed": 1, "Cached": False,
            "Answer": build_answer_b64(a=["1.2.3.4"]),
        })

    def domain_uniques(log2):
        return log2.groupBy("QH").agg(F.hll_sketch_agg("IP").alias("ip_sketch"))

    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    pipe = QuerylogPipeline(spark, str(src), str(out))
    pipe.aggregates["domain_uniques"] = domain_uniques
    pipe.sinks["domain_uniques"] = SummingParquetSink(
        str(out / "domain_uniques"), keys=["QH"], measures=["ip_sketch"],
        folds={"ip_sketch": "hll_union"},
    )
    batches = [[line(i) for i in range(25)], [line(i) for i in range(25, 60)]]
    for i, lines in enumerate(batches):
        (src / f"log-{i}.jsonl").write_text("\n".join(lines) + "\n")
        pipe.run_available()

    got = {
        r.QH: r.uniq
        for r in pipe.read_aggregate("domain_uniques")
        .select("QH", F.hll_sketch_estimate("ip_sketch").cast("long").alias("uniq"))
        .collect()
    }
    raw = spark.createDataFrame([(l,) for b in batches for l in b], ["value"])
    good, _ = parse_querylog(raw)
    want = {
        r.QH: r.uniq
        for r in good.groupBy("QH")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("IP")).cast("long").alias("uniq"))
        .collect()
    }
    assert got == want


def test_dense_fold_equals_sparse_and_stays_idempotent(tmp_path, spark):
    """dense=True (the streaming hot path, r6) must produce the SAME
    table state as the sparse bucket-pruned fold — same rows, same
    epoch ledger semantics — it only skips the touched-bucket
    discovery job. Also: a dense retry of an applied epoch no-ops, and
    a dense fold composes with a later sparse fold."""
    rows = [(f"key{i}", i) for i in range(64)]
    d1 = [(f"key{i}", 10) for i in range(0, 64, 3)]
    d2 = [("key1", 7), ("newkey", 2)]

    sparse = SummingParquetSink(
        str(tmp_path / "sparse"), keys=["k"], measures=["cnt"]
    )
    dense = SummingParquetSink(
        str(tmp_path / "dense"), keys=["k"], measures=["cnt"]
    )
    frames = [
        spark.createDataFrame(r, ["k", "cnt"]) for r in (rows, d1, d2)
    ]
    for e, f in enumerate(frames):
        sparse.apply_delta(f, epoch_id=e)
        dense.apply_delta(f, epoch_id=e, dense=True)

    def state(sink):
        return sorted(
            (r.k, r.cnt) for r in sink.read(spark).collect()
        )

    assert state(dense) == state(sparse)

    # dense retry of an applied epoch: no-op (state unchanged)
    dense.apply_delta(frames[2], epoch_id=2, dense=True)
    assert state(dense) == state(sparse)

    # dense then sparse compose: one more delta via the pruned path
    d3 = spark.createDataFrame([("key1", 100)], ["k", "cnt"])
    sparse.apply_delta(d3, epoch_id=3)
    dense.apply_delta(d3, epoch_id=3, dense=True)
    assert state(dense) == state(sparse)


def test_auto_dense_gate_tracks_delta_keys_not_epoch_rows(tmp_path, spark):
    """ADVICE r7: dense_folds="auto" gated on the RAW epoch row count,
    so a 100k-row epoch on one hot key picked dense and rewrote every
    bucket. The gate must reflect the delta's distinct-key coverage:
    the sink records whether the last sparse discovery touched all
    buckets, and auto goes dense only after observing full coverage."""
    from adguard2clickhouse_spark.streaming.pipeline import QuerylogPipeline

    sink = SummingParquetSink(
        str(tmp_path / "s"), keys=["k"], measures=["cnt"], n_buckets=8
    )
    pipe = object.__new__(QuerylogPipeline)  # only the fold knobs are read
    pipe.dense_folds = "auto"
    pipe.sparse_reprobe_every = 16
    pipe._dense_streaks = {}

    # no observation yet: even a huge epoch must start sparse
    assert pipe._dense_fold(sink, n_rows=100_000) is False

    # hot-key delta (1 distinct key): sparse fold observes 1/8 buckets
    hot = spark.createDataFrame([("hotkey", 100_000)], ["k", "cnt"])
    sink.apply_delta(hot, epoch_id=0)
    assert sink.last_fold_touched_all is False
    assert pipe._dense_fold(sink, n_rows=100_000) is False

    # spread delta touching all 8 buckets: observation flips, and auto
    # goes dense only when rows also clear the 4x-buckets floor
    spread = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(256)], ["k", "cnt"]
    )
    sink.apply_delta(spread, epoch_id=1)
    assert sink.last_fold_touched_all is True
    assert pipe._dense_fold(sink, n_rows=256) is True
    assert pipe._dense_fold(sink, n_rows=8) is False

    # pinned strategies ignore the observation
    pipe.dense_folds = True
    assert pipe._dense_fold(sink, n_rows=1) is True
    pipe.dense_folds = False
    assert pipe._dense_fold(sink, n_rows=10**6) is False


def test_hot_key_epoch_leaves_untouched_buckets_byte_identical(tmp_path, spark):
    """The property the auto gate exists to protect: a single-key delta
    folded sparsely rewrites only that key's bucket — every other
    bucket's files stay byte-identical."""
    sink = SummingParquetSink(
        str(tmp_path / "s"), keys=["k"], measures=["cnt"], n_buckets=8
    )
    base = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(256)], ["k", "cnt"]
    )
    sink.apply_delta(base, epoch_id=0)

    def bucket_files():
        out = {}
        for p in sorted(Path(sink.path).rglob("*.parquet")):
            out[str(p)] = hashlib.sha256(p.read_bytes()).hexdigest()
        return out

    before = bucket_files()
    hot = spark.createDataFrame([("key1", 50)], ["k", "cnt"])
    sink.apply_delta(hot, epoch_id=1)  # sparse: default
    after = bucket_files()
    # untouched buckets: same files, same bytes (new files appear only
    # under the one rewritten bucket's next version dir)
    surviving = {p: h for p, h in before.items() if p in after}
    assert surviving == {p: h for p, h in after.items() if p in before}
    changed_dirs = {
        str(Path(p).parent) for p in set(after) - set(before)
    }
    assert len(changed_dirs) == 1, changed_dirs
