"""X5 multimodal plumbing tests: Arrow batch shape, schema, stub
determinism, metadata-only pre-passes, ClickHouse DDL generation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from adguard2clickhouse_spark.operators import multimodal
from adguard2clickhouse_spark.sinks.clickhouse import (
    HAVE_CLICKHOUSE,
    log2_ddl,
    spark_type_to_clickhouse,
    summing_ddl,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes", ("image", "png", 64, 64, 0)),
        (2, b"RIFF-fake-audio", ("audio", "wav", 0, 0, 2500)),
        (3, b"mp4-fake-video", ("video", "mp4", 640, 480, 3500)),
        (4, None, ("image", "png", 8, 8, 0)),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_schema_and_values(media_df):
    out = multimodal.extract_features(media_df, stub=True)
    assert out.schema == multimodal.FEATURES_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].sha256 == hashlib.sha256(b"\x89PNG-fake-bytes").hexdigest()
    assert rows[1].n_bytes == len(b"\x89PNG-fake-bytes")
    assert len(rows[1].features) == multimodal.FEATURE_DIM
    assert all(0.0 <= f < 1.0 for f in rows[1].features)
    # null payload → empty-bytes features, not a crash (K3 discipline)
    assert rows[4].sha256 == hashlib.sha256(b"").hexdigest()
    assert rows[4].n_bytes == 0


def test_extract_features_deterministic(media_df):
    a = {r.media_id: tuple(r.features) for r in multimodal.extract_features(media_df).collect()}
    b = {r.media_id: tuple(r.features) for r in multimodal.extract_features(media_df).collect()}
    assert a == b


def test_real_decode_is_a_hard_error(media_df):
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        multimodal.extract_features(media_df, stub=False).collect()


@pytest.fixture(scope="module")
def media_parquet(media_df, tmp_path_factory, spark):
    """Parquet round-trip: column pruning is only observable against a
    file scan (a LocalRelation leaf always lists every column)."""
    path = str(tmp_path_factory.mktemp("media") / "media.parquet")
    media_df.write.parquet(path)
    return spark.read.parquet(path)


def test_frame_sample_plan_metadata_only(media_parquet):
    plan = multimodal.frame_sample_plan(media_parquet, every_ms=1000)
    got = [(r.media_id, r.frame_ts_ms) for r in plan.orderBy("media_id", "frame_ts_ms").collect()]
    # only the video row; duration 3500ms @1000ms → ts 0,1000,2000,3000
    assert got == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]
    # the payload bytes must never be read: pruned out of the scan
    physical = plan._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in physical.splitlines() if "ReadSchema" in l]
    assert read_schema and all("payload" not in l for l in read_schema)


def test_media_stats_prunes_payload(media_parquet):
    stats = multimodal.media_stats(media_parquet)
    got = {r.kind: (r.n_items, r.total_duration_ms) for r in stats.collect()}
    assert got == {"image": (2, 0), "audio": (1, 2500), "video": (1, 3500)}
    physical = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in physical.splitlines() if "ReadSchema" in l]
    assert read_schema and all("payload" not in l for l in read_schema)


# ---------------------------------------------------------------------------
# ClickHouse sink DDL (network writer is import-gated in this container)
# ---------------------------------------------------------------------------

def test_clickhouse_type_mapping():
    from pyspark.sql import types as T

    assert spark_type_to_clickhouse(T.TimestampType()) == "DateTime"
    assert spark_type_to_clickhouse(T.ArrayType(T.StringType())) == "Array(String)"
    with pytest.raises(ValueError):
        spark_type_to_clickhouse(T.MapType(T.StringType(), T.StringType()))


def test_log2_ddl_matches_reference_shape():
    ddl = log2_ddl()
    # README.md:4-22: MergeTree ORDER BY date_time with the 14 columns
    assert "ENGINE = MergeTree" in ddl
    assert "ORDER BY date_time" in ddl
    for col in ("`QH` String", "`IsFiltered` Bool", "`Elapsed` UInt64",
                "`rdatas` Array(String)"):
        assert col in ddl, col


def test_summing_ddl(spark):
    df = spark.createDataFrame([("a", 1)], "QH STRING, count LONG")
    ddl = summing_ddl("blocked_domains", df, keys=["QH"])
    assert "ENGINE = SummingMergeTree" in ddl
    assert "ORDER BY (`QH`)" in ddl


def test_writer_gated_without_library():
    if HAVE_CLICKHOUSE:
        pytest.skip("clickhouse_connect present")
    from adguard2clickhouse_spark.sinks.clickhouse import ClickHouseWriter

    with pytest.raises(ImportError):
        ClickHouseWriter("localhost", "db", "u", "p")


def test_resize_preserves_schema_and_payload(media_df):
    out = multimodal.resize_media(media_df, 32, 32, stub=True)
    assert out.schema == multimodal.MEDIA_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].meta.width == 32 and rows[1].meta.height == 32
    assert bytes(rows[1].payload) == b"\x89PNG-fake-bytes"
    assert rows[1].meta.kind == "image"  # untouched meta fields survive
    # composes with downstream feature extraction
    feats = multimodal.extract_features(out, stub=True)
    assert feats.count() == 4
