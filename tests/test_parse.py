"""End-to-end parse pipeline tests (SURVEY.md §2.2-2.3, FIXTURES.md §A1)."""

from __future__ import annotations

import json

import pytest

from adguard2clickhouse_spark.operators.dnswire import build_answer_b64
from adguard2clickhouse_spark.operators.parse import parse_querylog


def _line(**over):
    base = {
        "T": "2024-01-01T00:01:02.123456+00:00",
        "QH": "ads.example.com",
        "QT": "A",
        "QC": "IN",
        "CP": "doh",
        "Upstream": "8.8.8.8:53",
        "IP": "10.0.0.1",
        "Result": {"IsFiltered": True},
        "Elapsed": 123456,
        "Cached": False,
        "Answer": build_answer_b64(a=["1.2.3.4"]),
    }
    base.update(over)
    return json.dumps({k: v for k, v in base.items() if v is not ...})


@pytest.fixture(scope="module")
def parsed(spark):
    lines = [
        _line(),                                           # fully populated
        _line(QH="defaults.example.com", Upstream=..., Cached=..., Result=...),  # P3/P4
        _line(Answer=build_answer_b64(rcode=3), QH="nx.example.org"),
        "this is not json at all {{{",                     # corrupt JSON → dead letter
        _line(QH=...),                                     # missing required key → dead letter
        _line(Answer="bad-base64!"),                       # bad packet → dead letter (K3)
        _line(T="not-a-timestamp"),                        # unparseable ts → dead letter
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    good, dead = parse_querylog(df)
    return good.collect(), dead.collect()


def test_good_row_fully_parsed(parsed):
    good, _ = parsed
    r = {row.QH: row for row in good}["ads.example.com"]
    assert r.date_time.isoformat().startswith("2024-01-01T00:01:02")
    assert r.QT == "A" and r.QC == "IN" and r.CP == "doh"
    assert r.Upstream == "8.8.8.8:53"
    assert r.IP == "10.0.0.1"
    assert r.IsFiltered is True
    assert r.Elapsed == 123456
    assert r.Cached is False
    assert r.rcode == 0 and r.rdatas == ["1.2.3.4"] and r.rdatas6 == [] and r.cnames == []


def test_optional_defaults(parsed):
    """collector.py:22,24,26 — Upstream→'', IsFiltered→False, Cached→False."""
    good, _ = parsed
    rows = [row for row in good if row.Upstream == ""]
    assert len(rows) == 1
    r = rows[0]
    assert r.IsFiltered is False and r.Cached is False


def test_nxdomain_row(parsed):
    good, _ = parsed
    r = {row.QH: row for row in good}["nx.example.org"]
    assert r.rcode == 3 and r.rdatas == []


def test_dead_letter_routing(parsed):
    """Four malformed lines route to dead-letter, none crash (K3)."""
    good, dead = parsed
    assert len(good) == 3
    assert len(dead) == 4
    raws = [r.raw_line for r in dead]
    assert any("not json" in r for r in raws)


def test_column_order_matches_reference_insert(parsed, spark):
    """P11: column order == collector.py:74-75 insert list."""
    from adguard2clickhouse_spark.schemas import LOG2_COLUMNS

    assert LOG2_COLUMNS == [
        "date_time", "QH", "QT", "QC", "CP", "Upstream", "IP",
        "IsFiltered", "Elapsed", "Cached", "rcode", "rdatas", "rdatas6", "cnames",
    ]
