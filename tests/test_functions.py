"""Scalar function layer tests (SURVEY.md §2.6), incl. ClickHouse-semantics
edge cases called out in §7 'hard parts' #4."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from adguard2clickhouse_spark.functions import (
    IPV4_RE,
    IPV6_RE,
    array_rotate_right,
    split_by_char,
    tld,
    to_start_of_interval,
)
from adguard2clickhouse_spark.functions.net import py_is_ipv4, py_is_ipv6

_IPV4 = re.compile(IPV4_RE)
_IPV6 = re.compile(IPV6_RE)

IPV4_CASES = {
    "1.2.3.4": True,
    "255.255.255.255": True,
    "0.0.0.0": True,
    "256.1.1.1": False,
    "1.2.3": False,
    "1.2.3.4.5": False,
    "a.b.c.d": False,
    "": False,
    "1.2.3.4 ": False,  # full-string match (ClickHouse isIPv4String)
}

IPV6_CASES = {
    "2001:db8::1": True,
    "::": True,
    "::1": True,
    "fe80::1": True,
    "2001:0db8:0000:0000:0000:0000:0000:0001": True,
    "::ffff:1.2.3.4": True,
    "1.2.3.4": False,
    "example.com": False,
    "2001:db8:::1": False,
    "": False,
}


def test_ipv4_regex_cases():
    for s, want in IPV4_CASES.items():
        assert bool(_IPV4.match(s)) == want, s


def test_ipv6_regex_cases():
    for s, want in IPV6_CASES.items():
        assert bool(_IPV6.match(s)) == want, s


@given(st.ip_addresses(v=4).map(str))
@settings(max_examples=100, deadline=None)
def test_ipv4_regex_accepts_all_valid(s):
    assert _IPV4.match(s)


@given(st.ip_addresses(v=6).map(str))
@settings(max_examples=100, deadline=None)
def test_ipv6_regex_accepts_all_valid(s):
    assert _IPV6.match(s)


@given(st.text(alphabet="0123456789abcdef:.", max_size=24))
@settings(max_examples=200, deadline=None)
def test_regexes_agree_with_stdlib(s):
    """Regex semantics == stdlib ipaddress (the reference's netaddr checks)."""
    assert bool(_IPV4.match(s)) == py_is_ipv4(s)
    # scope-id/zone forms aside (not valid in hostnames), ipv6 should agree
    if "%" not in s:
        assert bool(_IPV6.match(s)) == py_is_ipv6(s)


def test_split_and_tld_and_rotate(spark):
    df = spark.createDataFrame(
        [("ads.example.com",), ("localhost",), ("",)], ["QH"]
    ).select(
        split_by_char("QH").alias("parts"),
        tld("QH").alias("tld"),
        array_rotate_right(split_by_char("QH"), 1).alias("rot"),
        F.element_at(array_rotate_right(split_by_char("QH"), 1), 1).alias("rot_head"),
    )
    rows = df.collect()
    assert rows[0].parts == ["ads", "example", "com"]
    assert rows[0].tld == "com"
    # literal reference composition: rotate-right then [1] == last element
    assert rows[0].rot == ["com", "ads", "example"]
    assert rows[0].rot_head == "com"
    assert rows[1].parts == ["localhost"]
    assert rows[1].tld == "localhost"
    assert rows[1].rot_head == "localhost"
    # ClickHouse splitByChar('.','') → [''] — Spark matches
    assert rows[2].parts == [""]


def test_to_start_of_interval_matches_duckdb(spark):
    """O6 oracle: our bucketing == DuckDB time_bucket (SURVEY §5.4)."""
    import datetime as dt

    import duckdb

    stamps = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 1, 0, 9, 59),
        dt.datetime(2024, 1, 1, 0, 10, 0),
        dt.datetime(2024, 3, 15, 23, 59, 59),
    ]
    got = (
        spark.createDataFrame([(s,) for s in stamps], ["ts"])
        .select(to_start_of_interval("ts", 10).alias("b"))
        .collect()
    )
    for s, r in zip(stamps, got):
        want = duckdb.sql(
            f"SELECT time_bucket(INTERVAL '10 minutes', TIMESTAMP '{s}')"
        ).fetchone()[0]
        assert r.b == want, s
