"""DNS wire parser tests (SURVEY.md §5 item 2 + property tests, item 4).

Covers FIXTURES.md §A1's required corpus variety: A-only, AAAA-only,
CNAME chains, mixed, NXDOMAIN, malformed base64/truncated packets.
"""

from __future__ import annotations

import base64

from hypothesis import given, settings
from hypothesis import strategies as st

from adguard2clickhouse_spark.operators.dnswire import (
    build_answer,
    build_answer_b64,
    parse_answer_b64,
    parse_message,
)


def test_a_only():
    rcode, r4, r6, cn = parse_answer_b64(build_answer_b64(a=["1.2.3.4", "9.9.9.9"]))
    assert (rcode, r4, r6, cn) == (0, ["1.2.3.4", "9.9.9.9"], [], [])


def test_aaaa_only():
    rcode, r4, r6, cn = parse_answer_b64(build_answer_b64(aaaa=["2001:db8::1"]))
    assert (rcode, r4, r6, cn) == (0, [], ["2001:db8::1"], [])


def test_cname_chain_with_terminal_a():
    rcode, r4, r6, cn = parse_answer_b64(
        build_answer_b64(cname=["cdn.example.net", "edge.example.net"], a=["7.7.7.7"])
    )
    assert rcode == 0
    assert r4 == ["7.7.7.7"]
    assert cn == ["cdn.example.net.", "edge.example.net."]


def test_nxdomain_empty_answer():
    assert parse_answer_b64(build_answer_b64(rcode=3)) == (3, [], [], [])


def test_txt_goes_to_cnames():
    # Classification rule (collector.py:34-40): non-IP rdata → cnames.
    _, _, _, cn = parse_answer_b64(build_answer_b64(txt=["v=spf1 -all"]))
    assert cn == ["v=spf1 -all"]


def test_malformed_inputs_dead_letter():
    assert parse_answer_b64("!!!not base64") is None
    assert parse_answer_b64(None) is None
    # valid base64, truncated packet
    assert parse_answer_b64(base64.b64encode(b"\x00\x01").decode()) is None
    # truncated mid-RR
    full = build_answer(a=["1.2.3.4"])
    assert parse_answer_b64(base64.b64encode(full[:-2]).decode()) is None


def test_compression_pointer():
    import struct

    hdr = struct.pack(">HHHHHH", 1, 0x8180, 1, 1, 0, 0)
    q = b"\x07example\x03com\x00" + struct.pack(">HH", 1, 1)
    ans = b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 300, 4) + bytes([9, 9, 9, 9])
    assert parse_message(hdr + q + ans) == (0, ["9.9.9.9"], [], [])


def test_pointer_loop_rejected():
    import struct

    hdr = struct.pack(">HHHHHH", 1, 0x8180, 0, 1, 0, 0)
    ans = b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 300, 4) + bytes([9, 9, 9, 9])
    # pointer at offset 12 points to itself
    assert parse_answer_b64(base64.b64encode(hdr + ans).decode()) is None


@given(
    rcode=st.integers(0, 15),
    a=st.lists(st.ip_addresses(v=4).map(str), max_size=4),
    aaaa=st.lists(st.ip_addresses(v=6).map(str), max_size=4),
    cname=st.lists(
        st.from_regex(r"[a-z]{1,10}\.[a-z]{2,5}", fullmatch=True), max_size=3
    ),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(rcode, a, aaaa, cname):
    """Every RR lands in exactly one bucket; rcode survives (SURVEY §5.4)."""
    parsed = parse_answer_b64(build_answer_b64(rcode=rcode, a=a, aaaa=aaaa, cname=cname))
    assert parsed is not None
    got_rcode, r4, r6, cn = parsed
    assert got_rcode == rcode
    assert r4 == a
    # compressed-form rendering is canonical; compare via ipaddress
    import ipaddress

    assert [ipaddress.IPv6Address(x) for x in r6] == [ipaddress.IPv6Address(x) for x in aaaa]
    assert cn == [c + "." for c in cname]


def test_udf_batch(spark):
    from pyspark.sql import functions as F

    from adguard2clickhouse_spark.operators.dnswire import parse_dns_answer

    rows = [
        (build_answer_b64(a=["1.2.3.4"]),),
        (build_answer_b64(rcode=3),),
        ("garbage",),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["Answer"]).withColumn(
        "dns", parse_dns_answer(F.col("Answer"))
    )
    got = [r.dns.asDict() if r.dns and r.dns.rcode is not None else None for r in df.collect()]
    assert got[0] == {"rcode": 0, "rdatas": ["1.2.3.4"], "rdatas6": [], "cnames": []}
    assert got[1] == {"rcode": 3, "rdatas": [], "rdatas6": [], "cnames": []}
    assert got[2] is None
    assert got[3] is None


def test_udf_nomemo_parity(spark):
    """The memo-free UDF variant (r16, for all-distinct packet callers)
    must agree with the memoized one row-for-row, including the
    dead-letter (all-null struct) rows."""
    from pyspark.sql import functions as F

    from adguard2clickhouse_spark.operators.dnswire import (
        parse_dns_answer,
        parse_dns_answer_nomemo,
    )

    rows = [
        (build_answer_b64(a=[f"10.0.{i // 256}.{i % 256}"], rcode=i % 6),)
        for i in range(300)
    ] + [
        (build_answer_b64(aaaa=["2001:db8::1"], cname=["cdn.example.net"]),),
        (build_answer_b64(txt=["v=spf1 -all"]),),
        ("garbage",),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["Answer"]).select(
        parse_dns_answer(F.col("Answer")).alias("memo"),
        parse_dns_answer_nomemo(F.col("Answer")).alias("nomemo"),
    )
    mismatches = df.filter(~F.col("memo").eqNullSafe(F.col("nomemo"))).count()
    assert mismatches == 0
