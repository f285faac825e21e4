"""DNS wire-format answer decoding (SURVEY.md §2.2 P6-P10, §2.10).

The reference does ``DNSRecord.parse(base64.b64decode(log['Answer']))``
and classifies each answer rdata into ``rdatas`` (IPv4) / ``rdatas6``
(IPv6) / ``cnames`` (everything else) — /root/reference/src/collector.py:29-41.

``dnslib`` is not available here, so this module implements the needed
subset of RFC 1035 message decoding in pure Python (header, question
skip, answer resource records, name decompression). It runs inside an
Arrow-batched pandas UDF — one Python call per ~10k rows, not per row —
and isolates errors per record (a malformed packet yields a null
struct, mirroring the reference's per-line try/except at
collector.py:76-78, instead of failing the batch).

Rendering matches the reference's classification semantics:
A → dotted quad, AAAA → compressed IPv6 (both validated with the stdlib
``ipaddress`` just as the reference used ``netaddr``), name-typed
records (CNAME/NS/PTR/...) → FQDN with trailing dot (as dnslib prints
them), TXT → joined character-strings, unknown types → hex. Anything
that isn't a valid IPv4/IPv6 literal lands in ``cnames``, exactly like
collector.py:34-40.
"""

from __future__ import annotations

import base64
import binascii
import functools
import ipaddress
import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from adguard2clickhouse_spark.schemas import DNS_ANSWER_SCHEMA

# RR type codes we render specially (RFC 1035 §3.2.2, RFC 3596).
_TYPE_A = 1
_TYPE_NS = 2
_TYPE_CNAME = 5
_TYPE_SOA = 6
_TYPE_PTR = 12
_TYPE_MX = 15
_TYPE_TXT = 16
_TYPE_AAAA = 28
_NAME_TYPES = {_TYPE_NS, _TYPE_CNAME, _TYPE_PTR}


def _decode_name(buf: bytes, off: int) -> tuple[str, int]:
    """Decode a (possibly compressed) domain name; return (name, next_off).

    Follows RFC 1035 §4.1.4 pointer compression with loop protection.
    """
    labels: list[str] = []
    end = -1
    seen: set[int] = set()
    while True:
        if off >= len(buf):
            raise ValueError("truncated name")
        length = buf[off]
        if length & 0xC0 == 0xC0:  # compression pointer
            if off + 1 >= len(buf):
                raise ValueError("truncated pointer")
            ptr = ((length & 0x3F) << 8) | buf[off + 1]
            if ptr in seen:
                raise ValueError("pointer loop")
            seen.add(ptr)
            if end < 0:
                end = off + 2
            off = ptr
        elif length == 0:
            if end < 0:
                end = off + 1
            name = ".".join(labels) + "." if labels else "."
            return name, end
        else:
            if off + 1 + length > len(buf):
                raise ValueError("truncated label")
            labels.append(buf[off + 1 : off + 1 + length].decode("ascii", "replace"))
            off += 1 + length


def _render_rdata(buf: bytes, rtype: int, rd_off: int, rd_len: int) -> str:
    """Render one rdata the way the reference's str(pr.rdata) would."""
    rdata = buf[rd_off : rd_off + rd_len]
    if rtype == _TYPE_A and rd_len == 4:
        return ".".join(str(b) for b in rdata)
    if rtype == _TYPE_AAAA and rd_len == 16:
        return str(ipaddress.IPv6Address(rdata))
    if rtype in _NAME_TYPES:
        name, _ = _decode_name(buf, rd_off)
        return name
    if rtype == _TYPE_MX and rd_len >= 3:
        pref = struct.unpack_from(">H", rdata)[0]
        name, _ = _decode_name(buf, rd_off + 2)
        return f"{pref} {name}"
    if rtype == _TYPE_SOA:
        mname, off2 = _decode_name(buf, rd_off)
        rname, _ = _decode_name(buf, off2)
        return f"{mname} {rname}"
    if rtype == _TYPE_TXT:
        parts, i = [], 0
        while i < rd_len:
            n = rdata[i]
            parts.append(rdata[i + 1 : i + 1 + n].decode("utf-8", "replace"))
            i += 1 + n
        return "".join(parts)
    return rdata.hex()


def parse_message(data: bytes) -> tuple[int, list[str], list[str], list[str]]:
    """Parse a DNS message; return (rcode, rdatas, rdatas6, cnames).

    Only the answer section is classified — the reference iterates
    ``t.rr`` (answers) at collector.py:34.
    """
    if len(data) < 12:
        raise ValueError("truncated header")
    (_id, flags, qd, an, _ns, _ar) = struct.unpack_from(">HHHHHH", data)
    rcode = flags & 0x0F
    off = 12
    for _ in range(qd):  # skip question section: name + type + class
        _, off = _decode_name(data, off)
        off += 4
        if off > len(data):
            raise ValueError("truncated question")
    rdatas: list[str] = []
    rdatas6: list[str] = []
    cnames: list[str] = []
    for _ in range(an):
        _, off = _decode_name(data, off)
        if off + 10 > len(data):
            raise ValueError("truncated rr header")
        rtype, _rclass, _ttl, rd_len = struct.unpack_from(">HHIH", data, off)
        off += 10
        if off + rd_len > len(data):
            raise ValueError("truncated rdata")
        text = _render_rdata(data, rtype, off, rd_len)
        off += rd_len
        # Classification exactly as collector.py:34-40 (netaddr checks).
        if _is_ipv4(text):
            rdatas.append(text)
        elif _is_ipv6(text):
            rdatas6.append(text)
        else:
            cnames.append(text)
    return rcode, rdatas, rdatas6, cnames


def _is_ipv4(s: str) -> bool:
    try:
        ipaddress.IPv4Address(s)
        return True
    except ValueError:
        return False


def _is_ipv6(s: str) -> bool:
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


def parse_answer_b64(s: str | None):
    """Decode one base64 answer; None on any failure (dead-letter path).

    Memoized per executor (bounded): DNS answer bytes are heavy-tailed
    in real query logs — upstreams return byte-identical packets for a
    TTL window — so the cache hit rate tracks the resolver's. Results
    are immutable tuples, safe to share across rows.
    """
    if s is None:
        return None
    hit = _parse_cached(s)
    if hit is None:
        return None
    rcode, r4, r6, cn = hit
    return rcode, list(r4), list(r6), list(cn)


def _parse_raw(s: str):
    try:
        rcode, r4, r6, cn = parse_message(base64.b64decode(s, validate=True))
        return rcode, tuple(r4), tuple(r6), tuple(cn)
    except (ValueError, binascii.Error, struct.error, IndexError):
        return None


# NB: a decorated def, not `lru_cache(...)(_parse_raw)` — the wrapper
# would inherit _parse_raw's __qualname__ via functools.wraps and then
# fail pickle-by-reference when a UDF closure captures it.
@functools.lru_cache(maxsize=65536)
def _parse_cached(s: str):
    return _parse_raw(s)


def _parse_series(answers: pd.Series, parse) -> pd.DataFrame:
    """Shared UDF body: one batch of base64 answers → struct columns.

    Per-row error isolation: a bad packet produces an all-null row of
    the struct; the pipeline routes those to the dead-letter sink
    (K3 semantics, collector.py:76-78). The parsed tuples go into the
    frame as-is — Arrow serializes tuples and lists identically, and
    the per-row tuple→list defensive copies this replaces cost ~0.5 µs
    per row, ~10× the bare post-hit cost on a fully-cached batch (r16
    microbench, 200k rows: 0.11 s with copies vs 0.01 s without).
    """
    out = {"rcode": [], "rdatas": [], "rdatas6": [], "cnames": []}
    for s in answers:
        parsed = parse(s) if s is not None else None
        if parsed is None:
            out["rcode"].append(None)
            out["rdatas"].append(None)
            out["rdatas6"].append(None)
            out["cnames"].append(None)
        else:
            rcode, r4, r6, cn = parsed
            out["rcode"].append(rcode)
            out["rdatas"].append(r4)
            out["rdatas6"].append(r6)
            out["cnames"].append(cn)
    return pd.DataFrame(out)


@pandas_udf(DNS_ANSWER_SCHEMA)
def parse_dns_answer(answers: pd.Series) -> pd.DataFrame:
    """Arrow-batched UDF: base64 answer → struct(rcode,rdatas,rdatas6,cnames).

    Memoized per executor (bounded lru): real query logs repeat
    byte-identical packets for a TTL window, so hits track the
    resolver's cache rate (r16 microbench, 200k rows: 135× on a
    64-variant pareto-tailed packet mix, but 1.4× *overhead* when every
    packet is distinct — use parse_dns_answer_nomemo for
    by-construction-unique packets)."""
    return _parse_series(answers, _parse_cached)


@pandas_udf(DNS_ANSWER_SCHEMA)
def parse_dns_answer_nomemo(answers: pd.Series) -> pd.DataFrame:
    """parse_dns_answer without the lru memo, for callers whose packets
    are known ~all-distinct (e.g. per-row synthesized packets): on that
    input the cache can never hit, so its hash+insert+evict cycle is
    pure overhead (measured 1.4× the parse wall at 65536 entries)."""
    return _parse_series(answers, _parse_raw)


def with_dns_answer(col: Column | str) -> Column:
    """Column expression: parsed DNS struct for a base64 answer column."""
    c = F.col(col) if isinstance(col, str) else col
    return parse_dns_answer(c)


# ---------------------------------------------------------------------------
# Encoder — used only by tests/fixtures to build deterministic packets
# (the reference builds none; FIXTURES.md §A1 requires a corpus).
# ---------------------------------------------------------------------------

def _encode_name(name: str) -> bytes:
    out = b""
    for label in name.rstrip(".").split("."):
        if label:
            out += bytes([len(label)]) + label.encode("ascii")
    return out + b"\x00"


def build_answer(
    qname: str = "example.com",
    rcode: int = 0,
    a: list[str] = (),
    aaaa: list[str] = (),
    cname: list[str] = (),
    txt: list[str] = (),
) -> bytes:
    """Build a minimal DNS response message (no compression)."""
    rrs: list[bytes] = []

    def rr(rtype: int, rdata: bytes) -> bytes:
        return (
            _encode_name(qname)
            + struct.pack(">HHIH", rtype, 1, 300, len(rdata))
            + rdata
        )

    for ip in a:
        rrs.append(rr(_TYPE_A, ipaddress.IPv4Address(ip).packed))
    for ip in aaaa:
        rrs.append(rr(_TYPE_AAAA, ipaddress.IPv6Address(ip).packed))
    for name in cname:
        rrs.append(rr(_TYPE_CNAME, _encode_name(name)))
    for t in txt:
        enc = t.encode()
        rrs.append(rr(_TYPE_TXT, bytes([len(enc)]) + enc))
    header = struct.pack(">HHHHHH", 0x1234, 0x8180 | (rcode & 0xF), 1, len(rrs), 0, 0)
    question = _encode_name(qname) + struct.pack(">HH", 1, 1)
    return header + question + b"".join(rrs)


def build_answer_b64(**kwargs) -> str:
    return base64.b64encode(build_answer(**kwargs)).decode()
