"""IP-literal predicates with ClickHouse semantics (SURVEY.md §2.6 O7).

The reference uses ``isIPv4String(QH)`` / ``isIPv6String(QH)`` inside
the tld_stats MV filter (/root/reference/README.md:148,168) to exclude
hostnames that are raw IP literals. ClickHouse's functions are
full-string matches, so the regexes are anchored.

Pure ``rlike`` keeps these JVM-side (whole-stage codegen); the Python
twins exist for oracle tests only.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F

# Dotted quad, each octet 0-255, full string.
_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"^({_OCTET}\.){{3}}{_OCTET}$"

# Full IPv6 incl. ::-compression and IPv4-mapped tails.
_H = r"[0-9A-Fa-f]{1,4}"
_V4 = rf"({_OCTET}\.){{3}}{_OCTET}"
IPV6_RE = (
    r"^("
    rf"({_H}:){{7}}{_H}"                         # 8 groups
    rf"|({_H}:){{1,7}}:"                          # 1-7 groups ::
    rf"|({_H}:){{1,6}}:{_H}"                      # :: 1 group
    rf"|({_H}:){{1,5}}(:{_H}){{1,2}}"
    rf"|({_H}:){{1,4}}(:{_H}){{1,3}}"
    rf"|({_H}:){{1,3}}(:{_H}){{1,4}}"
    rf"|({_H}:){{1,2}}(:{_H}){{1,5}}"
    rf"|{_H}:(:{_H}){{1,6}}"
    rf"|:((:{_H}){{1,7}}|:)"
    rf"|::([Ff]{{4}}(:0{{1,4}})?:)?{_V4}"         # IPv4-mapped ::ffff:a.b.c.d
    rf"|({_H}:){{1,4}}:{_V4}"                     # embedded IPv4
    r")$"
)


def is_ipv4_string(col: Column | str) -> Column:
    """``isIPv4String`` (README.md:148): anchored dotted-quad match.

    Deliberately a bare rlike: guarding the regex behind cheap
    prefilters (startswith-digit / contains-colon) was measured 2×
    SLOWER — anchored Java regex on short hostnames fails fast, and
    extra predicates just add per-row branches to the codegen'd loop."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(IPV4_RE)


def is_ipv6_string(col: Column | str) -> Column:
    """``isIPv6String`` (README.md:148): anchored full-IPv6 match."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(IPV6_RE)


# --- Python twins (oracles for tests; NOT used in Spark plans) -------------

def py_is_ipv4(s: str) -> bool:
    try:
        ipaddress.IPv4Address(s)
        return True
    except ValueError:
        return False


def py_is_ipv6(s: str) -> bool:
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False
