"""Scalar function layer (SURVEY.md §2.6 O1-O10, §2.4 F-predicates).

Every ClickHouse scalar the reference's materialized views use,
re-expressed on Spark built-ins so they stay inside whole-stage
codegen — no Python in the hot path.
"""

from adguard2clickhouse_spark.functions.net import (
    IPV4_RE,
    IPV6_RE,
    is_ipv4_string,
    is_ipv6_string,
)
from adguard2clickhouse_spark.functions.strings import (
    array_rotate_right,
    split_by_char,
    tld,
)
from adguard2clickhouse_spark.functions.time import to_start_of_interval

__all__ = [
    "IPV4_RE",
    "IPV6_RE",
    "is_ipv4_string",
    "is_ipv6_string",
    "split_by_char",
    "array_rotate_right",
    "tld",
    "to_start_of_interval",
]
