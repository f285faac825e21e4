from __future__ import annotations

import datetime as dt

import pytest

from adguard2clickhouse_spark.schemas import LOG2_SCHEMA
from adguard2clickhouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="session")
def log2_df(spark):
    """Tiny hand-built fact table exercising every aggregate path."""
    rows = [
        # date_time, QH, QT, QC, CP, Upstream, IP, IsFiltered, Elapsed,
        # Cached, rcode, rdatas, rdatas6, cnames
        (ts(1), "ads.example.com", "A", "IN", "", "8.8.8.8:53", "10.0.0.1", True, 100, False, 0, ["1.2.3.4"], [], []),
        (ts(2), "ads.example.com", "A", "IN", "doh", "8.8.8.8:53", "10.0.0.2", True, 110, False, 0, [], [], []),
        (ts(3), "good.example.com", "A", "IN", "", "1.1.1.1:53", "10.0.0.1", False, 120, True, 0, ["5.6.7.8"], [], []),
        (ts(4), "good.example.com", "AAAA", "IN", "", "1.1.1.1:53", "10.0.0.1", False, 90, False, 0, [], ["2001:db8::1"], []),
        (ts(11), "nx.example.org", "A", "IN", "dot", "8.8.8.8:53", "10.0.0.2", False, 500, False, 3, [], [], []),
        (ts(12), "localhost", "A", "IN", "", "", "10.0.0.3", False, 10, True, 0, [], [], []),       # single label → excluded from tld
        (ts(13), "1.2.3.4", "PTR", "IN", "", "", "10.0.0.3", False, 20, False, 0, [], [], []),        # IPv4 literal → excluded
        (ts(14), "2001:db8::2", "AAAA", "IN", "", "", "10.0.0.3", True, 30, False, 2, [], [], []),    # IPv6 literal → excluded
    ]
    return spark.createDataFrame(rows, LOG2_SCHEMA)
