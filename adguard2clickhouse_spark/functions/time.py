"""Time-bucketing scalar (SURVEY.md §2.6 O6).

``toStartOfInterval(date_time, toIntervalMinute(10))`` appears in the
stats2 MV (/root/reference/README.md:122). Spark's ``window()`` is the
idiomatic form for streaming aggregation; this scalar twin exists for
batch queries and oracle parity (DuckDB ``time_bucket``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_start_of_interval(col: Column | str, minutes: int = 10) -> Column:
    """Truncate a timestamp down to the start of its N-minute bucket."""
    c = F.col(col) if isinstance(col, str) else col
    secs = minutes * 60
    return F.timestamp_seconds(
        (F.unix_timestamp(c) / secs).cast("long") * secs
    )
