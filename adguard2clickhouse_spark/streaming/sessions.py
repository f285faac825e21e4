"""Custom stateful streaming operator: gap-based sessionization.

The reference keeps no per-key state in the collector (SURVEY.md §2.9
— all state lives in the sink), so this is an extension operator: the
canonical "operator Spark's declarative surface can't express" —
per-user sessions that close after a 30-minute silence — implemented
with ``applyInPandasWithState`` (Arrow-batched, state store backed,
event-time timeouts driven by the watermark).

Batch twin: ``__spark_entry__.q_sessions`` (lag + cumulative markers)
— the driver cross-checks that shape against DuckDB; this streaming
form is validated by the test suite feeding the same rows through an
``availableNow`` stream and comparing closed sessions.

Scale notes (1000 executors, 100 TB):
- state is per user_id, hash-partitioned by the state store; each key
  holds 3 longs — no unbounded growth, eviction via event-time timeout
  at watermark + gap;
- Arrow batches cross the Python boundary once per (partition, trigger),
  not per row;
- the watermark bounds both late data and state lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
# epoch-second longs: minimal, Arrow-friendly state row
STATE_SCHEMA = "start_s bigint, last_s bigint, n bigint"


def _to_epoch_s(series: pd.Series) -> pd.Series:
    return series.astype("datetime64[ns]").astype("int64") // 1_000_000_000


def _sessionize_group(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    closed: list[tuple[int, int, int, int]] = []  # (uid, start, end, n)

    if state.hasTimedOut:
        start_s, last_s, n = state.get
        closed.append((user_id, start_s, last_s, n))
        state.remove()
    else:
        ts_all: list[int] = []
        for pdf in pdf_iter:
            ts_all.extend(_to_epoch_s(pdf["ts"]).tolist())
        ts_all.sort()

        if state.exists:
            start_s, last_s, n = state.get
        else:
            start_s = last_s = ts_all[0]
            n = 0
            # n counts events folded into (start_s..last_s); seeding
            # with the first event keeps the loop below uniform
        for t in ts_all:
            if n > 0 and t - last_s > SESSION_GAP_S:
                closed.append((user_id, start_s, last_s, n))
                start_s, last_s, n = t, t, 1
            else:
                last_s = max(last_s, t)
                n += 1
        state.update((start_s, last_s, n))
        # Evict when the watermark passes the gap after the last event.
        # Clamp to watermark+1: Spark does NOT pre-filter rows older
        # than the watermark for this operator, so a straggler event
        # could put last_s + gap behind the current watermark, and a
        # timeout timestamp ≤ watermark raises and fails the whole
        # streaming query. The clamp closes such a session at the next
        # trigger instead.
        timeout_ms = (last_s + SESSION_GAP_S) * 1000
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )

    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
        yield out


def sessionize_stream(
    events: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """events stream → closed-session stream.

    A session closes either inline (a later event of the same user
    arrives past the gap) or by event-time timeout (the watermark
    passes last_event + gap). Open sessions stay in the state store.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
