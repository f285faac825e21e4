"""Streaming deduplication with bounded state.

Event streams re-deliver: at-least-once sources, client retries,
replayed partitions. `dropDuplicatesWithinWatermark` keeps one row
per key among rows whose event times fall within the watermark
horizon of each other — the state store holds only in-horizon keys,
so memory is bounded by (arrival rate × horizon), not stream length.

This is the streaming twin of `operators/dedup.exact_dedup`, and the
front door a production topology puts BEFORE the summing sinks: the
additive upsert is idempotent per epoch but not per re-delivered
event; key-dedup at ingest is what makes re-sent events harmless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedupe_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """One row per ``keys`` among events within the watermark horizon;
    requires ``ts_col`` to be the event-time column of the stream."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
