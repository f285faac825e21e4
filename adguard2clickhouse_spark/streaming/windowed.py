"""Watermarked state-store aggregation — the design-(a) alternative.

SURVEY.md §2.5 A6 offers two streaming designs for stats2:
(a) state-store windowed aggregation with a watermark, or (b) the
stateless foreachBatch + additive summing sink the main pipeline uses
(pipeline.py). This module implements (a) for the tumbling 10-minute
window so both shapes exist and are tested against each other.

Semantic difference, stated precisely: (b) matches the reference
exactly — ClickHouse merges are unbounded in event time, late rows
always fold in (README.md:113-128 has no lateness bound). (a) trades
that for bounded state: rows later than the watermark are DROPPED and
finalized windows are immutable. At 100 TB the state store holds
(IP × active-window) rows — bounded by the watermark horizon — and
emits each window exactly once when it finalizes (append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats2_windowed_stream(
    log2_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of aggregates.stats2 via the state store.

    Emits one finalized row per (IP, 10-min window) once the watermark
    passes window end (append output mode).
    """
    return (
        log2_stream.withWatermark("date_time", watermark)
        .groupBy(F.col("IP"), F.window("date_time", "10 minutes").alias("_w"))
        .agg(
            F.sum(F.when(F.col("IsFiltered"), 1).otherwise(0))
            .cast("long")
            .alias("blocked"),
            F.sum(F.when(~F.col("IsFiltered"), 1).otherwise(0))
            .cast("long")
            .alias("visited"),
        )
        .select(
            "IP",
            F.col("_w.start").alias("date_time"),
            "blocked",
            "visited",
        )
    )
