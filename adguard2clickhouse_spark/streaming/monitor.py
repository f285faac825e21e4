"""Streaming observability: record per-batch progress.

The reference daemon's only signal is its stdout tracebacks; a
production stream needs rates and lag. Structured Streaming already
emits a progress event per micro-batch — this module just captures it
in-process so tests, ops scripts, and the collector can assert on
throughput without scraping logs.

At scale the same listener is where you export to a metrics backend:
override `publish` instead of buffering.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    processed_rows_per_second: float
    duration_ms: int


@dataclass
class ProgressRecorder(StreamingQueryListener):
    """Buffers one `BatchProgress` per micro-batch. Attach with
    ``spark.streams.addListener(rec)``; detach with
    ``spark.streams.removeListener(rec)`` (always detach — listeners
    outlive queries). Callbacks arrive asynchronously on a JVM thread:
    after ``awaitTermination`` poll `records` briefly rather than
    asserting immediately."""

    records: list[BatchProgress] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.publish(
            BatchProgress(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                processed_rows_per_second=p.processedRowsPerSecond or 0.0,
                duration_ms=sum(v for v in p.durationMs.values() if v),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def publish(self, progress: BatchProgress) -> None:
        """Buffer by default; override to ship to a metrics backend."""
        self.records.append(progress)

    def total_input_rows(self) -> int:
        return sum(r.num_input_rows for r in self.records)


def audit_observation(df, cols: list[str]):
    """(observed_df, observation): row count + per-column null counts
    that PIGGYBACK on whatever action consumes the frame — Spark's
    Observation computes the metrics inside the same job, so a write
    gets its data-quality audit for zero extra scans (vs the naive
    count()+write double read, which at 100 TB doubles the I/O bill).

    Read ``observation.get`` AFTER the consuming action finishes:
    {'n_rows': …, 'nulls_<col>': …}.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        .cast("long")
        .alias(f"nulls_{c}")
        for c in cols
    ]
    return df.observe(obs, *aggs), obs
