"""Query-log source (SURVEY.md §2.1 S1/S2).

The reference tails one growing file (``tailer.follow``,
/root/reference/src/collector.py:54) and truncates it at startup
(collector.py:45) — i.e. "latest offsets, no replay". Spark's file
source discovers appended *files*, so the production deployment is
log-rotation into a watched directory; that is what both readers here
consume. Checkpointed offsets (set by the streaming pipeline) replace
truncate-and-hope with exactly-once file tracking.

``maxFilesPerTrigger`` bounds micro-batch size so one giant backlog
doesn't produce one giant batch — the knob that matters at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_querylog_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch twin: all current log lines as a single-column text frame."""
    return spark.read.text(path)


def read_querylog_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a directory of rotated query-log files."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
