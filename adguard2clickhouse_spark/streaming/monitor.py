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


# ---------------------------------------------------------------------------
# Codegen class-cache health (VERDICT r12 #4)
#
# `spark.sql.codegen.cache.maxEntries` is a JVM STATIC, read once at the
# JVM's first codegen from the then-active session's conf (get_spark
# sizes it to 2000 for the 184-query catalog — see session.py). The
# failure mode when the catalog outgrows it is SILENT: no error, no log
# line, just every repeated execution re-Janino-compiling its generated
# classes (~33% total slowdown on the 14-headliner sweep, measured in
# BENCH_codegen_cache_r12.json — the r11/r12 "session state" mystery).
# These helpers read the same CodegenMetrics the root-cause analysis
# used so a sweep can ASSERT steady state instead of rediscovering the
# regression by wall clock.
# ---------------------------------------------------------------------------


def codegen_cache_snapshot(spark) -> dict:
    """One reading of the JVM-static codegen state: generated-class
    cache occupancy and the cumulative Janino compile counter.

    ``max_entries`` is the SESSION's conf value — on a JVM whose first
    codegen ran under a different session it can disagree with the
    static cache's real capacity, which the JVM does not expose; the
    steady-state check below therefore keys on the compile COUNTER,
    never on occupancy-vs-capacity.
    """
    jvm = spark.sparkContext._jvm
    cache = (
        jvm.org.apache.spark.sql.catalyst.expressions.codegen
        .__getattr__("CodeGenerator$").__getattr__("MODULE$")
    ).cache()
    hist = (
        jvm.org.apache.spark.metrics.source
        .__getattr__("CodegenMetrics$").__getattr__("MODULE$")
    ).METRIC_COMPILATION_TIME()
    count = int(hist.getCount())
    # APPROXIMATE: Codahale exposes no monotonic total, only a SAMPLED
    # reservoir snapshot — mean×count drifts as the reservoir evicts,
    # so a begin/end delta of this figure can be off or even negative
    # (ADVICE r13). Pass/fail decisions key on the monotonic COUNTER
    # above; this ms figure is context only and is labeled as such.
    return {
        "cache_entries": int(cache.size()),
        "compile_count": count,
        "compile_total_ms_approx": round(
            hist.getSnapshot().getMean() * count, 1
        ),
        "max_entries": int(
            spark.conf.get("spark.sql.codegen.cache.maxEntries", "100")
        ),
    }


class CodegenSteadyStateCheck:
    """Detects codegen-cache thrash across a REPEATED workload.

    Usage: run the workload once (fills the cache and JIT), call
    ``begin()``, run the identical workload again, call ``end()`` —
    a steady-state pass compiles ZERO new classes, so any non-zero
    delta means the class cache is too small for the plan set and
    every future repetition pays the recompile tax. ``end()`` returns
    a human-readable warning string (None when healthy) and keeps the
    numbers on ``.delta`` for artifacts.
    """

    def __init__(self, spark):
        self._spark = spark
        self._t0 = None
        self.delta = None

    def begin(self) -> "CodegenSteadyStateCheck":
        self._t0 = codegen_cache_snapshot(self._spark)
        return self

    def end(self) -> str | None:
        t1 = codegen_cache_snapshot(self._spark)
        t0 = self._t0
        self.delta = {
            "steady_state_compiles": t1["compile_count"] - t0["compile_count"],
            # approximate (reservoir mean×count delta) — see snapshot
            # docstring; can be inaccurate, never used for pass/fail
            "steady_state_compile_ms_approx": round(
                t1["compile_total_ms_approx"] - t0["compile_total_ms_approx"],
                1,
            ),
            "cache_entries": t1["cache_entries"],
            "max_entries": t1["max_entries"],
        }
        d = self.delta
        if d["steady_state_compiles"] > 0:
            return (
                "CODEGEN-CACHE-THRASH: a repeated identical workload "
                f"compiled {d['steady_state_compiles']} generated classes "
                f"(~{d['steady_state_compile_ms_approx']} ms approx.) "
                "that a steady state "
                "compiles zero of - spark.sql.codegen.cache.maxEntries "
                f"(session conf: {d['max_entries']}, occupancy: "
                f"{d['cache_entries']}) is too small for this plan set; "
                "raise SPARK_GRAFT_CODEGEN_CACHE (the conf is a JVM "
                "static, effective only before the JVM's first codegen). "
                "Measured cost of ignoring this: ~33% on the 14-headliner "
                "sweep (BENCH_codegen_cache_r12.json)."
            )
        return None
