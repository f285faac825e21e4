"""The end-to-end streaming topology (SURVEY.md §3.1-3.2, §7 step 5).

Reference architecture being re-expressed:

    tailer.follow(querylog) ──► parse ──► INSERT log2          (collector.py:54-75)
                                            │ (per insert block)
                                            ├─► MV → blocked_domains   (README.md:31-40)
                                            ├─► MV → clients_stats     (README.md:52-62)
                                            └─► ... (7 MVs total)

Spark-first shape: ONE streaming query. Each micro-batch is the
"insert block"; inside foreachBatch the batch is persisted once and
fanned out to the fact append plus the eight aggregate deltas, each
additively folded into its summing sink — exactly the MV + Summing-
MergeTree contract, with no unbounded executor state (no state store),
which is what survives 100 TB: aggregation state lives in the sink,
keyed and compact, while Spark only ever holds one micro-batch.

Delivery: checkpointed source offsets + epoch-id-idempotent aggregate
upserts = exactly-once for aggregates, at-least-once for fact appends
(the reference is at-most-once: truncate-at-boot, fire-and-forget —
collector.py:45,52).

Late data: none of the aggregates needs a watermark — they are keyed
sums folded in the sink, unbounded in event time like ClickHouse
merges (SURVEY.md §2.9). stats2's 10-minute buckets are part of the
key, not window state.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from adguard2clickhouse_spark.operators.aggregates import (
    AGGREGATE_KEYS,
    ALL_AGGREGATES,
    fused_aggregate_deltas,
)
from adguard2clickhouse_spark.operators.parse import (
    parse_querylog_lines,
    split_dead_letter,
)
from adguard2clickhouse_spark.sinks.summing import SummingParquetSink
from adguard2clickhouse_spark.sources.querylog import read_querylog_stream


def aggregate_sinks(out_dir: str) -> dict[str, SummingParquetSink]:
    sinks = {}
    for name, keys in AGGREGATE_KEYS.items():
        measures = {
            "clients_stats": ["visited", "blocked"],
            "stats2": ["blocked", "visited"],
        }.get(name, ["count"])
        sinks[name] = SummingParquetSink(
            os.path.join(out_dir, name), keys=keys, measures=measures
        )
    return sinks


class QuerylogPipeline:
    """source dir → parse → fact append + 8 additive aggregates."""

    def __init__(self, spark: SparkSession, source_dir: str, out_dir: str,
                 checkpoint_dir: str | None = None, clickhouse=None,
                 custom_aggregates=None,
                 parse_parallelism: int | str | None = None,
                 dense_folds: bool | str = "auto",
                 fused_deltas: bool | str = "auto"):
        self.spark = spark
        # Micro-batches are small relative to the static shuffle-partition
        # count; AQE coalescing (on by default since Spark 3.2, explicit
        # in get_spark()) right-sizes every per-batch shuffle. We don't
        # flip conf on a session we don't own — without AQE the pipeline
        # is still correct, just runs more small tasks per batch.
        # The parse stage carries a pandas UDF: make sure a foreign
        # session's executors can import this package.
        from adguard2clickhouse_spark.session import ensure_executor_package

        ensure_executor_package(spark)
        self.source_dir = source_dir
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
        self.log2_path = os.path.join(out_dir, "log2")
        self.dead_letter_path = os.path.join(out_dir, "dead_letter")
        # Aggregate spec: the reference-parity eight by default, plus
        # any bring-your-own MVs — ``custom_aggregates`` is
        # {name: (fn, keys, measures)}, exactly what
        # functions.chsql.aggregates_from_clickhouse_ddl() returns from
        # a user's verbatim ClickHouse MV DDL. Custom entries with a
        # parity name override the built-in (the user's SQL wins).
        self.aggregates = dict(ALL_AGGREGATES)
        self.sinks = aggregate_sinks(out_dir)
        for name, (fn, keys, measures) in (custom_aggregates or {}).items():
            self.aggregates[name] = fn
            self.sinks[name] = SummingParquetSink(
                os.path.join(out_dir, name), keys=keys, measures=measures
            )
        # Optional ClickHouse fact insert (the reference's north-star
        # sink, src/collector.py:73-75): a foreachBatch-compatible
        # writer (sinks/clickhouse.py). Aggregates stay in the parquet
        # summing sinks — against a real ClickHouse the server-side MVs
        # fold them from this very insert, exactly like the reference.
        self.clickhouse = clickhouse
        # Optional round-robin repartition of the RAW LINES below the
        # parse. Hypothesis (r6): micro-batch partitioning follows the
        # file count per trigger (2 files = 2 partitions), starving the
        # UDF/encode/write stages of cores. MEASURED at 1M rows / 10
        # epochs on a quiet host: OFF 25.4-27.9k rows/s; 32 -> 20.9k;
        # 8 -> 22.4k — the added per-epoch exchange plus 8 sinks x more
        # shuffle-map tasks cost MORE than the parallelism buys, and
        # per-stage attribution shows parse_materialize barely moves
        # (the leg is dominated by scan + persist + job overhead, not
        # by per-row CPU). Same lesson as the r5 batch finding: don't
        # repartition your way out of a cost that isn't per-row CPU.
        # The knob stays for genuinely CPU-dense parses (real DNS blobs
        # rather than 5 memoized variants); round-robin repartition is
        # deterministic across epoch retries (sorts before exchanging),
        # so ClickHouse dedup tokens stay stable. "auto" =
        # defaultParallelism; int pins; None/0 (default) disables.
        if parse_parallelism == "auto":
            parse_parallelism = spark.sparkContext.defaultParallelism
        self.parse_parallelism = parse_parallelism or None
        # Per-sink fold strategy (ADVICE r6: r6 hardwired dense=True,
        # trading away the sink's documented O(touched-state) property
        # for every future caller). "auto" (default) decides PER EPOCH
        # PER SINK from data already on hand — the batch row count the
        # cache materialization produces anyway: a delta with
        # rows ≥ 4·n_buckets touches every bucket with near certainty
        # under the xxhash64 bucketing (P[missed bucket] ≤
        # n·e^(−rows/n) < 2% at 4×), so the discovery job can only
        # rediscover "all of them" — skip it. Below that, low-traffic
        # epochs and high-n_buckets sinks keep the sparse bucket-pruned
        # path that leaves untouched buckets byte-identical. True/False
        # pin the strategy for every sink.
        self.dense_folds = dense_folds
        # Fused grouping-sets delta computation (see process_batch).
        # "auto" (default) decides PER EPOCH from the batch row count:
        # same-day A/B pairs at 1M rows (r9) put the crossover between
        # 100k and 250k rows/epoch — per-sink wins at 100k (57.8s vs
        # fused 67.7s: the fan is merge+write-bound and the fused job
        # adds a serial stage), fused wins at 250k (41.8s vs 58.3s)
        # and 500k (median 24.1s vs 26.9s: eight full-input groupBys
        # get scan/delta-compute-bound before one grouping-sets pass
        # does). True/False pin the strategy; the fused plan itself is
        # driver-gated via a16_fused_mv_union.
        self.fused_deltas = fused_deltas
        self.fused_min_rows = 200_000
        # per-epoch stage walls appended by process_batch (see there)
        self.batch_timings: list[dict] = []

    def _dense_fold(self, sink: SummingParquetSink, n_rows: int) -> bool:
        """Per-epoch per-sink fold strategy (see ``dense_folds`` in
        ``__init__``): dense when the strategy is pinned True, sparse
        when pinned False. "auto" needs TWO signals (ADVICE r7: the
        raw row count alone is the wrong quantity — bucket coverage
        depends on the delta's distinct-KEY count, so a 100k-row epoch
        on one hot key would pick dense and rewrite every bucket,
        defeating the O(touched-state) property): (1) rows ≥
        4·n_buckets makes full coverage plausible, and (2) the sink's
        LAST sparse discovery actually observed a delta touching every
        bucket (``last_fold_touched_all``, measured for free by the
        discovery job). The first epoch therefore always runs sparse —
        one discovery job at startup buys the measurement; steady-state
        keyed traffic flips to dense on epoch 2, while hot-key traffic
        stays sparse for good. A traffic shift while dense goes
        unobserved (dense never measures) — that costs rewritten-but-
        identical buckets, never correctness."""
        if self.dense_folds == "auto":
            return (
                n_rows >= 4 * sink.n_buckets
                and sink.last_fold_touched_all is True
            )
        return bool(self.dense_folds)

    # -- the per-micro-batch body (the reference's "insert block") ----------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        import time as _time

        timings: dict[str, float] = {"epoch_id": epoch_id}

        def _mark(stage: str, t0: float) -> float:
            now = _time.time()
            timings[stage] = round(now - t0, 3)
            return now

        def _timed(stage: str, fn):
            def run():
                t0 = _time.time()
                out = fn()
                timings[stage] = round(_time.time() - t0, 3)
                return out

            return run

        batch_df.persist()
        try:
            t = _time.time()
            good, dead = split_dead_letter(batch_df)
            # Materialize the cache eagerly: the fan-out below submits
            # jobs from several threads at once, and each would
            # otherwise race to compute the (UDF-bearing) parse lineage.
            n_good = good.persist().count()
            t = _mark("parse_materialize_s", t)

            def _fact_append():
                # fact append, partitioned by event date and sorted by
                # time within files — the MergeTree ORDER BY date_time
                # analog (README.md:21): date partitions prune
                # time-range scans, in-file ordering gives parquet
                # min/max row-group skipping.
                (
                    good.withColumn("date", F.to_date("date_time"))
                    .sortWithinPartitions("date_time")
                    .write.mode("append")
                    .partitionBy("date")
                    .parquet(self.log2_path)
                )

            def _dead_letter():
                # dead-letter channel (K3, collector.py:76-78)
                dead.write.mode("append").parquet(self.dead_letter_path)

            def _clickhouse():
                # the reference's per-block insert, batched: one POST of
                # RowBinary per executor partition instead of one HTTP
                # round-trip per row (collector.py:73-75)
                self.clickhouse.insert_batch(
                    good, "log2", dedup_token=f"log2_epoch_{epoch_id}"
                )

            # At-least-once contract: the fact append is NOT
            # epoch-idempotent — if any step in this batch fails and
            # Structured Streaming retries the epoch, log2 parquet can
            # receive the block twice (the additive summing sinks
            # dedupe by epoch_id; parquet appends cannot without a
            # table format's transaction log). Mitigations, in order:
            # the ingest-side dedupe_horizon guard drops re-delivered
            # source lines; the ClickHouse insert passes a
            # deterministic insert_deduplication_token per (epoch,
            # partition) so the SERVER drops retried blocks; and
            # downstream readers can dedupe on the natural key
            # (date_time, QH, name) if exact-once parquet facts are
            # required. Running the consumers concurrently does not
            # change this contract: failure of ANY of them fails the
            # batch before the offset commit, exactly as sequential
            # failure between stages did.

            # Delta computation: per-sink groupBys vs ONE fused
            # grouping-sets pass (fused_aggregate_deltas, VERDICT r6
            # #4), decided per epoch under "auto" (see __init__ for
            # the measured crossover). Small epochs are fan
            # merge+write-bound — the fused job only adds a serial
            # stage; large epochs are delta-compute-bound — eight full
            # re-scans of the cached batch cost more than one
            # grouping-sets pass. The fused plan applies only to the
            # stock aggregate set (custom MVs have no extractor).
            if self.fused_deltas == "auto":
                use_fused = n_good >= self.fused_min_rows
            else:
                # truthy pins fuse (bool(1) counted before the auto
                # mode existed and must keep counting)
                use_fused = bool(self.fused_deltas)
            fused = None
            if use_fused and all(
                ALL_AGGREGATES.get(name) is fn
                for name, fn in self.aggregates.items()
            ):
                fused, extract = fused_aggregate_deltas(good)
                fused.persist().count()
                t = _mark("fused_delta_s", t)
                deltas = {
                    name: extract[name](fused) for name in self.aggregates
                }
            else:
                deltas = {
                    name: fn(good) for name, fn in self.aggregates.items()
                }

            # ONE overlapped section: fact append, dead-letter append,
            # ClickHouse POSTs and the 8 additive sink folds are
            # independent consumers of the materialized caches, so they
            # run as concurrent Spark jobs (r7, VERDICT r6 #4): the
            # epoch wall becomes parse + max(consumer) instead of
            # parse + Σ(consumers). Each consumer is still timed
            # individually; `overlap_section_s` records the section's
            # real elapsed wall (the critical path, normally the fan).
            def _fold(name):
                return lambda: self.sinks[name].apply_delta(
                    deltas[name],
                    epoch_id,
                    dense=self._dense_fold(self.sinks[name], n_good),
                )

            consumers = [
                _timed("fact_append_s", _fact_append),
                _timed("dead_letter_s", _dead_letter),
            ]
            if self.clickhouse is not None:
                consumers.append(_timed("clickhouse_insert_s", _clickhouse))
            def _fan():
                with ThreadPoolExecutor(
                    max_workers=len(self.aggregates)
                ) as pool:
                    fs = [pool.submit(_fold(n)) for n in self.aggregates]
                    for f in fs:
                        f.result()

            consumers.append(_timed("aggregate_fan_s", _fan))
            try:
                with ThreadPoolExecutor(max_workers=len(consumers)) as pool:
                    futures = [pool.submit(c) for c in consumers]
                    for f in futures:
                        f.result()  # propagate first failure, fail the batch
            finally:
                if fused is not None:
                    fused.unpersist()
            timings["overlap_section_s"] = round(_time.time() - t, 3)
            good.unpersist()
            # Per-epoch stage wall attribution (driver-side). The
            # consumer stages OVERLAP: their individual walls sum to
            # more than the section wall; `overlap_section_s` is the
            # real elapsed time of the fan-out. Bounded: epochs are few
            # per process and each dict is ~8 floats — bench harnesses
            # read and reset it.
            self.batch_timings.append(timings)
        finally:
            batch_df.unpersist()

    # -- run -----------------------------------------------------------------
    def start(
        self,
        available_now: bool = False,
        processing_time: str = "5 seconds",
        max_files_per_trigger: int | None = None,
        dedupe_horizon: str | None = None,
    ) -> StreamingQuery:
        raw = read_querylog_stream(
            self.spark, self.source_dir, max_files_per_trigger=max_files_per_trigger
        )
        if dedupe_horizon is not None:
            # Ingest-side dedup (at-least-once sources, re-spooled files):
            # one row per raw line within the horizon, keyed on the line
            # itself. Ingest-time watermark (the raw text carries no
            # parsed event time yet) bounds the state store; the additive
            # sinks downstream are epoch-idempotent but NOT re-delivery-
            # idempotent, which is exactly what this guard closes.
            raw = (
                raw.withColumn("_ingest_ts", F.current_timestamp())
                .withWatermark("_ingest_ts", dedupe_horizon)
                .dropDuplicatesWithinWatermark(["value"])
                .drop("_ingest_ts")
            )
        if self.parse_parallelism:
            raw = raw.repartition(self.parse_parallelism)
        parsed = parse_querylog_lines(raw)
        writer = (
            parsed.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            # the micro-batch interval is the analog of the reference's
            # server-side async-insert buffering (collector.py:52)
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_available(self, dedupe_horizon: str | None = None) -> None:
        """Process everything currently in the source dir, then stop."""
        q = self.start(available_now=True, dedupe_horizon=dedupe_horizon)
        q.awaitTermination()

    # -- read API (SURVEY.md §3.3) -------------------------------------------
    def read_aggregate(self, name: str) -> DataFrame | None:
        return self.sinks[name].read(self.spark)

    def sql(self, query: str) -> DataFrame:
        """Query the engine's tables in ClickHouse dialect — the SELECT
        side of drop-in parity. Registers every aggregate sink plus
        ``log2`` as temp views, the ClickHouse function shims
        (functions/chsql.py), and transpiles the dialect differences
        (1-based ``expr[n]``, db prefixes, array ``length``), so a
        query a reference user runs against their ClickHouse today —
        e.g. ``SELECT QH, count FROM blocked_domains ORDER BY count
        DESC LIMIT 10`` or anything using ``splitByChar`` /
        ``toStartOfInterval`` — runs unchanged here."""
        from adguard2clickhouse_spark.functions import chsql

        chsql.register_clickhouse_functions(self.spark)
        for name, sink in self.sinks.items():
            df = sink.read(self.spark)
            if df is not None:
                df.createOrReplaceTempView(name)
        if os.path.isdir(self.log2_path):
            self.read_log2().createOrReplaceTempView("log2")
        return self.spark.sql(chsql.transpile(query))

    def read_log2(self, merge_schema: bool = False) -> DataFrame:
        """``merge_schema=True`` reconciles files written before and
        after a column was added to the fact schema (parquet schema
        evolution) — older rows surface the new column as null. Off by
        default: the merged-footer listing costs a full file-footer
        pass, which at 100 TB you pay only when evolution happened."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(self.log2_path)

    # -- maintenance ---------------------------------------------------------
    def rebuild_aggregates(self, names: list[str] | None = None) -> None:
        """Backfill aggregate tables from the fact table — the recovery
        path ClickHouse's insert-triggered MVs don't have (an MV created
        late, a corrupted SummingMergeTree, a changed aggregate formula
        all require manual INSERT SELECT surgery there; README.md:24-189
        defines them insert-time-only). Here the fact table is the
        source of truth: recompute any aggregate wholesale and swap it
        in atomically via the sink's versioned pointer. Streaming can
        keep appending — the next epoch folds onto the rebuilt base."""
        log2 = self.read_log2().persist()
        try:
            for name in names or list(self.aggregates):
                sink = self.sinks[name]
                sink.replace(self.aggregates[name](log2))
        finally:
            log2.unpersist()

    def _dead_letter_digest(self) -> str:
        """Deterministic identity of the CURRENT dead-letter directory:
        file names + sizes + a CRC of each file's CONTENT. Stable across
        retries of one replay (the directory is only swapped at the very
        end, so a crashed replay re-reads identical bytes), different
        for any later replay — including the pathological case of two
        distinct dead-letter populations whose (name, size) listings
        happen to coincide, which a listing-only digest would conflate
        and wrongly skip. Dead-letter directories hold failed lines only,
        so hashing their content is cheap relative to the replay itself.

        The token is checked against ``SummingParquetSink``'s
        ``replay_tokens`` ledger, which keeps the most recent 1000
        entries (see ``applied_token`` for the window contract)."""
        import zlib

        listing = []
        for root, _dirs, files in os.walk(self.dead_letter_path):
            rel = os.path.relpath(root, self.dead_letter_path)
            for f in sorted(files):
                p = os.path.join(root, f)
                crc = 0
                with open(p, "rb") as fh:
                    while chunk := fh.read(1 << 20):
                        crc = zlib.crc32(chunk, crc)
                listing.append((rel, f, os.path.getsize(p), crc))
        return f"replay-{zlib.crc32(repr(sorted(listing)).encode()):08x}"

    def replay_dead_letters(self, mode: str = "delta") -> dict:
        """Re-parse the dead-letter channel — the operational recovery
        the reference cannot do (its failed lines go to stdout and are
        gone, src/collector.py:76-78). Lines that NOW parse (after a
        parser fix / upstream repair) are appended to log2 and folded
        into every aggregate; lines that still fail replace the
        dead-letter channel.

        ``mode="delta"`` (default): the recovered lines flow through
        the SAME additive fan-out as a streaming micro-batch, under a
        replay token derived from the dead-letter directory digest —
        only the hash buckets the delta touches are rewritten, so at
        100 TB a replay of 100 lines costs 100 lines, not a rescan of
        the entire fact history (VERDICT r4 #3). A crashed replay can
        be re-run: sinks that already folded this token no-op
        (``applied_token``), sinks that didn't fold now; untouched
        buckets' files are never rewritten (byte-identical — asserted
        in tests/test_streaming.py). The token ledger is separate from
        stream epochs on purpose — see ``SummingParquetSink.applied_token``.

        ``mode="rebuild"``: full recompute from the fact table via
        ``rebuild_aggregates`` — the right tool when the aggregate
        FORMULA changed (a delta cannot express that fix).

        Run while the stream is stopped (the dead-letter directory is
        rewritten in place). The fact append itself is at-least-once
        (plain parquet has no transaction log — same documented
        contract as the streaming fact append; the ClickHouse insert
        carries a deterministic dedup token so the server drops a
        retried block). Returns {"replayed", "still_dead"}.
        """
        import shutil
        import tempfile

        if mode not in ("delta", "rebuild"):
            raise ValueError(f"unknown replay mode: {mode!r}")
        if not os.path.isdir(self.dead_letter_path):
            return {"replayed": 0, "still_dead": 0}
        from adguard2clickhouse_spark.operators.parse import parse_querylog

        dead = self.spark.read.parquet(self.dead_letter_path)
        good, still_dead = parse_querylog(dead, "raw_line")
        good.persist()
        try:
            n_good = good.count()
            token = self._dead_letter_digest()
            # materialize the survivors BEFORE touching the source dir
            tmp = tempfile.mkdtemp(dir=self.out_dir)
            still_path = os.path.join(tmp, "dead_letter")
            still_dead.write.parquet(still_path)
            n_dead = self.spark.read.parquet(still_path).count()
            if n_good:
                (
                    good.withColumn("date", F.to_date("date_time"))
                    .sortWithinPartitions("date_time")
                    .write.mode("append")
                    .partitionBy("date")
                    .parquet(self.log2_path)
                )
                if self.clickhouse is not None:
                    self.clickhouse.insert_batch(good, "log2", dedup_token=token)
                if mode == "delta":
                    with ThreadPoolExecutor(
                        max_workers=len(self.aggregates)
                    ) as pool:
                        futures = [
                            pool.submit(
                                self.sinks[name].apply_delta, fn(good), None, token
                            )
                            for name, fn in self.aggregates.items()
                        ]
                        for f in futures:
                            f.result()
        finally:
            # a failed append/insert/fold must not leave the parsed frame
            # pinned in executor memory for the rest of the session
            good.unpersist()
        shutil.rmtree(self.dead_letter_path)
        os.replace(still_path, self.dead_letter_path)
        shutil.rmtree(tmp, ignore_errors=True)
        if n_good and mode == "rebuild":
            self.rebuild_aggregates()
        return {"replayed": n_good, "still_dead": n_dead}
