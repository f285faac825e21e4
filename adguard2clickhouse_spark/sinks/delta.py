"""Delta Lake adapter for the fact-sink contract (VERDICT r11 #5).

Implements ``sinks/contract.py``'s documented Delta mapping so a
cluster deployment can pass ``QuerylogPipeline(...,
fact_sink_factory=lambda p, **kw: DeltaFactSink(p, **kw))`` and keep
the identical exactly-once semantics over s3://…/abfss:// paths:

- **append(epoch_id)** rides Delta's idempotent-writes contract
  (``txnAppId``/``txnVersion`` write options — a version ≤ the
  recorded one no-ops inside Delta's commit protocol) AND carries this
  sink's ledger (epoch window/hwm, token window, generation, stream
  identity) in the commit's ``userMetadata``, so one atomic Delta
  commit plays the role of the local sink's pointer write.
- **applied/applied_token/generation** read the ledger back from the
  most recent commit carrying one (``DESCRIBE HISTORY``): foreign
  commits (OPTIMIZE from another tool) interleave harmlessly because
  every commit THIS sink makes re-carries the full ledger.
- **replace** = ``mode("overwrite")`` (+ ``overwriteSchema``) with the
  ledger carried over — ledgers survive the swap, generation bumps
  only when asked.
- **compact** = ``DeltaTable.optimize().executeCompaction()`` — a
  dataChange=false commit readers skip; Delta's VACUUM retention
  replaces the local sink's ``trash_retention_s``. ``small_bytes`` /
  ``max_fold_slots`` are accepted and ignored: OPTIMIZE is already
  incremental (it bin-packs only under-sized files).

STATUS: exercised by the delta-gated leg of
``tests/test_fact_sink_contract.py`` — ``delta-spark`` is NOT
installed in this build sandbox, so that leg has never run here; the
class refuses to construct without it rather than pretending (the
same hard-error policy as the multimodal decode stubs). Run the
contract suite on a cluster image with delta-spark before relying on
it.
"""

from __future__ import annotations

import importlib.util
import json

from pyspark.sql import DataFrame, SparkSession

from adguard2clickhouse_spark.sinks.contract import FactSink

_MAX_TRACKED = 1000
_LEDGER_KEY = "adguard2clickhouse_spark_ledger_v1"


class DeltaFactSink(FactSink):
    def __init__(
        self,
        path: str,
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
        stream_id: str | None = None,
    ):
        if importlib.util.find_spec("delta") is None:
            raise ImportError(
                "DeltaFactSink needs the delta-spark package (and a "
                "SparkSession built with configure_spark_with_delta_pip "
                "or the Delta runtime). It is not installed in this "
                "environment — use the default LedgeredFactSink on "
                "local paths, or install delta-spark on the cluster."
            )
        self.path = path
        self.partition_by = list(partition_by or [])
        self.sort_within = list(sort_within or [])
        self.stream_id = stream_id

    # -- ledger in commit userMetadata ------------------------------------
    def _empty_ledger(self) -> dict:
        return {
            "epochs": [],
            "epoch_hwm": None,
            "tokens": [],
            "generation": 0,
            "stream_id": None,
        }

    def _table(self, spark: SparkSession):
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(spark, self.path):
            return None
        return DeltaTable.forPath(spark, self.path)

    def _ledger(self, spark: SparkSession) -> dict:
        """Most recent commit carrying this sink's ledger; foreign
        commits in between are skipped (ours always re-carry it)."""
        t = self._table(spark)
        if t is None:
            return self._empty_ledger()
        for row in t.history().select("userMetadata").collect():
            meta = row["userMetadata"]
            if not meta:
                continue
            try:
                parsed = json.loads(meta)
            except ValueError:
                continue
            if _LEDGER_KEY in parsed:
                ledger = self._empty_ledger()
                ledger.update(parsed[_LEDGER_KEY])
                return self._scope(ledger)
        return self._empty_ledger()

    def _scope(self, ledger: dict) -> dict:
        # identical identity-scoping rules to LedgeredFactSink
        if self.stream_id is None:
            return ledger
        prev = ledger.get("stream_id")
        if prev is None:
            return {**ledger, "stream_id": self.stream_id}
        if prev != self.stream_id:
            return {
                **ledger,
                "stream_id": self.stream_id,
                "epochs": [],
                "epoch_hwm": None,
            }
        return ledger

    def _user_metadata(self, ledger: dict) -> str:
        return json.dumps({_LEDGER_KEY: ledger})

    def _writer(self, df: DataFrame, ledger: dict, mode: str):
        out = df
        if self.sort_within:
            out = out.sortWithinPartitions(*self.sort_within)
        w = (
            out.write.format("delta")
            .mode(mode)
            .option("userMetadata", self._user_metadata(ledger))
        )
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w

    # -- contract ----------------------------------------------------------
    def append(
        self,
        df: DataFrame,
        epoch_id: int | None = None,
        token: str | None = None,
    ) -> bool:
        spark = df.sparkSession
        ledger = self._ledger(spark)
        hwm = ledger["epoch_hwm"]
        if epoch_id is not None and (
            epoch_id in ledger["epochs"] or (hwm is not None and epoch_id <= hwm)
        ):
            return False
        if token is not None and token in ledger["tokens"]:
            return False
        if epoch_id is not None:
            ledger["epochs"] = (ledger["epochs"] + [epoch_id])[-_MAX_TRACKED:]
            ledger["epoch_hwm"] = (
                epoch_id if hwm is None else max(hwm, epoch_id)
            )
        if token is not None:
            ledger["tokens"] = (ledger["tokens"] + [token])[-_MAX_TRACKED:]
        # NOTE for the gated contract run: an EMPTY-frame append must
        # still produce a Delta commit (the ledger update rides the
        # commit's userMetadata — losing it would un-record the epoch
        # and break applied()). Delta commits appends of zero files on
        # an existing table and creates the table on a missing one; if
        # a Delta version is found skipping empty commits, write the
        # ledger via an explicit no-op commit instead. This is exactly
        # the behavior test_contract_empty_epoch_records_id pins.
        w = self._writer(df, ledger, "append")
        if epoch_id is not None:
            # belt + suspenders: Delta's own idempotent-writes guard
            # (covers a concurrent writer this driver-side ledger
            # read-modify-write cannot see)
            w = w.option(
                "txnAppId", self.stream_id or f"facts:{self.path}"
            ).option("txnVersion", epoch_id)
        w.save(self.path)
        return True

    def applied(self, epoch_id: int) -> bool:
        spark = SparkSession.getActiveSession()
        ledger = self._ledger(spark)
        hwm = ledger["epoch_hwm"]
        return epoch_id in ledger["epochs"] or (
            hwm is not None and epoch_id <= hwm
        )

    def applied_token(self, token: str) -> bool:
        spark = SparkSession.getActiveSession()
        return token in self._ledger(spark)["tokens"]

    def read(
        self, spark: SparkSession, merge_schema: bool = False
    ) -> DataFrame | None:
        """None when no committed DATA exists — not merely before the
        table exists: an empty-epoch append may have created the table
        with zero rows (it must still commit, to carry the ledger),
        and the contract (test_contract_empty_epoch_records_id) reads
        that state as None exactly like the ledgered sink's empty
        dirs-list. The emptiness probe is one take(1) job; mergeSchema
        is native to Delta (the snapshot schema already spans
        evolution)."""
        if self._table(spark) is None:
            return None
        df = spark.read.format("delta").load(self.path)
        return df if df.take(1) else None

    def has_data(self) -> bool:
        spark = SparkSession.getActiveSession()
        t = self._table(spark)
        if t is None:
            return False
        return bool(t.toDF().take(1))

    def replace(self, df: DataFrame, bump_generation: bool = False) -> None:
        spark = df.sparkSession
        ledger = self._ledger(spark)
        if bump_generation:
            ledger["generation"] += 1
        (
            self._writer(df, ledger, "overwrite")
            .option("overwriteSchema", "true")
            .save(self.path)
        )

    def generation(self) -> int:
        spark = SparkSession.getActiveSession()
        return self._ledger(spark)["generation"]

    def compact(
        self,
        spark: SparkSession,
        small_bytes: int | None = None,
        max_fold_slots: int | None = None,
    ) -> int:
        if max_fold_slots is not None and max_fold_slots < 2:
            raise ValueError("max_fold_slots must be >= 2")
        t = self._table(spark)
        if t is None:
            return 0
        metrics = t.optimize().executeCompaction()
        try:
            row = metrics.collect()[0]
            return int(row["metrics"]["numFilesRemoved"])
        except Exception:  # noqa: BLE001 — metrics shape varies by version
            return 0
