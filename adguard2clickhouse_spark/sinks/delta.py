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

ARCHITECTURE (r13, VERDICT r12 #2): everything that touches
delta-spark lives behind ``DeltaCommitLayer`` — five thin calls
(is_table / history_user_metadata / write / read / optimize_compact)
with Delta's documented commit semantics. The sink's OWN logic —
ledger scoping, epoch/token idempotence, hwm, generation bumps,
empty-epoch commits — is pure Python over that seam, so the sandbox
(which has no delta-spark and cannot pip-install it) executes it
under the contract suite against a faithful fake commit layer
(``tests/test_fact_sink_contract.py::FakeDeltaCommitLayer``: atomic
versioned commits over parquet, txnAppId/txnVersion no-op guard,
foreign dataChange=false commits, crash injection between data write
and commit record). The REAL layer remains delta-spark verbatim and
still hard-errors when the package is missing — it has never run in
this sandbox and says so; run the suite on a cluster image with
delta-spark before relying on it.
"""

from __future__ import annotations

import importlib.util
import json

from pyspark.sql import DataFrame, SparkSession

from adguard2clickhouse_spark.sinks.contract import FactSink

_MAX_TRACKED = 1000
_LEDGER_KEY = "adguard2clickhouse_spark_ledger_v1"


class DeltaCommitLayer:
    """The exact delta-spark surface ``DeltaFactSink`` consumes.

    Semantics a substitute layer must honor (these are Delta's own,
    and the fake in the contract suite implements them):

    - ``write`` is ATOMIC: either a new table version exists carrying
      ``user_metadata`` (and the data change), or nothing does.
    - When ``txn_app_id``/``txn_version`` are passed and the table has
      already recorded a version ≥ ``txn_version`` for that app id,
      the ENTIRE commit no-ops (Delta idempotent writes) — including
      the userMetadata.
    - ``history_user_metadata`` returns one entry per commit, newest
      first, ``None`` for commits without userMetadata (foreign
      writers, OPTIMIZE).
    - ``optimize_compact`` rewrites files without changing table
      content (dataChange=false) and makes its own commit WITHOUT
      userMetadata.
    """

    def __init__(self):
        if importlib.util.find_spec("delta") is None:
            raise ImportError(
                "DeltaFactSink needs the delta-spark package (and a "
                "SparkSession built with configure_spark_with_delta_pip "
                "or the Delta runtime). It is not installed in this "
                "environment — use the default LedgeredFactSink on "
                "local paths, or install delta-spark on the cluster."
            )

    def is_table(self, spark: SparkSession, path: str) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(spark, path)

    def history_user_metadata(self, spark: SparkSession, path: str) -> list:
        from delta.tables import DeltaTable

        t = DeltaTable.forPath(spark, path)
        return [
            row["userMetadata"]
            for row in t.history().select("userMetadata").collect()
        ]

    def write(
        self,
        df: DataFrame,
        path: str,
        *,
        mode: str,
        user_metadata: str,
        partition_by: list[str],
        sort_within: list[str],
        txn_app_id: str | None = None,
        txn_version: int | None = None,
        overwrite_schema: bool = False,
    ) -> None:
        out = df
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        w = (
            out.write.format("delta")
            .mode(mode)
            .option("userMetadata", user_metadata)
            # the contract allows schema evolution across epochs
            # (test_contract_merge_schema_read_spans_evolution); plain
            # Delta appends REJECT new columns without this option
            .option("mergeSchema", "true")
        )
        if partition_by:
            w = w.partitionBy(*partition_by)
        if txn_app_id is not None:
            w = w.option("txnAppId", txn_app_id).option(
                "txnVersion", txn_version
            )
        if overwrite_schema:
            w = w.option("overwriteSchema", "true")
        w.save(path)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.format("delta").load(path)

    def optimize_compact(self, spark: SparkSession, path: str) -> int:
        from delta.tables import DeltaTable

        t = DeltaTable.forPath(spark, path)
        metrics = t.optimize().executeCompaction()
        try:
            row = metrics.collect()[0]
            return int(row["metrics"]["numFilesRemoved"])
        except Exception:  # noqa: BLE001 — metrics shape varies by version
            return 0


class DeltaFactSink(FactSink):
    def __init__(
        self,
        path: str,
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
        stream_id: str | None = None,
        commit_layer: DeltaCommitLayer | None = None,
    ):
        # Constructing the default layer hard-errors without
        # delta-spark (never fakes); an injected layer carries its own
        # guarantees (the contract suite's fake documents them).
        self._io = commit_layer if commit_layer is not None else DeltaCommitLayer()
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

    def _ledger(self, spark: SparkSession) -> dict:
        """Most recent commit carrying this sink's ledger; foreign
        commits in between are skipped (ours always re-carry it)."""
        if not self._io.is_table(spark, self.path):
            return self._empty_ledger()
        for meta in self._io.history_user_metadata(spark, self.path):
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
        #
        # txnAppId/txnVersion (epoch appends only): belt + suspenders —
        # Delta's own idempotent-writes guard covers a concurrent
        # writer this driver-side ledger read-modify-write cannot see.
        self._io.write(
            df,
            self.path,
            mode="append",
            user_metadata=self._user_metadata(ledger),
            partition_by=self.partition_by,
            sort_within=self.sort_within,
            txn_app_id=(
                (self.stream_id or f"facts:{self.path}")
                if epoch_id is not None
                else None
            ),
            txn_version=epoch_id,
        )
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
        if not self._io.is_table(spark, self.path):
            return None
        df = self._io.read(spark, self.path)
        return df if df.take(1) else None

    def has_data(self) -> bool:
        spark = SparkSession.getActiveSession()
        if not self._io.is_table(spark, self.path):
            return False
        return bool(self._io.read(spark, self.path).take(1))

    def replace(self, df: DataFrame, bump_generation: bool = False) -> None:
        spark = df.sparkSession
        ledger = self._ledger(spark)
        if bump_generation:
            ledger["generation"] += 1
        self._io.write(
            df,
            self.path,
            mode="overwrite",
            user_metadata=self._user_metadata(ledger),
            partition_by=self.partition_by,
            sort_within=self.sort_within,
            overwrite_schema=True,
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
        if not self._io.is_table(spark, self.path):
            return 0
        return self._io.optimize_compact(spark, self.path)
