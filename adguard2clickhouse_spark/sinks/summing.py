"""Additive "summing" sink — the SummingMergeTree contract natively.

In the reference, every insert block triggers the MVs to emit delta
rows into SummingMergeTree tables, and background merges fold rows
with equal ORDER BY keys by summing the numeric columns
(/root/reference/README.md:25-41 et al., SURVEY.md §2.8 C1/C2). This
sink is that contract on Parquet:

    apply_delta(delta_df, epoch_id):  state' = (state ∪ delta) ⊕ keys

with ⊕ = groupBy(keys).sum(measures). Correct because every reference
aggregate is a sum/count (order-insensitive, associative) — verified
by tests/test_aggregates.py::test_additivity_invariant.

Exactly-once: each table directory keeps a pointer file (atomic
os.replace) naming the current version directory and the set of
already-applied epoch ids; a foreachBatch retry with a seen epoch_id
is a no-op. This is the same idempotent-upsert discipline the
ClickHouse sink needs (there via idempotent inserts / replicated
dedup); the sink interface is pluggable so either backs the pipeline.

Scale: aggregate state is keyed and small relative to the fact stream
(domains, clients, TLDs — not events), so rewrite-on-merge is cheap;
the merge itself is a shuffle on the aggregate key only. At 100 TB the
same interface backs Delta MERGE or ClickHouse SummingMergeTree where
the fold is native.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "CURRENT.json"
_MAX_EPOCHS_TRACKED = 1000


class SummingParquetSink:
    def __init__(self, path: str, keys: list[str], measures: list[str]):
        self.path = path
        self.keys = keys
        self.measures = measures
        os.makedirs(path, exist_ok=True)

    # -- pointer management -------------------------------------------------
    def _pointer(self) -> dict:
        p = os.path.join(self.path, _POINTER)
        if not os.path.exists(p):
            return {"version": 0, "epochs": []}
        with open(p) as f:
            return json.load(f)

    def _write_pointer(self, meta: dict) -> None:
        tmp = os.path.join(self.path, f".{_POINTER}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, _POINTER))  # atomic

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version:08d}")

    # -- public API ----------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        meta = self._pointer()
        if meta["version"] == 0:
            return None
        return spark.read.parquet(self._data_dir(meta["version"]))

    def applied(self, epoch_id: int) -> bool:
        return epoch_id in self._pointer()["epochs"]

    def replace(self, full: DataFrame) -> None:
        """Swap in a wholesale recomputation (backfill/repair): write the
        new state as the next version and point at it atomically. The
        applied-epoch history is preserved so a concurrent stream's
        retried epoch is still recognized as folded-in."""
        meta = self._pointer()
        new_version = meta["version"] + 1
        full.write.mode("overwrite").parquet(self._data_dir(new_version))
        self._write_pointer({"version": new_version, "epochs": meta["epochs"]})
        old = self._data_dir(meta["version"])
        if meta["version"] and os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def apply_delta(self, delta: DataFrame, epoch_id: int | None = None) -> None:
        """Fold a delta frame into the table (idempotent per epoch_id)."""
        meta = self._pointer()
        if epoch_id is not None and epoch_id in meta["epochs"]:
            return  # retry of an applied epoch — exactly-once no-op

        spark = delta.sparkSession
        current = self.read(spark)
        merged = (
            delta
            if current is None
            else current.unionByName(delta)
            .groupBy(*self.keys)
            .agg(*[F.sum(m).alias(m) for m in self.measures])
        )

        new_version = meta["version"] + 1
        merged.write.mode("overwrite").parquet(self._data_dir(new_version))

        epochs = meta["epochs"]
        if epoch_id is not None:
            epochs = (epochs + [epoch_id])[-_MAX_EPOCHS_TRACKED:]
        self._write_pointer({"version": new_version, "epochs": epochs})

        old = self._data_dir(meta["version"])
        if meta["version"] and os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
