"""Shared bench execution helper (r11).

A bare ``df.count()`` is NOT a full execution: Catalyst prunes final
projections and unreferenced aggregate values under it, so a query
whose tail IS the work gets timed as a scan (caught r11 — x4_quality
under-measured ~2.1×; per-query bridge in BENCH_sink_method_r11.json).
``force_count`` returns the row count while aggregating a hash of
EVERY output column alongside it, so nothing in the plan is prunable
and the scale scripts keep their rows-returned evidence (a rows-only
noop sink would satisfy the timer but void the "record rows returned"
rule) in the same single job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def force_count(df: DataFrame) -> int:
    """Row count with the COMPLETE plan executed (every output column
    consumed by a hash aggregate; top-level map columns go through
    map_entries, which hash() cannot take directly)."""
    cols = []
    for f in df.schema.fields:
        # df[name], not F.col(name): a dotted column name would parse as a
        # nested-field reference under F.col (r11 ADVICE).
        c = df[f.name]
        if isinstance(f.dataType, MapType):
            c = F.map_entries(c)
        cols.append(c)
    row = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.bit_xor(F.hash(*cols)).alias("_force"),
    ).collect()[0]
    return row["_n"]
