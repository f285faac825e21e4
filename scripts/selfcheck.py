"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the same SF, compares row count, sorted column names, and
an order-insensitive value hash (stringified, row-sorted). Reports
per-query PASS/FAIL with a value diff sample on mismatch.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from adguard2clickhouse_spark.sources.tables import TABLE_NAMES  # noqa: E402


def vanilla_spark():
    """A deliberately-unconfigured session, like the driver harness's.

    Every conf our queries need must be set at runtime by library code
    (see sources/tables.py) — building the session here with none of
    get_spark()'s settings keeps this replica honest about that.
    """
    import os

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("selfcheck")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: repr(v))
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").map(lambda v: repr(v))
        elif col.dtype == bool or str(col.dtype) == "boolean":
            df[c] = col.map(lambda v: repr(bool(v)) if v is not None else "None")
        else:
            df[c] = col.map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    ok = True
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        print(f"  [{name}] COLUMN MISMATCH spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return False
    if len(spark_pdf) != len(duck_pdf):
        print(f"  [{name}] ROWCOUNT spark={len(spark_pdf)} duck={len(duck_pdf)}")
        ok = False
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if not a.equals(b):
        merged = a.merge(b, how="outer", indicator=True)
        only_a = merged[merged["_merge"] == "left_only"].head(3)
        only_b = merged[merged["_merge"] == "right_only"].head(3)
        print(f"  [{name}] VALUE MISMATCH\n  spark-only:\n{only_a}\n  duck-only:\n{only_b}")
        ok = False
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = vanilla_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(sdf) >= 0 else "?"
            print(f"{status:9s} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if compare(name, sdf, ddf):
            print(f"PASS      {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
