"""Generate a scaled-up copy of a driver testdata dir (default: sf0.1 x10 = sf1).

The driver's parquet fixtures are read-only and stop at sf0.1; the
100-TB design claims (banded dedup joins, AQE-chosen broadcasts, IVF
cell pruning) need at least one measured scaling point above that.
This script replicates a fixture dir MULT times with consistent key
offsets, preserving every distribution the queries exercise:

- region/nation stay fixed (TPC-H-style non-scaling dims);
- customer/supplier/part/orders/lineitem/events scale linearly with
  all FK columns offset by copy * KEY_OFFSET, so join fan-outs and
  group cardinalities scale exactly like the base data;
- documents get a per-copy marker token spliced in every 3 words:
  within-copy near-dup structure is preserved verbatim (both sides of
  a pair carry the same markers), while cross-copy Jaccard collapses
  (every 3-shingle spans a marker) — so x2_* pair counts scale
  LINEARLY with MULT instead of quadratically, which is what "10x
  more data" means for a real corpus (a corpus 10x bigger does not
  have 45x the duplicate pairs of each doc);
- embeddings get small deterministic per-copy noise, keeping the
  metric structure (cluster labels, pairwise scale) while avoiding
  10-way exact-duplicate vectors.

Deterministic: same inputs -> byte-identical logical content.

Usage: python scripts/gen_scale.py [--base /root/testdata/sf0.1]
           [--out /root/repo/.localdata/sf1] [--mult 10]
"""

from __future__ import annotations

import argparse
import os

KEY_OFFSET = 10_000_000  # > every key in the base fixtures

REPLICATED_SQL = {
    # table -> list of key columns to offset (all other columns pass through)
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
FIXED = ["region", "nation"]


def replicate_sql(con, base: str, out: str, table: str, keys: list[str], mult: int):
    import duckdb  # noqa: F401

    cols = [
        c[0]
        for c in con.sql(f"describe select * from '{base}/{table}.parquet'").fetchall()
    ]
    sel = ", ".join(
        f"{c} + i * {KEY_OFFSET} AS {c}" if c in keys else c for c in cols
    )
    con.sql(
        f"COPY (SELECT {sel} FROM '{base}/{table}.parquet', range({mult}) t(i) "
        f"ORDER BY i) TO '{out}/{table}.parquet' (FORMAT parquet)"
    )


def replicate_documents(base: str, out: str, mult: int):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.read_parquet(f"{base}/documents.parquet")
    frames = [df]
    for i in range(1, mult):
        c = df.copy()
        marker = f"cp{i}x"
        c["text"] = c["text"].map(
            lambda t: " ".join(
                w + (" " + marker if j % 3 == 2 else "")
                for j, w in enumerate(t.split(" "))
            )
        )
        c["doc_id"] = c["doc_id"] + i * KEY_OFFSET
        c["n_chars"] = c["text"].str.len()
        frames.append(c)
    allf = pd.concat(frames, ignore_index=True)
    # row_group_size matters: a single-row-group file makes Spark's
    # byte-range split collapse to ONE reader task (row-group
    # granularity), serializing every downstream scan — measured as a
    # 10s straggler on the sf10 documents file.
    pq.write_table(pa.Table.from_pandas(allf, preserve_index=False),
                   f"{out}/documents.parquet", row_group_size=16384)


def replicate_embeddings(base: str, out: str, mult: int):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.read_parquet(f"{base}/embeddings.parquet")
    mat = np.stack(df["embedding"].to_numpy())  # (n, dim) float32
    frames = [df]
    for i in range(1, mult):
        rng = np.random.RandomState(1000 + i)
        noisy = (mat + rng.normal(0, 0.05, mat.shape)).astype("float32")
        c = pd.DataFrame(
            {
                "vec_id": df["vec_id"] + i * KEY_OFFSET,
                "embedding": list(noisy),
                "label": df["label"],
            }
        )
        frames.append(c)
    allf = pd.concat(frames, ignore_index=True)
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
         ("label", pa.int32())]
    )
    pq.write_table(pa.Table.from_pandas(allf, schema=schema, preserve_index=False),
                   f"{out}/embeddings.parquet", row_group_size=16384)


def main():
    import duckdb
    import shutil

    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.localdata/sf1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    # The mult=1000 lineitem replication sorts 600M rows; DuckDB's
    # default memory budget (~80% of RAM) got the r6 attempt OOM-killed
    # mid-COPY, leaving a footer-less parquet that later benches choked
    # on. Cap the budget and give the sort a spill directory instead.
    con.sql("SET memory_limit='55GB'")
    con.sql(f"SET temp_directory='{args.out}/.duckdb_tmp'")
    for t in FIXED:
        shutil.copyfile(f"{args.base}/{t}.parquet", f"{args.out}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in REPLICATED_SQL.items():
        replicate_sql(con, args.base, args.out, t, keys, args.mult)
        n = con.sql(f"select count(*) from '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    replicate_documents(args.base, args.out, args.mult)
    replicate_embeddings(args.base, args.out, args.mult)
    con2 = duckdb.connect()
    for t in ["documents", "embeddings"]:
        n = con2.sql(f"select count(*) from '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
