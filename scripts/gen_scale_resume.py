"""Resume an interrupted gen_scale.py run: generate only missing tables."""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import gen_scale  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.localdata/sf100")
    ap.add_argument("--mult", type=int, default=1000)
    args = ap.parse_args()

    import duckdb
    import shutil

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    def missing(t):
        """Absent OR invalid: an interrupted COPY leaves a footer-less
        file (the r6 sf100 lineitem) — existence alone is not done.
        Only a confirmed-invalid footer (pyarrow's ArrowInvalid) or an
        unreadable file (OSError) deletes and regenerates; anything
        else (ImportError, MemoryError, a transient glitch) propagates
        rather than destroying a multi-hour artifact (ADVICE r7: the
        bare ``except Exception: os.remove``)."""
        p = f"{args.out}/{t}.parquet"
        if not os.path.exists(p):
            return True
        import pyarrow.lib
        import pyarrow.parquet as pq

        try:
            pq.ParquetFile(p)
            return False
        except (pyarrow.lib.ArrowInvalid, OSError):
            os.remove(p)
            return True

    for t in gen_scale.FIXED:
        if missing(t):
            shutil.copyfile(f"{args.base}/{t}.parquet", f"{args.out}/{t}.parquet")
            print(f"{t}: copied", flush=True)
    for t, keys in gen_scale.REPLICATED_SQL.items():
        if missing(t):
            gen_scale.replicate_sql(con, args.base, args.out, t, keys, args.mult)
            n = con.sql(
                f"select count(*) from '{args.out}/{t}.parquet'"
            ).fetchone()[0]
            print(f"{t}: {n} rows", flush=True)
        else:
            print(f"{t}: exists, skipped", flush=True)
    if missing("documents"):
        gen_scale.replicate_documents(args.base, args.out, args.mult)
        print("documents: done", flush=True)
    if missing("embeddings"):
        gen_scale.replicate_embeddings(args.base, args.out, args.mult)
        print("embeddings: done", flush=True)
    con2 = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        n = con2.sql(
            f"select count(*) from '{args.out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"verify {t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
