"""Measure the r10 overflow reroute at scale (VERDICT r9 ask #2).

Three questions, answered with walls and row counts in one 48g session:

1. Does the exact inverted-index Jaccard survive sf1/sf10 on the
   REALISTIC (marker-replicated) corpus? The r4 "heap exhaustion at
   sf10" was measured on pre-marker replication, where every copy
   multiplied every shingle's df (mass ×mult²); the r5+ marker scheme
   collapses cross-copy shingles, so candidate mass scales LINEARLY
   with the corpus — the regime a real 10×-bigger corpus is in.
2. On a genuinely hot-shingle corpus (16-word boilerplate prepended to
   every document — the df²-blowup class that motivated the guard),
   does the default guard refuse with the measured mass, and does
   ``on_overflow='reroute'`` then complete via PPJoin with answers
   bit-identical to the exact semantics?
3. What do the rerouted clusters (x1 path) cost at sf1?

Writes BENCH_reroute_r10.json. Documents-only sf1/sf10 replicas are
generated on first run via gen_scale.replicate_documents (same marker
scheme, same row_group_size discipline).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent.parent
BOILER = (
    "terms of service apply to all use of this site strictly "
    "no warranty expressed or implied whatsoever"
)  # 17 words -> 15 full-df 3-shingles per document


def ensure_documents(mult: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(path):
        from gen_scale import replicate_documents

        replicate_documents("/root/testdata/sf0.1", out_dir, mult)
        print(f"generated {path}")
    return path


def ensure_hot(src_path: str, out_path: str) -> str:
    """Prepend the same boilerplate to EVERY document: each of its 15
    3-shingles then has df = n_docs, so the index join's candidate
    mass is 15·n(n−1)/2 — the quadratic class the guard exists for."""
    if not os.path.exists(out_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        df = pd.read_parquet(src_path)
        df["text"] = BOILER + " " + df["text"]
        df["n_chars"] = df["text"].str.len()
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            out_path,
            row_group_size=16384,
        )
        print(f"generated {out_path}")
    return out_path


def wall(fn, reps: int) -> tuple[float, list[float], int]:
    walls, rows = [], 0
    for _ in range(reps):
        t0 = time.time()
        rows = fn()
        walls.append(round(time.time() - t0, 3))
    return statistics.median(walls), walls, rows


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from adguard2clickhouse_spark.operators import dedup
    from adguard2clickhouse_spark.operators.graph import connected_components
    from adguard2clickhouse_spark.session import get_spark

    spark = get_spark(app_name="reroute-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf1_doc = ensure_documents(10, str(REPO / ".localdata" / "sf1"))
    sf10_doc = ensure_documents(100, str(REPO / ".localdata" / "sf10"))
    hot_doc = ensure_hot(sf1_doc, str(REPO / ".localdata" / "sf1" / "documents_hot.parquet"))

    results: dict = {"boilerplate_words": len(BOILER.split())}

    # codegen warmup
    warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dedup.ngram_jaccard_pairs(warm).count()
    dedup.ngram_jaccard_pairs_ppjoin(warm).count()

    # -- 1. realistic (marker) corpus, sf1 + sf10. The exact index runs
    # under the DEFAULT guard: where the measured mass clears the 2e9
    # cap it runs and parity-checks against ppjoin; where it refuses
    # (sf10's exact mass is ~3.2e9 — candidate mass scales linearly
    # with the corpus but the base boilerplate constant is large), the
    # refusal + mass are the record and the REROUTE is what gets timed.
    for tag, path, reps in (("sf1", sf1_doc, 3), ("sf10", sf10_doc, 1)):
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        entry: dict = {"n_docs": n_docs}
        try:
            med_i, walls_i, rows_i = wall(
                lambda: dedup.ngram_jaccard_pairs(
                    docs, n=3, threshold=0.8
                ).count(),
                reps,
            )
            entry["index"] = {
                "median_s": med_i, "walls": walls_i, "rows": rows_i,
            }
        except ValueError as e:
            msg = str(e)
            entry["index"] = {
                "default_guard": "refused",
                "refusal_mass": int(
                    msg.split("emit ")[1].split(" candidate")[0]
                    .replace(",", "")
                ),
            }
            med_r, walls_r, rows_r = wall(
                lambda: dedup.ngram_jaccard_pairs(
                    docs, n=3, threshold=0.8, on_overflow="reroute"
                ).count(),
                reps,
            )
            entry["reroute"] = {
                "median_s": med_r, "walls": walls_r, "rows": rows_r,
            }
        med_p, walls_p, rows_p = wall(
            lambda: dedup.ngram_jaccard_pairs_ppjoin(
                docs, n=3, threshold=0.8
            ).count(),
            reps,
        )
        entry["ppjoin"] = {"median_s": med_p, "walls": walls_p, "rows": rows_p}
        if "rows" in entry["index"]:
            assert entry["index"]["rows"] == rows_p, (tag, entry, rows_p)
            entry["parity_rows_equal"] = True
        if "reroute" in entry:
            assert entry["reroute"]["rows"] == rows_p, (tag, entry, rows_p)
            entry["reroute_parity_rows_equal"] = True
        results[f"marker_{tag}"] = entry
        print(tag, entry)

    # -- 2. hot-shingle corpus: guard refusal + reroute completion
    hot = spark.read.parquet(hot_doc)
    n_hot = hot.count()
    hot_entry: dict = {"n_docs": n_hot}
    try:
        dedup.ngram_jaccard_pairs(hot, n=3, threshold=0.8).count()
        hot_entry["default_guard"] = "DID NOT TRIP (unexpected)"
    except ValueError as e:
        msg = str(e)
        hot_entry["default_guard"] = "refused"
        hot_entry["refusal_mass"] = int(
            msg.split("emit ")[1].split(" candidate")[0].replace(",", "")
        )
    med_r, walls_r, rows_r = wall(
        lambda: dedup.ngram_jaccard_pairs(
            hot, n=3, threshold=0.8, on_overflow="reroute"
        ).count(),
        2,
    )
    hot_entry["reroute"] = {"median_s": med_r, "walls": walls_r, "rows": rows_r}
    # the reroute's answers ARE the exact semantics (bit-identical
    # PPJoin; exactness proven at sf1 parity above + pytest/driver
    # hash gates) — running the refused 3e9-candidate join to re-prove
    # it here is exactly what the guard exists to prevent
    results["hot_sf1"] = hot_entry
    print("hot_sf1", hot_entry)

    # -- 3. rerouted clusters at sf1 (the x1 weak-list path)
    docs1 = spark.read.parquet(sf1_doc)
    def clusters():
        pairs = dedup.ngram_jaccard_pairs(
            docs1, n=3, threshold=0.8, on_overflow="reroute"
        )
        comp = connected_components(docs1.select("doc_id"), pairs)
        return comp.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("component").alias("c"),
        ).collect()[0]["n"]

    med_c, walls_c, rows_c = wall(clusters, 2)
    results["clusters_reroute_sf1"] = {
        "median_s": med_c, "walls": walls_c, "rows": rows_c,
    }
    print("clusters", results["clusters_reroute_sf1"])

    out = REPO / "BENCH_reroute_r10.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")
    spark.stop()




def lsh_section(spark, results: dict) -> None:
    """Section 4 (run separately via --lsh): the embedding-LSH reroute
    at sf1 (20k vectors, dim 64, 10 label clusters + per-copy noise).
    Records the MEASURED candidate masses of the fixed-bits demo form
    (bits=6) and the auto-scaled rerouted form (bits=ceil(log2(n/64)),
    max_bucket=256), then times both: the guard cap is set between the
    two measured masses so the trip + reroute path is exercised, and
    the entry records both masses so the choice is transparent."""
    import math

    from pyspark.sql import functions as F

    from adguard2clickhouse_spark.operators import similarity

    emb_path = str(REPO / ".localdata" / "sf1" / "embeddings.parquet")
    if not os.path.exists(emb_path):
        from gen_scale import replicate_embeddings

        replicate_embeddings(
            "/root/testdata/sf0.1", str(REPO / ".localdata" / "sf1"), 10
        )
        print(f"generated {emb_path}")
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    dim = 64

    def mass(bits: int, n_tables: int, max_bucket: int | None) -> int:
        sigs = emb.select(
            F.posexplode(
                similarity.lsh_signatures_udf(dim, bits, n_tables, 42)(
                    F.col("embedding")
                )
            ).alias("_t", "_s")
        )
        counts = sigs.groupBy("_t", "_s").agg(F.count(F.lit(1)).alias("_c"))
        if max_bucket is not None:
            counts = counts.filter(F.col("_c") <= max_bucket)
        row = counts.agg(
            F.sum(F.col("_c") * (F.col("_c") - 1) / F.lit(2)).alias("_p")
        ).collect()[0]
        return int(row["_p"] or 0)

    auto_bits = max(6, min(16, math.ceil(math.log2(max(n, 2) / 64))))
    pre = mass(6, 8, None)
    post = mass(auto_bits, 8, 256)
    entry: dict = {
        "n_vecs": n, "fixed_bits": 6, "auto_bits": auto_bits,
        "mass_fixed_bits": pre, "mass_rerouted": post,
        "mass_reduction_x": round(pre / max(post, 1), 1),
    }
    cap = (pre + post) // 2
    entry["cap_used"] = cap

    med_f, walls_f, rows_f = wall(
        lambda: similarity.embedding_dup_pairs_lsh(
            emb, threshold=0.9, bits=6, n_tables=8, dim=dim,
            max_candidate_pairs=None,
        ).count(),
        2,
    )
    entry["fixed_bits_run"] = {
        "median_s": med_f, "walls": walls_f, "rows": rows_f,
    }
    try:
        similarity.embedding_dup_pairs_lsh(
            emb, threshold=0.9, bits=6, n_tables=8, dim=dim,
            max_candidate_pairs=cap,
        ).count()
        entry["guard_at_cap"] = "DID NOT TRIP (unexpected)"
    except ValueError:
        entry["guard_at_cap"] = "refused"
    med_r, walls_r, rows_r = wall(
        lambda: similarity.embedding_dup_pairs_lsh(
            emb, threshold=0.9, bits=6, n_tables=8, dim=dim,
            max_candidate_pairs=cap, on_overflow="reroute",
        ).count(),
        2,
    )
    entry["reroute_run"] = {
        "median_s": med_r, "walls": walls_r, "rows": rows_r,
    }
    # every pair from EITHER form passed the exact cosine verify; the
    # rerouted form trades recall on marginal pairs for O(n) candidates
    entry["recall_vs_fixed"] = round(rows_r / max(rows_f, 1), 3)
    results["lsh_sf1"] = entry
    print("lsh_sf1", entry)


def lsh_main() -> None:
    """Append the LSH section to the existing artifact."""
    from adguard2clickhouse_spark.session import get_spark as _gs

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = _gs(app_name="reroute-scale-bench-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    out = REPO / "BENCH_reroute_r10.json"
    res = json.loads(out.read_text()) if out.exists() else {}
    lsh_section(spark, res)
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    if "--lsh" in sys.argv:
        lsh_main()
    else:
        main()
