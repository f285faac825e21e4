"""Profile winnow_fingerprints' window-min formulation (VERDICT r13 #3).

x2_winnow_fingerprints is the slowest sf100 completer (496 s) on a
pure map plan — the suspect is the per-window materialization in
``transform(sequence(1, n_windows), i -> array_min(slice(hs, i, w)))``:
every window allocates a fresh w-element array before taking its min.
Two same-semantics alternatives that never allocate per window:

- least     — ``least(element_at(hs, i), ..., element_at(hs, i+w-1))``:
              w direct lookups + a w-ary min, zero allocation. O(n*w)
              lookups but allocation-free.
- doubling  — sparse-table/log-doubling: ceil(log2 w) zip_with passes
              build window-2^j minima, then each window min is
              ``least(m[i], m[i + w - 2^j])``. O(n log w) work and
              only log w array allocations PER DOCUMENT (not per
              window). The win grows with w.

All three must select IDENTICAL fingerprints (asserted here and in
tests/test_dedup.py). This script times them on a synthetic corpus
shaped like the documents table (realistic token counts) at several
(w, corpus) points and prints one JSON line for the artifact.

Usage: python scripts/profile_winnow.py [--rows 200000] [--tokens 120]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from adguard2clickhouse_spark.session import get_spark  # noqa: E402


def build_corpus(spark, rows: int, tokens: int):
    """Deterministic synthetic docs: `tokens` pseudo-words per doc."""
    return (
        spark.range(rows)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(tokens)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (F.xxhash64(F.col("id"), i) % 5000).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


def mins_slice(hs, w):
    n_windows = F.greatest(F.size(hs) - F.lit(w - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(hs, i, w)),
    )


def mins_least(hs, w):
    n_windows = F.greatest(F.size(hs) - F.lit(w - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.least(*[F.element_at(hs, i + F.lit(j)) for j in range(w)]),
    )


def mins_doubling(hs, w):
    # m_j[i] = min(hs[i .. i+2^j-1]); window-w min = least(m_j[i],
    # m_j[i + w - 2^j]) with 2^j the largest power of two <= w.
    # Overlap is fine for min. zip_with on a shifted copy halves the
    # passes vs per-window loops; slice() here is per-DOCUMENT.
    m, span = hs, 1
    while span * 2 <= w:
        shifted = F.slice(m, span + 1, F.size(m) - F.lit(span))
        m = F.zip_with(
            F.slice(m, 1, F.size(m) - F.lit(span)), shifted,
            lambda a, b: F.least(a, b),
        )
        span *= 2
    n_windows = F.greatest(F.size(hs) - F.lit(w - 1), F.lit(0))
    if span == w:
        return F.slice(m, 1, n_windows)
    off = w - span
    return F.zip_with(
        F.slice(m, 1, n_windows),
        F.slice(m, 1 + off, n_windows),
        lambda a, b: F.least(a, b),
    )


FORMS = {"slice": mins_slice, "least": mins_least, "doubling": mins_doubling}


def fingerprints(docs, form, w, k=5):
    from adguard2clickhouse_spark.operators.dedup import (
        _positional_shingle_hashes,
    )

    hs = F.col("_hs")
    return (
        docs.select(
            F.col("doc_id"),
            F.split(F.col("text"), " ").alias("_toks"),
        )
        .select(
            "doc_id",
            _positional_shingle_hashes(F.col("_toks"), k).alias("_hs"),
        )
        .filter(F.size("_hs") >= w)
        .select(
            "doc_id",
            F.explode(F.array_distinct(FORMS[form](hs, w))).alias(
                "fingerprint"
            ),
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--tokens", type=int, default=120)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="profile-winnow")
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark, args.rows, args.tokens).persist()
    docs.count()

    # identity gate first: all forms pick the same fingerprints
    for w in (4, 8, 16):
        base = None
        for form in FORMS:
            got = (
                fingerprints(docs.limit(2000), form, w)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.hash("doc_id", "fingerprint")).alias("h"),
                )
                .collect()[0]
            )
            sig = (got["n"], got["h"])
            if base is None:
                base = sig
            assert sig == base, f"w={w} {form} diverged: {sig} vs {base}"
    print("identity gate: all forms identical at w=4,8,16", file=sys.stderr)

    results = {}
    for w in (4, 8, 16):
        for form in FORMS:
            walls = []
            for _ in range(args.reps):
                t0 = time.time()
                fingerprints(docs, form, w).write.mode("overwrite").format(
                    "noop"
                ).save()
                walls.append(round(time.time() - t0, 3))
            results[f"w{w}_{form}"] = {
                "median_sec": round(statistics.median(walls), 3),
                "runs": walls,
            }
            print(f"w={w:>2} {form:<9} {statistics.median(walls):7.3f}s "
                  f"{walls}", file=sys.stderr)

    out = {
        "metric": "winnow_window_min_formulations",
        "rows": args.rows,
        "tokens_per_doc": args.tokens,
        "reps": args.reps,
        "results": results,
    }
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
