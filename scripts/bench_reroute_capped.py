"""reroute_capped COMPLETION at scale on a boilerplate-heavy corpus
(VERDICT r13 #5).

The sf10/sf100 marker corpora prove the ladder's REFUSAL path — their
duplicate mass is semantic (true clone pairs), so the df-ratio cap
sheds nothing by construction and the capped probe still refuses. What
no committed artifact showed yet is the tier's DESIGN case actually
completing: a corpus whose candidate mass is dominated by corpus
boilerplate (shared header/footer shingles, df ≈ n_docs) at a LOW
match threshold, where:

- 'raise'          refuses with the measured quadratic mass,
- 'reroute'        (exact PPJoin twin) pays the full exact wall — a
                   low threshold makes prefixes long, so the
                   boilerplate lands INSIDE the prefix and the twin's
                   candidate set explodes toward n²/2,
- 'reroute_capped' sheds the boilerplate postings (df > ratio·n_docs)
                   and completes in seconds, keeping every pair whose
                   evidence includes low-df content shingles (the true
                   twins) and announcing the approximation on stderr
                   (REROUTE-CAPPED ENGAGED, ADVICE r13).

Corpus: n_docs docs, each = one SHARED 24-token boilerplate header
(every 3-shingle in it has df = n_docs) + 36 unique tokens; every
2·twin_frac-th doc is paired with a near-identical twin (same content
tokens, one token differs → Jaccard far above the low threshold).
Ground truth: the capped tier must return EXACTLY the twin pairs.

Usage:
    python scripts/bench_reroute_capped.py [--docs 120000]
        [--exact-docs 30000] [--out BENCH_reroute_capped_r14.json]

Writes one JSON line; the 'reroute' exact wall is measured at
--exact-docs (it is the quadratic tier — at --docs it is the 8-11 min
wall the ladder exists to avoid; measured ratio recorded) and the
capped tier at BOTH sizes.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from adguard2clickhouse_spark.operators import dedup  # noqa: E402
from adguard2clickhouse_spark.session import get_spark  # noqa: E402

BOILER = " ".join(f"hdr{i}" for i in range(24))  # shared header: df=n


def build_corpus(spark, n_docs: int, twin_frac: int = 20):
    """Every doc: 24-token shared header + 36 unique tokens. Docs
    (2k, 2k+1) with k % twin_frac == 0 are twins (35 shared content
    tokens + 1 differing) — Jaccard ≈ 35/61 >> 0.1 even after the
    header is capped away."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.floor(F.col("id") / 2)).alias("_pair"),
        (F.col("id") % 2).alias("_side"),
    )
    is_twin = (F.col("_pair") % twin_frac == 0)
    # content tokens keyed by pair for twins (shared), by doc otherwise
    content_key = F.when(is_twin, F.col("_pair") * 2).otherwise(F.col("doc_id"))
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(36)),
        lambda i: F.concat(
            F.lit("c"), F.conv(F.xxhash64(content_key, i).cast("string"), 10, 16)
        ),
    )
    # twins differ in exactly their LAST token (keeps 35 shared
    # 1-gram... we shingle with n=3, so 33 of 34 content shingles shared)
    toks = F.when(
        is_twin & (F.col("_side") == 1),
        F.concat(F.slice(toks, 1, 35), F.array(F.concat(F.lit("alt"), F.col("doc_id").cast("string")))),
    ).otherwise(toks)
    return base.select(
        "doc_id",
        F.concat_ws(" ", F.lit(BOILER), F.array_join(toks, " ")).alias("text"),
    )


def expected_twin_pairs(n_docs: int, twin_frac: int = 20) -> int:
    return len([k for k in range(0, n_docs // 2) if k % twin_frac == 0
                if 2 * k + 1 < n_docs])


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--exact-docs", type=int, default=10_000)
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--cap", type=int, default=50_000_000)
    ap.add_argument("--out", default="BENCH_reroute_capped_r14.json")
    args = ap.parse_args()

    spark = get_spark(app_name="bench-reroute-capped")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for label, n_docs in (("exact_size", args.exact_docs), ("full_size", args.docs)):
        docs = build_corpus(spark, n_docs).persist()
        docs.count()
        want = expected_twin_pairs(n_docs)
        row = {}

        # tier 0: the sized refusal
        try:
            dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=args.threshold,
                max_candidate_pairs=args.cap, on_overflow="raise",
            ).count()
            row["raise"] = {"refused": False}
        except ValueError as e:
            wall, _ = 0.0, None
            row["raise"] = {"refused": True, "message_head": str(e)[:160]}

        # tier 2: capped — must COMPLETE, keep exactly the twins,
        # and announce the approximation
        buf = io.StringIO()
        with contextlib.redirect_stderr(buf):
            wall, pairs = timed(lambda: dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=args.threshold,
                max_candidate_pairs=args.cap, on_overflow="reroute_capped",
            ).count())
        sys.stderr.write(buf.getvalue())
        row["reroute_capped"] = {
            "wall_sec": wall,
            "pairs": pairs,
            "expected_twin_pairs": want,
            "signal_kept": pairs == want,
            "announced": "REROUTE-CAPPED ENGAGED" in buf.getvalue(),
        }
        print(f"[{label} n={n_docs}] capped: {wall}s, {pairs} pairs "
              f"(want {want}), announced={row['reroute_capped']['announced']}",
              file=sys.stderr)

        # tier 1: exact reroute — the unbounded wall; only at the
        # smaller size (at full size this is the multi-minute wall the
        # capped tier exists to avoid; the ratio extrapolates ~n²)
        if label == "exact_size":
            wall, pairs = timed(lambda: dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=args.threshold,
                max_candidate_pairs=args.cap, on_overflow="reroute",
            ).count())
            row["reroute_exact"] = {"wall_sec": wall, "pairs": pairs,
                                    "expected_twin_pairs": want}
            print(f"[{label} n={n_docs}] exact reroute: {wall}s, "
                  f"{pairs} pairs", file=sys.stderr)

        results[label] = {"n_docs": n_docs, **row}
        docs.unpersist()

    exact = results["exact_size"]
    speedup = (
        round(exact["reroute_exact"]["wall_sec"]
              / max(exact["reroute_capped"]["wall_sec"], 1e-9), 2)
        if "reroute_exact" in exact else None
    )
    out = {
        "metric": "reroute_capped_completion_boilerplate",
        "why": "VERDICT r13 #5: show the capped tier COMPLETING where "
               "it sheds real mass (boilerplate df), vs the exact "
               "tier's wall on the same corpus",
        "threshold": args.threshold,
        "cap": args.cap,
        "results": results,
        "exact_vs_capped_speedup_at_exact_size": speedup,
    }
    print(json.dumps(out))
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
