"""Benchmark-contamination detection (brief §extensions: before
training, every corpus is checked for verbatim overlap with the eval
suites it will be judged on — shared word n-grams are the standard
signal, e.g. the 13-gram screens used for GPT-3/PaLM-style decontamination).

Shape: the benchmark side is tiny relative to the corpus (eval suites
are thousands of documents, the corpus is billions), so its distinct
shingle set is broadcast — corpus shingles never shuffle; the only
exchange is the per-document hit aggregation on the unique doc key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle): all word n-grams of each document.

    Zero-exchange form (r15 — the explode + lead-window build forced a
    hash exchange + per-doc sort of EVERY corpus token, ~500M rows at
    sf100, the bulk of x8_contamination's 119 s wall): keep the token
    array in place, explode only the n-gram START indices, and
    concat_ws the n element_at's in a codegen'd projection — the same
    restructure as the r14 winnow/k-gram rewrites. A/B at sf10: 8.9 →
    2.9 s, multiset-identical on every (doc, shingle, count). The
    empty-token drop happens in the array (order-preserving
    F.filter), matching the old posexplode-then-filter stream; the
    DuckDB oracle twin (shingle_sql_cte) still replays the window
    form — the hash gate proves the two shapes equal."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    starts = F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1))
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(id_col, "_toks", F.explode(starts).alias("_i"))
        .select(
            F.col(id_col),
            F.concat_ws(
                " ",
                *[
                    F.element_at("_toks", F.col("_i") + F.lit(j))
                    for j in range(n)
                ],
            ).alias("shingle"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per corpus document: how many DISTINCT benchmark shingles it
    shares. Returns (id, n_hits, contaminated).

    ``benchmark`` rows present in ``corpus`` flag themselves (a doc
    trivially shares its own shingles) — callers that keep eval docs
    inside the corpus should exclude them by id, as the driver query
    does with an is_benchmark column.
    """
    bench_shingles = (
        word_shingles(benchmark, n, text_col, id_col).select("shingle").distinct()
    )
    hits = (
        word_shingles(corpus, n, text_col, id_col)
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("shingle")).alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def shingle_sql_cte(
    n: int = 3,
    text_rel: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """ANSI-SQL twin of :func:`word_shingles` (DuckDB oracle): same
    explode + lead + concat_ws, so the hash gate covers the shingle
    extraction itself, not just the join."""
    leads = ", ".join(
        f"lead(_tok, {i}) OVER (PARTITION BY {id_col} ORDER BY _pos) AS _g{i}"
        for i in range(1, n)
    )
    gparts = ", ".join(["_tok"] + [f"_g{i}" for i in range(1, n)])
    return (
        f"SELECT {id_col}, concat_ws(' ', {gparts}) AS shingle FROM ("
        f"  SELECT {id_col}, _pos, _tok, {leads} FROM ("
        f"    SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS _tok, "
        f"           generate_subscripts(string_split({text_col}, ' '), 1) AS _pos "
        f"    FROM {text_rel}) WHERE _tok <> ''"
        f") WHERE _g{n-1} IS NOT NULL"
    )
