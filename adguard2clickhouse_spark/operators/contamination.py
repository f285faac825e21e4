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
from pyspark.sql.window import Window


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle): all word n-grams of each document, via one
    explode + lead window (same stream shape as repetition metrics —
    no self-join, no quadratic blow-up)."""
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_tok"),
        )
        .filter(F.col("_tok") != "")
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    parts = [F.col("_tok")] + [F.lead("_tok", i).over(w) for i in range(1, n)]
    sel = toks.select("_id", *[p.alias(f"_g{i}") for i, p in enumerate(parts)])
    return sel.filter(F.col(f"_g{n-1}").isNotNull()).select(
        F.col("_id").alias(id_col),
        F.concat_ws(" ", *[f"_g{i}" for i in range(n)]).alias("shingle"),
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
