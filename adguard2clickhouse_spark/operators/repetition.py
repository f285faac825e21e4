"""Repetition / boilerplate metrics for corpus curation (brief
§extensions: Gopher-style repetition filters — heavily repeated
tokens and n-grams are the classic signature of low-quality or
machine-generated text).

Per-document outputs (all permille, floor()'d integers so the DuckDB
oracle compares exactly — see text.quality_features for why floor and
not cast):

  - ``uniq_token_permille``   distinct tokens / tokens
  - ``top_token_permille``    most frequent single token / tokens
  - ``dup_bigram_permille``   1000 − distinct bigrams / bigrams

Plan shape: one explode of the token stream, bigrams via a ``lead``
window (never a self-join), then two partial-aggregable groupBys on
the document key. Only (doc_id, token) pairs shuffle — texts stay in
the scan. At 100 TB the doc_id key is unique-per-row, so the shuffle
is uniform by construction (no skew possible).

Interpreted-HOF audit (r15, VERDICT r14 #3 — the 89 s sf100 wall made
x4_repetition a flagged candidate): this module contains NO
higher-order-function lambdas; the wall is the exploded token volume
through the per-doc window sort plus two count-distinct aggregations,
all codegen'd. Nothing to rewrite under the HOF rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_tok"),
        )
        .filter(F.col("_tok") != "")
    )

    # per-(doc, token) counts → per-doc totals + top-token count in one
    # two-level aggregation (both levels partial-aggregate map-side).
    tok_counts = toks.groupBy("_id", "_tok").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = tok_counts.groupBy("_id").agg(
        F.sum("_c").alias("_n_tok"),
        F.count(F.lit(1)).alias("_n_uniq"),
        F.max("_c").alias("_top"),
    )

    w = Window.partitionBy("_id").orderBy("_pos")
    bigrams = (
        toks.withColumn("_nxt", F.lead("_tok").over(w))
        .filter(F.col("_nxt").isNotNull())
        .select("_id", F.concat_ws(" ", "_tok", "_nxt").alias("_bi"))
    )
    bi_agg = bigrams.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n_bi"),
        F.count_distinct(F.col("_bi")).alias("_n_bi_uniq"),
    )

    return (
        per_doc.join(bi_agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_n_tok").cast("long").alias("n_tokens"),
            F.floor((F.col("_n_uniq") * 1000) / F.col("_n_tok")).alias(
                "uniq_token_permille"
            ),
            F.floor((F.col("_top") * 1000) / F.col("_n_tok")).alias(
                "top_token_permille"
            ),
            F.coalesce(
                1000 - F.floor((F.col("_n_bi_uniq") * 1000) / F.col("_n_bi")),
                F.lit(0),
            ).cast("long").alias("dup_bigram_permille"),
        )
    )


def corpus_ngram_counts(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Corpus-level top-k word n-grams: (ngram, cnt, n_docs), ordered by
    cnt desc then ngram asc (deterministic under ties).

    The n-gram stream comes from the same explode+lead shape as
    :func:`repetition_metrics`; the global top-k is a
    TakeOrderedAndProject (partial top-k per partition, no full sort).
    """
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_tok"),
        )
        .filter(F.col("_tok") != "")
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    parts = [F.col("_tok")] + [F.lead("_tok", i).over(w) for i in range(1, n)]
    grams = toks.select(
        "_id", *[p.alias(f"_g{i}") for i, p in enumerate(parts)]
    ).filter(F.col(f"_g{n-1}").isNotNull())
    gram = F.concat_ws(" ", *[f"_g{i}" for i in range(n)])
    return (
        grams.select("_id", gram.alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct(F.col("_id")).alias("n_docs"),
        )
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )
