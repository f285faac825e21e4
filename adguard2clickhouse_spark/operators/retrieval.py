"""Corpus vocabulary and term-based retrieval (brief §extensions:
tokenizer-vocab construction and lexical search over the documents
table).

Vocabulary building is the first step of training any tokenizer: rank
every token by corpus frequency and assign dense integer ids to the
top-N. Retrieval scores documents against a query term set with
tf·idf — here idf is the *integer* surrogate ``floor(tf·10⁶/df)``
(monotone in the classic log-idf; see
operators/text.py::distinctive_terms for why: transcendental
functions are not bit-identical across engines, integer division is,
so the whole ranking stays under the exact DuckDB oracle gate).

Scale notes (100 TB corpus):
- token counting is explode → partial-aggregated groupBy — map-side
  combine keeps the shuffle at (token, count) pairs, never text;
- the global top-N uses orderBy+limit, which Spark executes as
  TakeOrderedAndProject (per-partition heap of N, then a merge of
  per-partition heaps on the driver side of the exchange) — there is
  no full global sort at any size;
- id assignment (a row_number) runs on the N surviving rows only, so
  the single-partition window is bounded by the vocab size, not the
  corpus;
- retrieval filters the exploded tokens to the query term set FIRST —
  df (document frequency) is computed only for query terms, so the
  join fan-in is |query| rows, broadcast by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd  # module level: pandas_udf/mapInPandas type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
) -> DataFrame:
    """Top-``vocab_size`` tokens by corpus frequency with dense ids.

    Returns (token, token_id, cnt, n_docs): ``token_id`` is the
    0-based frequency rank (ties broken on the token string so the
    assignment is total and deterministic), ``cnt`` the corpus
    occurrence count, ``n_docs`` the document frequency.

    The heavy part (explode + groupBy over every token occurrence)
    shuffles only (token, partial-count); the window that assigns ids
    sees ``vocab_size`` rows.
    """
    toks = df.select(
        F.col("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(vocab_size)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.select(
        "token",
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Vocabulary coverage per group: token volume, out-of-vocabulary
    token count, and OOV permille — the report that tells you whether
    a tokenizer's vocab actually covers a source before you commit to
    it at training scale.

    Plan: tokens explode once, broadcast-left-join the vocab (a vocab
    is ≤ a few million rows — broadcast by construction), then a
    per-group aggregate. The corpus shuffles only (group, partial
    counts); the text never moves.
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    joined = toks.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("_in"))),
        "token",
        "left",
    )
    return (
        joined.groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            F.col("_g").alias(group_col),
            "n_tokens",
            "n_oov",
            F.floor(F.col("n_oov") * 1000 / F.col("n_tokens"))
            .cast("long")
            .alias("oov_permille"),
        )
    )


def _merge_fold(s, left: str, right: str):
    """One BPE merge applied to a symbol-array column as a JVM
    higher-order fold — greedy left-to-right non-overlapping (a merged
    symbol ``left||right`` can never equal ``left``, so it cannot
    re-match as the left part within the same pass)."""
    lc, rc = F.lit(left), F.lit(right)
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lc)
            & (x == rc),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(lc, rc)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode texts with a learned merge table: whitespace-split,
    char-split each word, then apply every merge in learned order.

    The entire encode is ONE per-row expression — zero shuffles, zero
    Python; it composes with chunking/packing downstream exactly like
    any other projected column. At 100 TB this is the property that
    matters: tokenization cost scales with the scan, adds no exchange,
    and pipelines inside whole-stage codegen's parent stage."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda w: w != F.lit("")
    )
    sym = F.transform(
        words,
        lambda w: F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: w.substr(i, F.lit(1)),
        ),
    )
    def apply_one(col, left: str, right: str):
        # separate function: pyspark inspects lambda arity, so the
        # merge pair must bind via closure, not default args
        return F.transform(col, lambda s: _merge_fold(s, left, right))

    for left, right in merges:
        sym = apply_one(sym, left, right)
    return df.select(F.col(id_col), F.flatten(sym).alias(out_col))


def bpe_apply_arrow(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    memo_max_entries: int = 1 << 20,
) -> DataFrame:
    """Arrow twin of ``bpe_apply`` — same greedy left-to-right
    non-overlapping merge semantics, bit-identical token streams
    (pinned in pytest), executed in a ``mapInPandas`` kernel with a
    per-task word→tokens MEMO, bounded at ``memo_max_entries``
    distinct words (r15, ADVICE r14: unbounded, a high-distinct
    vocabulary — URLs, ids, numerals — grows a long-lived worker's
    RSS without limit; on overflow the memo is cleared wholesale,
    which a Zipfian vocabulary repopulates with its hot words within
    one batch, keeping the 42× win while bounding worker memory to
    ~memo_max_entries token lists).

    Why this exists (r14, found by the sf100 sweep): the expression
    form is zero-shuffle but its nested higher-order lambdas
    (per merge × per word × per symbol) are INTERPRETED — Spark never
    codegens HOF lambdas — and re-encode every occurrence of every
    word; at 5M docs it was the engine's slowest completer (685 s).
    BPE is a pure word→tokens function, so a memo collapses the work
    to one encode per DISTINCT word per task — the classic tokenizer
    cache — and Arrow batches amortize the Python hop. Measured
    (BENCH_kgram_codegen_r14.json): sf10 100.5 s → 2.4 s (42×),
    sf100/8 GB 685 s → 24 s. Stays a pure map stage: no exchange,
    composes with chunking/packing downstream exactly like the
    expression form, which remains as the all-JVM reference
    implementation the parity test pins against.
    """
    merges_list = [(str(l), str(r)) for l, r in merges]
    out_fields = df.select(id_col).schema.fields
    schema = T.StructType(
        list(out_fields) + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def encode_word(w: str, memo: dict) -> list:
        got = memo.get(w)
        if got is not None:
            return got
        syms = list(w)
        for left, right in merges_list:
            i, out = 0, []
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        if len(memo) >= memo_max_entries:
            memo.clear()
        memo[w] = syms
        return syms

    def run(batches):
        memo: dict = {}
        for pdf in batches:
            # NULL text → NULL tokens, matching the expression form
            # (split(NULL)=NULL propagates through transform/flatten)
            toks = [
                None
                if s is None
                else [
                    t
                    for w in s.split(" ")
                    if w != ""
                    for t in encode_word(w, memo)
                ]
                for s in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 15,
    max_vocab_words: int = 5000,
):
    """Sennrich-style BPE merge training, distributed.

    Returns ``(merges, symbols)``: ``merges`` is a list of
    ``(step, left, right, weight)`` tuples — the learned merge table in
    order — and ``symbols`` the final per-word symbol arrays.

    Distribution shape: the corpus collapses once to distinct words ×
    counts (the only corpus-sized shuffle; capped at the
    ``max_vocab_words`` most frequent words — standard practice, the
    tail can't win a merge). Every iteration then runs on the vocab
    relation only: adjacent-pair counts (explode + groupBy, overlapping
    pairs counted like the reference algorithm), a 1-row argmax collect
    (the driver decision, same place the IVF k-means pulls centroids),
    and the merge applied as a JVM higher-order ``aggregate`` fold —
    greedy left-to-right non-overlapping, equivalent to the scan-index
    reference because a merged symbol ``left||right`` can never equal
    ``left`` again within the same pass. No Python touches row data;
    lineage is truncated per iteration so plans stay O(1).
    """
    wf = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(max_vocab_words)
    )
    syms = wf.select(
        "f",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("s"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pairs = syms.select(
            "f",
            F.explode(
                F.zip_with(
                    F.expr("slice(s, 1, size(s) - 1)"),
                    F.expr("slice(s, 2, size(s) - 1)"),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("f").cast("long").alias("wt"))
            .orderBy(F.desc("wt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, wt = top[0].l, top[0].r, top[0].wt
        merges.append((step, l, r, int(wt)))
        nxt = syms.withColumn(
            "s", _merge_fold(F.col("s"), l, r)
        ).localCheckpoint(eager=True)
        syms.unpersist()
        syms = nxt
    return merges, syms


def tfidf_search(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query, scored by
    ``sum over query terms of floor(tf · 10⁶ / df)`` (integer tf·idf;
    df = number of documents containing the term).

    Returns (doc_id, score, n_hits, rnk): ``n_hits`` is how many
    distinct query terms matched; ties break on doc_id.

    Plan shape: the exploded token stream is filtered to the query
    term set before any aggregation, so everything downstream —
    per-doc tf, per-term df, the score join — operates on
    |query_terms| distinct keys. The df relation is a handful of rows
    and broadcasts; the final top-k is TakeOrderedAndProject.
    """
    terms = [t for t in query_terms if t]
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term").isin(list(terms)))
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .groupBy("_id")
        .agg(
            F.sum(F.floor((F.col("_tf") * 1_000_000) / F.col("_df")))
            .cast("long")
            .alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("_id"))
        .limit(k)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select(F.col("_id").alias(id_col), "score", "n_hits", "rnk")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram language-model score — the CCNet-style
    quality signal (docs whose tokens are corpus-improbable score very
    negative; boilerplate scores high). ``logprob_micro`` =
    Σ over token occurrences of floor(10⁶ · ln(count(t)/total)).

    Engine-portable by construction: each per-distinct-token term is
    floored to an int64 BEFORE the per-doc sum, so the aggregation is
    order-independent integer arithmetic; the only float op is one
    ln() per vocabulary entry on an exactly-representable quotient of
    two int64s (identical IEEE division both engines, libm ln agreeing
    to <1 ulp — the floor boundary risk is per-vocab-entry, verified
    against the DuckDB oracle on the driver corpus).

    Plan shape: one explode → two aggregations (per-token corpus
    counts; per-(doc,token) tf) → tf ⋈ vocab on the token (plain hash
    join — vocab can be millions of rows at corpus scale, no broadcast
    hint) → per-doc integer sum. The corpus total rides in a 1-row
    broadcast (allowlisted nested-loop shape).

    Returns (doc_id, n_tokens, logprob_micro).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_cnt"))
    total = vocab.agg(F.sum("_cnt").alias("_total"))
    term_score = vocab.join(F.broadcast(total)).select(
        "term",
        F.floor(
            F.lit(1_000_000)
            * F.log(F.col("_cnt").cast("double") / F.col("_total"))
        )
        .cast("long")
        .alias("_term_micro"),
    )
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("_tf"))
    return (
        tf.join(term_score, "term")
        .groupBy("_id")
        .agg(
            F.sum("_tf").cast("long").alias("n_tokens"),
            F.sum(F.col("_tf") * F.col("_term_micro")).cast("long").alias("logprob_micro"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "logprob_micro")
    )


def bm25_search(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` BM25 (k1=1.2, b=0.75) retrieval over the corpus, in
    EXACT integer arithmetic so the oracle replays it bit-for-bit.

    The float-free trick: with k1=6/5 and b=3/4, the per-term fraction
    tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) — where avgdl = total/N —
    is the exact rational (44·total·tf) / (20·total·tf + 6·total +
    18·dl·N) in int64s; the score term is idf_micro · that, integer
    DIV, summed per doc (order-independent). The one float op is
    idf_micro = floor(10⁶·ln((2N+2)/(2df+1))) on an exact rational, as
    in :func:`unigram_logprob`. Int64 headroom: numerator peaks at
    ~idf_micro·44·total·tf — safe beyond 10⁹ corpus tokens; shard the
    scoring (or drop idf to milli units) past that.

    Plan shape mirrors tfidf_search: explode filtered to the query
    term set BEFORE any aggregation, df/idf relation broadcast (its
    row count is bounded by |query_terms|), doc lengths join on id,
    corpus totals in a 1-row broadcast, top-k as
    TakeOrderedAndProject. Returns (doc_id, score_micro, n_hits, rnk).
    """
    terms = [t for t in query_terms if t]
    base = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    )
    dl = base.select("_id", F.size("_toks").cast("long").alias("_dl"))
    totals = dl.agg(
        F.count(F.lit(1)).cast("long").alias("_n_docs"),
        F.sum("_dl").cast("long").alias("_total"),
    )
    toks = base.select("_id", F.explode("_toks").alias("term")).filter(
        F.col("term").isin(list(terms))
    )
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    idf = dfreq.join(F.broadcast(totals)).select(
        "term",
        F.floor(
            F.lit(1_000_000)
            * F.log(
                (F.lit(2) * F.col("_n_docs") + F.lit(2)).cast("double")
                / (F.lit(2) * F.col("_df") + F.lit(1))
            )
        )
        .cast("long")
        .alias("_idf_micro"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "_id")
        .join(F.broadcast(totals))
        .select(
            "_id",
            # integer `div`, NOT `/`: long / long is a double divide in
            # Spark, and the numerator peaks ~7.5e16 > 2^53 — a double
            # round-trip would corrupt low bits and break the oracle.
            F.expr(
                "(_idf_micro * 44 * _total * _tf) div "
                "(20 * _total * _tf + 6 * _total + 18 * _dl * _n_docs)"
            ).cast("long").alias("_term_score"),
        )
        .groupBy("_id")
        .agg(
            F.sum("_term_score").cast("long").alias("score_micro"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
    )
    w = Window.orderBy(F.desc("score_micro"), F.asc("_id"))
    return (
        scored.orderBy(F.desc("score_micro"), F.asc("_id"))
        .limit(k)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select(F.col("_id").alias(id_col), "score_micro", "n_hits", "rnk")
    )
