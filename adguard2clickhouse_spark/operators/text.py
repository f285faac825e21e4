"""Text-analysis operators for training-data pipelines (brief §extensions, X4).

All pure built-ins (whole-stage codegen, no Python): token counting,
quality scoring, n-gram-heuristic language ID, and document
fingerprinting. Each has a DuckDB-expressible twin so the driver's
oracle can hash-check it exactly.

Scale notes: every operator here is a narrow projection — no shuffle,
no UDF — so it runs at scan speed and composes with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID. Deliberately small and deterministic — the point is the
# Spark expression shape (higher-order filter over the token array),
# not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (split on single spaces, like the corpus)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex 'BPE-ish' token count: words, numbers, and single
    punctuation marks each count as one token — a cheap proxy for
    subword tokenizer counts when budgeting training data."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_hits(col: Column | str, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of ``lang`` (higher-order
    filter — stays JVM-side, no UDF)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def lang_id(col: Column | str) -> Column:
    """Pick the language whose stopword hit-count is highest; 'und'
    (undetermined) when no stopwords hit at all.

    Deterministic tie-break: language order en > de > fr (strictly
    greater comparison walking the list).
    """
    hit_cols = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in STOPWORDS:  # insertion order = priority order
        h = hit_cols[lang]
        take = h > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, h).otherwise(best_hits)
    return best_lang


def quality_keep(col: Column | str) -> Column:
    """The keep/drop verdict of `quality_features` as a standalone
    column expression — filter with it directly (a pure projection the
    scan absorbs) instead of joining back against the feature frame."""
    t = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(t)
    n_chars = F.length(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    # nullif: empty text has n_chars 0 — the ratio must be NULL (DuckDB
    # semantics; NULL < 200 is NULL, and NULL AND FALSE = FALSE, so the
    # verdict is still a clean drop), never an ANSI divide-by-zero.
    return (
        (n_tok >= 10)
        & (n_chars >= 50)
        & (F.floor((n_punct * 1000) / F.nullif(n_chars, F.lit(0))) < 200)
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation
    and stopword ratios (×1000, integer — exact cross-engine compare),
    and a boolean keep/drop verdict like a pretraining quality filter."""
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = F.length(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_stop = stopword_hits(t, "en")
    # floor(), not cast: DuckDB CAST(double AS BIGINT) rounds while Spark
    # truncates — floor() is identical in both, keeping oracles exact.
    # nullif: ratios over empty text (n_chars/n_tok 0) are NULL exactly
    # like the DuckDB oracle, never ANSI divide-by-zero errors.
    punct_permille = F.floor((n_punct * 1000) / F.nullif(n_chars, F.lit(0)))
    stop_permille = F.floor((n_stop * 1000) / F.nullif(n_tok, F.lit(0)))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        (n_chars - F.length(F.replace(t, F.lit(" "), F.lit("")))).cast("long").alias("n_spaces"),
        n_punct.cast("long").alias("n_punct"),
        punct_permille.alias("punct_permille"),
        stop_permille.alias("stopword_permille"),
        (
            (n_tok >= 10) & (n_chars >= 50) & (punct_permille < 200)
        ).alias("quality_keep"),
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text. Used for exact-dup
    detection across shards without shipping full texts through the
    shuffle (hash first, group on the 32-char digest)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def document_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass profile: id, token counts, language guess, fingerprint."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        lang_id(text_col).alias("lang_guess"),
        fingerprint(text_col).alias("fingerprint"),
    )


def distinctive_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k most DISTINCTIVE terms per document: tf weighted by
    inverse document frequency, score = floor(tf · 10⁶ / df). Integer
    arithmetic instead of the classic log-idf on purpose: transcendental
    functions are not bit-identical across engines, integer division
    is — so this stays under the exact oracle gate while ranking the
    same way (1/df is monotone in idf).

    Plan: explode tokens once → (doc, term, tf) partial-aggregated
    map-side → term df from the same relation (distinct doc count per
    term) → join on term (shuffles (term, tf) pairs, never text) →
    per-doc top-k via row_number window. Ties break on the term string
    for determinism.

    Returns (id, term, score, rnk) with rnk ≤ k.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scored = tf.join(dfreq, "term").select(
        "_id",
        "term",
        F.floor((F.col("_tf") * 1_000_000) / F.col("_df")).alias("score"),
    )
    w = Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(F.col("_id").alias(id_col), "term", "score", "rnk")
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Adjacent character-pair frequencies weighted by word frequency —
    the statistic a BPE tokenizer trainer computes every merge
    iteration (most-frequent pair wins the merge).

    Scale shape — the classic BPE trick, distributed: aggregate the
    corpus to DISTINCT words with counts FIRST (one shuffle keyed on
    the word), then explode each distinct word's ≤ len-1 pairs weighted
    by its count. Pair statistics cost O(vocabulary), not O(corpus
    tokens) — at 100 TB the vocab is millions of rows while the corpus
    is trillions of tokens, so the explode runs on the small relation.
    Returns the ``top_n`` (pair, weight) rows, ties on the pair string.
    """
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    pairs = wf.filter(F.length("w") >= 2).select(
        "f",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("pair"))
        .limit(top_n)
    )


def common_ngram_density(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Boilerplate exposure per document: the permille of its distinct
    word n-grams that occur in ≥ ``min_df`` documents corpus-wide.
    High values mean the document is mostly template/boilerplate text
    shared with others — the per-document signal behind boilerplate
    stripping and near-dup triage.

    Scale shape: one explode of 8-byte shingle hashes (never the
    shingle strings), a groupBy on the hash for document frequency,
    and a hash-keyed join back — the same inverted-index skeleton as
    ngram_jaccard_pairs, but linear (no self-join). Returns
    (id, n_shingles, common_permille).
    """
    from adguard2clickhouse_spark.operators.dedup import (
        _kgram_hash_at,
        _shingle_starts,
    )

    from pyspark.storagelevel import StorageLevel

    # Codegen n-gram hashing (r14, the winnow lesson —
    # BENCH_winnow_r14.json): explode start positions and hash in a
    # regular projection instead of exploding an interpreted-HOF-built
    # array (transform() lambdas never reach WholeStageCodegen; the
    # interpreted tree measured ~40× the codegen'd identical
    # expression). The old array form got per-doc DISTINCT for free
    # via array_distinct; the row form pays one (id, hash) exchange
    # for dropDuplicates — measured a net win at sf10
    # (BENCH_kgram_codegen_r14.json) because map-side partial dedup
    # ships only the distinct rows the old plan also materialized.
    sh = (
        df.select(
            F.col(id_col).alias("_id"),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .select(
            "_id", "_toks",
            F.explode(_shingle_starts(F.col("_toks"), n)).alias("_i"),
        )
        .select(
            "_id", _kgram_hash_at(F.col("_toks"), F.col("_i"), n).alias("_h")
        )
        .dropDuplicates(["_id", "_h"])
    ).persist(
        # feeds both the df-count and the join-back — build once. DISK
        # ONLY, not memory-backed (r13, the spans.py lesson): this is a
        # LARGER-THAN-CORPUS exploded frame (one row per distinct
        # shingle per doc, ~1e9 rows at sf100) and a memory-backed
        # cache of it races the join for the default 8 GB heap — the
        # same shape heap-OOM'd x4_span_scrub at sf100; this one
        # survived at 289 s with cache pressure, local-disk blocks are
        # the storage level that scales with the frame.
        StorageLevel.DISK_ONLY
    )
    try:
        dfreq = sh.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
        out = (
            sh.join(dfreq, "_h")
            .groupBy("_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles"),
                F.floor(
                    F.sum(F.when(F.col("_df") >= min_df, 1).otherwise(0))
                    * 1000
                    / F.count(F.lit(1))
                )
                .cast("long")
                .alias("common_permille"),
            )
            .select(F.col("_id").alias(id_col), "n_shingles", "common_permille")
            .localCheckpoint(eager=True)
        )
    finally:
        sh.unpersist()
    return out


def hashed_bow(
    df: "DataFrame",
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Hashing-trick bag-of-words: token → stable md5 bucket in
    [0, dim), counted per document. The deterministic, engine-portable
    stand-in for a neural embedding — it connects the text tables to
    the vector operators (cosine top-k, LSH/PQ dedup) with a feature
    map any engine can replay, so the WHOLE text→embed→similarity
    pipeline sits under the hash gate.

    Returns (id, bucket, n) integer rows — the exact-SQL-twin shape;
    :func:`hashed_embedding` pivots to the array form for the vector
    operators."""
    from adguard2clickhouse_spark.operators.sampling import hash_bucket

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    )
    return (
        toks.groupBy(id_col, hash_bucket(F.col("_tok"), dim).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def hashed_embedding(
    df: "DataFrame",
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Dense L2-normalized array<double> form of :func:`hashed_bow`:
    per doc, counts pivot into a dim-length array via map_from_entries
    + a sequence transform (pure JVM — no UDF, one groupBy shuffle).
    Zero-token docs yield the zero vector (cosine() treats it as
    directionless, never similar)."""
    bow = hashed_bow(df, dim, text_col, id_col)
    as_map = bow.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("n")))
        ).alias("_m")
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at("_m", j), F.lit(0)).cast("double"),
    )
    nrm = F.sqrt(
        F.aggregate(counts, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return as_map.select(
        F.col(id_col),
        F.when(nrm == 0, counts)
        .otherwise(F.transform(counts, lambda v: v / nrm))
        .alias(vec_col),
    )
