"""Vocabulary build, tf·idf retrieval and mixture planning
(operators/retrieval.py, operators/mixture.py)."""

from __future__ import annotations

import pytest

from adguard2clickhouse_spark.operators.mixture import (
    mixture_quotas,
    mixture_sample,
)
from adguard2clickhouse_spark.operators.retrieval import build_vocab, tfidf_search


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a a a b c", "en", "s0"),
        (1, "a b b d", "en", "s0"),
        (2, "a c d d d", "fr", "s1"),
        (3, "e", "fr", "s1"),
        (4, "a e e", "de", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_vocab_dense_ids_and_order(corpus):
    out = build_vocab(corpus, vocab_size=3).collect()
    # a: 6 occurrences in 4 docs; d: 4 in 2; b: 3 in 2; e: 3 in 2; c: 2 in 2
    assert [(r.token, r.token_id, r.cnt) for r in out] == [
        ("a", 0, 6),
        ("d", 1, 4),
        ("b", 2, 3),  # tie with e at cnt=3 → token string breaks it
    ]
    assert [r.n_docs for r in out] == [4, 2, 2]


def test_vocab_caps_at_distinct_tokens(corpus):
    assert build_vocab(corpus, vocab_size=100).count() == 5


def test_tfidf_scores_and_rank(corpus):
    out = {r.doc_id: r for r in tfidf_search(corpus, ["a", "e"], k=10).collect()}
    # df(a)=4, df(e)=2. doc0: tf(a)=3 → 750000. doc4: tf(a)=1,tf(e)=2 → 250000+1000000.
    assert out[4].score == 1_250_000 and out[4].n_hits == 2
    assert out[0].score == 750_000 and out[0].n_hits == 1
    assert out[3].score == 500_000  # tf(e)=1 → floor(1e6/2)
    ranks = sorted((r.rnk, r.doc_id) for r in out.values())
    assert ranks[0] == (1, 4)  # highest score ranks first


def test_tfidf_ignores_absent_terms(corpus):
    out = tfidf_search(corpus, ["zzz"], k=10)
    assert out.count() == 0


def test_mixture_quotas_integer_weights(corpus):
    q = {r.lang: r for r in mixture_quotas(corpus, "lang", budget=9).collect()}
    # counts: en=2, fr=2, de=1 → squares 4, 4, 1, Σ=9
    assert q["en"].weight_permille == 444 and q["de"].weight_permille == 111
    # quota = floor(9·w/9) capped at n_docs: en → min(4,2)=2, de → min(1,1)=1
    assert q["en"].quota == 2 and q["fr"].quota == 2 and q["de"].quota == 1


def test_mixture_sample_respects_quota_and_determinism(corpus):
    s1 = mixture_sample(corpus, "lang", budget=9)
    got = s1.groupBy("lang").count().collect()
    assert {r.lang: r["count"] for r in got} == {"en": 2, "fr": 2, "de": 1}
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in mixture_sample(corpus.repartition(7), "lang", budget=9).collect()
    )


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference Sennrich BPE: overlapping pair stats, argmax with
    lexicographic (left, right) tie-break, greedy left-to-right
    non-overlapping merge application."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for step in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        wt = max(stats.values())
        l, r = min(p for p, v in stats.items() if v == wt)
        merges.append((step, l, r, wt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_reference(spark):
    """The distributed merge loop reproduces the scan-index reference
    algorithm exactly — merge table AND final symbolization — on a
    corpus with repeated morphology ('low/lower/lowest ...') where
    overlap counting and tie-breaks both matter."""
    from adguard2clickhouse_spark.operators.retrieval import bpe_train

    texts = [
        "low low low lower lower lowest",
        "new newer newest new new",
        "wide wider widest low new",
        "aaa aa aaa",  # overlapping pairs: 'aaa' counts (a,a) twice
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1

    got_merges, got_syms = bpe_train(df, n_merges=12)
    ref_merges, ref_vocab = _ref_bpe(freqs, 12)
    assert got_merges == ref_merges
    got_final = {tuple(r.s): r.f for r in got_syms.collect()}
    assert got_final == ref_vocab


def _ref_encode(text: str, merges) -> list[str]:
    toks: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


def test_bpe_apply_matches_reference_encoder(spark):
    from adguard2clickhouse_spark.operators.retrieval import bpe_apply

    merges = [("t", "h"), ("th", "e"), ("e", "r"), ("a", "a")]
    texts = [
        "the thermal aaaa berth  other",  # double space → empty token dropped
        "x theee aa a",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.bpe_tokens for r in bpe_apply(df, merges).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_encode(t, merges), t


def test_bpe_apply_arrow_matches_expression_form(spark):
    """r14: the Arrow memoized kernel (now behind x4_bpe_encode — the
    expression form's nested interpreted HOF folds measured 42× slower
    at sf10 and 685 s at sf100) must produce the BIT-IDENTICAL token
    stream as the all-JVM expression form and the reference encoder,
    including the greedy-overlap ('aaaa' under (a,a)), empty-token and
    NULL-text edges. The memo must not leak state across words."""
    from adguard2clickhouse_spark.operators.retrieval import (
        bpe_apply,
        bpe_apply_arrow,
    )

    merges = [("t", "h"), ("th", "e"), ("e", "r"), ("a", "a"), ("aa", "aa")]
    texts = [
        "the thermal aaaa berth  other",
        "x theee aa a aaaaa",
        "",
        None,
        "aaaa aaaa the the",  # repeated words: memo hits must not drift
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = {r.doc_id: r.bpe_tokens for r in bpe_apply(df, merges).collect()}
    got = {r.doc_id: r.bpe_tokens for r in bpe_apply_arrow(df, merges).collect()}
    # expression form drops NULL-split rows? both must agree doc-by-doc
    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i], (i, texts[i])
    for i, t in enumerate(texts):
        if t is not None:
            assert got[i] == _ref_encode(t, merges), t


def test_bpe_train_then_apply_reproduces_training_symbols(spark):
    """Encoding the training corpus with the learned merge table must
    reproduce the final training symbolization word for word — the
    consistency that makes a stored merge table sufficient to tokenize
    new data identically."""
    from adguard2clickhouse_spark.operators.retrieval import bpe_apply, bpe_train

    texts = ["low lower lowest", "new newer newest", "low new lower"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, syms = bpe_train(df, n_merges=6)
    table = [(l, r) for _, l, r, _ in merges]
    trained = {"".join(r.s): list(r.s) for r in syms.collect()}
    for w, expect in trained.items():
        got = bpe_apply(
            spark.createDataFrame([(0, w)], "doc_id long, text string"), table
        ).head().bpe_tokens
        assert got == expect, w


def test_oov_rate_counts_against_vocab(spark):
    from adguard2clickhouse_spark.operators.retrieval import oov_rate

    docs = spark.createDataFrame(
        [(0, "a a b zz", "s0"), (1, "a  b", "s1"), (2, "qq rr", "s1")],
        "doc_id long, text string, source string",
    )
    vocab = spark.createDataFrame([("a",), ("b",)], "token string")
    out = {r.source: r for r in oov_rate(docs, vocab).collect()}
    assert (out["s0"].n_tokens, out["s0"].n_oov, out["s0"].oov_permille) == (4, 1, 250)
    # empty tokens from the double space are dropped
    assert (out["s1"].n_tokens, out["s1"].n_oov, out["s1"].oov_permille) == (4, 2, 500)


def test_unigram_logprob_matches_hand_computation(spark):
    """Tiny corpus where the unigram model is computable by hand:
    every per-token micro term and the per-doc integer sums."""
    import math

    from adguard2clickhouse_spark.operators.retrieval import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], ["doc_id", "text"]
    )
    # counts: a=2, b=2, c=1; total=5
    t = {tok: math.floor(1e6 * math.log(c / 5)) for tok, c in
         {"a": 2, "b": 2, "c": 1}.items()}
    got = {r.doc_id: (r.n_tokens, r.logprob_micro)
           for r in unigram_logprob(df).collect()}
    assert got[1] == (3, 2 * t["a"] + t["b"])
    assert got[2] == (2, t["b"] + t["c"])
    # sanity: the rarer-token doc scores lower per token
    assert got[2][1] / 2 < got[1][1] / 3


def test_bm25_matches_hand_computation(spark):
    """BM25 with k1=6/5, b=3/4 on a 3-doc corpus, scored by hand via
    the exact rational form (44*total*tf) // (20*total*tf + 6*total +
    18*dl*N)."""
    import math

    from adguard2clickhouse_spark.operators.retrieval import bm25_search

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z z z"), (3, "y z w")], ["doc_id", "text"]
    )
    # N=3, total=10; query {x}: df=2, idf_micro=floor(1e6*ln(8/5))
    idf = math.floor(1e6 * math.log(8 / 5))
    def frac(tf, dl):
        return (idf * 44 * 10 * tf) // (20 * 10 * tf + 6 * 10 + 18 * dl * 3)
    got = {r.doc_id: (r.score_micro, r.n_hits, r.rnk)
           for r in bm25_search(df, ["x"], k=10).collect()}
    assert got[1] == (frac(2, 3), 1, 1)   # tf=2, dl=3 wins
    assert got[2] == (frac(1, 4), 1, 2)
    assert 3 not in got


def test_bm25_length_normalization_orders_equal_tf(spark):
    """Equal tf: the shorter document must score higher (the b-term
    at work), and rnk reflects it."""
    from adguard2clickhouse_spark.operators.retrieval import bm25_search

    df = spark.createDataFrame(
        [(1, "q a"), (2, "q a a a a a a a")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.rnk for r in bm25_search(df, ["q"], k=10).collect()}
    assert got[1] == 1 and got[2] == 2


def test_bpe_apply_arrow_memo_bound_preserves_parity(spark):
    """r15 (ADVICE r14): the per-task memo is bounded (cleared wholesale
    at memo_max_entries so a high-distinct vocabulary can't grow worker
    RSS without limit). A pathologically tiny cap — forcing clears
    mid-word-stream, including between repeated occurrences of the same
    word — must not change a single token."""
    from adguard2clickhouse_spark.operators.retrieval import (
        bpe_apply,
        bpe_apply_arrow,
    )

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("aa", "aa")]
    texts = [f"the w{i} aaaa the w{i} tail" for i in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = {r.doc_id: r.bpe_tokens for r in bpe_apply(df, merges).collect()}
    got = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply_arrow(df, merges, memo_max_entries=2).collect()
    }
    assert got == want
