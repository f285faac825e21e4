"""pyspark.ml compatibility wrappers cross-validated against the
native exact implementations (SURVEY §2.12 names the stock MLlib
estimators as the checklist mappings; our custom LSH paths are the
production ones — these gates prove the two agree).
"""

from __future__ import annotations

from adguard2clickhouse_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.01"


def test_brp_ml_pairs_subset_and_recall(spark):
    """BucketedRandomProjectionLSH approxSimilarityJoin + exact-cosine
    re-verify: every emitted pair is in the exact answer (precision 1
    by construction) and recall stays above the tuned gate."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {tuple(r) for r in similarity.embedding_dup_pairs(emb, threshold=0.35).collect()}
    ml = {
        tuple(r)
        for r in similarity.embedding_dup_pairs_brp_ml(
            emb, threshold=0.35, num_hash_tables=4, bucket_length=2.0
        ).collect()
    }
    assert ml <= exact
    assert len(exact) > 100  # fixture sanity: the gate is not vacuous
    assert len(ml) / len(exact) >= 0.9


def test_minhash_ml_pairs_recall(spark):
    """MinHashLSH approxSimilarityJoin over hashed-shingle binary
    vectors recovers the exact inverted-index Jaccard pairs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        .select("doc_a", "doc_b")
        .collect()
    }
    ml = {tuple(r) for r in dedup.minhash_lsh_ml_pairs(docs, n=3, threshold=0.8).collect()}
    assert len(exact) > 10
    assert len(ml & exact) / len(exact) >= 0.9


def test_minhash_ml_guard_refuses_over_cap(spark):
    """The r15 candidate-mass guard: a duplicate-heavy corpus whose
    per-table bucket mass tops the cap refuses with the measured mass
    and names the banded native path (the stock single-hash tables
    cannot shed mass themselves)."""
    import pytest

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        dedup.minhash_lsh_ml_pairs(
            docs, n=3, threshold=0.8, max_candidate_pairs=10
        ).collect()


def test_minhash_ml_guard_parity_below_cap(spark):
    """Below the cap the guarded call is row-identical to the
    unguarded one — the probe is read-only."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    unguarded = {
        tuple(r)
        for r in dedup.minhash_lsh_ml_pairs(
            docs, n=3, threshold=0.8, max_candidate_pairs=None
        ).collect()
    }
    guarded = {
        tuple(r)
        for r in dedup.minhash_lsh_ml_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert guarded == unguarded


def test_brp_ml_guard_refuses_over_cap(spark):
    """Same guard on the BRP twin: an oversized bucket_length funnels
    every vector into few buckets; the probe measures that mass and
    refuses naming the native guarded path."""
    import pytest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    with pytest.raises(ValueError, match="embedding_dup_pairs_lsh"):
        similarity.embedding_dup_pairs_brp_ml(
            emb, threshold=0.35, bucket_length=1e9, max_candidate_pairs=10
        ).collect()
