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
