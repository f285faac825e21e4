"""Quadratic-candidate guards on the exact/demo dedup forms (r9).

The scale-killer failure mode of the inverted-index Jaccard join and
the fixed-bits LSH bucket join is a silent quadratic candidate blowup
(measured: heap exhaustion at sf10 on a replicated corpus). Both
operators now probe the exact candidate count — Σ m·(m−1)/2 over the
ACTUAL join input — with one linear aggregate and refuse, naming the
measured mass and the scale-safe alternative, instead of attempting
the join. Same pattern as with_fill's axis guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adguard2clickhouse_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def boiler_docs(spark):
    """12 docs sharing one boilerplate 3-shingle ('terms of service')
    plus unique tails — the shared shingle alone contributes
    12·11/2 = 66 candidate pairs."""
    rows = [
        (i, f"terms of service unique{i} tail{i} word{i}") for i in range(12)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_jaccard_guard_trips_with_named_mass_and_fixes(boiler_docs):
    with pytest.raises(ValueError) as e:
        dedup.ngram_jaccard_pairs(boiler_docs, n=3, max_candidate_pairs=10)
    msg = str(e.value)
    assert "66" in msg  # the measured mass, not a guess
    assert "max_df_ratio" in msg and "minhash_lsh_pairs" in msg


def test_jaccard_guard_probes_post_cap_input(boiler_docs):
    """The probe measures the join the caller actually runs: with the
    boilerplate shingle df-capped out of the join, the same corpus
    passes the same tiny cap."""
    out = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, max_df=2, max_candidate_pairs=10
    )
    assert out.count() == 0  # unique tails: nothing left to pair


def test_jaccard_default_cap_and_disable_unchanged(boiler_docs):
    expected = dedup.ngram_jaccard_pairs(
        boiler_docs, n=3, threshold=0.3, max_candidate_pairs=None
    ).collect()
    got = dedup.ngram_jaccard_pairs(boiler_docs, n=3, threshold=0.3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


@pytest.fixture(scope="module")
def clone_vecs(spark):
    """10 identical vectors — every LSH table puts all of them in one
    bucket: 4 tables x 10·9/2 = 180 candidates before pair-dedup."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_guard_trips_on_clone_bucket(clone_vecs):
    with pytest.raises(ValueError) as e:
        similarity.embedding_dup_pairs_lsh(
            clone_vecs, dim=4, max_candidate_pairs=100
        )
    msg = str(e.value)
    assert "180" in msg
    assert "max_bucket" in msg and "bits" in msg


def test_lsh_guard_probes_post_bucket_cap(clone_vecs):
    """max_bucket drops the clone bucket from the join; the guard sees
    the join that will actually run and lets it through."""
    out = similarity.embedding_dup_pairs_lsh(
        clone_vecs, dim=4, max_bucket=5, max_candidate_pairs=100
    )
    assert out.count() == 0


def test_lsh_default_cap_passes_fixture(clone_vecs):
    pairs = similarity.embedding_dup_pairs_lsh(clone_vecs, dim=4).count()
    assert pairs == 45  # all identical vectors pair up
