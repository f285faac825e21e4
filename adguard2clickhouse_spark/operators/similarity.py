"""Similarity search over embedding columns (brief §extensions, X3).

Two paths:

- brute-force cosine top-k — the exact baseline. Dot products via
  higher-order functions (zip_with + aggregate) in DOUBLE, JVM-side,
  deterministic left-to-right fold (matches the DuckDB oracle's
  list_dot_product bit-for-bit).
- random-hyperplane LSH buckets — the scale path. Each vector gets a
  b-bit signature (sign of dot with b fixed random hyperplanes,
  seed=42); candidates come from bucket-equality joins, so the
  all-pairs O(n²) never materializes. Recall is tunable via multiple
  independent tables (offset seeds).

At 100 TB the brute-force path is still the right *per-bucket* kernel:
LSH narrows to buckets, brute-force ranks within them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    The query vector is a literal array → the whole scan+score is one
    codegen stage; top-k is a TakeOrderedAndProject (no full sort).
    Ties break on id for cross-engine determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k corpus neighbors for every query row (broadcast the
    smaller query side; rank within query partition)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (scale path)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def lsh_signature(vec_col: Column, dim: int, bits: int = 16, seed: int = 42) -> Column:
    """b-bit signature: bit i = sign(v · plane_i). Planes are literals
    folded into the plan — no join against a planes table needed."""
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        sig = sig + F.when(dot(vec_col, p) > 0, F.lit(1 << i)).otherwise(0)
    return sig


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose signature is within
    Hamming ≤ 2 of the query's signature (bucket + near-bucket probe).

    At corpus scale the signature column is precomputed/persisted and
    the probe is a partition-pruned scan; here it's inline.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qsig = 0
    for i in range(bits):
        if float(np.dot(query_vec, planes[i])) > 0:
            qsig |= 1 << i

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    with_sig = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_signature(F.col(vec_col), dim, bits, seed).alias("_sig"),
    )
    candidates = with_sig.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= 2
    )
    return (
        candidates.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )
