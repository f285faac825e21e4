"""Deterministic dataset splitting & sampling (brief §extensions: the
train/val/test plumbing every training-data pipeline needs).

Hash-based, not random: a document's split assignment is a pure
function of its id, so it is stable across runs, machines, partitions
and engine versions — re-ingesting the corpus can never leak val/test
documents into train. The hash is md5 (not xxhash64) deliberately:
md5 exists in every engine (DuckDB included), so split assignment is
oracle-checkable and portable off Spark.

Scale: a narrow projection — no shuffle, no sampling state; filters
on the split column push into the parquet scan when materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(col: Column | str, buckets: int = _BUCKETS) -> Column:
    """Stable bucket in [0, buckets): first 8 hex digits of
    md5(CAST(id AS STRING)) mod buckets. 32 bits of hash → bias from
    the modulo is ≤ buckets/2³² (negligible at 10⁴ buckets)."""
    c = F.col(col) if isinstance(col, str) else col
    h32 = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h32, F.lit(buckets)).cast("int")


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_permille: int = 50,
    test_permille: int = 50,
    split_col: str = "split",
) -> DataFrame:
    """Label every row train/val/test by id-hash bucket: buckets
    [0, val) → val, [val, val+test) → test, the rest → train
    (permille of the 10 000-bucket space)."""
    b = hash_bucket(id_col)
    val_hi = val_permille * _BUCKETS // 1000
    test_hi = val_hi + test_permille * _BUCKETS // 1000
    return df.withColumn(
        split_col,
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def deterministic_sample(
    df: DataFrame, rate_permille: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~rate_permille/1000 of rows, chosen by id hash — the same
    rows every run (unlike df.sample, which varies with partitioning).
    Composable: a 100‰ sample is a superset of a 50‰ sample."""
    return df.filter(hash_bucket(id_col) < rate_permille * _BUCKETS // 1000)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    per_stratum: int,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Exactly ``per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen deterministically: rank rows inside each
    stratum by md5(id) — a stable pseudo-random order — and keep the
    first k. Rebalancing language/source mixes this way is how corpus
    recipes hit their per-domain token budgets reproducibly.

    Scale: one shuffle on the stratum key. The per-stratum sort the
    row_number needs is bounded by stratum size — for skew-prone
    strata (one language dominating a corpus) prefer two-phase: a
    ``deterministic_sample`` pre-filter at ≈k/N_stratum rate to shrink
    the big strata, then this exact top-k on the survivors.
    """
    from pyspark.sql.window import Window

    c = F.col(id_col)
    w = Window.partitionBy(strata_col).orderBy(F.md5(c.cast("string")), c)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= per_stratum)
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global training order: every row gets a (shard,
    position) that is a pure function of its id — the corpus "shuffle"
    a training run needs, stable across runs, machines, partitioning
    and engine versions (unlike orderBy(rand()) which changes with the
    seed plumbing and task layout).

    Shard = id-hash bucket; position = rank of md5(id) within the
    shard. Scale shape: one shuffle on the shard key and a per-shard
    sort — never a single global window. Readers consume shards
    independently and interleave them; two-level randomness (hash
    spread across shards, md5 order within) is the standard epoch-
    shuffle layout.
    """
    from pyspark.sql.window import Window

    c = F.col(id_col)
    w = Window.partitionBy(shard_col).orderBy(F.md5(c.cast("string")), c)
    return df.withColumn(
        shard_col, hash_bucket(id_col, n_shards).cast("long")
    ).withColumn(pos_col, F.row_number().over(w).cast("long"))


def with_fold(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """K-fold cross-validation assignment: fold = md5-bucket(id) mod k.

    Hash-derived like with_split, and for the same reason — the fold of
    a document is a pure function of its id, so re-ingestion, joins, or
    repartitioning can never migrate a document across folds (the
    leakage that silently invalidates cross-validation). Fold i's
    training set is simply ``fold != i``: one predicate, no sampling
    state to store or ship.
    """
    return df.withColumn(
        fold_col, F.pmod(hash_bucket(id_col), F.lit(k)).cast("int")
    )


def with_split_leakage_safe(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component",
    val_permille: int = 50,
    test_permille: int = 50,
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split by NEAR-DUP CLUSTER, not by document: the
    md5 bucket is taken over the cluster representative, so every
    member of a near-duplicate cluster lands in the SAME split — the
    guard against the classic eval-contamination bug where a test
    document's near-copy sits in train and the benchmark silently
    measures memorization (with_split alone cannot prevent this: two
    near-dups have independent ids, hence independent buckets).

    ``clusters`` is any (id, component) frame — typically
    ``graph.connected_components`` over ``dedup.ngram_jaccard_pairs``
    or ``minhash_lsh_pairs`` edges, where the component label is the
    cluster's minimum id. Singleton docs are their own component, so
    their assignment degenerates to exactly ``with_split``'s.

    Scale: one equi-join on the id (broadcast when the cluster map is
    small; at corpus scale both sides hash-partition on the id — the
    same shuffle the closure already paid) and then the same narrow
    bucket projection as ``with_split``. Deterministic end to end:
    component labels are min-ids (stable), md5 is engine-portable, so
    the split survives re-ingestion and engine swaps bit-for-bit.
    """
    joined = df.join(clusters.select(id_col, component_col), id_col)
    b = hash_bucket(component_col)
    val_hi = val_permille * _BUCKETS // 1000
    test_hi = val_hi + test_permille * _BUCKETS // 1000
    return joined.withColumn(
        split_col,
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )
