"""Explicit skew handling: salted equi-join.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py), which splits oversized shuffle partitions at
runtime. The explicit salt is for what AQE cannot do: pre-committed
partitioning (bucketed tables whose layout must survive), streaming
joins where the plan is fixed across micro-batches, or a hot key known
ahead of time that should never land in one task in the first place.

Shape: the fat side scatters each row into one of ``salt`` sub-keys;
the slim side replicates each row ``salt`` times (one per sub-key).
Join on (key, salt) — the hot key's pairs now spread over ``salt``
tasks. Equality with the unsalted join holds for inner equi-joins by
construction: every (left row, right row) key match meets in exactly
one sub-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt_skew"


def salted_join(
    fat: DataFrame,
    slim: DataFrame,
    on: str | list[str],
    salt: int = 8,
    spread_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join with the fat side salted and the slim side
    replicated ``salt`` ×. Use when one join key is hot enough that a
    single reducer would own it; the slim side pays salt× replication,
    so keep it the smaller relation.

    Scatter: ``pmod(xxhash64(keys ++ spread_cols), salt)``. Pass
    ``spread_cols`` naming stable non-key columns of the fat side so
    a hot key's rows actually spread; the hash of stable column values
    is deterministic under task retries and recomputation, which keeps
    the salted plan safe for streaming joins and speculative execution
    (a row-id scatter would not be — monotonically_increasing_id
    changes across recomputes). With no spread_cols the scatter
    degenerates to one sub-key per key value: correct, but no skew
    relief — so insist on them.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not spread_cols:
        raise ValueError(
            "salted_join needs spread_cols: stable fat-side non-key "
            "columns that differentiate rows within a hot key"
        )
    scatter = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys + list(spread_cols)]),
        F.lit(salt),
    ).cast("int")
    fat_s = fat.withColumn(_SALT, scatter)
    slim_s = slim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return fat_s.join(slim_s, keys + [_SALT]).drop(_SALT)
