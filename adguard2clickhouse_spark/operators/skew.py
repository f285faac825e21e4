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
) -> DataFrame:
    """Inner equi-join with the fat side salted and the slim side
    replicated ``salt`` ×. Use when one join key is hot enough that a
    single reducer would own it; the slim side pays salt× replication,
    so keep it the smaller relation."""
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic scatter: hash the full fat row's key + a spread
    # column-independent term; pmod keeps it in [0, salt)
    scatter = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
        F.lit(salt),
    ).cast("int")
    fat_s = fat.withColumn(_SALT, scatter)
    slim_s = slim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return fat_s.join(slim_s, keys + [_SALT]).drop(_SALT)
