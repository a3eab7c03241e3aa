"""Skew-handling helpers (SURVEY §4 partitioning notes; 100 TB design).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled`` — on in session.py). For skewed
*aggregation* keys (one giant group), the classic fix is salting: spread
each key over N sub-keys, partially aggregate, then merge. Both stages are
map-side-combinable, so the hot key's traffic divides by N.

``salted_agg`` keeps the salt deterministic (hash of a secondary column,
not rand()) so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    salt_on: str,
    n_salt: int = 8,
    out: str = "total",
) -> DataFrame:
    """Two-stage sum: groupBy(keys + salt) → groupBy(keys). Equivalent to a
    plain groupBy-sum, but the first shuffle spreads a hot key across
    ``n_salt`` partitions."""
    salt = (F.xxhash64(F.col(salt_on)) % n_salt).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(F.sum(value).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key,
    salt_on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join for when the small side is too large to
    broadcast and AQE's skew splitting isn't available (e.g. a storage
    layout pins partitioning): salt the big side deterministically, then
    replicate each small-side row across all ``n_salt`` sub-keys so every
    salted partition can still find its match. Traffic for a hot key
    divides by ``n_salt``; the small side grows by the same factor —
    the classic trade, made explicit.

    Result equals ``big.join(small, key, how)`` for 'inner' and 'left'
    (verified in tests/test_scale_patterns.py).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics-preserving)")
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salt))
    big_s = big.withColumn("_salt", salt)
    small_r = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salt)]))
    )
    joined = big_s.join(small_r, keys + ["_salt"], how)
    return joined.drop("_salt")
