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
