"""Two-stage per-key top-k: bound a ranking window's shuffle input.

``Window.partitionBy(k).orderBy(...)`` + ``row_number() <= n`` is
correct but shuffles EVERY candidate row to the key's reducer. At 100 TB
the candidate set per key (e.g. every scored ANN neighbor of a query)
dwarfs n, so the exchange — not the scoring — becomes the bottleneck.
The classic fix (Spark's own TakeOrderedAndProject does it for global
sort+limit, but nothing does it per key) is a partial top-k before the
shuffle: each Arrow batch keeps only its local top-n per key UNDER THE
SAME ORDERING the global window applies, which makes the global top-n
provably a subset of the union of local top-ns. The exchange then
carries ≤ batches × keys × n rows.

Used by the ANN serving rankings (queries/similarity.py) and the PQ/ADC
scans (operators/pq.py implements the same idea fused into its scan).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame


def partition_local_topk(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Tuple[str, bool]],
    k: int,
) -> DataFrame:
    """Keep only each Arrow batch's top-``k`` rows per ``keys`` group
    under ``order`` ([(column, ascending), ...]) — stage 1 of a
    two-stage top-k. Schema is unchanged; follow with the usual global
    ranking window (which must use the SAME ordering, with enough
    tie-break columns to be total, or the subset property fails)."""
    cols: List[str] = [c for c, _ in order]
    asc: List[bool] = [a for _, a in order]
    keys = list(keys)
    schema = df.schema

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(cols, ascending=asc, kind="mergesort")
                    .groupby(keys, sort=False)
                    .head(k)
                )

    return df.mapInPandas(f, schema)
