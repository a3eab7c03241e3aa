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

As of round 16 the ANN serving rankings (queries/similarity.py) use the
plain rank window instead: Spark 4's InferWindowGroupLimit plants a
PARTIAL WindowGroupLimit below the exchange, achieving this exact bound
in pure JVM with no Python boundary. This operator remains for fused
Python stages that need the bound INSIDE an existing mapInPandas pass
(operators/pq.py fuses the same idea into its ADC scan) and as the
reference implementation its tests pin.
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
    tie-break columns to be total, or the subset property fails).

    Null semantics (they differ between pandas and Spark, and a silent
    mismatch breaks the subset property):

    - null GROUP KEYS are kept (``dropna=False``) — a Spark window
      treats a null key as a real partition, so stage 1 must too;
    - null ORDER values are placed where Spark's default window ordering
      puts them (asc → nulls first, desc → nulls last).  pandas can only
      express one ``na_position`` per sort call, so a mixed-direction
      ordering is fine only while at most ONE direction's columns
      actually contain nulls (the common case: a nullable sort column
      plus a non-null tie-break); when null-bearing columns need BOTH
      placements in one batch this raises ``ValueError`` rather than
      silently dropping candidates;
    - float order columns must not contain NaN: Arrow→pandas folds NULL
      and NaN together there, while Spark orders NaN greatest — the
      caller must pre-filter (every current call site orders by computed
      finite distances, so this costs nothing).
    """
    cols: List[str] = [c for c, _ in order]
    asc: List[bool] = [a for _, a in order]
    keys = list(keys)
    schema = df.schema
    if all(asc):
        na_position = "first"  # Spark: ASC NULLS FIRST
    elif not any(asc):
        na_position = "last"  # Spark: DESC NULLS LAST
    else:
        na_position = None  # mixed: only valid if order cols are null-free

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                if na_position is None:
                    # Spark's placement per direction: asc → first,
                    # desc → last. One na_position can serve a mixed
                    # ordering iff the columns that actually HOLD nulls
                    # all want the same side.
                    wanted = {
                        "first" if a else "last"
                        for c, a in order
                        if pdf[c].isna().any()
                    }
                    if len(wanted) > 1:
                        raise ValueError(
                            "partition_local_topk: mixed asc/desc ordering "
                            f"over {cols} with null order values in BOTH "
                            "directions — pandas cannot reproduce Spark's "
                            "per-direction null placement; pre-filter nulls "
                            "or use a homogeneous ordering"
                        )
                    pos = wanted.pop() if wanted else "last"
                else:
                    pos = na_position
                yield (
                    pdf.sort_values(cols, ascending=asc, kind="mergesort", na_position=pos)
                    .groupby(keys, sort=False, dropna=False)
                    .head(k)
                )

    return df.mapInPandas(f, schema)
