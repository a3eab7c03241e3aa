"""Product quantization (PQ) for approximate nearest neighbour at scale.

The missing piece between LSH/IVF pruning and a 100 TB vector corpus is
MEMORY: raw float32×D embeddings are ~100-1000× larger than the PQ codes
FAISS-style systems actually scan. PQ (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public):

- split each D-dim vector into ``m`` subvectors of D/m dims;
- train an independent k-means codebook (k ≤ 256) per subspace;
- encode every vector as ``m`` one-byte codes;
- answer a query by Asymmetric Distance Computation (ADC): precompute an
  (m × k) lookup table of partial squared distances from the query to
  every codeword, then a vector's distance is ``m`` table adds.

Spark mapping, all stages distributed:

- **training** (:func:`train_pq`): one Arrow-batched pass per Lloyd
  iteration assigns all m subspaces at once (vectorized argmin), then a
  JVM groupBy((subspace, code)) computes the new codewords; only the
  m·k codeword rows are collected per iteration (same driver-size
  discipline as operators/kmeans.py).
- **encoding** (:func:`encode_pq`): map-side vectorized argmin — a pure
  function of the vector, zero shuffles; codes land as
  ``array<smallint>`` (m bytes of information per vector).
- **search** (:func:`pq_adc_topk`): per-query LUTs are numpy on the
  driver (m·k floats each — trivially broadcastable at any query batch
  size), the scan is a mapInPandas over the CODES table only (the float
  embeddings are never touched at query time), and the global top-k is
  one window over ``candidates × queries`` partial results.

Composes with the IVF family in queries/similarity.py exactly like
FAISS IVF-PQ: coarse cells prune the scan, PQ compresses what remains.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)


def _as_matrix(series: "pd.Series") -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in series])


def train_pq(
    emb: DataFrame, m: int = 8, k: int = 16, n_iter: int = 6
) -> np.ndarray:
    """Train per-subspace codebooks → (m, k, D/m) ndarray.

    ``emb`` columns: (vec_id, emb array). Init = subvectors of the first
    k vectors by vec_id (deterministic, like operators/kmeans.py)."""
    first = [r.emb for r in emb.orderBy("vec_id").limit(k).collect()]
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    books = np.asarray(first, dtype=np.float64).reshape(k, m, ds).transpose(1, 0, 2).copy()

    assign_schema = StructType(
        [
            StructField("subspace", IntegerType()),
            StructField("code", IntegerType()),
            StructField("subvec", ArrayType(DoubleType())),
        ]
    )
    for _ in range(n_iter):
        bk = books.copy()  # ships by value in the closure

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _as_matrix(pdf["emb"]).reshape(len(pdf), m, ds)
                # (n, m, k) squared distances → (n, m) codes
                d2 = ((x[:, :, None, :] - bk[None, :, :, :]) ** 2).sum(-1)
                codes = d2.argmin(-1)
                n = len(pdf)
                yield pd.DataFrame(
                    {
                        "subspace": np.repeat(np.arange(m), n),
                        "code": codes.T.reshape(-1),
                        "subvec": [
                            x[i, j].tolist() for j in range(m) for i in range(n)
                        ],
                    }
                )

        rows = (
            emb.mapInPandas(assign, assign_schema)
            .groupBy("subspace", "code")
            .agg(*[F.avg(F.col("subvec")[i]).alias(f"c{i}") for i in range(ds)])
            .collect()
        )
        for r in rows:  # empty codes keep their previous codeword
            books[r.subspace, r.code] = [getattr(r, f"c{i}") for i in range(ds)]
    return books


_CODE_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("codes", ArrayType(ShortType())),
    ]
)


def encode_pq(emb: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, emb) → (vec_id, codes array<smallint>) — map-side."""
    m, k, ds = books.shape
    bk = books.copy()

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = _as_matrix(pdf["emb"]).reshape(len(pdf), m, ds)
            codes = ((x[:, :, None, :] - bk[None, :, :, :]) ** 2).sum(-1).argmin(-1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": [c.astype(np.int16) for c in codes]}
            )

    return emb.mapInPandas(enc, _CODE_SCHEMA)


_CAND_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("adc_dist", DoubleType()),
    ]
)


def _local_topk_frame(
    d: np.ndarray,
    vec_ids: np.ndarray,
    qids: List[int],
    topk: int,
    rounded: bool,
    masks=None,
) -> Optional[pd.DataFrame]:
    """Per-batch local top-k (two-stage top-k, stage 1). Selection uses
    the SAME (distance, vec_id) ordering the global window applies — with
    the rounded key when ``rounded`` — so the global top-k is provably a
    subset of the union of local top-ks, and the shuffle after the scan
    carries ≤ batches × nq × topk rows instead of every scored pair."""
    keys = np.round(d, 6) if rounded else d
    frames = []
    for i, qid in enumerate(qids):
        ki, vi, di = keys[i], vec_ids, d[i]
        if masks is not None:
            mask = masks[i]
            if not mask.any():
                continue
            ki, vi, di = ki[mask], vec_ids[mask], di[mask]
        order = np.lexsort((vi, ki))[:topk]
        frames.append(
            pd.DataFrame(
                {"query_id": qid, "vec_id": vi[order], "adc_dist": di[order]}
            )
        )
    if not frames:
        return None
    return pd.concat(frames, ignore_index=True)


def _global_topk(candidates: DataFrame, topk: int, rank_rounded: bool) -> DataFrame:
    order = F.round("adc_dist", 6) if rank_rounded else F.asc("adc_dist")
    w = Window.partitionBy("query_id").orderBy(order, F.asc("vec_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "vec_id", "rank", F.round("adc_dist", 6).alias("adc_dist"))
    )


def pq_adc_candidates(
    codes: DataFrame,
    books: np.ndarray,
    queries: Sequence[Tuple[int, Sequence[float]]],
    topk: int = 10,
    rank_rounded: bool = False,
) -> DataFrame:
    """Stage-1 ADC scan → per-batch local top-k candidates (bounded)."""
    m, k, ds = books.shape
    q = np.asarray([v for _, v in queries], dtype=np.float64).reshape(-1, m, ds)
    luts = ((q[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)  # (nq, m, k)
    qids = [int(i) for i, _ in queries]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["codes"]])
            # (nq, n) distances: gather each query's LUT at the codes
            d = luts[:, sub[None, :], c].sum(-1)  # (nq, n)
            out = _local_topk_frame(
                d, pdf["vec_id"].values, qids, topk, rank_rounded
            )
            if out is not None:
                yield out

    return codes.mapInPandas(scan, _CAND_SCHEMA)


def pq_adc_topk(
    codes: DataFrame,
    books: np.ndarray,
    queries: Sequence[Tuple[int, Sequence[float]]],
    topk: int = 10,
    rank_rounded: bool = False,
) -> DataFrame:
    """ADC top-k per query → (query_id, vec_id, rank, adc_dist).

    LUTs: (nq, m, k) partial squared distances, built driver-side (numpy,
    a few KB) and shipped by value; the distributed scan reads ONLY the
    codes table and does m gathers + adds per (vector, query), emitting a
    per-batch local top-k so the global window shuffles a bounded set.

    ``rank_rounded`` orders by the 6-decimal-rounded distance (then
    vec_id) instead of the raw double — used by the oracle-gated query so
    rank assignment can't flip on sub-1e-6 summation-order noise between
    engines."""
    cands = pq_adc_candidates(codes, books, queries, topk, rank_rounded)
    return _global_topk(cands, topk, rank_rounded)


def _probe_cells(
    q: np.ndarray, centroids: np.ndarray, nprobe: int
) -> List[List[int]]:
    """Each query's nprobe nearest coarse cells, ENGINE-DETERMINISTICALLY:
    squared distances as a sequential float64 fold over dims (bit-matching
    the SQL oracle's list_sum left-to-right accumulation, not numpy's
    pairwise summation), stable-sorted so cent_id breaks exact ties the
    same way on both engines."""
    nq, dim = q.shape
    d2c = np.zeros((nq, len(centroids)), dtype=np.float64)
    for j in range(dim):
        d2c += (q[:, j, None] - centroids[None, :, j]) ** 2
    return [
        np.argsort(d2c[i], kind="stable")[:nprobe].tolist() for i in range(nq)
    ]


def ivfpq_topk(
    codes_with_cell: DataFrame,
    books: np.ndarray,
    centroids: np.ndarray,
    queries: Sequence[Tuple[int, Sequence[float]]],
    topk: int = 10,
    nprobe: int = 4,
    rank_rounded: bool = False,
) -> DataFrame:
    """IVF-PQ serving (the FAISS production composition): coarse centroids
    prune the scan to each query's ``nprobe`` nearest cells, ADC scores
    only the surviving CODES, and each Arrow batch emits its local top-k
    before the single bounded global ranking shuffle.

    ``codes_with_cell``: (vec_id, codes, cell_id) — at 100 TB this table
    is written partitioned by ``cell_id`` so the ``isin`` filter below
    becomes partition pruning (only probed cell files are read at all);
    the ADC cost then follows nprobe/K of the corpus, at PQ memory."""
    cands = ivfpq_candidates(
        codes_with_cell, books, centroids, queries, topk, nprobe, rank_rounded
    )
    return _global_topk(cands, topk, rank_rounded)


def ivfpq_candidates(
    codes_with_cell: DataFrame,
    books: np.ndarray,
    centroids: np.ndarray,
    queries: Sequence[Tuple[int, Sequence[float]]],
    topk: int = 10,
    nprobe: int = 4,
    rank_rounded: bool = False,
) -> DataFrame:
    """Stage-1 IVF-PQ scan → per-batch local top-k candidates (bounded)."""
    m, k, ds = books.shape
    q = np.asarray([v for _, v in queries], dtype=np.float64)
    cells_per_q = _probe_cells(q, centroids, nprobe)
    probe = {int(qid): set(cells_per_q[i]) for i, (qid, _) in enumerate(queries)}
    union_cells = sorted(set().union(*probe.values()))

    qm = q.reshape(-1, m, ds)
    luts = ((qm[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)
    qids = [int(i) for i, _ in queries]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["codes"]])
            cells = pdf["cell_id"].values
            d = luts[:, sub[None, :], c].sum(-1)  # (nq, n)
            masks = [
                np.asarray([cell in probe[qid] for cell in cells])
                for qid in qids
            ]
            out = _local_topk_frame(
                d, pdf["vec_id"].values, qids, topk, rank_rounded, masks=masks
            )
            if out is not None:
                yield out

    pruned = codes_with_cell.where(F.col("cell_id").isin(union_cells))
    return pruned.mapInPandas(scan, _CAND_SCHEMA)
