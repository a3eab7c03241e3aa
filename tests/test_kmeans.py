"""Distributed Lloyd k-means (operators/kmeans.py): convergence,
assignment invariants, and the recall lift it buys the IVF index."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from odc_stac_spark.operators.kmeans import assign_to_centroids, kmeans_fit
from odc_stac_spark.queries.similarity import TOP_K, _vecd
from odc_stac_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", _vecd(F.col("embedding")).alias("emb"))
        .persist()
    )


def test_kmeans_quality_trace_non_decreasing(emb):
    cent, trace = kmeans_fit(emb, k=8, n_iter=4)
    assert len(cent) == 8 and len(trace) == 4
    # Lloyd monotonicity (tiny float slack for the mean-of-cosine proxy)
    for a, b in zip(trace, trace[1:]):
        assert b >= a - 1e-9, trace
    # fitted centroids moved away from the raw init vectors
    init = [list(map(float, r.emb)) for r in emb.orderBy("vec_id").limit(8).collect()]
    assert cent != init


def test_assignment_partition_invariants(emb):
    cent, _ = kmeans_fit(emb, k=8, n_iter=2)
    assigned = assign_to_centroids(emb, cent)
    n = emb.count()
    assert assigned.count() == n  # every vector exactly once
    assert assigned.select("vec_id").distinct().count() == n
    ids = {r.cent_id for r in assigned.select("cent_id").distinct().collect()}
    assert ids <= set(range(8))


def _recall(spark, sf_dir, result_df):
    """top-K recall vs brute force, averaged over queries."""
    from odc_stac_spark.queries.similarity import knn_bruteforce_cosine

    brute = knn_bruteforce_cosine(spark, sf_dir).collect()
    want = {}
    for r in brute:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in result_df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recs = [len(got.get(q, set()) & ns) / len(ns) for q, ns in want.items()]
    return sum(recs) / len(recs)


def test_kmeans_ivf_recall(spark, sf_dir):
    from odc_stac_spark.queries import load_all

    reg = load_all()
    r_kmeans = _recall(spark, sf_dir, reg["ann_ivf_kmeans_topk"].spark_fn(spark, sf_dir))
    assert r_kmeans >= 0.5, r_kmeans
    # and the result sets are well-formed
    df = reg["ann_ivf_kmeans_topk"].spark_fn(spark, sf_dir)
    per_q = df.groupBy("query_id").count().collect()
    assert all(r["count"] == TOP_K for r in per_q)
