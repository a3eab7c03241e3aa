"""Invariant tests for the round-14 operators — semantics the DuckDB hash
gate cannot express (the gate proves Spark==SQL; these prove the SHARED
semantics are the intended ones)."""

from __future__ import annotations

import pyspark.sql.functions as F

from odc_stac_spark.queries import load_all
from odc_stac_spark.queries.llm_pipeline import cc_star_contraction

REGISTRY = load_all()


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def test_cc_star_path_graph_diameter_independent(spark):
    """A 64-hop chain: plain min-label propagation needs 64 rounds; star
    contraction must finish inside its 16-round cap AND label every node
    with the chain minimum."""
    edges = _sym_edges(spark, [(i, i + 1) for i in range(64)])
    out = {r["doc_id"]: r["component"] for r in cc_star_contraction(edges).collect()}
    assert len(out) == 65
    assert set(out.values()) == {0}


def test_cc_star_multi_component(spark):
    """Three components of different shapes (chain, triangle+pendant,
    isolated edge) — each node labels with its component minimum."""
    pairs = [(10, 11), (11, 12), (12, 13)]          # chain, min 10
    pairs += [(20, 21), (21, 22), (20, 22), (22, 23)]  # triangle+pendant, min 20
    pairs += [(30, 31)]                              # edge, min 30
    out = {
        r["doc_id"]: r["component"]
        for r in cc_star_contraction(_sym_edges(spark, pairs)).collect()
    }
    assert {k: v for k, v in out.items() if k < 20} == {i: 10 for i in (10, 11, 12, 13)}
    assert {k: v for k, v in out.items() if 20 <= k < 30} == {i: 20 for i in (20, 21, 22, 23)}
    assert {k: v for k, v in out.items() if k >= 30} == {30: 30, 31: 30}


def test_cc_star_matches_label_propagation_on_corpus(spark, sf_dir):
    """Both CC formulations converge to min-reachable-id labels on the
    real near-dup pair graph — byte-identical assignments."""
    prop = {
        (r["doc_id"], r["component"])
        for r in REGISTRY["dedup_connected_components"].spark_fn(spark, sf_dir).collect()
    }
    star = {
        (r["doc_id"], r["component"])
        for r in REGISTRY["dedup_cc_star_contraction"].spark_fn(spark, sf_dir).collect()
    }
    assert prop == star
    assert len(prop) > 0


def test_cc_star_high_degree_hub(spark):
    """A star-of-stars (hub 0 linked to 5 sub-hubs, each with 10 leaves):
    exactly one component labeled 0, all 56 nodes present."""
    pairs = []
    nid = 1
    for _ in range(5):
        hub = nid
        nid += 1
        pairs.append((0, hub))
        for _ in range(10):
            pairs.append((hub, nid))
            nid += 1
    out = {r["doc_id"]: r["component"] for r in cc_star_contraction(_sym_edges(spark, pairs)).collect()}
    assert len(out) == 56
    assert set(out.values()) == {0}
