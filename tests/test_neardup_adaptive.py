"""Adaptive-K near-dup blocking (`embedding_neardup_adaptive`).

The r13 10×-scale probe quantified the fixed-K weakness: with IVF_K=16
frozen, cell populations grow linearly with the corpus, so cell-blocked
pair generation grows quadratically (2.8 s → 74.8 s at 10×). The
adaptive variant implements the production rule the fixed query's
docstring promises — K = max(IVF_K, ceil(n / NEARDUP_TARGET_CELL)) —
keeping the expected cell size (hence pairs-per-cell, hence total
verify cost) bounded as the corpus grows.

Pinned here:
- the K rule matches the oracle's GREATEST/CEIL arithmetic exactly;
- emitted pairs carry EXACT cosines (vs a brute-force recomputation)
  and only pairs above threshold appear;
- plan shape: corpus-side assignment is ZERO-shuffle (broadcast 1-row
  quantizer array + map-side fold — no Window, no corpus-keyed
  exchange), and K genuinely adapts (32 at n=500, 125 at n=2000).
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from odc_stac_spark.queries import load_all
from odc_stac_spark.queries.similarity import (
    IVF_K,
    NEARDUP_COS,
    NEARDUP_NPROBE,
    NEARDUP_TARGET_CELL,
    _neardup_k,
)

REGISTRY = load_all()


@pytest.mark.parametrize(
    "n", [1, 15, 16, 255, 256, 257, 500, 2000, 20_000, 1_000_000]
)
def test_k_rule_matches_oracle_arithmetic(n):
    """Spark-side ceil-div must equal the oracle's
    GREATEST(IVF_K, CEIL(n / NEARDUP_TARGET_CELL)) for any n."""
    want = duckdb.sql(
        f"SELECT GREATEST({IVF_K}, "
        f"CAST(CEIL({n} / {NEARDUP_TARGET_CELL}.0) AS BIGINT))"
    ).fetchone()[0]
    assert _neardup_k(n) == want


def test_k_grows_with_corpus():
    assert _neardup_k(500) == 32
    assert _neardup_k(2000) == 125
    # floor: tiny corpora keep the fixed-K behavior
    assert _neardup_k(100) == IVF_K


def test_pairs_have_exact_cosines_and_threshold(spark, sf_dir):
    got = REGISTRY["embedding_neardup_adaptive"].spark_fn(spark, sf_dir)
    rows = got.collect()
    assert rows, "expected at least one near-dup pair on the fixture"
    # brute-force exact cosine for every emitted pair
    emb = {
        r.vec_id: r.emb
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb"))
        .collect()
    }
    for r in rows:
        a, b = emb[r.vec_a], emb[r.vec_b]
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        exact = dot / (na * nb)
        assert exact >= NEARDUP_COS
        assert abs(exact - r.cos) < 5e-7  # round(…, 6) of the exact value
        assert r.vec_a < r.vec_b


def test_assignment_is_zero_shuffle_and_k_adapts(spark):
    """The corpus-side assignment must be a map-side fold against a
    broadcast quantizer array: no Window, no corpus-keyed exchange; and
    the centroid filter literal must reflect the ADAPTIVE K."""
    for sf_dir, k in (("/root/testdata/sf0.01", 32), ("/root/testdata/sf0.1", 125)):
        df = REGISTRY["embedding_neardup_adaptive"].spark_fn(spark, sf_dir)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastNestedLoopJoin" in plan  # 1-row quantizer array join
        # the only corpus-row exchanges allowed: the compute repartition
        # (RoundRobin) and the final distinct agg; assignment itself adds none
        assert "Exchange hashpartitioning(vec_id" not in plan
        # adaptive K visible in the centroid-side pushed filter
        assert f"< {k})" in plan, f"expected centroid filter vec_id < {k} at {sf_dir}"
        # quantizer aggregate is the bounded two-stage collect_list
        assert "partial_collect_list" in plan
