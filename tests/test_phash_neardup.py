"""Perceptual-hash image dedup (`mm_image_phash_neardup`).

The planted-near-dup corpus (operators/multimodal.py synth_image_neardup)
mirrors the documents table's text dup clusters: every 10th doc_id opens
a 3-member cluster sharing a base image with a +40·m bump on every 29th
pixel. Pinned here:

- the dHash operator against an INDEPENDENT scalar recomputation
  (pure-Python loops, no numpy vectorization shared with the operator);
- 100% recall of the planted clusters at fixture scale (deterministic
  data — recall is a fact, not a statistic: every planted pair lands at
  hamming ≤ 4 and shares ≥1 of the 4×16-bit bands);
- banding semantics: candidates share a band; no all-pairs operator in
  the physical plan.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from odc_stac_spark.operators.multimodal import (
    encode_simg,
    image_dhash,
    synth_image_neardup,
)
from odc_stac_spark.queries import load_all
from odc_stac_spark.queries.multimodal import PHASH_HAM_T

REGISTRY = load_all()


def _scalar_dhash(px) -> tuple[int, int]:
    """Independent dHash: scalar loops, list indexing, no shared numpy."""
    h, w = len(px), len(px[0])
    gray = [[sum(px[y][x]) for x in range(w)] for y in range(h)]
    ys = [(yq * h) // 8 for yq in range(8)]
    xs = [(xq * w) // 9 for xq in range(9)]
    bits = []
    for yq in range(8):
        for xq in range(8):
            bits.append(1 if gray[ys[yq]][xs[xq + 1]] > gray[ys[yq]][xs[xq]] else 0)
    hi = lo = 0
    for p, b in enumerate(bits[:32]):
        hi |= b << (31 - p)
    for p, b in enumerate(bits[32:]):
        lo |= b << (31 - p)
    return hi, lo


@pytest.mark.parametrize("seed", [0, 1, 2, 7, 40, 41, 123])
def test_dhash_operator_matches_scalar_model(spark, seed):
    img = synth_image_neardup(seed)
    df = spark.createDataFrame(
        [(seed, bytearray(encode_simg(img)), "image/x-simg+neardup")],
        "doc_id long, media binary, media_type string",
    )
    row = image_dhash(df).collect()[0]
    want_hi, want_lo = _scalar_dhash(img.tolist())
    assert (row.hash_hi, row.hash_lo) == (want_hi, want_lo)
    assert 0 <= row.hash_hi < 2**32 and 0 <= row.hash_lo < 2**32


def test_cluster_members_are_near_misses_not_copies():
    """Members differ from the base (the perturbation is real) but by
    only a few dHash bits (it is a NEAR duplicate, not an exact one)."""
    h0 = _scalar_dhash(synth_image_neardup(40).tolist())
    for m in (1, 2):
        img = synth_image_neardup(40 + m)
        assert not np.array_equal(img, synth_image_neardup(40))
        hm = _scalar_dhash(img.tolist())
        ham = bin(h0[0] ^ hm[0]).count("1") + bin(h0[1] ^ hm[1]).count("1")
        assert ham <= 4


def test_planted_clusters_fully_recalled(spark, sf_dir):
    got = REGISTRY["mm_image_phash_neardup"].spark_fn(spark, sf_dir)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in got.collect()}
    doc_ids = {
        r.doc_id for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()
    }
    planted = set()
    for d in doc_ids:
        if d % 10 == 0 and d + 1 in doc_ids and d + 2 in doc_ids:
            planted |= {(d, d + 1), (d, d + 2), (d + 1, d + 2)}
    assert planted, "fixture must contain planted clusters"
    missing = planted - set(pairs)
    assert not missing, f"planted near-dup pairs not recalled: {sorted(missing)[:5]}"
    assert all(h <= PHASH_HAM_T for h in pairs.values())
    assert all(a < b for a, b in pairs)


def test_band_join_not_allpairs(spark, sf_dir):
    df = REGISTRY["mm_image_phash_neardup"].spark_fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # candidates come from a band equi-join, never a cross/theta product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_v" in plan
    # pixels never reach a join: both join sides scan the persisted
    # (doc_id, hash_hi, hash_lo) table — media stays inside the
    # mapInPandas islands below the persist boundary
    scans = [l for l in plan.splitlines() if "InMemoryTableScan" in l]
    assert scans and all("media" not in l for l in scans)
