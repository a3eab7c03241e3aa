"""Persisted ANN index (round-4 verdict item 7): the corpus-side work
(IVF assignment / LSH signatures) is written once; serving queries read
only index artifacts — same results as the from-scratch queries, with no
re-scan of the embeddings source and a co-located (bucketed) candidate
self-join for LSH."""

from __future__ import annotations

import os

from odc_stac_spark.queries.similarity import (
    ann_ivf_topk,
    ann_ivf_topk_from_index,
    ann_lsh_hyperplane,
    ann_lsh_pairs_from_index,
    build_ivf_index,
    build_lsh_index,
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_locations(df) -> str:
    """All FileScan lines of the executed plan (where the data comes from)."""
    return "\n".join(
        l for l in _executed_plan(df).splitlines() if "FileScan" in l
    )


def test_ivf_from_index_equals_from_scratch_and_reads_only_index(
    spark, sf_dir, tmp_path
):
    p = str(tmp_path / "ivf")
    build_ivf_index(spark, sf_dir, p)
    # cent_id partition directories: probing prunes to NPROBE/K of these
    assert any(d.startswith("cent_id=") for d in os.listdir(p))

    got = ann_ivf_topk_from_index(spark, p)
    want = ann_ivf_topk(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # serving must not touch the embeddings source at all — every scan in
    # the plan is an index file
    scans = _scan_locations(got)
    assert "embeddings" not in scans
    assert scans.count(str(tmp_path)) >= 1


def test_lsh_from_index_equals_from_scratch_no_signature_recompute(
    spark, sf_dir, tmp_path
):
    p = str(tmp_path / "lsh")
    table = "lsh_sigs_test_ann_index"
    build_lsh_index(spark, sf_dir, p, table)
    try:
        got = ann_lsh_pairs_from_index(spark, p, table)
        want = ann_lsh_hyperplane(spark, sf_dir)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        scans = _scan_locations(got)
        assert "embeddings" not in scans  # signatures and vectors from index
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_lsh_index_bucket_join_is_colocated(spark, sf_dir, tmp_path):
    """The signature table is bucketed by (l, b): with broadcast disabled
    the candidate self-join must be a sort-merge join with NO exchange on
    the bucket key — at 100 TB pair generation shuffles nothing."""
    p = str(tmp_path / "lsh")
    table = "lsh_sigs_test_bucketed"
    build_lsh_index(spark, sf_dir, p, table)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = ann_lsh_pairs_from_index(spark, p, table)
        plan = _executed_plan(df)
        assert "SortMergeJoin" in plan
        # no hash-exchange whose key starts with the bucket column `l`
        assert "hashpartitioning(l#" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
