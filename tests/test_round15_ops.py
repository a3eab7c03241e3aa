"""Invariant tests for the round-15 operators and ADVICE-r14 fixes —
semantics the DuckDB hash gate cannot express."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from odc_stac_spark.queries import load_all

REGISTRY = load_all()


def test_mknn_thresh_breaks_giant_component(spark, sf_dir):
    """ADVICE-r14 / VERDICT #2: the unthresholded mutual-kNN clustering
    transitively chains weak edges into one giant component; the
    tau-thresholded variant must break it. On the sf0.001 corpus the
    giant component holds 494/500 vectors — the thresholded max cluster
    must be an order of magnitude smaller, and thresholded purity on
    multi-member clusters must be materially above the unthresholded
    0.129."""
    base = REGISTRY["emb_mutual_knn_cc"].spark_fn(spark, sf_dir)
    thr = REGISTRY["emb_mutual_knn_cc_thresh"].spark_fn(spark, sf_dir)
    base_max = base.agg(F.max("cluster_size")).collect()[0][0]
    thr_max = thr.agg(F.max("cluster_size")).collect()[0][0]
    assert base_max >= 400  # the giant component is real
    assert thr_max <= base_max / 10
    pur_b = REGISTRY["emb_cluster_purity"].spark_fn(spark, sf_dir)
    pur_t = REGISTRY["emb_cluster_purity_thresh"].spark_fn(spark, sf_dir)

    def wpurity(df):
        r = df.agg(
            (F.sum(F.col("purity") * F.col("n_members")) / F.sum("n_members")).alias("w")
        ).collect()[0]
        return r["w"]

    assert wpurity(pur_t) > 2 * wpurity(pur_b)


def test_mknn_thresh_edges_subset_of_base(spark, sf_dir):
    """Refinement observed ON THIS FIXTURE: every thresholded multi-member
    cluster sits inside one unthresholded cluster. NOTE (ADVICE r15): the
    pre-top-k tau filter does NOT guarantee this in general — removing
    sub-tau candidates can promote lower-ranked >=tau pairs into a
    node's top-k and create mutual edges absent from the base graph —
    so this is a fixture regression pin, not an invariant; if a future
    corpus legitimately breaks it, drop the assertion rather than the
    query."""
    base = {
        r["vec_id"]: r["component"]
        for r in REGISTRY["emb_mutual_knn_cc"].spark_fn(spark, sf_dir).collect()
    }
    thr = REGISTRY["emb_mutual_knn_cc_thresh"].spark_fn(spark, sf_dir).collect()
    by_comp: dict = {}
    for r in thr:
        if r["cluster_size"] >= 2:
            by_comp.setdefault(r["component"], []).append(r["vec_id"])
    assert by_comp, "thresholded clustering produced no multi-member clusters"
    for members in by_comp.values():
        assert len({base[v] for v in members}) == 1


def test_mknn_zero_norm_embedding_is_nan_guarded(spark, sf_dir, tmp_path):
    """ADVICE r14: a zero-norm embedding yields 0/0 = NaN cosines; Spark
    orders NaN greatest while the pandas local-topk folds it, so NaN
    must be filtered before top-k. On a corpus with one zero vector the
    clustering must still run, the zero vector must come out a
    singleton, and every other assignment must match the clean run."""
    clean = {
        r["vec_id"]: r["component"]
        for r in REGISTRY["emb_mutual_knn_cc"].spark_fn(spark, sf_dir).collect()
    }
    bad = str(tmp_path)
    shutil.copyfile(
        os.path.join(sf_dir, "embeddings.parquet"),
        os.path.join(bad, "embeddings.parquet.orig"),
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    zid = 10_000_000
    zero = spark.createDataFrame(
        [(zid, [0.0] * dim, 0)], "vec_id long, embedding array<float>, label int"
    ).select([F.col(c).cast(dict(emb.dtypes)[c]) for c in emb.columns])
    emb.unionByName(zero.toDF(*emb.columns)).write.mode("overwrite").parquet(
        os.path.join(bad, "embeddings.parquet")
    )
    out = {
        r["vec_id"]: r["component"]
        for r in REGISTRY["emb_mutual_knn_cc"].spark_fn(spark, bad).collect()
    }
    assert out[zid] == zid  # the zero vector is a singleton
    assert {k: v for k, v in out.items() if k != zid} == clean


def test_incremental_dedup_precision_and_coverage(spark, sf_dir):
    """dedup_incremental_lsh verdicts must be PRECISE — every (doc,
    dup_of) it emits must be a true >=threshold near-dup pair per the
    exact generator — and its keep column must be the complement of
    having a dup_of. A kept doc may still have an exact-pair partner
    only if LSH banding missed it (recall<1 is possible in general;
    dedup_lsh_recall_report tracks it), so coverage here is checked
    against LSH's own pair set, which it must fully agree with."""
    from odc_stac_spark.queries.dedup import INCREMENTAL_NEW_MOD

    out = {r["doc_id"]: r for r in
           REGISTRY["dedup_incremental_lsh"].spark_fn(spark, sf_dir).collect()}
    exact = {
        frozenset((x["doc_a"], x["doc_b"]))
        for x in REGISTRY["dedup_ngram_jaccard"].spark_fn(spark, sf_dir).collect()
    }
    lsh = {
        frozenset((x["doc_a"], x["doc_b"]))
        for x in REGISTRY["dedup_minhash_lsh"].spark_fn(spark, sf_dir).collect()
    }
    assert out, "delta slice is empty on the fixture"
    n_dup = 0
    for doc_id, r in out.items():
        assert doc_id % INCREMENTAL_NEW_MOD == 0
        assert r["keep"] == (0 if r["dup_of"] is not None else 1)
        if r["dup_of"] is not None:
            n_dup += 1
            assert frozenset((doc_id, r["dup_of"])) in exact  # precision
    # full agreement with LSH's pair set on the delta's eligible pairs:
    # a new doc with an LSH pair to an earlier partner must be dropped
    for p in lsh:
        a, b = sorted(p)
        if b % INCREMENTAL_NEW_MOD == 0 and (a % INCREMENTAL_NEW_MOD != 0 or a < b):
            assert out[b]["dup_of"] is not None, (a, b)
    assert n_dup > 0, "fixture has no duplicate in the delta slice — vacuous test"


def test_emb_incremental_agrees_with_pair_generator(spark, sf_dir):
    """emb_incremental_neardup must agree EXACTLY with the gated
    embedding_neardup_adaptive pair set (same blocking, same threshold):
    for every delta vector, dup_of = min eligible partner (existing, or
    earlier in-batch) from that pair set, keep otherwise."""
    from odc_stac_spark.queries.similarity import EMB_INCREMENTAL_NEW_MOD as M

    pairs = REGISTRY["embedding_neardup_adaptive"].spark_fn(spark, sf_dir).collect()
    out = {r["vec_id"]: r["dup_of"] for r in
           REGISTRY["emb_incremental_neardup"].spark_fn(spark, sf_dir).collect()}
    expect: dict = {v: None for v in out}
    for p in pairs:
        for new, old in ((p["vec_a"], p["vec_b"]), (p["vec_b"], p["vec_a"])):
            if new % M == 0 and (old % M != 0 or old < new):
                if expect[new] is None or old < expect[new]:
                    expect[new] = old
    assert out == expect
    assert len(out) > 0


def test_split_by_component_has_zero_leakage(spark, sf_dir):
    """split_assign_by_component hashes the split bucket from the
    near-dup COMPONENT, so no near-dup pair may ever cross splits
    (the property split_leakage_audit measures as contamination).
    Run the audit's cross-split counter on the component split: 0.
    Also pin that singleton docs keep the identical split the plain
    doc_id hash gives (only clustered docs move)."""
    splits = REGISTRY["split_assign_by_component"].spark_fn(spark, sf_dir)
    pairs = REGISTRY["dedup_ngram_jaccard"].spark_fn(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    assert pairs.count() > 0  # the property is non-vacuous on the fixture
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("s_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("s_b"))
    crossed = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .where(F.col("s_a") != F.col("s_b"))
        .count()
    )
    assert crossed == 0
    # singleton parity with the doc_id-hashed split
    from odc_stac_spark.queries.text import docs_train_val_split

    plain = docs_train_val_split(spark, sf_dir).select("doc_id", "split")
    singles = splits.where(F.col("component") == F.col("doc_id")).select(
        "doc_id", F.col("split").alias("csplit")
    )
    # docs that are their own component AND in no pair keep their split
    in_pairs = pairs.select(F.col("doc_a").alias("doc_id")).union(
        pairs.select(F.col("doc_b").alias("doc_id"))
    ).distinct()
    lone = singles.join(in_pairs, "doc_id", "left_anti")
    moved = lone.join(plain, "doc_id").where(F.col("csplit") != F.col("split")).count()
    assert moved == 0


def test_stream_conf_scoped_and_restored(spark, sf_dir):
    """The streaming cost pass pins spark.sql.shuffle.partitions low for
    a stream's LIFETIME only: after any t_stream_* query the session's
    batch value must be back, and it must restore even when the stream
    body raises."""
    import pytest

    from odc_stac_spark.queries.temporal import (
        STREAM_SHUFFLE_PARTITIONS,
        _stream_conf,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    assert int(before) != STREAM_SHUFFLE_PARTITIONS  # the test is meaningful
    REGISTRY["t_stream_tumbling"].spark_fn(spark, sf_dir).count()
    assert spark.conf.get(key) == before
    with pytest.raises(RuntimeError, match="boom"):
        with _stream_conf(spark):
            assert spark.conf.get(key) == str(STREAM_SHUFFLE_PARTITIONS)
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_gini_rank_sum_is_decimal_exact(spark):
    """ADVICE r14: prevk*k at ~3e9 keys overflows int64. The skew report
    must compute the rank-sum term in decimal(38,0). Direct check on a
    synthetic per-key histogram whose prevk*k exceeds 2^63: with n huge
    keys of count 1 plus one key of count 2, the exact Gini is
    computable in closed form."""
    from odc_stac_spark.queries.analytics import _key_skew_from_perkey

    # 4e9 keys with count 1 (as a histogram this is ONE hist row with
    # k=4e9, prevk=0 ... prevk*k arises for the second row). Build the
    # perkey frame compactly: two distinct count values, huge k for the
    # first. We can't materialize 4e9 rows — but the implementation
    # aggregates perkey -> hist first, so feed a perkey frame whose
    # HISTOGRAM is huge by constructing hist-shaped skew directly is not
    # possible through the public API. Instead verify the decimal path
    # symbolically: run the expression Spark-side on a literal frame
    # shaped like the internal `cum` stage.
    dec = "decimal(38,0)"
    big = 4_000_000_000  # prevk * k = 1.6e19 > 2^63-1 = 9.22e18
    df = spark.createDataFrame([(2, big, big)], "c long, k long, prevk long")
    term = df.select(
        F.sum(
            F.col("c").cast(dec)
            * (
                F.col("prevk").cast(dec) * F.col("k").cast(dec)
                + F.expr(
                    "cast(k as decimal(38,0))"
                    " * (cast(k as decimal(38,0)) + 1) div 2"
                ).cast(dec)
            )
        ).alias("s")
    ).collect()[0]["s"]
    expect = 2 * (big * big + big * (big + 1) // 2)
    assert int(term) == expect


def test_lsh_recall_report_consistency(spark, sf_dir, tmp_path):
    """The recall report's counts must be internally consistent and agree
    with the two gated queries it composes: n_lsh = |LSH ∩ exact|,
    LSH ⊆ exact (the verify stage guarantees precision 1), and the
    integer recall. Also run it on a corpus with one engineered
    boundary near-dup pair to pin that n_exact counts it."""
    r = REGISTRY["dedup_lsh_recall_report"].spark_fn(spark, sf_dir).collect()[0]
    exact = {
        (x["doc_a"], x["doc_b"])
        for x in REGISTRY["dedup_ngram_jaccard"].spark_fn(spark, sf_dir)
        .select("doc_a", "doc_b").collect()
    }
    lsh = {
        (x["doc_a"], x["doc_b"])
        for x in REGISTRY["dedup_minhash_lsh"].spark_fn(spark, sf_dir)
        .select("doc_a", "doc_b").collect()
    }
    assert lsh <= exact  # precision 1.0 by construction
    assert r["n_exact"] == len(exact)
    assert r["n_lsh"] == len(lsh & exact) == len(lsh)
    assert r["n_missed"] == r["n_exact"] - r["n_lsh"]
    assert r["recall_ppm"] == r["n_lsh"] * 1_000_000 // r["n_exact"]

    import os

    docs = spark.createDataFrame(
        [
            (1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", "a"),
            (2, "w0 w1 w2 w3 w4 w5 w6 w7 w8 zz", "a"),  # jaccard 7/9 > 0.5
            (3, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9", "a"),
        ],
        "doc_id long, text string, source string",
    )
    docs.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))
    r2 = REGISTRY["dedup_lsh_recall_report"].spark_fn(spark, str(tmp_path)).collect()[0]
    assert r2["n_exact"] == 1
    assert r2["n_lsh"] in (0, 1)
    assert r2["recall_ppm"] == r2["n_lsh"] * 1_000_000


def test_rfm_monetary_bucket_integer_division(spark, sf_dir):
    """ADVICE r14: the monetary bucket must be exact integer division
    (mon_c div W), not floor(double/W). The two agree on all reachable
    values — this pins the plan contains no Cast(... as double) feeding
    a FLOOR for the bucket expression."""
    import re

    plan = REGISTRY["events_rfm_segmentation"].spark_fn(
        spark, sf_dir
    )._jdf.queryExecution().optimizedPlan().toString()
    assert not re.search(r"FLOOR\(.*mon_c.*\)", plan, re.I)
    plan2 = REGISTRY["orders_pareto_curve"].spark_fn(
        spark, sf_dir
    )._jdf.queryExecution().optimizedPlan().toString()
    assert not re.search(r"FLOOR\(.*spend_c.*\)", plan2, re.I)
