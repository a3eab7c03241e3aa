"""Invariant tests for the round-13 third-wave operators — semantics the
DuckDB hash gate cannot express (the gate proves Spark==SQL; these prove
the SHARED semantics are the intended ones)."""

from __future__ import annotations

import pyspark.sql.functions as F

from odc_stac_spark.queries import load_all
from odc_stac_spark.sources.tables import load_table

REGISTRY = load_all()


def test_linear_trend_forecast_consistency(spark, sf_dir):
    """forecast_next must equal intercept + slope * (xmax + 1) for the
    same exact sums, and the fit must use every observed hourly point."""
    out = REGISTRY["ts_linear_trend_forecast"].spark_fn(spark, sf_dir)
    rows = {r["event_type"]: r for r in out.collect()}
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .count()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("h").alias("h0"),
            F.max("h").alias("h1"),
        )
    )
    for r in hourly.collect():
        got = rows[r["event_type"]]
        assert got["n"] == r["n"]
        xmax = int((r["h1"] - r["h0"]).total_seconds() // 3600)
        # forecast is the fitted line evaluated one step past the series end
        pred = got["intercept"] + got["slope"] * (xmax + 1)
        # slope/intercept are rounded to 6dp AFTER the forecast was
        # computed from the unrounded line, so the recomputed forecast
        # drifts by up to (xmax+2) * 5e-7
        assert abs(pred - got["forecast_next"]) < (xmax + 3) * 5e-7


def test_linear_trend_recovers_exact_line(spark):
    """On synthetic y = 3 + 2x the closed-form sums must recover slope=2,
    intercept=3 exactly (integer sums, no residual noise)."""
    from odc_stac_spark.queries.temporal import ts_linear_trend_forecast
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df = spark.range(0, 48).select(
            F.lit(1).alias("event_id"),
            (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(hours=F.col("id"))).alias("ts"),
            F.lit(1).alias("user_id"),
            F.lit("synthline").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        # y = 3 + 2x copies of each hour row -> hourly count = 3 + 2x
        df = df.withColumn("x", F.hour("ts") + 24 * (F.dayofmonth("ts") - 1))
        df = df.select("*", F.explode(F.sequence(F.lit(1), F.lit(3) + 2 * F.col("x"))).alias("rep")).drop("x", "rep")
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r for r in ts_linear_trend_forecast(spark, d).collect()}
        r = out["synthline"]
        assert r["slope"] == 2.0 and r["intercept"] == 3.0
        assert r["forecast_next"] == 3.0 + 2.0 * 48


def test_cross_correlation_bounds_and_coverage(spark, sf_dir):
    """|r| <= 1 everywhere; every unordered type pair appears at all 5
    lags; a series correlates with itself at lag 0 with r == 1 (checked
    via a duplicated synthetic pair would be overkill — instead check n
    decreases with |lag| as the overlap window shrinks)."""
    out = REGISTRY["ts_cross_correlation"].spark_fn(spark, sf_dir)
    rows = out.collect()
    types = set()
    for r in rows:
        assert abs(r["xcorr"]) <= 1.0 + 1e-9
        assert r["type_a"] < r["type_b"]
        types.update([r["type_a"], r["type_b"]])
    k = len(types)
    assert len(rows) == (k * (k - 1) // 2) * 5
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r["type_a"], r["type_b"]), {})[r["lag"]] = r["n"]
    for lagmap in by_pair.values():
        assert set(lagmap) == {-2, -1, 0, 1, 2}
        # overlap shrinks by |lag| rows on the dense spine
        assert lagmap[0] == lagmap[1] + 1 == lagmap[-1] + 1
        assert lagmap[0] == lagmap[2] + 2 == lagmap[-2] + 2


def test_emb_dim_stats_envelope(spark, sf_dir):
    """One row per dimension; variance >= 0; vmin <= mean <= vmax;
    zero_frac in [0,1]; n equals the corpus size for every dim (no
    ragged vectors in the test corpus)."""
    out = REGISTRY["emb_dim_stats"].spark_fn(spark, sf_dir)
    rows = out.collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    dims = sorted(r["dim"] for r in rows)
    assert dims == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["n"] == n_vecs
        assert r["variance"] >= -1e-6
        assert r["vmin"] - 1e-6 <= r["mean"] <= r["vmax"] + 1e-6
        assert 0.0 <= r["zero_frac"] <= 1.0
        assert r["is_dead"] in (0, 1)


def test_pagerank_mass_conservation(spark, sf_dir):
    """On a symmetric graph with no dangling nodes, total PageRank mass
    stays 1.0; top-20 ppm values must be positive and rank-ordered."""
    from odc_stac_spark.queries.graph import _undirected_edges, PR_DAMP, PR_ITERS

    out = REGISTRY["graph_pagerank_topk"].spark_fn(spark, sf_dir).collect()
    assert [r["rk"] for r in out] == list(range(1, 21))
    ppm = [r["pagerank_ppm"] for r in out]
    assert all(p > 0 for p in ppm)
    assert ppm == sorted(ppm, reverse=True)
    # recompute full final vector mass (independent of the query's top-k cut)
    edges = _undirected_edges(spark, sf_dir)
    deg = edges.groupBy("src").count().withColumnRenamed("count", "outdeg")
    n = deg.count()
    ranks = deg.select(F.col("src").alias("node"), (F.lit(1.0) / n).alias("r"))
    ew = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    )
    for _ in range(PR_ITERS):
        ranks = (
            ew.join(ranks, ew.src == ranks.node)
            .groupBy("dst")
            .agg(((1 - PR_DAMP) / n + PR_DAMP * F.sum(F.col("r") * F.col("w"))).alias("r"))
            .withColumnRenamed("dst", "node")
        )
        mass = ranks.agg(F.sum("r")).collect()[0][0]
        assert abs(mass - 1.0) < 1e-9


def test_triangle_count_known_graph(spark, tmp_path):
    """Two overlapping baskets {1,2,3} and {2,3,4} form exactly two
    triangles; shared edge nodes 2,3 participate in both."""
    import os
    from odc_stac_spark.queries.graph import graph_triangle_count

    rows = [(100, p) for p in (1, 2, 3)] + [(200, p) for p in (2, 3, 4)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = {r["node"]: r for r in graph_triangle_count(spark, str(tmp_path)).collect()}
    assert out[1]["total_triangles"] == 2
    assert out[1]["tri_count"] == 1 and out[4]["tri_count"] == 1
    assert out[2]["tri_count"] == 2 and out[3]["tri_count"] == 2


def test_triangle_count_degree_order_vs_id_order(spark, tmp_path):
    """Triangle {1, 5, 10} where deg(5) is inflated by pendant edges, so
    the two non-pivot wedge endpoints have id order (5 < 10) OPPOSITE to
    degree order (deg(10)=2 < deg(5)=5).  The degree-ordered orientation
    makes the closing edge 10->5; a raw-id c > b wedge filter pairs
    (b=5, c=10), never finds 5->10 in the oriented edge list, and drops
    the triangle entirely (the r13 ADVICE bug).  The wedge filter must
    use the same (degree, id) total order as the orientation."""
    import os
    from odc_stac_spark.queries.graph import graph_triangle_count

    rows = [(100, p) for p in (1, 5, 10)]  # the single triangle
    # pendant 2-item orders inflating deg(5): edges {5,20},{5,21},{5,22}
    rows += [(201, 5), (201, 20), (202, 5), (202, 21), (203, 5), (203, 22)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = {r["node"]: r for r in graph_triangle_count(spark, str(tmp_path)).collect()}
    assert out, "triangle {1,5,10} was dropped by the wedge filter"
    assert out[1]["total_triangles"] == 1
    assert out[1]["tri_count"] == 1
    assert out[5]["tri_count"] == 1
    assert out[10]["tri_count"] == 1


def test_rfm_covers_all_customers_with_valid_scores(spark, sf_dir):
    out = REGISTRY["events_rfm_segmentation"].spark_fn(spark, sf_dir)
    rows = out.collect()
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_q"] <= 4 and 1 <= r["f_q"] <= 4 and 1 <= r["m_q"] <= 4
        if r["segment"] == "champion":
            assert r["r_q"] <= 2 and r["f_q"] >= 3 and r["m_q"] >= 3
        elif r["segment"] == "at_risk":
            assert r["r_q"] >= 3 and r["f_q"] <= 2
        elif r["segment"] == "loyal":
            assert r["f_q"] >= 3
        else:
            assert r["segment"] == "regular"


def test_twophase_distinct_equals_naive(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in REGISTRY["agg_skewed_distinct_twophase"].spark_fn(spark, sf_dir).collect()
    }
    naive = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in naive:
        assert out[r["event_type"]]["n_users"] == r["u"]
        assert out[r["event_type"]]["n_events"] == r["n"]


def test_gopher_pass_is_conjunction(spark, sf_dir):
    out = REGISTRY["text_gopher_quality_rules"].spark_fn(spark, sf_dir)
    bad = out.where(
        F.col("gopher_pass")
        != (
            F.col("ok_word_count")
            * F.col("ok_mean_len")
            * F.col("ok_alpha_ratio")
            * F.col("ok_stopwords")
        )
    ).count()
    assert bad == 0
    assert out.count() == load_table(spark, sf_dir, "documents").count()


def test_stream_exact_dedup_matches_batch_distinct(spark, sf_dir):
    out = REGISTRY["t_stream_exact_dedup"].spark_fn(spark, sf_dir)
    total_stream = out.agg(F.sum("n_unique")).collect()[0][0]
    total_batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.date_trunc("minute", "ts"))
        .distinct()
        .count()
    )
    assert total_stream == total_batch


def test_time_to_convert_percentiles_ordered(spark, sf_dir):
    r = REGISTRY["funnel_time_to_convert"].spark_fn(spark, sf_dir).collect()[0]
    assert r["n_conversions"] > 0
    assert 0 <= r["p25_mins"] <= r["p50_mins"] <= r["p75_mins"] <= r["p90_mins"]
    n_clickers = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_conversions"] <= n_clickers


def test_pareto_curve_monotone_and_concentrated(spark, sf_dir):
    rows = sorted(
        REGISTRY["orders_pareto_curve"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["top_pct"],
    )
    assert [r["top_pct"] for r in rows] == [10, 20, 30, 40, 50, 60, 70, 80, 90]
    shares = [r["rev_share"] for r in rows]
    ncust = [r["n_top_customers"] for r in rows]
    assert shares == sorted(shares) and ncust == sorted(ncust)
    for r in rows:
        # top spenders carry at least their proportional share (allow the
        # bucket-granularity overshoot of n_top_customers to cover it)
        assert r["rev_share"] >= r["top_pct"] / 100.0 - 1e-9


def test_latency_p95_is_exact_bucket_threshold(spark, sf_dir):
    from odc_stac_spark.queries.temporal import LAT_W
    import math

    out = {
        r["hour_us"]: r
        for r in REGISTRY["events_latency_p95_sli"].spark_fn(spark, sf_dir).collect()
    }
    views = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
            F.floor(F.col("value") / LAT_W).alias("bucket"),
        )
    )
    per_hour = views.groupBy("hour_us").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_list("bucket").alias("buckets"),
    )
    for r in per_hour.collect():
        got = out[r["hour_us"]]
        assert got["n_views"] == r["n"]
        b = int(got["p95_le"] / LAT_W) - 1  # inclusive threshold bucket
        need = math.ceil(r["n"] * 95 / 100.0)
        assert sum(1 for x in r["buckets"] if x <= b) >= need
        assert sum(1 for x in r["buckets"] if x <= b - 1) < need


def test_stream_latency_p95_equals_batch(spark, sf_dir):
    batch = REGISTRY["events_latency_p95_sli"].spark_fn(spark, sf_dir)
    stream = REGISTRY["t_stream_latency_p95"].spark_fn(spark, sf_dir)
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_winnowing_single_window_doc(spark, tmp_path):
    """A 6-token doc with K=3, W=4 has exactly one valid window (4
    k-grams); the selected fingerprint must be the md5-minimum of the
    four k-gram hashes."""
    import hashlib
    import os
    from odc_stac_spark.queries.text import text_winnowing_fingerprint

    words = ["delta", "alpha", "echo", "bravo", "charlie", "foxtrot"]
    text = " ".join(words)
    df = spark.createDataFrame(
        [(1, text, "en", "src0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = text_winnowing_fingerprint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    kgrams = [" ".join(words[i : i + 3]) for i in range(4)]
    hashes = [hashlib.md5(k.encode()).hexdigest() for k in kgrams]
    r = out[0]
    assert r["n_fingerprints"] == 1
    assert r["min_fp"] == min(hashes)
    assert r["fp_digest"] == hashlib.md5(min(hashes).encode()).hexdigest()


def test_winnowing_guarantee_density(spark, sf_dir):
    """Winnowing guarantees >=1 fingerprint per window of W k-grams, so
    each doc must select at least ceil(n_windows / W) fingerprints (one
    selection can cover at most W windows)."""
    import math
    from odc_stac_spark.queries.text import WIN_K, WIN_W

    out = REGISTRY["text_winnowing_fingerprint"].spark_fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.size(F.split(F.trim(F.lower(F.col("text"))), " +")) - WIN_K + 1).alias(
            "n_kgrams"
        ),
    )
    j = {r["doc_id"]: r for r in out.join(docs, "doc_id").collect()}
    for r in j.values():
        n_windows = r["n_kgrams"] - WIN_W + 1
        if n_windows >= 1:
            assert r["n_fingerprints"] >= math.ceil(n_windows / WIN_W)
            assert r["n_fingerprints"] <= r["n_kgrams"]


def test_gram_topcorr_matches_numpy(spark, sf_dir):
    import numpy as np

    out = REGISTRY["emb_gram_topcorr"].spark_fn(spark, sf_dir).collect()
    assert [r["rk"] for r in out] == list(range(1, 21))
    for r in out:
        assert abs(r["corr"]) <= 1.0 + 1e-9
        assert 1 <= r["dim_i"] < r["dim_j"]
    X = np.asarray(
        [
            row["embedding"]
            for row in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    C = np.corrcoef(X, rowvar=False)
    for r in out[:5]:
        assert abs(C[r["dim_i"] - 1, r["dim_j"] - 1] - r["corr"]) < 1e-4


def test_pca_matches_numpy_top_component(spark, sf_dir):
    import numpy as np

    rows = REGISTRY["emb_pca_power_iteration"].spark_fn(spark, sf_dir).collect()
    v = np.zeros(len(rows))
    for r in rows:
        v[r["dim"] - 1] = r["loading"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    lam = rows[0]["eigenvalue"]
    evr = rows[0]["explained_var_ratio"]
    assert lam > 0 and 0 < evr <= 1
    X = np.asarray(
        [
            row["embedding"]
            for row in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    # the gate pins the EXACT K-step iterate: replicate it in numpy
    # (full precision, raw data — independent of the distributed
    # moments/join path) and demand near-identity
    from odc_stac_spark.queries.similarity import PCA_ITERS

    ref = np.zeros(len(C))
    ref[0] = 1.0
    for _ in range(PCA_ITERS):
        ref = C @ ref
        ref /= np.linalg.norm(ref)
    assert abs(float(ref @ v)) > 0.9999, float(ref @ v)
    # Rayleigh quotient of any unit iterate lies in the spectrum; after
    # K ascent steps it must sit in the top of it (above lambda_2 is not
    # guaranteed on a flat spectrum, but above the spectral MEDIAN is)
    assert lam <= w[-1] * 1.001
    assert lam >= float(np.median(w))


def test_cdc_merge_exercises_all_three_actions(spark, sf_dir):
    rows = {
        r["action"]: r
        for r in REGISTRY["cdc_merge_latest_wins"].spark_fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"insert", "update", "unchanged"}
    for r in rows.values():
        assert r["n_rows"] > 0


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    out = {
        r["o_orderpriority"]: r
        for r in REGISTRY["j_bucketed_colocated"].spark_fn(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .collect()
    )
    for r in plain:
        assert out[r["o_orderpriority"]]["n_lines"] == r["n_lines"]


def test_mad_anomaly_stats_match_numpy(spark, sf_dir):
    import numpy as np

    out = REGISTRY["ts_anomaly_mad"].spark_fn(spark, sf_dir).collect()
    from odc_stac_spark.queries.temporal import ANOM_MAD_K

    for r in out:
        assert abs(r["robust_z"]) >= ANOM_MAD_K
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .count()
        .collect()
    )
    by_type: dict = {}
    for r in hourly:
        by_type.setdefault(r["event_type"], []).append(r["count"])
    flagged = {(r["event_type"], r["hour_us"]) for r in out}
    n_expected = 0
    for t, ns in by_type.items():
        arr = np.array(ns, dtype=float)
        med = np.median(arr)
        mad = np.median(np.abs(arr - med))
        if mad > 0:
            z = np.round(0.6745 * (arr - med) / mad, 4)
            n_expected += int((np.abs(z) >= ANOM_MAD_K).sum())
    assert len(flagged) == n_expected


def test_linear_attribution_conserves_revenue(spark, sf_dir):
    out = REGISTRY["events_attribution_linear"].spark_fn(spark, sf_dir)
    total_credited = out.agg(F.sum("credited_revenue")).collect()[0][0]
    ev = load_table(spark, sf_dir, "events")
    from odc_stac_spark.queries.temporal import ATTR_WINDOW_DAYS

    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round("value", 2).alias("amount"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("c_ts")
    )
    attributed = (
        p.join(
            c,
            (F.col("cu") == F.col("user_id"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (
                F.col("c_ts")
                >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
            ),
            "left_semi",
        )
        .agg(F.sum("amount"))
        .collect()[0][0]
    )
    # linear attribution must conserve the attributed purchase value
    # (amount / n_touches summed over touches == amount per purchase)
    assert abs(total_credited - attributed) < 0.05


def test_sample_k_per_group_exact(spark, sf_dir):
    from odc_stac_spark.queries.llm_pipeline import SAMPLE_K_PER_GROUP

    out = REGISTRY["sample_k_per_group_by_hash"].spark_fn(spark, sf_dir)
    rows = out.collect()
    per_src: dict = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    d = load_table(spark, sf_dir, "documents")
    sizes = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, got in per_src.items():
        assert len(got) == min(SAMPLE_K_PER_GROUP, sizes[src])
        assert sorted(r["rk"] for r in got) == list(range(1, len(got) + 1))
    # deterministic: equals the direct single-stage window computation
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(
        F.asc(F.md5(F.col("doc_id").cast("string"))), F.asc("doc_id")
    )
    direct = (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= SAMPLE_K_PER_GROUP)
        .select("source", "rk", "doc_id")
    )
    assert out.exceptAll(direct).count() == 0
    assert direct.exceptAll(out).count() == 0


def test_bot_flags_match_direct_recomputation(spark, sf_dir):
    from odc_stac_spark.queries.temporal import BOT_HOURLY_MAX, BOT_BURST_MAX

    out = {r["user_id"]: r for r in
           REGISTRY["events_bot_detection_rules"].spark_fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    hm = {r["user_id"]: r["mh"] for r in
          ev.groupBy("user_id", F.date_trunc("hour", "ts")).count()
          .groupBy("user_id").agg(F.max("count").alias("mh")).collect()}
    bm = {r["user_id"]: r["mb"] for r in
          ev.groupBy("user_id", F.date_trunc("minute", "ts")).count()
          .groupBy("user_id").agg(F.max("count").alias("mb")).collect()}
    expected = {u for u in hm
                if hm[u] > BOT_HOURLY_MAX or bm[u] > BOT_BURST_MAX}
    assert set(out) == expected
    for u, r in out.items():
        assert r["max_hourly"] == hm[u] and r["max_burst"] == bm[u]
        assert r["flag_sustained"] == int(hm[u] > BOT_HOURLY_MAX)
        assert r["flag_burst"] == int(bm[u] > BOT_BURST_MAX)


def test_cohort_ltv_monotone_and_bounded(spark, sf_dir):
    rows = REGISTRY["orders_cohort_ltv"].spark_fn(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_us"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["offset_m"])
        assert rs[0]["offset_m"] == 0  # the first-order month is offset 0
        ltv = [r["cum_ltv_per_customer"] for r in rs]
        assert ltv == sorted(ltv)  # cumulative spend never decreases
        for r in rs:
            assert 1 <= r["n_active"] <= r["cohort_size"]


def test_langclass_fracs_and_majority(spark, sf_dir):
    rows = REGISTRY["text_langclass_contingency"].spark_fn(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert abs(sum(r["frac"] for r in rs) - 1.0) < 1e-2
        assert sum(r["n"] for r in rs) == rs[0]["lang_total"]
        mx = max(r["n"] for r in rs)
        for r in rs:
            assert r["is_majority"] == int(r["n"] == mx)


def test_referential_integrity_clean_fixture(spark, sf_dir):
    rows = {r["fk"]: r for r in
            REGISTRY["dq_referential_integrity"].spark_fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "lineitem->orders", "orders->customer", "lineitem->part",
        "lineitem->supplier", "customer->nation",
    }
    for r in rows.values():
        assert r["orphans"] == 0  # the TPC-H fixture is referentially clean
        assert 0 < r["child_keys"] <= r["child_rows"]


def test_stream_bot_detection_equals_batch(spark, sf_dir):
    batch = REGISTRY["events_bot_detection_rules"].spark_fn(spark, sf_dir)
    stream = REGISTRY["t_stream_bot_detection"].spark_fn(spark, sf_dir)
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_ship_delay_percentiles_ordered(spark, sf_dir):
    rows = REGISTRY["orders_ship_delay_percentiles"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"] <= r["p99_days"] <= r["max_days"]


def test_oov_rate_curve_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["text_oov_rate_curve"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["vocab_size"],
    )
    from odc_stac_spark.queries.text import OOV_VOCAB_SIZES

    assert [r["vocab_size"] for r in rows] == OOV_VOCAB_SIZES
    rates = [r["oov_rate"] for r in rows]
    # bigger vocabulary never covers less
    assert rates == sorted(rates, reverse=True)
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["vocab_used"] <= r["vocab_size"]
    # total token conservation at the largest probe
    d = load_table(spark, sf_dir, "documents")
    total = d.select(
        F.sum(F.size(F.split(F.trim(F.lower(F.col("text"))), " +")))
    ).collect()[0][0]
    biggest = rows[-1]
    covered = total - biggest["oov_tokens"]
    assert 0 < covered <= total


def test_seasonality_decomposition_identity(spark, sf_dir):
    rows = REGISTRY["orders_seasonality_decomposition"].spark_fn(spark, sf_dir).collect()
    months = (
        load_table(spark, sf_dir, "orders")
        .select(F.date_trunc("month", "o_orderdate"))
        .distinct()
        .count()
    )
    assert len(rows) == months
    for r in rows:
        # additive identity holds exactly (everything derives from ints)
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-6


def test_new_vs_returning_conservation(spark, sf_dir):
    rows = REGISTRY["events_new_vs_returning"].spark_fn(spark, sf_dir).collect()
    total_new = sum(r["new_users"] for r in rows)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert total_new == n_users  # every user is new exactly once
    for r in rows:
        assert r["active_users"] == r["new_users"] + r["returning_users"]


def test_cluster_histogram_accounts_all_labeled_docs(spark, sf_dir):
    rows = REGISTRY["dedup_cluster_size_histogram"].spark_fn(spark, sf_dir).collect()
    from odc_stac_spark.queries.llm_pipeline import dedup_connected_components

    labeled = dedup_connected_components(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == labeled
    for r in rows:
        assert r["cluster_size"] >= 2  # every component has an edge
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_abc_classes_partition_parts(spark, sf_dir):
    rows = {r["abc_class"]: r for r in
            REGISTRY["orders_abc_classification"].spark_fn(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    assert abs(sum(r["rev_share"] for r in rows.values()) - 1.0) < 1e-3
    # A carries at least the 80% target minus one bucket of slack
    assert rows["A"]["rev_share"] >= 0.75
    # class revenue ordering follows the construction
    assert rows["A"]["rev_share"] > rows["B"]["rev_share"] > rows["C"]["rev_share"]


def test_stream_new_vs_returning_equals_batch(spark, sf_dir):
    batch = REGISTRY["events_new_vs_returning"].spark_fn(spark, sf_dir)
    stream = REGISTRY["t_stream_new_vs_returning"].spark_fn(spark, sf_dir)
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_drift_tv_bounds_and_halves(spark, sf_dir):
    rows = REGISTRY["events_distribution_drift_tv"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5  # one per event type
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_first_half"] + r["n_second_half"] for r in rows) == total
    for r in rows:
        assert 0.0 <= r["tv_distance"] <= 1.0
        assert r["drift_flag"] == int(r["tv_distance"] >= 0.1)
        assert r["n_first_half"] > 0 and r["n_second_half"] > 0


def test_pmi_collocations_ranked_and_thresholded(spark, sf_dir):
    from odc_stac_spark.queries.text import PMI_MIN_COUNT, PMI_TOPK

    rows = REGISTRY["text_ngram_collocations_pmi"].spark_fn(spark, sf_dir).collect()
    assert [r["rk"] for r in rows] == list(range(1, min(PMI_TOPK, len(rows)) + 1))
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r["c_xy"] >= PMI_MIN_COUNT
        assert r["w1"] and r["w2"]


def test_zipf_fit_negative_slope(spark, sf_dir):
    from odc_stac_spark.queries.text import ZIPF_TOPN

    r = REGISTRY["text_zipf_fit"].spark_fn(spark, sf_dir).collect()[0]
    assert r["n_points"] <= ZIPF_TOPN
    # frequencies fall with rank, so the log-log slope is negative
    assert r["zipf_slope"] < 0
    assert r["log_intercept"] > 0


def test_behavior_entropy_bounds_and_degenerate_user(spark, sf_dir, tmp_path):
    import math
    import os
    from odc_stac_spark.queries.temporal import events_behavior_entropy

    rows = REGISTRY["events_behavior_entropy"].spark_fn(spark, sf_dir).collect()
    for r in rows:
        # Shannon entropy over k types is bounded by log2(k)
        assert 0 <= r["avg_entropy_bits"] <= math.log2(max(r["n_types"], 2)) + 1e-6
    # a synthetic single-type user has exactly zero entropy and is low
    df = spark.range(0, 10).selectExpr(
        "id as event_id",
        "timestamp('2024-01-01 00:00:00') + make_interval(0,0,0,0,0,cast(id as int),0) as ts",
        "1 as user_id",
        "'click' as event_type",
        "0.0 as value",
        "'{}' as props",
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = events_behavior_entropy(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["n_types"] == 1
    assert out[0]["avg_entropy_bits"] == 0.0
    assert out[0]["low_entropy_users"] == 1


def test_returns_rate_bounds(spark, sf_dir):
    rows = REGISTRY["returns_rate_by_brand"].spark_fn(spark, sf_dir).collect()
    total_lines = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_lines"] for r in rows) == total_lines
    for r in rows:
        assert 0.0 <= r["return_rate"] <= 1.0
        assert r["n_returned"] <= r["n_lines"]
        assert r["returned_revenue"] >= 0


def test_hhi_bounds_and_supplier_conservation(spark, sf_dir):
    rows = REGISTRY["supplier_concentration_hhi"].spark_fn(spark, sf_dir).collect()
    n_sup = (
        load_table(spark, sf_dir, "lineitem").select("l_suppkey").distinct().count()
    )
    assert sum(r["n_suppliers"] for r in rows) == n_sup
    for r in rows:
        # HHI in (0, 10000]; 10000/n is the perfectly-even lower bound
        assert 10000.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 10000.0 + 1e-6
        assert r["concentrated"] == int(r["hhi"] > 2500)


def test_session_duration_histogram_conserves_sessions(spark, sf_dir):
    rows = REGISTRY["events_session_duration_histogram"].spark_fn(spark, sf_dir).collect()
    sessions = REGISTRY["t_session_windows"].spark_fn(spark, sf_dir)
    n_sessions = sessions.count()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_sessions"] for r in rows) == n_sessions
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["bounce_sessions"] <= r["n_sessions"]


def test_retention_curve_monotone_decreasing(spark, sf_dir):
    from odc_stac_spark.queries.temporal import RETENTION_DAYS

    rows = sorted(
        REGISTRY["events_retention_day_n_curve"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["day_n"],
    )
    assert [r["day_n"] for r in rows] == RETENTION_DAYS
    rates = [r["retention_rate"] for r in rows]
    # "active >= N days later" shrinks as N grows
    assert rates == sorted(rates, reverse=True)
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    for r in rows:
        assert r["n_users"] == n_users
        assert 0 <= r["retained"] <= n_users


def test_user_activity_powerlaw_slope_nonpositive(spark, sf_dir):
    r = REGISTRY["events_user_activity_powerlaw"].spark_fn(spark, sf_dir).collect()[0]
    assert r["n_points"] >= 2
    assert r["powerlaw_slope"] <= 0  # counts fall (or tie) with rank


def test_type_cooccurrence_matrix_shape(spark, sf_dir):
    rows = REGISTRY["events_type_cooccurrence_jaccard"].spark_fn(spark, sf_dir).collect()
    types = set()
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        types.update([r["type_a"], r["type_b"]])
    k = len(types)
    assert len(rows) <= k * (k - 1) // 2


def test_weekday_profile_conserves_orders(spark, sf_dir):
    rows = REGISTRY["orders_weekday_profile"].spark_fn(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == total
    assert {r["dow"] for r in rows} <= set(range(1, 8))
