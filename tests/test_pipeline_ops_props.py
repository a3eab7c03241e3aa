"""Invariant tests for the round-13 continuation operators — properties
the DuckDB oracle cannot express (the oracle proves Spark==SQL; these
prove the SHARED semantics are the intended ones)."""

from __future__ import annotations

import pyspark.sql.functions as F

from odc_stac_spark.queries import load_all
from odc_stac_spark.queries.text import CHUNK_S, CHUNK_W
from odc_stac_spark.sources.tables import load_table

REGISTRY = load_all()


def test_chunker_covers_every_token(spark, sf_dir):
    """Chunk windows must tile each document completely: consecutive
    starts differ by the stride, the first starts at 0, and the last
    chunk reaches the final token."""
    chunks = REGISTRY["text_chunk_overlap"].spark_fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), " +")).alias("n_toks"),
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("chunk_start").alias("first_start"),
        F.max(F.col("chunk_start") + F.col("n_tokens")).alias("covered_end"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_start").alias("last_start"),
    )
    j = per_doc.join(docs, "doc_id")
    assert j.where(F.col("first_start") != 0).count() == 0
    assert j.where(F.col("covered_end") != F.col("n_toks")).count() == 0
    # starts form the arithmetic progression 0, S, 2S, ...
    assert j.where(
        F.col("last_start") != (F.col("n_chunks") - 1) * CHUNK_S
    ).count() == 0
    # adjacent chunks overlap by W - S tokens wherever both are full
    assert CHUNK_W - CHUNK_S > 0


def test_m4_keeps_bucket_extremes(spark, sf_dir):
    """Per bucket: ≤4 flagged points, and the flagged set contains the
    bucket's true min and max values."""
    m4 = REGISTRY["ts_downsample_m4"].spark_fn(spark, sf_dir)
    per_bucket = m4.groupBy("event_type", "bucket_us").agg(
        F.count(F.lit(1)).alias("k"),
        F.max(F.when(F.col("is_min") == 1, F.col("value"))).alias("vmin"),
        F.max(F.when(F.col("is_max") == 1, F.col("value"))).alias("vmax"),
    )
    assert per_bucket.where(F.col("k") > 4).count() == 0
    ev = load_table(spark, sf_dir, "events")
    truth = ev.groupBy(
        "event_type", F.unix_micros(F.date_trunc("day", "ts")).alias("bucket_us")
    ).agg(
        F.round(F.min("value"), 4).alias("tmin"), F.round(F.max("value"), 4).alias("tmax")
    )
    j = per_bucket.join(truth, ["event_type", "bucket_us"])
    assert j.where(F.col("vmin") != F.col("tmin")).count() == 0
    assert j.where(F.col("vmax") != F.col("tmax")).count() == 0


def test_gap_fill_is_dense_and_carries_forward(spark, sf_dir):
    """The filled series has one row per hour in each series' span, gap
    rows carry the most recent real value, and n==0 exactly on gaps."""
    out = REGISTRY["ts_gap_fill_locf"].spark_fn(spark, sf_dir)
    spans = out.groupBy("event_type").agg(
        F.min("hour_us").alias("lo"),
        F.max("hour_us").alias("hi"),
        F.count(F.lit(1)).alias("rows"),
    )
    bad = spans.where(
        F.col("rows") != (F.col("hi") - F.col("lo")) / 3_600_000_000 + 1
    )
    assert bad.count() == 0
    assert out.where((F.col("was_gap") == 1) != (F.col("n") == 0)).count() == 0
    # a gap row's value equals the previous non-gap row's value
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("hour_us")
    prev = F.lag("value_locf").over(w)
    gaps = out.withColumn("prev", prev).where(F.col("was_gap") == 1)
    assert gaps.where(F.col("value_locf") != F.col("prev")).count() == 0


def test_int8_quantization_bounds_and_recall(spark, sf_dir):
    """Quantized cosine stays within the SQ8 error envelope of the true
    cosine: int8 top-1 neighbors must be near-top under the exact metric
    (here: top-1 qcos within 0.1 of the exact top-1 cos per query)."""
    q8 = (
        REGISTRY["ann_int8_quantized_topk"].spark_fn(spark, sf_dir)
        .where(F.col("rn") == 1)
        .select("query_id", F.col("qcos").alias("s8"))
    )
    exact = (
        REGISTRY["knn_bruteforce_cosine"].spark_fn(spark, sf_dir)
        .where(F.col("rn") == 1)
        .select("query_id", F.col("cos").alias("sx"))
    )
    j = q8.join(exact, "query_id")
    assert j.count() > 0
    assert j.where(F.abs(F.col("s8") - F.col("sx")) > 0.1).count() == 0


def test_matryoshka_rerank_matches_exact_topk_scores(spark, sf_dir):
    """The re-ranked scores are EXACT cosines — every (query, neighbor)
    the matryoshka path returns must carry the same cos as the
    brute-force oracle pairs when present there."""
    mrl = REGISTRY["ann_matryoshka_rerank"].spark_fn(spark, sf_dir).select(
        "query_id", "neighbor_id", "cos"
    )
    exact = REGISTRY["knn_bruteforce_cosine"].spark_fn(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("cos").alias("xcos")
    )
    j = mrl.join(exact, ["query_id", "neighbor_id"])
    assert j.where(F.col("cos") != F.col("xcos")).count() == 0


def test_weighted_sample_monotone_in_weight(spark, sf_dir):
    """Acceptance is monotone in weight by construction; empirically the
    kept set's mean weight must exceed the corpus mean weight."""
    kept = REGISTRY["sample_weighted_bernoulli"].spark_fn(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    mk = kept.agg(F.avg("n_chars")).first()[0]
    ma = d.agg(F.avg("n_chars")).first()[0]
    assert mk > ma


def test_stream_anomaly_equals_batch_anomaly(spark, sf_dir):
    """Stream-maintained state must yield the identical flag set as the
    batch query (the stream==batch parity contract, checked directly in
    addition to the shared SQL oracle)."""
    batch = REGISTRY["ts_anomaly_zscore"].spark_fn(spark, sf_dir)
    stream = REGISTRY["t_stream_anomaly_zscore"].spark_fn(spark, sf_dir)
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s


def test_markov_rows_are_distributions(spark, sf_dir):
    m = REGISTRY["events_markov_transitions"].spark_fn(spark, sf_dir)
    sums = m.groupBy("event_type").agg(F.sum("p").alias("s"), F.sum("n").alias("n"))
    bad = sums.where((F.abs(F.col("s") - 1.0) > 1e-4) | (F.col("n") <= 0))
    assert bad.count() == 0


def test_dau_never_exceeds_wau(spark, sf_dir):
    s = REGISTRY["events_dau_wau_stickiness"].spark_fn(spark, sf_dir)
    assert s.where(F.col("dau") > F.col("wau")).count() == 0
    assert s.where((F.col("stickiness") <= 0) | (F.col("stickiness") > 1)).count() == 0


def test_sketch_deciles_are_even_and_ordered(spark, sf_dir):
    d = REGISTRY["orders_decile_by_sketch"].spark_fn(spark, sf_dir)
    rows = {r.decile: r for r in d.collect()}
    assert set(rows) == set(range(1, 11))
    total = sum(r.n_orders for r in rows.values())
    for k, r in rows.items():
        assert 0.5 * total / 10 <= r.n_orders <= 1.5 * total / 10, (k, r)
        if k > 1:
            assert rows[k - 1].hi <= r.hi and rows[k - 1].lo <= r.lo


def test_topk_rankings_are_monotone(spark, sf_dir):
    for name, count_col in (("basket_pair_lift", "n_ab"), ("events_path_topk", "n")):
        rows = sorted(
            REGISTRY[name].spark_fn(spark, sf_dir).collect(), key=lambda r: r.rn
        )
        counts = [getattr(r, count_col) for r in rows]
        assert counts == sorted(counts, reverse=True), name


def test_recall_and_entropy_are_bounded(spark, sf_dir):
    r = REGISTRY["ann_recall_report"].spark_fn(spark, sf_dir)
    assert r.where((F.col("recall") < 0) | (F.col("recall") > 1)).count() == 0
    e = REGISTRY["text_entropy_filter"].spark_fn(spark, sf_dir)
    assert e.where(F.col("entropy_bits") < 0).count() == 0
    assert e.where(
        (F.col("keep") == 1) != (F.col("entropy_bits") >= 3.0)
    ).count() == 0


def test_vad_and_scene_frame_counts_match_the_synth_geometry(spark, sf_dir):
    vad = REGISTRY["mm_audio_vad_frames"].spark_fn(spark, sf_dir)
    per = vad.groupBy("doc_id").agg(F.count(F.lit(1)).alias("k"))
    expect = (
        (F.lit(1000) + F.col("doc_id") % 500 + F.lit(99)) / F.lit(100)
    ).cast("long")
    assert per.where(F.col("k") != F.floor(expect)).count() == 0
    sc = REGISTRY["mm_video_scene_cuts"].spark_fn(spark, sf_dir)
    per_sc = sc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("k"))
    assert per_sc.where(
        F.col("k") != (F.lit(4) + F.col("doc_id") % 4 - 1)
    ).count() == 0


def test_split_proportions(spark, sf_dir):
    s = REGISTRY["docs_train_val_split"].spark_fn(spark, sf_dir)
    by = {r.split: r.n for r in s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(by.values())
    assert 0.80 <= by.get("train", 0) / total <= 0.97
    assert by.get("val", 0) > 0 and by.get("test", 0) > 0


def test_stream_sessions_equal_batch_sessions(spark, sf_dir):
    batch = REGISTRY["t_session_windows"].spark_fn(spark, sf_dir).select(
        "user_id", "n_events", "session_start_us", "session_end_us"
    )
    stream = REGISTRY["t_stream_session_windows"].spark_fn(spark, sf_dir)
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s
