"""HLL sketch rollup — error bounds and mergeability (no SQL oracle)."""

import pyspark.sql.functions as F

from odc_stac_spark.queries import load_all

SF = "/root/testdata/sf0.01"


def test_hll_rollup_error_and_merge(spark):
    q = load_all()["sketch_hll_rollup"]
    rows = q.spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        # lgK=14 keeps HLL relative error well under 2%
        err = abs(r.approx_weekly_users - r.exact_weekly_users) / max(
            r.exact_weekly_users, 1
        )
        assert err <= 0.02, (r.event_type, r.week_start, err)
        # unioning daily sketches must answer the weekly question (dedup
        # across days), not the sum of dailies (which double-counts users
        # active on several days)
        assert r.approx_weekly_users <= r.sum_daily_exact


def test_hll_union_associativity(spark):
    """Merging partial sketches equals sketching the full stream — the
    property that makes sketch rollups correct under any partitioning."""
    from odc_stac_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select("user_id", (F.col("event_id") % 7).alias("part"))
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).cast("bigint")
    ).collect()[0][0]
    merged = (
        ev.groupBy("part")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s", F.lit(True))).cast("bigint"))
        .collect()[0][0]
    )
    assert direct == merged


def test_cms_never_underestimates_and_min_is_tight(spark):
    """Count-Min guarantee: estimate >= exact for EVERY key; with D=4
    rows over 150 keys in 256 buckets most keys should be estimated
    exactly (min over rows kills single-row collisions)."""
    q = load_all()["sketch_cms_heavyhitters"]
    rows = q.spark_fn(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_estimate == r.exact_count + r.overestimate for r in rows)
    exact = sum(1 for r in rows if r.overestimate == 0)
    assert exact >= len(rows) * 0.9, f"{exact}/{len(rows)} exact"
    # total mass conservation per sketch is implied by construction;
    # spot-check the heaviest key is estimated exactly or within eps*N
    n_events = sum(r.exact_count for r in rows)
    assert all(r.overestimate <= 2.0 * n_events / 256 * 4 for r in rows)


def test_bloom_has_no_false_negatives(spark):
    """Bloom guarantee: every exact match passes the filter; false
    positives exist at this M/K/keyset but stay a small fraction."""
    q = load_all()["sketch_bloom_prefilter"]
    rows = q.spark_fn(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.bloom_pass == r.exact_match + r.false_positives
        assert r.bloom_pass >= r.exact_match
        assert r.false_positives < r.n_events * 0.1
    assert sum(r.false_positives for r in rows) > 0, "expected some collisions"
