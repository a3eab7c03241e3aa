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
