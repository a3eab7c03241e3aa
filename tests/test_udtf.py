"""SURVEY §2.10: UDTF + grouped-agg UDAF extension surface."""

from __future__ import annotations

import pyspark.sql.functions as F

from odc_stac_spark.functions.udtf import TileRangeUDTF, mad, register_udtfs
from odc_stac_spark.model import GeoBox, GeoboxTiles
from odc_stac_spark.sources.tables import load_table


def test_tile_range_udtf_matches_geoboxtiles(spark):
    """The UDTF emits exactly the tile set GeoboxTiles.tiles computes
    for a batch of footprints, driven from SQL via LATERAL."""
    gbox = GeoBox((380, 120), (10.0, 0.0, 0.0, 0.0, -10.0, 4000.0), "EPSG:32735")
    tiles = GeoboxTiles(gbox, (64, 64))
    register_udtfs(spark)
    feet = [
        (0, 0.0, 3400.0, 1200.0, 4000.0),
        (1, 500.0, 200.0, 900.0, 2600.0),
        (2, -500.0, 3900.0, 10.0, 4100.0),   # partially outside
        (3, 5000.0, 5000.0, 6000.0, 6000.0), # fully outside -> no rows
    ]
    spark.createDataFrame(
        feet, "fid int, xmin double, ymin double, xmax double, ymax double"
    ).createOrReplaceTempView("feet")
    got = spark.sql(
        """
        SELECT f.fid, t.iy, t.ix
        FROM feet f, LATERAL tile_range(
            xmin, ymin, xmax, ymax,
            0.0D, 4000.0D, 10.0D, 64, 64, 380, 120
        ) t
        """
    ).collect()
    got_set = {(r.fid, r.iy, r.ix) for r in got}
    want_set = {
        (fid, iy, ix)
        for fid, xmin, ymin, xmax, ymax in feet
        for iy, ix in tiles.tiles_overlapping_bbox((xmin, ymin, xmax, ymax))
    }
    assert got_set == want_set
    assert not any(fid == 3 for fid, _, _ in got_set)


def test_mad_grouped_agg_udaf(spark, sf_dir):
    """Arrow grouped-agg UDAF: MAD of order totals per priority equals
    the pandas computation."""
    orders = load_table(spark, sf_dir, "orders")
    got = {
        r.o_orderpriority: r.mad_total
        for r in orders.groupBy("o_orderpriority")
        .agg(mad()("o_totalprice").alias("mad_total"))
        .collect()
    }
    pdf = orders.select("o_orderpriority", "o_totalprice").toPandas()
    want = (
        pdf.groupby("o_orderpriority")["o_totalprice"]
        .apply(lambda v: float((v - v.median()).abs().median()))
        .to_dict()
    )
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, k
