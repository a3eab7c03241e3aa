"""STAC-geoparquet catalog layout — sources/geoparquet.py."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from odc_stac_spark.sources.geoparquet import (
    bbox_filter,
    geoparquet_meta,
    read_stac_geoparquet,
    wkb_decode,
    wkb_encode_polygon,
    write_stac_geoparquet,
)


def test_wkb_roundtrip_polygon():
    rings = [
        [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0)],
        [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)],  # hole
    ]
    t, polys = wkb_decode(wkb_encode_polygon(rings))
    assert t == "Polygon" and len(polys) == 1 and len(polys[0]) == 2
    np.testing.assert_allclose(polys[0][0], rings[0])
    np.testing.assert_allclose(polys[0][1], rings[1])


def test_wkb_big_endian_decode():
    import struct

    # hand-assemble a big-endian WKB triangle
    pts = [(1.0, 2.0), (3.0, 2.0), (1.0, 5.0), (1.0, 2.0)]
    buf = struct.pack(">BII", 0, 3, 1) + struct.pack(">I", 4)
    for x, y in pts:
        buf += struct.pack(">dd", x, y)
    t, polys = wkb_decode(buf)
    assert t == "Polygon"
    np.testing.assert_allclose(polys[0][0], pts)


def test_wkb_unknown_type_refused():
    import struct

    with pytest.raises(NotImplementedError):
        wkb_decode(struct.pack("<BI", 1, 2))  # LineString


@pytest.fixture()
def catalog(spark):
    rows = [
        (
            f"item-{i:03d}",
            "c-a" if i % 2 == 0 else "c-b",
            [float(i % 10), float(i // 10), float(i % 10 + 2), float(i // 10 + 2)],
        )
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "id string, collection string, bbox array<double>")


def test_geoparquet_roundtrip_and_meta(spark, catalog, tmp_path):
    path = str(tmp_path / "cat")
    files = write_stac_geoparquet(catalog.repartition(4), path)
    assert len(files) >= 2  # one file per non-empty partition, executor-written
    meta = geoparquet_meta(path)
    assert meta["version"] == "1.1.0"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"
    assert meta["columns"]["geometry"]["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]

    back = read_stac_geoparquet(spark, path)
    assert back.count() == 100
    row = back.where(F.col("id") == "item-007").collect()[0]
    assert row.bbox.xmin == 7.0 and row.bbox.ymax == 2.0
    t, polys = wkb_decode(bytes(row.geometry))
    assert t == "Polygon"
    np.testing.assert_allclose(
        polys[0][0], [(7, 0), (9, 0), (9, 2), (7, 2), (7, 0)]
    )


def test_bbox_filter_pushdown_and_result(spark, catalog, tmp_path):
    path = str(tmp_path / "cat")
    write_stac_geoparquet(catalog, path)
    df = read_stac_geoparquet(spark, path)
    q = bbox_filter(df, 3.0, 0.0, 4.0, 1.0).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bbox.xmin" in plan
    got = {r.id for r in q.collect()}
    want = {
        f"item-{i:03d}"
        for i in range(100)
        if i % 10 <= 4.0 and i % 10 + 2 >= 3.0 and i // 10 <= 1.0 and i // 10 + 2 >= 0.0
    }
    assert got == want and got


def test_catalog_path_runs_from_geoparquet(spark, tmp_path):
    """The full catalog pipeline — items_df → STAC-geoparquet at rest →
    scan → parse_items — must produce the same parsed catalog as the
    plain-parquet roundtrip (assets map, geoboxes and all)."""
    from datetime import datetime, timedelta

    from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterSource
    from odc_stac_spark.plans.load import Item
    from odc_stac_spark.sources.geoparquet import catalog_from_geoparquet
    from odc_stac_spark.sources.stac_items import items_df, parse_items

    items = []
    for i, origin in enumerate([(0.0, 1000.0), (400.0, 800.0)]):
        gbox = GeoBox((100, 120), (10.0, 0.0, origin[0], 0.0, -10.0, origin[1]), "EPSG:32735")
        items.append(
            Item(
                id=f"gpq-{i:03d}",
                datetime=datetime(2020, 6, 6) + timedelta(hours=i),
                bands={
                    "red": RasterSource(
                        f"synth://red{i}?seed={i}", geobox=gbox,
                        meta=RasterBandMetadata("int32", -1.0),
                    )
                },
            )
        )
    raw = items_df(spark, items)

    plain = str(tmp_path / "plain")
    raw.write.parquet(plain)
    want = parse_items(spark, spark.read.parquet(plain)).orderBy("id", "asset_name").collect()

    gpq = str(tmp_path / "gpq")
    write_stac_geoparquet(raw, gpq)
    assert geoparquet_meta(gpq)["version"] == "1.1.0"
    back = catalog_from_geoparquet(read_stac_geoparquet(spark, gpq))
    got = parse_items(spark, back).orderBy("id", "asset_name").collect()

    assert [r.asDict() for r in got] == [r.asDict() for r in want]
