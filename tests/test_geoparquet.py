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
