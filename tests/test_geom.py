"""P4 geometry: from-scratch polygon type (functions/geom.py) — membership
against an independent scalar pnpoly oracle, holes, bbox intersection
cases, rasterization, CRS transforms, and AOI tile pruning in load().
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest

from odc_stac_spark.functions.geom import Polygon, normalize_geometry
from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterSource
from odc_stac_spark.plans.load import Item, load, output_geobox

CRS = "EPSG:32735"


def pnpoly_scalar(rings, px, py):
    """Independent even-odd oracle: the classic Franklin pnpoly loop."""
    inside = False
    for ring in rings:
        n = len(ring) - 1
        j = n - 1
        for i in range(n):
            xi, yi = ring[i]
            xj, yj = ring[j]
            if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi) + xi:
                inside = not inside
            j = i
    return inside


def test_contains_matches_scalar_oracle():
    rng = np.random.default_rng(42)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
    rad = rng.uniform(2.0, 5.0, 9)
    ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
    poly = Polygon([ring])
    xs = rng.uniform(-6, 6, 500)
    ys = rng.uniform(-6, 6, 500)
    got = poly.contains(xs, ys)
    want = [pnpoly_scalar(poly.rings, x, y) for x, y in zip(xs, ys)]
    assert got.tolist() == want


def test_holes_and_area():
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole = [(4, 4), (6, 4), (6, 6), (4, 6)]
    poly = Polygon([outer, hole])
    assert poly.contains(2.0, 2.0)
    assert not poly.contains(5.0, 5.0)  # inside the hole
    assert not poly.contains(11.0, 5.0)
    assert poly.area == pytest.approx(100 - 4)
    assert poly.bounds == (0.0, 0.0, 10.0, 10.0)


def test_from_geojson_multipolygon_and_geo_interface():
    gj = {
        "type": "MultiPolygon",
        "coordinates": [
            [[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]],
            [[(5, 5), (7, 5), (7, 7), (5, 7), (5, 5)]],
        ],
    }
    poly = Polygon.from_geojson(gj)
    assert poly.contains(1.0, 1.0) and poly.contains(6.0, 6.0)
    assert not poly.contains(3.5, 3.5)
    # round-trip through __geo_interface__
    again = Polygon.from_geojson(poly)
    assert again.contains(1.0, 1.0)


def test_intersects_bbox_cases():
    tri = Polygon([[(0, 0), (10, 0), (5, 8)]])
    assert tri.intersects_bbox((4, 1, 6, 3))  # box fully inside polygon
    assert tri.intersects_bbox((-2, -2, 1, 1))  # vertex inside box
    assert not tri.intersects_bbox((20, 20, 30, 30))  # disjoint (bounds)
    assert not tri.intersects_bbox((-3, 5, -1, 7))  # bounds overlap? no
    # edge-crossing only: thin strip through a box, no vertex containment
    strip = Polygon([[(-1, 0.45), (2, 0.45), (2, 0.55), (-1, 0.55)]])
    assert strip.intersects_bbox((0, 0, 1, 1))
    # bbox overlapping the polygon's bounds but missing the polygon
    assert not tri.intersects_bbox((8.5, 5.0, 10.0, 8.0))


def test_rasterize_matches_contains():
    gbox = GeoBox((20, 30), (1.0, 0.0, 0.0, 0.0, -1.0, 20.0), "EPSG:4326")
    poly = Polygon([[(3.2, 2.1), (25.7, 4.3), (14.9, 18.6)]])
    mask = poly.rasterize(gbox)
    assert mask.shape == (20, 30)
    xs = 0.5 + np.arange(30)
    ys = 19.5 - np.arange(20)
    for iy in (0, 7, 13, 19):
        for ix in (0, 11, 22, 29):
            assert mask[iy, ix] == pnpoly_scalar(poly.rings, xs[ix], ys[iy])
    assert 0 < mask.sum() < mask.size
    with pytest.raises(ValueError):
        poly.rasterize(GeoBox((2, 2), (1.0, 0, 0, 0, -1.0, 2.0), CRS))


def test_to_crs_roundtrip_bounds():
    poly = Polygon([[(27.0, -15.0), (27.5, -15.0), (27.5, -14.5), (27.0, -14.5)]])
    utm = poly.to_crs(CRS)
    assert utm.crs == CRS
    back = utm.to_crs("EPSG:4326")
    b0, b1 = poly.bounds, back.bounds
    assert np.allclose(b0, b1, atol=1e-6)
    # area survives the round trip to within densification error
    assert back.area == pytest.approx(poly.area, rel=1e-6)


def test_normalize_geometry_forms():
    p = normalize_geometry((0.0, 0.0, 2.0, 3.0))
    assert p.bounds == (0.0, 0.0, 2.0, 3.0) and p.area == pytest.approx(6.0)
    p2 = normalize_geometry(
        {"type": "Polygon", "coordinates": [[(0, 0), (1, 0), (1, 1), (0, 1)]]}
    )
    assert isinstance(p2, Polygon) and p2.crs == "EPSG:4326"
    assert normalize_geometry(p2) is p2


def test_load_geopolygon_prunes_tiles(spark):
    """AOI ring geometry drops tiles whose bbox misses the polygon; the
    surviving tiles are pixel-identical to the unrestricted load."""
    gbox = GeoBox((96, 96), (10.0, 0.0, 0.0, 0.0, -10.0, 960.0), CRS)
    item = Item(
        id="aoi-000",
        datetime=datetime(2020, 6, 6, 8, 30),
        bands={
            "red": RasterSource(
                "synth://aoi?seed=5&nodata_every=0",
                geobox=gbox,
                meta=RasterBandMetadata("int16", -1),
            )
        },
    )
    # a diagonal triangle over the grid: its bbox covers (almost) all
    # tiles but the ring geometry misses the upper-right/lower-left corners
    tri = Polygon([[(20.0, 30.0), (940.0, 50.0), (60.0, 930.0)]], crs=CRS)

    # same output grid both times: x/y covering the triangle's bbox vs the
    # triangle itself (the grid covers the polygon's bbox either way — the
    # ring geometry only prunes tiles)
    full, _ = load(spark, [item], chunks=(32, 32), x=(20.0, 940.0),
                   y=(30.0, 930.0), resolution=10.0, crs=CRS)
    pruned, plan = load(spark, [item], chunks=(32, 32), geopolygon=tri,
                        resolution=10.0, crs=CRS)
    assert plan.aoi is not None

    f = {(r["iy"], r["ix"]): r["data"] for r in full.collect()}
    p = {(r["iy"], r["ix"]): r["data"] for r in pruned.collect()}
    assert set(p) < set(f)  # strictly fewer tiles
    # exactly the tiles whose bbox intersects the triangle survive
    expect = {
        k
        for k in f
        if tri.intersects_bbox(plan.tiles.tile_geobox(*k).bbox())
    }
    assert set(p) == expect
    for k, data in p.items():
        assert data == f[k]


def test_output_geobox_polygon_crs_respected():
    """A Polygon geopolygon carries its own CRS into the grid query."""
    poly = Polygon([[(100.0, 100.0), (500.0, 100.0), (500.0, 400.0)]], crs=CRS)
    gb = output_geobox([], geopolygon=poly, crs=CRS, resolution=10.0)
    assert gb is not None and gb.crs == CRS
    assert gb.bbox() == (100.0, 100.0, 500.0, 400.0)
