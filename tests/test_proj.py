"""functions/proj.py (Krüger WGS84↔UTM) + cross-CRS warp tests.

The projection tests are invariant-based (no external library to compare
against): central-meridian/equator anchors, the k0 scale factor, meridian
arc length, round-trip closure at sub-mm level, and zone symmetry. The
warp tests then check the sampling machinery: a UTM source read into a
geographic grid must equal sampling the source at the transformed
coordinates computed independently in the test.
"""

from __future__ import annotations

import numpy as np
import pytest

from odc_stac_spark.functions import proj
from odc_stac_spark.functions.proj import (
    can_transform,
    geographic_to_utm,
    parse_utm,
    transform,
    utm_to_geographic,
)
from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterLoadParams, RasterSource
from odc_stac_spark.sources.synth import SynthReader


def test_parse_utm():
    assert parse_utm("EPSG:32635") == (35, True)
    assert parse_utm("EPSG:32735") == (35, False)
    with pytest.raises(NotImplementedError):
        parse_utm("EPSG:3857")
    assert can_transform("EPSG:4326", "EPSG:32735")
    assert can_transform("EPSG:4326", "EPSG:3857")
    assert can_transform("EPSG:3857", "EPSG:32735")
    assert can_transform("EPSG:4326", "EPSG:3577")  # Albers now built in
    assert can_transform("EPSG:3577", "ESRI:54008")
    assert not can_transform("EPSG:4326", "EPSG:2193")  # NZTM: pyproj slot


def test_central_meridian_and_equator_anchors():
    x, y = geographic_to_utm(27.0, 0.0, 35, True)
    assert abs(x - 500000.0) < 1e-6
    assert abs(y) < 1e-6
    # southern hemisphere false northing
    x, y = geographic_to_utm(27.0, 0.0, 35, False)
    assert abs(y - 10000000.0) < 1e-6


def test_scale_factor_at_central_meridian():
    """E-W ground scale on the central meridian must be k0 = 0.9996."""
    eps = 0.0005
    x1, _ = geographic_to_utm(27.0 + eps, 0.0, 35, True)
    x0, _ = geographic_to_utm(27.0 - eps, 0.0, 35, True)
    ground = 2 * eps / 360.0 * 2 * np.pi * 6378137.0
    assert abs((x1 - x0) / ground - 0.9996) < 1e-7


def test_meridian_arc_one_degree():
    """0→1°N meridian distance on WGS84 ≈ 110574.4 m, times k0."""
    _, y = geographic_to_utm(27.0, 1.0, 35, True)
    assert abs(y - 110574.4 * 0.9996) < 1.0  # within a metre


def test_roundtrip_closure():
    rng = np.random.default_rng(0)
    lon = 24.0 + rng.random(20000) * 6.0
    lat = -80.0 + rng.random(20000) * 160.0
    x, y = geographic_to_utm(lon, lat, 35, False)
    lon2, lat2 = utm_to_geographic(x, y, 35, False)
    assert np.abs(lon2 - lon).max() < 1e-8  # ≈ 1 mm
    assert np.abs(lat2 - lat).max() < 1e-8


def test_zone_mirror_symmetry():
    """Points mirrored about the central meridian map to mirrored x."""
    xw, yw = geographic_to_utm(26.0, -10.0, 35, False)
    xe, ye = geographic_to_utm(28.0, -10.0, 35, False)
    assert abs((500000.0 - xw) - (xe - 500000.0)) < 1e-6
    assert abs(yw - ye) < 1e-6


def test_transform_utm_to_utm_via_geographic():
    x, y = transform(500000.0, 8000000.0, "EPSG:32735", "EPSG:32736")
    lon, lat = utm_to_geographic(500000.0, 8000000.0, 35, False)
    x2, y2 = geographic_to_utm(lon, lat, 36, False)
    assert abs(x - x2) < 1e-9 and abs(y - y2) < 1e-9


# ---- cross-CRS warp through the reader -----------------------------------


def synth_val(seed, py, px):
    return (seed * 7919 + py * 8191 + px * 127) % 10007


def test_crosscrs_nearest_matches_manual_sampling():
    """UTM source → geographic dst grid; expected output computed by
    transforming dst centers with the same proj functions and sampling the
    synth value field directly."""
    src_gbox = GeoBox(
        (200, 200), (100.0, 0.0, 400000.0, 0.0, -100.0, 8350000.0), "EPSG:32735"
    )
    src = RasterSource("synth://x?seed=3", geobox=src_gbox, meta=RasterBandMetadata("int32", None))
    # the source footprint in lon/lat is roughly (26.1..26.3, -15.1..-14.9)
    dst = GeoBox((120, 140), (0.002, 0.0, 26.05, 0.0, -0.002, -14.85), "EPSG:4326")
    rr = SynthReader().read(src, RasterLoadParams(), dst)
    assert rr is not None

    ys, xs = np.mgrid[rr.roi_y[0] : rr.roi_y[1], rr.roi_x[0] : rr.roi_x[1]]
    lon = 26.05 + (xs + 0.5) * 0.002
    lat = -14.85 - (ys + 0.5) * 0.002
    ux, uy = geographic_to_utm(lon, lat, 35, False)
    spy = np.floor((uy - 8350000.0) / -100.0).astype(int)
    spx = np.floor((ux - 400000.0) / 100.0).astype(int)
    inb = (spy >= 0) & (spy < 200) & (spx >= 0) & (spx < 200)
    want = synth_val(3, spy, spx)
    np.testing.assert_array_equal(rr.pix[inb], want[inb].astype(rr.pix.dtype))
    assert inb.any()


def test_crosscrs_roundtrip_identity_region():
    """Warping a UTM source onto a UTM grid of another zone and back would
    compound; instead check bilinear cross-CRS runs and fills the
    overlapping region with finite values."""
    src_gbox = GeoBox(
        (300, 300), (100.0, 0.0, 400000.0, 0.0, -100.0, 8350000.0), "EPSG:32735"
    )
    src = RasterSource("synth://y?seed=5", geobox=src_gbox, meta=RasterBandMetadata("float64", None))
    dst = GeoBox((100, 100), (0.002, 0.0, 26.1, 0.0, -0.002, -14.92), "EPSG:4326")
    rr = SynthReader().read(src, RasterLoadParams(resampling="bilinear"), dst)
    assert rr is not None
    assert np.isfinite(rr.pix).mean() > 0.9


def test_crosscrs_average_matches_manual_binning():
    """Cross-CRS average: mean of src pixels whose transformed centers
    land in each dst cell — recomputed independently here by binning."""
    src_gbox = GeoBox(
        (120, 120), (50.0, 0.0, 420000.0, 0.0, -50.0, 8345000.0), "EPSG:32735"
    )
    src = RasterSource("synth://avg?seed=9", geobox=src_gbox, meta=RasterBandMetadata("float64", None))
    dst = GeoBox((40, 40), (0.002, 0.0, 26.24, 0.0, -0.002, -14.94), "EPSG:4326")
    rr = SynthReader().read(src, RasterLoadParams(resampling="average"), dst)
    assert rr is not None

    # manual binning over ALL src pixels
    iy, ix = np.mgrid[0:120, 0:120]
    vals = synth_val(9, iy, ix).astype(np.float64)
    scx = 420000.0 + (ix + 0.5) * 50.0
    scy = 8345000.0 - (iy + 0.5) * 50.0
    lon, lat = utm_to_geographic(scx, scy, 35, False)
    bx = np.floor((lon - 26.24) / 0.002).astype(int) - rr.roi_x[0]
    by = np.floor((lat - (-14.94)) / -0.002).astype(int) - rr.roi_y[0]
    n_y = rr.roi_y[1] - rr.roi_y[0]
    n_x = rr.roi_x[1] - rr.roi_x[0]
    want = np.full((n_y, n_x), np.nan)
    cnt = np.zeros((n_y, n_x))
    acc = np.zeros((n_y, n_x))
    sel = (by >= 0) & (by < n_y) & (bx >= 0) & (bx < n_x)
    np.add.at(acc, (by[sel], bx[sel]), vals[sel])
    np.add.at(cnt, (by[sel], bx[sel]), 1)
    filled = cnt > 0
    want[filled] = acc[filled] / cnt[filled]
    np.testing.assert_allclose(rr.pix, want, equal_nan=True)


def test_crosscrs_unsupported_pair_raises():
    src_gbox = GeoBox((10, 10), (1.0, 0.0, 0.0, 0.0, -1.0, 10.0), "EPSG:2193")
    src = RasterSource("synth://z?seed=1", geobox=src_gbox, meta=RasterBandMetadata("int32", None))
    dst = GeoBox((10, 10), (0.1, 0.0, 0.0, 0.0, -0.1, 1.0), "EPSG:4326")
    with pytest.raises(NotImplementedError, match="pyproj"):
        SynthReader().read(src, RasterLoadParams(), dst)


# ---- Albers equal-area conic + sinusoidal (odc-catalog CRS families) -----


def test_albers_3577_roundtrip_and_invariants():
    rng = np.random.default_rng(1)
    lon = rng.uniform(113, 154, 2000)
    lat = rng.uniform(-44, -10, 2000)
    x, y = proj.transform(lon, lat, "EPSG:4326", "EPSG:3577")
    lon2, lat2 = proj.transform(x, y, "EPSG:3577", "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # central meridian maps to x=0; east of it x>0
    x0, _ = proj.transform(np.array([132.0]), np.array([-25.0]), "EPSG:4326", "EPSG:3577")
    assert abs(x0[0]) < 1e-6
    xe, _ = proj.transform(np.array([140.0]), np.array([-25.0]), "EPSG:4326", "EPSG:3577")
    assert xe[0] > 0


def test_albers_is_actually_equal_area():
    """The defining property, checked independently: the projection's
    Jacobian determinant equals the ellipsoidal area element M·N·cosφ."""
    a, f = 6378137.0, 1 / 298.257222101
    e2 = 2 * f - f * f
    for lo, la in ((140.0, -30.0), (118.0, -20.0), (150.0, -42.0)):
        d = 1e-4
        (x0,), (y0,) = proj.transform(np.array([lo]), np.array([la]), "EPSG:4326", "EPSG:3577")
        (x1,), (y1,) = proj.transform(np.array([lo + d]), np.array([la]), "EPSG:4326", "EPSG:3577")
        (x2,), (y2,) = proj.transform(np.array([lo]), np.array([la + d]), "EPSG:4326", "EPSG:3577")
        J = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) / np.radians(d) ** 2
        phi = np.radians(la)
        M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        assert abs(J / (M * N * np.cos(phi)) - 1.0) < 1e-6


def test_albers_conus_and_california_roundtrip():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-124, -67, 500)
    lat = rng.uniform(25, 49, 500)
    for crs in ("EPSG:5070", "EPSG:3310"):
        x, y = proj.transform(lon, lat, "EPSG:4326", crs)
        l2, p2 = proj.transform(x, y, crs, "EPSG:4326")
        np.testing.assert_allclose(l2, lon, atol=1e-9)
        np.testing.assert_allclose(p2, lat, atol=1e-9)


def test_sinusoidal_roundtrip_and_modis_grid():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-85, 85, 1000)
    x, y = proj.transform(lon, lat, "EPSG:4326", "ESRI:54008")
    l2, p2 = proj.transform(x, y, "ESRI:54008", "EPSG:4326")
    np.testing.assert_allclose(l2, lon, atol=1e-9)
    np.testing.assert_allclose(p2, lat, atol=1e-9)
    # the MODIS constant: equator circumference/2 = pi*R
    xedge, _ = proj.transform(np.array([180.0]), np.array([0.0]), "EPSG:4326", "ESRI:54008")
    np.testing.assert_allclose(xedge[0], np.pi * 6371007.181, rtol=1e-12)


def test_albers_crosscrs_warp_through_reader():
    """EPSG:3577 source → 4326 output grid via the reader's warp path,
    spot-checked against manual center transformation + nearest sampling
    (same method as the UTM cross-CRS test)."""
    # a 3577 grid near (140E, 30S): x ~ 765k, y ~ -3350k
    (cx,), (cy,) = proj.transform(np.array([140.0]), np.array([-30.0]), "EPSG:4326", "EPSG:3577")
    x0 = float(np.floor(cx / 100) * 100)
    y0 = float(np.ceil(cy / 100) * 100)
    src_gbox = GeoBox((200, 200), (100.0, 0.0, x0, 0.0, -100.0, y0), "EPSG:3577")
    src = RasterSource(
        "synth://alb?seed=6", geobox=src_gbox, meta=RasterBandMetadata("int32", None)
    )
    dst = GeoBox((100, 120), (0.002, 0.0, 139.95, 0.0, -0.002, -29.95), "EPSG:4326")
    rr = SynthReader().read(src, RasterLoadParams(), dst)
    assert rr is not None
    ys, xs = np.mgrid[rr.roi_y[0]:rr.roi_y[1], rr.roi_x[0]:rr.roi_x[1]]
    lon = 139.95 + (xs + 0.5) * 0.002
    lat = -29.95 - (ys + 0.5) * 0.002
    ax, ay = proj.transform(lon, lat, "EPSG:4326", "EPSG:3577")
    spy = np.floor((ay - y0) / -100.0).astype(int)
    spx = np.floor((ax - x0) / 100.0).astype(int)
    inb = (spy >= 0) & (spy < 200) & (spx >= 0) & (spx < 200)
    assert inb.any()
    want = (6 * 7919 + spy * 8191 + spx * 127) % 10007
    np.testing.assert_array_equal(rr.pix[inb], want[inb].astype(rr.pix.dtype))
