"""Unit tests for the same-CRS warp path (SURVEY §2.8 F16: the
reference's rasterio.warp resampling, loader/_rio.py:361-369, minus CRS
transforms which need a projection library). Expectations are computed
from first principles against the SynthReader value function
v(py, px) = (seed*7919 + py*8191 + px*127) % 10007."""

from __future__ import annotations

import numpy as np
import pytest

from odc_stac_spark.model import (
    GeoBox,
    RasterBandMetadata,
    RasterLoadParams,
    RasterSource,
)
from odc_stac_spark.sources.synth import SynthReader

CRS = "EPSG:32735"


def synth_val(seed, py, px):
    return (seed * 7919 + py * 8191 + px * 127) % 10007


def mk_src(uri, origin, shape, res=10.0, dtype="int32", nodata=None):
    g = GeoBox(shape, (res, 0.0, origin[0], 0.0, -res, origin[1]), CRS)
    return RasterSource(uri, geobox=g, meta=RasterBandMetadata(dtype, nodata))


def test_nearest_halfpixel_offset():
    """src shifted +0.5 px in x: dst centers land in src pixel floor(x+0.5)."""
    src = mk_src("synth://a?seed=3", (5.0, 1000.0), (100, 100))  # x0=5 → half-pixel
    dst = GeoBox((100, 100), (10.0, 0.0, 0.0, 0.0, -10.0, 1000.0), CRS)
    rr = SynthReader().read(src, RasterLoadParams(), dst)
    assert rr.roi_y[0] == 0 and rr.roi_x[1] == 100
    # dst pixel (y, x) center world = (x*10+5, 1000-(y*10+5));
    # src pixel index = floor(((x*10+5) - 5)/10) = x-? compute directly
    ys, xs = np.mgrid[rr.roi_y[0] : rr.roi_y[1], rr.roi_x[0] : rr.roi_x[1]]
    wx = xs * 10.0 + 5.0
    wy = 1000.0 - (ys * 10.0 + 5.0)
    spy = np.floor((wy - 1000.0) / -10.0).astype(int)
    spx = np.floor((wx - 5.0) / 10.0).astype(int)
    want = synth_val(3, spy, spx)
    np.testing.assert_array_equal(rr.pix, want.astype(rr.pix.dtype))


def test_nearest_upsample_2x():
    """dst at 2x finer resolution: each src pixel covers a 2x2 dst block."""
    src = mk_src("synth://u?seed=1", (0.0, 200.0), (20, 20))
    dst = GeoBox((40, 40), (5.0, 0.0, 0.0, 0.0, -5.0, 200.0), CRS)
    rr = SynthReader().read(src, RasterLoadParams(), dst)
    ys, xs = np.mgrid[0:40, 0:40]
    want = synth_val(1, ys // 2, xs // 2)
    np.testing.assert_array_equal(rr.pix, want.astype(rr.pix.dtype))


def test_bilinear_aligned_equals_source():
    """bilinear on an exactly aligned grid reproduces source values
    everywhere — the +1 neighbors carry weight 0 and must not poison the
    border even where they fall outside the source."""
    src = mk_src("synth://b?seed=5", (0.0, 500.0), (50, 50), dtype="float32")
    dst = GeoBox((50, 50), (10.0, 0.0, 0.0, 0.0, -10.0, 500.0), CRS)
    rr = SynthReader().read(src, RasterLoadParams(resampling="bilinear"), dst)
    ys, xs = np.mgrid[0:50, 0:50]
    want = synth_val(5, ys, xs).astype(np.float64)
    np.testing.assert_allclose(rr.pix, want.astype("float32"))


def test_bilinear_halfpixel_is_neighbor_mean():
    """src shifted by exactly half a pixel in x → output = mean of the two
    x-neighbors (weights 0.5/0.5)."""
    src = mk_src("synth://c?seed=7", (5.0, 500.0), (50, 50), dtype="float64")
    dst = GeoBox((50, 50), (10.0, 0.0, 0.0, 0.0, -10.0, 500.0), CRS)
    rr = SynthReader().read(src, RasterLoadParams(resampling="bilinear"), dst)
    ys, xs = np.mgrid[0:50, 0:50]
    # dst center x = xs*10+5 → src fractional px = (xs*10+5-5)/10 - 0.5 = xs - 0.5
    # → neighbors xs-1 and xs, equal weight; y is aligned (weight 1 on ys)
    want = 0.5 * synth_val(7, ys, xs - 1) + 0.5 * synth_val(7, ys, xs)
    valid = np.zeros_like(want, dtype=bool)
    valid[:, 1:] = True  # x-1 >= 0 (y is aligned: weight-0 neighbors ignored)
    np.testing.assert_allclose(rr.pix[valid.nonzero()], want[valid.nonzero()])
    assert np.isnan(rr.pix[:, 0]).all()


def test_bilinear_nodata_neighbor_poisons():
    """any nodata neighbor → output nodata (mask-aware, no partial blend)."""
    src = mk_src("synth://d?seed=2&nodata_every=7", (5.0, 500.0), (50, 50), nodata=-1)
    dst = GeoBox((50, 50), (10.0, 0.0, 0.0, 0.0, -10.0, 500.0), CRS)
    cfg = RasterLoadParams(dtype="float64", fill_value=float("nan"), resampling="bilinear")
    rr = SynthReader().read(src, cfg, dst)
    ys, xs = np.mgrid[0:50, 0:50]
    holeL = (ys + (xs - 1) + 2) % 7 == 0
    holeR = (ys + xs + 2) % 7 == 0
    inb = np.zeros_like(holeL)
    inb[:, 1:] = True
    poisoned = (holeL | holeR) & inb
    assert np.isnan(rr.pix[poisoned.nonzero()]).all()
    clean = ~(holeL | holeR) & inb
    want = 0.5 * synth_val(2, ys, xs - 1) + 0.5 * synth_val(2, ys, xs)
    np.testing.assert_allclose(rr.pix[clean.nonzero()], want[clean.nonzero()])


def test_average_2x_block_mean():
    """2x downsample with average = mean of each 2x2 block (all valid)."""
    src = mk_src("synth://e?seed=4", (0.0, 400.0), (40, 40), dtype="float64")
    dst = GeoBox((20, 20), (20.0, 0.0, 0.0, 0.0, -20.0, 400.0), CRS)
    rr = SynthReader().read(src, RasterLoadParams(resampling="average"), dst)
    ys, xs = np.mgrid[0:40, 0:40]
    full = synth_val(4, ys, xs).astype(np.float64)
    want = full.reshape(20, 2, 20, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(rr.pix, want)


def test_average_skips_nodata_and_marks_empty():
    """average ignores nodata pixels; all-hole blocks → dst nodata."""
    src = mk_src("synth://f?seed=0&nodata_every=2", (0.0, 400.0), (40, 40), nodata=-1)
    dst = GeoBox((20, 20), (20.0, 0.0, 0.0, 0.0, -20.0, 400.0), CRS)
    cfg = RasterLoadParams(dtype="float64", fill_value=-999.0, resampling="average")
    rr = SynthReader().read(src, cfg, dst)
    ys, xs = np.mgrid[0:40, 0:40]
    full = synth_val(0, ys, xs).astype(np.float64)
    hole = (ys + xs) % 2 == 0  # checkerboard: every block has 2 valid pixels
    full[hole] = np.nan
    want = np.nanmean(full.reshape(20, 2, 20, 2), axis=(1, 3))
    np.testing.assert_allclose(rr.pix, want)


def test_integer_output_rounds():
    src = mk_src("synth://g?seed=9", (5.0, 500.0), (50, 50), dtype="int32")
    dst = GeoBox((50, 50), (10.0, 0.0, 0.0, 0.0, -10.0, 500.0), CRS)
    cfg = RasterLoadParams(resampling="bilinear", fill_value=-1)
    rr = SynthReader().read(src, cfg, dst)
    assert rr.pix.dtype == np.int32
    ys, xs = np.mgrid[0:50, 0:50]
    want = np.rint(0.5 * synth_val(9, ys, xs - 1) + 0.5 * synth_val(9, ys, xs))
    inb = np.zeros((50, 50), dtype=bool)
    inb[:, 1:] = True
    np.testing.assert_array_equal(rr.pix[inb.nonzero()], want[inb.nonzero()].astype(np.int32))
    assert (rr.pix[:, 0] == -1).all()


def test_unsupported_resampling_raises():
    src = mk_src("synth://h?seed=1", (5.0, 500.0), (10, 10))
    dst = GeoBox((10, 10), (10.0, 0.0, 0.0, 0.0, -10.0, 500.0), CRS)
    with pytest.raises(NotImplementedError, match="cubic"):
        SynthReader().read(src, RasterLoadParams(resampling="cubic"), dst)


def test_warp_through_spark_pipeline(spark):
    """End-to-end: a half-pixel-misaligned source with bilinear resampling
    through plan → tile explode → applyInPandas mosaic; tiles must stitch
    to exactly what a whole-grid direct read produces."""
    from datetime import datetime

    from odc_stac_spark.plans.load import Item, assemble_numpy, load, plan_load

    src = mk_src("synth://e2e?seed=11&nodata_every=9", (5.0, 1000.0), (100, 120), nodata=-1)
    item = Item(id="w-000", datetime=datetime(2020, 6, 6), bands={"red": src})
    out_gbox = GeoBox((96, 112), (10.0, 0.0, 0.0, 0.0, -10.0, 960.0), CRS)
    cfg = {"*": RasterLoadParams(dtype="float64", fill_value=float("nan"), resampling="bilinear")}
    plan = plan_load([item], geobox=out_gbox, chunks=(40, 40), cfg=cfg)
    tiles_df, _ = load(spark, [item], plan=plan)
    got = assemble_numpy(tiles_df, plan)["red"][0]

    rr = SynthReader().read(src, cfg["*"], out_gbox)
    want = np.full(out_gbox.shape, np.nan)
    want[rr.roi_y[0] : rr.roi_y[1], rr.roi_x[0] : rr.roi_x[1]] = rr.pix
    np.testing.assert_allclose(got, want, equal_nan=True)


def test_paste_path_still_taken_when_aligned():
    """aligned integer-shrink grids must NOT go through the warp (the
    decimated windowed read is the overview pushdown path)."""
    src = mk_src("synth://i?seed=6", (0.0, 400.0), (40, 40))
    dst = GeoBox((20, 20), (20.0, 0.0, 0.0, 0.0, -20.0, 400.0), CRS)
    rr = SynthReader().read(src, RasterLoadParams(), dst)
    ys, xs = np.mgrid[0:20, 0:20]
    # decimated read samples the top-left pixel of each 2x2 block
    want = synth_val(6, ys * 2, xs * 2)
    np.testing.assert_array_equal(rr.pix, want.astype(rr.pix.dtype))
