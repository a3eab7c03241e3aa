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
    with pytest.raises(NotImplementedError, match="sinc_sharp"):
        SynthReader().read(src, RasterLoadParams(resampling="sinc_sharp"), dst)


# ---- full resampling-mode surface (reference loader/_rio.py:327 exposes
# rasterio's mode set) — every expectation below is computed from first
# principles with per-pixel loops, independent of the vectorized code.


def _keys(t, a=-0.5):
    t = abs(t)
    if t <= 1:
        return (a + 2) * t**3 - (a + 3) * t**2 + 1
    if t < 2:
        return a * (t**3 - 5 * t**2 + 8 * t - 4)
    return 0.0


def test_cubic_halfpixel_matches_loop_oracle():
    """src shifted +5 m (half px): cubic interpolation at every dst center
    equals a scalar-loop Keys convolution over the 4x4 neighborhood."""
    src = mk_src("synth://c?seed=7", (5.0, 1000.0), (60, 60), dtype="float64")
    dst = GeoBox((20, 20), (10.0, 0.0, 100.0, 0.0, -10.0, 800.0), CRS)
    rr = SynthReader().read(
        src, RasterLoadParams(dtype="float64", resampling="cubic"), dst
    )
    for dy in range(0, 20, 7):
        for dx in range(0, 20, 7):
            y = rr.roi_y[0] + dy
            x = rr.roi_x[0] + dx
            wx = 100.0 + (x + 0.5) * 10.0
            wy = 800.0 - (y + 0.5) * 10.0
            fy = (wy - 1000.0) / -10.0 - 0.5
            fx = (wx - 5.0) / 10.0 - 0.5
            jy, jx = int(np.floor(fy)), int(np.floor(fx))
            ay, ax = fy - jy, fx - jx
            want = 0.0
            for ty in (-1, 0, 1, 2):
                for tx in (-1, 0, 1, 2):
                    want += (
                        _keys(ty - ay)
                        * _keys(tx - ax)
                        * synth_val(7, jy + ty, jx + tx)
                    )
            np.testing.assert_allclose(rr.pix[dy, dx], want, rtol=1e-12)


def test_cubic_aligned_equals_source():
    """cubic on an exactly aligned grid reproduces source values (the
    kernel interpolates through sample points)."""
    src = mk_src("synth://ca?seed=2", (0.0, 600.0), (60, 60), dtype="float64")
    dst = GeoBox((40, 40), (10.0, 0.0, 100.0, 0.0, -10.0, 500.0), CRS)
    rr = SynthReader().read(
        src, RasterLoadParams(dtype="float64", resampling="cubic"), dst
    )
    ys, xs = np.mgrid[rr.roi_y[0]:rr.roi_y[1], rr.roi_x[0]:rr.roi_x[1]]
    want = synth_val(2, ys + 10, xs + 10).astype(np.float64)
    np.testing.assert_allclose(rr.pix, want, rtol=1e-12)


def _bin_oracle(mode, seed, shape, src_origin, dst, nodata=None, nodata_every=None):
    """Scalar-loop statistic over src pixels whose centers land in each
    dst cell (2x downsample geometry used by the tests below)."""
    vals = {}
    sy0, sx0 = src_origin[1], src_origin[0]
    for py in range(shape[0]):
        for px in range(shape[1]):
            v = float(synth_val(seed, py, px))
            if nodata_every and (py + px + seed) % nodata_every == 0:
                continue  # nodata hole (synth rule: (py+px+seed) % K == 0)
            wx = sx0 + (px + 0.5) * 10.0
            wy = sy0 - (py + 0.5) * 10.0
            bx = int(np.floor((wx - dst.transform[2]) / dst.transform[0]))
            by = int(np.floor((wy - dst.transform[5]) / dst.transform[4]))
            if 0 <= by < dst.shape[0] and 0 <= bx < dst.shape[1]:
                vals.setdefault((by, bx), []).append(v)
    out = np.full(dst.shape, np.nan)
    for (by, bx), vs in vals.items():
        vs = sorted(vs)
        if mode == "min":
            out[by, bx] = vs[0]
        elif mode == "max":
            out[by, bx] = vs[-1]
        elif mode == "sum":
            out[by, bx] = sum(vs)
        elif mode == "rms":
            out[by, bx] = np.sqrt(sum(v * v for v in vs) / len(vs))
        elif mode in ("med", "q1", "q3"):
            q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[mode]
            pos = (len(vs) - 1) * q
            lo = int(np.floor(pos))
            hi = min(lo + 1, len(vs) - 1)
            out[by, bx] = vs[lo] * (1 - (pos - lo)) + vs[hi] * (pos - lo)
        elif mode == "mode":
            from collections import Counter

            c = Counter(vs)
            top = max(c.values())
            out[by, bx] = min(v for v, n in c.items() if n == top)
    return out


@pytest.mark.parametrize("mode", ["min", "max", "sum", "rms", "med", "q1", "q3", "mode"])
def test_bin_modes_match_loop_oracle(mode):
    src = mk_src("synth://b?seed=11", (0.0, 800.0), (40, 40), dtype="float64")
    dst = GeoBox((20, 20), (20.0, 0.0, 0.0, 0.0, -20.0, 800.0), CRS)
    rr = SynthReader().read(
        src, RasterLoadParams(dtype="float64", resampling=mode), dst
    )
    want = _bin_oracle(mode, 11, (40, 40), (0.0, 800.0), dst)
    got = np.full(dst.shape, np.nan)
    got[rr.roi_y[0]:rr.roi_y[1], rr.roi_x[0]:rr.roi_x[1]] = rr.pix
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_bin_mode_skips_nodata(spark=None):
    """nodata source pixels are excluded from the bin statistic."""
    src = mk_src(
        "synth://bn?seed=5&nodata_every=3", (0.0, 800.0), (40, 40),
        dtype="float64", nodata=-1.0,
    )
    dst = GeoBox((20, 20), (20.0, 0.0, 0.0, 0.0, -20.0, 800.0), CRS)
    rr = SynthReader().read(
        src,
        RasterLoadParams(dtype="float64", fill_value=float("nan"), resampling="med"),
        dst,
    )
    want = _bin_oracle("med", 5, (40, 40), (0.0, 800.0), dst, nodata_every=3)
    got = np.full(dst.shape, np.nan)
    got[rr.roi_y[0]:rr.roi_y[1], rr.roi_x[0]:rr.roi_x[1]] = rr.pix
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_gauss_is_weighted_mean_loop_oracle():
    """gauss: Gaussian-weighted mean (σ = half dst pixel per axis) of the
    contributing src pixel centers."""
    src = mk_src("synth://g?seed=9", (0.0, 800.0), (40, 40), dtype="float64")
    dst = GeoBox((20, 20), (20.0, 0.0, 0.0, 0.0, -20.0, 800.0), CRS)
    rr = SynthReader().read(
        src, RasterLoadParams(dtype="float64", resampling="gauss"), dst
    )
    for by, bx in ((0, 0), (7, 13), (19, 19)):
        wsum = vsum = 0.0
        ccx = 0.0 + (bx + 0.5) * 20.0
        ccy = 800.0 + (by + 0.5) * -20.0
        for py in range(40):
            for px in range(40):
                wx = (px + 0.5) * 10.0
                wy = 800.0 - (py + 0.5) * 10.0
                if int(np.floor((wx - 0.0) / 20.0)) == bx and int(
                    np.floor((wy - 800.0) / -20.0)
                ) == by:
                    w = np.exp(
                        -((wx - ccx) ** 2 / (2 * 10.0**2) + (wy - ccy) ** 2 / (2 * 10.0**2))
                    )
                    wsum += w
                    vsum += w * synth_val(9, py, px)
        y, x = by - rr.roi_y[0], bx - rr.roi_x[0]
        np.testing.assert_allclose(rr.pix[y, x], vsum / wsum, rtol=1e-12)


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


def _bspline(t):
    t = abs(t)
    if t <= 1:
        return (4 - 6 * t**2 + 3 * t**3) / 6
    if t < 2:
        return (2 - t) ** 3 / 6
    return 0.0


def _lanczos(t, a=3):
    if abs(t) >= a:
        return 0.0
    return float(np.sinc(t) * np.sinc(t / a))


@pytest.mark.parametrize(
    "mode,taps,kern,norm",
    [
        ("cubic_spline", (-1, 0, 1, 2), _bspline, False),
        ("lanczos", (-2, -1, 0, 1, 2, 3), _lanczos, True),
    ],
)
def test_wide_kernels_match_loop_oracle(mode, taps, kern, norm):
    """cubic_spline (B-spline smoothing) and lanczos (windowed sinc,
    kernel-mass normalized) vs scalar-loop convolution."""
    src = mk_src(f"synth://w{mode}?seed=13", (5.0, 1000.0), (60, 60), dtype="float64")
    dst = GeoBox((12, 12), (10.0, 0.0, 200.0, 0.0, -10.0, 800.0), CRS)
    rr = SynthReader().read(
        src, RasterLoadParams(dtype="float64", resampling=mode), dst
    )
    for dy in (0, 5, 11):
        for dx in (1, 7):
            y = rr.roi_y[0] + dy
            x = rr.roi_x[0] + dx
            wx = 200.0 + (x + 0.5) * 10.0
            wy = 800.0 - (y + 0.5) * 10.0
            fy = (wy - 1000.0) / -10.0 - 0.5
            fx = (wx - 5.0) / 10.0 - 0.5
            jy, jx = int(np.floor(fy)), int(np.floor(fx))
            ay, ax = fy - jy, fx - jx
            want = wsum = 0.0
            for ty in taps:
                for tx in taps:
                    w = kern(ty - ay) * kern(tx - ax)
                    want += w * synth_val(13, jy + ty, jx + tx)
                    wsum += w
            if norm:
                want /= wsum
            np.testing.assert_allclose(rr.pix[dy, dx], want, rtol=1e-10)


def test_cubic_spline_aligned_smooths_not_interpolates():
    """B-spline is a smoothing kernel: aligned grids do NOT reproduce
    source values exactly (unlike bilinear/cubic)."""
    src = mk_src("synth://sm?seed=4", (0.0, 600.0), (60, 60), dtype="float64")
    dst = GeoBox((20, 20), (10.0, 0.0, 100.0, 0.0, -10.0, 500.0), CRS)
    rr = SynthReader().read(
        src, RasterLoadParams(dtype="float64", resampling="cubic_spline"), dst
    )
    ys, xs = np.mgrid[rr.roi_y[0]:rr.roi_y[1], rr.roi_x[0]:rr.roi_x[1]]
    aligned_src = synth_val(4, ys + 10, xs + 10).astype(np.float64)
    assert not np.allclose(rr.pix, aligned_src)
