"""Property-based round-trip tests (reference strategy SURVEY §5.3 —
upgraded from fixed parametrization to hypothesis)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from odc_stac_spark.model import (
    GeoBox,
    GeoboxTiles,
    band_display_name,
    norm_key,
    pick_overview,
    solar_offset_seconds,
)

res_st = st.sampled_from([0.25, 1.0, 10.0, 30.0, 60.0])
size_st = st.integers(min_value=1, max_value=500)


@given(
    name=st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True),
    idx=st.integers(min_value=1, max_value=99),
)
def test_norm_key_display_roundtrip(name, idx):
    key = (name, idx)
    assert norm_key(band_display_name(key)) == key


@settings(max_examples=200)
@given(
    x0=st.floats(-1e6, 1e6, allow_nan=False),
    y0=st.floats(-1e6, 1e6, allow_nan=False),
    res=res_st,
    ny=size_st,
    nx=size_st,
    iy=st.integers(0, 499),
    ix=st.integers(0, 499),
)
def test_pixel_world_roundtrip(x0, y0, res, ny, nx, iy, ix):
    g = GeoBox((ny, nx), (res, 0.0, x0, 0.0, -res, y0), "EPSG:32735")
    iy, ix = iy % ny, ix % nx
    # pixel center maps back to the same pixel
    x, y = g.world_of(iy, ix)
    assert g.pixel_of(x + res / 2, y - res / 2) == (iy, ix)


@settings(max_examples=100, deadline=None)  # deadline=None: co-tenant CPU
# load makes wall-clock deadlines flaky in the full-suite run
@given(ny=size_st, nx=size_st, ty=st.integers(1, 64), tx=st.integers(1, 64))
def test_tiles_partition_exactly(ny, nx, ty, tx):
    g = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, 0.0), "EPSG:32735")
    tiles = GeoboxTiles(g, (ty, tx))
    nty, ntx = tiles.chunk_counts
    # tile shapes sum back to the base shape on each axis, none empty
    heights = [tiles.tile_geobox(i, 0).shape[0] for i in range(nty)]
    widths = [tiles.tile_geobox(0, j).shape[1] for j in range(ntx)]
    assert sum(heights) == ny and sum(widths) == nx
    assert all(h > 0 for h in heights) and all(w > 0 for w in widths)
    # whole-extent query touches every tile
    hits = set(tiles.tiles_overlapping_bbox(g.bbox()))
    assert hits == {(i, j) for i in range(nty) for j in range(ntx)}


@given(lon=st.floats(-180.0, 180.0, allow_nan=False))
def test_solar_offset_bounds_and_truncation(lon):
    off = solar_offset_seconds(lon)
    assert off == int(lon / 15) * 3600  # trunc toward zero
    assert abs(off) <= 12 * 3600


@given(
    shrink=st.integers(1, 64),
    overviews=st.lists(st.integers(2, 32).map(lambda x: x), min_size=0, max_size=5),
)
def test_pick_overview_is_largest_leq(shrink, overviews):
    overviews = sorted(set(overviews))
    i = pick_overview(shrink, overviews)
    if i is None:
        assert all(o > shrink for o in overviews)
    else:
        assert overviews[i] <= shrink
        assert all(o > shrink for o in overviews[i + 1 :])


@settings(max_examples=200)
@given(
    zone=st.integers(1, 60),
    north=st.booleans(),
    dlon=st.floats(-3.4, 3.4, allow_nan=False),
    lat=st.floats(-80.0, 84.0, allow_nan=False),
)
def test_proj_roundtrip_closure(zone, north, dlon, lat):
    """UTM forward∘inverse is the identity to ≈1 mm anywhere in a zone."""
    from odc_stac_spark.functions.proj import geographic_to_utm, utm_to_geographic

    lon = (zone * 6 - 183) + dlon
    x, y = geographic_to_utm(lon, lat, zone, north)
    lon2, lat2 = utm_to_geographic(x, y, zone, north)
    assert abs(float(lon2) - lon) < 1e-8
    assert abs(float(lat2) - lat) < 1e-8


@settings(max_examples=50, deadline=None)
@given(
    off_x=st.floats(-55.0, 55.0, allow_nan=False),
    off_y=st.floats(-55.0, 55.0, allow_nan=False),
    seed=st.integers(0, 99),
)
def test_warp_nearest_matches_direct_sampling(off_x, off_y, seed):
    """For ANY grid offset, nearest-warp output equals sampling the synth
    value field at the containing src pixel of each dst center."""
    import numpy as np

    from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterLoadParams, RasterSource
    from odc_stac_spark.sources.synth import SynthReader

    src_g = GeoBox((40, 40), (10.0, 0.0, off_x, 0.0, -10.0, 400.0 + off_y), "EPSG:32735")
    src = RasterSource(f"synth://p?seed={seed}", geobox=src_g, meta=RasterBandMetadata("int32", None))
    dst = GeoBox((40, 40), (10.0, 0.0, 0.0, 0.0, -10.0, 400.0), "EPSG:32735")
    rr = SynthReader().read(src, RasterLoadParams(), dst)
    if rr is None:
        return
    ys, xs = np.mgrid[rr.roi_y[0] : rr.roi_y[1], rr.roi_x[0] : rr.roi_x[1]]
    wx = (xs + 0.5) * 10.0
    wy = 400.0 - (ys + 0.5) * 10.0
    spy = np.floor((wy - (400.0 + off_y)) / -10.0).astype(int)
    spx = np.floor((wx - off_x) / 10.0).astype(int)
    inb = (spy >= 0) & (spy < 40) & (spx >= 0) & (spx < 40)
    want = (seed * 7919 + spy * 8191 + spx * 127) % 10007
    assert (rr.pix[inb] == want[inb].astype(rr.pix.dtype)).all()


@settings(max_examples=25, deadline=None)
@given(
    ny=st.integers(1, 200),
    nx=st.integers(1, 200),
    tile=st.sampled_from([16, 64, 256]),
    dtype=st.sampled_from(["uint8", "uint16", "int32", "float32"]),
)
def test_geotiff_roundtrip_any_shape(tmp_path_factory, ny, nx, tile, dtype):
    import numpy as np

    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import read_cog_file, write_cog_file

    rng = np.random.default_rng(ny * 1000 + nx)
    if np.dtype(dtype).kind == "f":
        arr = rng.random((ny, nx)).astype(dtype)
    else:
        arr = rng.integers(0, np.iinfo(dtype).max, size=(ny, nx), dtype=dtype)
    g = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, ny * 10.0), "EPSG:32735")
    p = str(tmp_path_factory.mktemp("tif") / "x.tif")
    write_cog_file(p, arr, g, tile=tile)
    got = read_cog_file(p)
    assert (got["data"] == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    ny=st.integers(5, 80),
    nx=st.integers(5, 80),
    cy=st.integers(4, 48),
    cx=st.integers(4, 48),
    dtype=st.sampled_from(["uint8", "int16", "uint16", "int32", "float32", "float64"]),
    compressor=st.sampled_from(["zlib", "none"]),
    fill=st.integers(0, 100),
)
def test_zarr_chunk_assembly_roundtrip(tmp_path_factory, ny, nx, cy, cx, dtype, compressor, fill):
    """Spec property: any (shape, chunks, dtype, compressor) combination
    round-trips through chunk-file writes (edge chunks padded) and the
    independent reader — pure chunk math, no Spark."""
    import json
    import os
    import zlib as _z

    import numpy as np

    from odc_stac_spark.sources.sinks import read_zarr_array

    rng = np.random.default_rng(ny * 1000 + nx)
    arr = (rng.integers(0, 100, (ny, nx))).astype(dtype)
    out = str(tmp_path_factory.mktemp("z") / "a")
    os.makedirs(out)
    comp = {"id": "zlib", "level": 1} if compressor == "zlib" else None
    with open(os.path.join(out, ".zarray"), "w") as f:
        json.dump(
            {
                "zarr_format": 2,
                "shape": [ny, nx],
                "chunks": [cy, cx],
                "dtype": np.dtype(dtype).str,
                "compressor": comp,
                "fill_value": fill,
                "order": "C",
                "filters": None,
            },
            f,
        )
    for iy in range(-(-ny // cy)):
        for ix in range(-(-nx // cx)):
            full = np.full((cy, cx), fill, np.dtype(dtype))
            sl = arr[iy * cy : (iy + 1) * cy, ix * cx : (ix + 1) * cx]
            full[: sl.shape[0], : sl.shape[1]] = sl
            payload = full.tobytes()
            if comp is not None:
                payload = _z.compress(payload, 1)
            with open(os.path.join(out, f"{iy}.{ix}"), "wb") as f:
                f.write(payload)
    got = read_zarr_array(out)
    np.testing.assert_array_equal(got, arr)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 10**6),  # ts (us)
            st.sampled_from(["signup", "click", "purchase", "view"]),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_funnel_fold_matches_naive_scan(events):
    """The funnel's aggregate() fold (and its 3-CTE SQL oracle) both equal
    the obvious per-user sequential scan."""
    from collections import defaultdict

    rows = [
        {"user_id": u, "ts": ts, "event_id": i, "event_type": ty}
        for i, (u, ts, ty) in enumerate(events)
    ]
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    want = defaultdict(int)
    for u, evs in per_user.items():
        stage = 0
        for e in sorted(evs, key=lambda e: (e["ts"], e["event_id"])):
            if stage == 0 and e["event_type"] == "signup":
                stage = 1
            elif stage == 1 and e["event_type"] == "click":
                stage = 2
            elif stage == 2 and e["event_type"] == "purchase":
                stage = 3
        want[stage] += 1

    # 3-CTE strict-> formulation (the oracle's shape), on the same data
    got = defaultdict(int)
    for u, evs in per_user.items():
        key = lambda e: (e["ts"], e["event_id"])  # noqa: E731
        sk = min((key(e) for e in evs if e["event_type"] == "signup"), default=None)
        ck = (
            min((key(e) for e in evs if e["event_type"] == "click" and key(e) > sk), default=None)
            if sk is not None
            else None
        )
        pk = (
            min((key(e) for e in evs if e["event_type"] == "purchase" and key(e) > ck), default=None)
            if ck is not None
            else None
        )
        got[3 if pk else 2 if ck else 1 if sk else 0] += 1
    assert dict(got) == dict(want)


@settings(max_examples=200, deadline=None)
@given(
    c_us=st.integers(0, 10**13),
    delta=st.integers(0, 30 * 60 * 1_000_000),
)
def test_interval_bucket_coverage(c_us, delta):
    """Range-join bucketing invariant: any purchase within
    [click, click + I] lands in the click's bucket or the next one —
    the two exploded candidate buckets always cover the interval."""
    I = 30 * 60 * 1_000_000
    p_us = c_us + delta
    assert p_us // I in (c_us // I, c_us // I + 1)


# ---- real codecs (operators/codecs.py, operators/jpeg.py) -----------------


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(h, w, c, seed):
    from odc_stac_spark.operators.codecs import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


@given(
    n=st.integers(1, 4000),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 4),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(n, rate, channels, seed):
    from odc_stac_spark.operators.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, channels), dtype=np.int16)
    if channels == 1:
        s = s[:, 0]
    d, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    np.testing.assert_array_equal(d, s)


@given(
    ny=st.integers(1, 6),
    nx=st.integers(1, 6),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_block_constant_even_lossless_property(ny, nx, seed):
    """The exactness invariant the oracle queries build on, over arbitrary
    block layouts: even-valued pure-DC blocks survive q=50 bit-exactly."""
    from odc_stac_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    v = (2 * rng.integers(0, 128, (ny, nx))).astype(np.uint8)
    img = np.repeat(np.repeat(v, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    np.testing.assert_array_equal(out[:, :, 0], img)


@given(
    dims=st.integers(1, 3),
    version=st.sampled_from([1, 2, 5]),
    dtype=st.sampled_from(["int16", "int32", "float32", "float64", "uint8"]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_netcdf_roundtrip_property(tmp_path_factory, dims, version, dtype, seed):
    from odc_stac_spark.sources.netcdf import (
        read_netcdf_header,
        read_netcdf_var,
        write_netcdf,
    )

    rng = np.random.default_rng(seed)
    shape = tuple(int(rng.integers(1, 9)) for _ in range(dims))
    if np.issubdtype(np.dtype(dtype), np.integer):
        info = np.iinfo(dtype)
        a = rng.integers(info.min, int(info.max) + 1, shape).astype(dtype)
    else:
        a = rng.standard_normal(shape).astype(dtype)
    names = ("z", "y", "x")[:dims]
    p = str(tmp_path_factory.mktemp("nc") / "p.nc")
    write_netcdf(p, dict(zip(names, shape)), {"v": (names, a)}, version=version)
    hdr = read_netcdf_header(p)
    np.testing.assert_array_equal(read_netcdf_var(p, hdr, "v"), a)


@given(
    n=st.integers(1, 12),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_wkb_roundtrip_property(n, seed):
    from odc_stac_spark.sources.geoparquet import wkb_decode, wkb_encode_polygon

    rng = np.random.default_rng(seed)
    ring = [(float(x), float(y)) for x, y in rng.uniform(-1e6, 1e6, (n + 3, 2))]
    ring.append(ring[0])
    t, polys = wkb_decode(wkb_encode_polygon([ring]))
    assert t == "Polygon"
    np.testing.assert_allclose(polys[0][0], ring)


@given(
    order=st.integers(1, 12),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_hilbert_bijection_property(order, seed):
    """d is invertible on random samples: distinct cells → distinct d, and
    d < 4^order."""
    from odc_stac_spark.operators.spacefill import hilbert_np

    rng = np.random.default_rng(seed)
    n = 1 << order
    pts = rng.integers(0, n, (min(200, n * n), 2))
    pts = np.unique(pts, axis=0)
    d = hilbert_np(pts[:, 0], pts[:, 1], order)
    assert (d >= 0).all() and (d < n * n).all()
    assert len(np.unique(d)) == len(pts)
