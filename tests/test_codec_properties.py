"""Property-based round-trip gates for the round-7 codecs (WebP VP8L,
GIF, FLAC, progressive JPEG coefficients, TIFF Predictor 3): hypothesis
drives shapes/content/parameters through the full encode→decode paths,
asserting exact losslessness everywhere the format is lossless."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

SHAPE = st.tuples(st.integers(1, 40), st.integers(1, 40))


@settings(max_examples=25, deadline=None)
@given(shape=SHAPE, channels=st.sampled_from([3, 4]), seed=st.integers(0, 2**31))
def test_webp_lossless_any_content(shape, channels, seed):
    from odc_stac_spark.operators.webp import decode_webp, encode_webp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, shape + (channels,), dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=15, deadline=None)
@given(
    shape=SHAPE,
    seed=st.integers(0, 2**31),
    cache_bits=st.sampled_from([0, 3, 8]),
    predictor=st.one_of(st.none(), st.integers(0, 13)),
)
def test_webp_transform_matrix(shape, seed, cache_bits, predictor):
    from odc_stac_spark.operators.webp import decode_webp, encode_webp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
    out = decode_webp(
        encode_webp(img, cache_bits=cache_bits, predictor=predictor)
    )
    assert (out == img).all()


@settings(max_examples=20, deadline=None)
@given(
    shape=SHAPE,
    ncolors=st.integers(2, 64),
    seed=st.integers(0, 2**31),
    interlace=st.booleans(),
)
def test_gif_palette_lossless(shape, ncolors, seed, interlace):
    from odc_stac_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    pal[:, 0] = np.arange(ncolors)  # force distinct colors
    img = pal[rng.integers(0, ncolors, shape)]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 3000),
    seed=st.integers(0, 2**31),
    block=st.sampled_from([192, 576, 1000, 4096]),
    amplitude=st.sampled_from([1, 100, 32767]),
)
def test_flac_lossless_any_signal(n, seed, block, amplitude):
    from odc_stac_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    s = rng.integers(-amplitude, amplitude + 1, n).astype(np.int16)
    out, rate = decode_flac(encode_flac(s, rate=16000, block_size=block))
    assert rate == 16000
    np.testing.assert_array_equal(out, s)


@settings(max_examples=15, deadline=None)
@given(shape=SHAPE, seed=st.integers(0, 2**31), q=st.sampled_from([40, 75, 95]))
def test_progressive_jpeg_always_equals_baseline(shape, seed, q):
    from odc_stac_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    b = decode_jpeg(encode_jpeg(img, quality=q))
    p = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
    np.testing.assert_array_equal(b, p)


@settings(max_examples=15, deadline=None)
@given(
    shape=SHAPE,
    seed=st.integers(0, 2**31),
    dtype=st.sampled_from(["float32", "float64"]),
)
def test_tiff_predictor3_bitexact(shape, seed, dtype, tmp_path_factory):
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import read_cog_file, write_cog_file

    rng = np.random.default_rng(seed)
    pix = rng.standard_normal(shape).astype(dtype)
    pix[0, 0] = np.float32("nan") if dtype == "float32" else float("nan")
    ny, nx = shape
    gbox = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, ny * 10.0), "EPSG:32735")
    p = str(tmp_path_factory.mktemp("p3") / "x.tif")
    write_cog_file(p, pix, gbox, tile=32, compression="deflate", predictor=3,
                   overview_levels=[])
    got = read_cog_file(p)["data"]
    # bit-exact incl. the NaN payload
    np.testing.assert_array_equal(got.view("uint8"), pix.view("uint8"))


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 2000),
    mcs=st.integers(2, 8),
    seed=st.integers(0, 2**31),
)
def test_gif_lzw_roundtrip(n, mcs, seed):
    from odc_stac_spark.operators.gif import lzw_decode_gif, lzw_encode_gif

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 1 << mcs, n).astype(np.uint8).tobytes()
    assert lzw_decode_gif(lzw_encode_gif(idx, mcs), mcs) == idx
