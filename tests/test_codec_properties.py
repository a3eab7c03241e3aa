"""Property-based (hypothesis) roundtrip gates for the from-scratch
codec family — randomized shapes/dtypes/contents beyond the fixed
fixtures. Each property is a full encode→decode identity, so a single
shrunk counterexample pinpoints a spec bug."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from odc_stac_spark.operators.jp2 import decode_jp2, encode_jp2_codestream
from odc_stac_spark.operators.jpeg import decode_jpeg, encode_jpeg
from odc_stac_spark.operators.zstd import decode_zstd


@st.composite
def small_image(draw, max_side=70, dtypes=("uint8", "uint16")):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    dt = np.dtype(draw(st.sampled_from(dtypes)))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    hi = int(min(np.iinfo(dt).max, 4000)) + 1
    smooth = draw(st.booleans())
    if smooth:
        img = ((np.add.outer(np.arange(h), np.arange(w)) * 3) % hi).astype(dt)
    else:
        img = rng.integers(0, hi, (h, w)).astype(dt)
    return img


@settings(max_examples=25, deadline=None)
@given(img=small_image(), levels=st.integers(1, 4), cblk=st.sampled_from([8, 16, 32]))
def test_jp2_lossless_roundtrip_property(img, levels, cblk):
    blob = encode_jp2_codestream(img, levels=levels, cblk=cblk)
    out = decode_jp2(blob)
    np.testing.assert_array_equal(out[:, :, 0], img)


@settings(max_examples=10, deadline=None)
@given(
    img=small_image(max_side=90),
    ty=st.integers(17, 48),
    tx=st.integers(17, 48),
)
def test_jp2_multitile_roundtrip_property(img, ty, tx):
    blob = encode_jp2_codestream(img, levels=2, cblk=16, tile_size=(ty, tx))
    np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], img)


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=20000), level=st.sampled_from([1, 3, 9]))
def test_zstd_pyarrow_frames_property(data, level):
    import pyarrow as pa

    blob = bytes(pa.Codec("zstd", compression_level=level).compress(data))
    assert decode_zstd(blob) == data


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h8=st.integers(1, 6),
    w8=st.integers(1, 6),
)
def test_jpeg_dc_exact_roundtrip_property(seed, h8, w8):
    """Block-constant even-valued grayscale is exactly lossless through
    baseline JPEG at quality 50 (the property the hash gates rely on)."""
    rng = np.random.default_rng(seed)
    blocks = (2 * rng.integers(0, 128, (h8, w8))).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    np.testing.assert_array_equal(out[:, :, 0], img)
