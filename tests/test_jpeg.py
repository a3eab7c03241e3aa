"""Baseline JPEG codec — operators/jpeg.py."""

import numpy as np
import pytest

from odc_stac_spark.operators.jpeg import ZIGZAG, decode_jpeg, encode_jpeg

rng = np.random.default_rng(11)


def psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_zigzag_is_the_standard_order():
    # spot-check the generated walk against the spec's published sequence
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_flat_gray_lossless_q50():
    img = np.full((16, 24), 100, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert out.shape == (16, 24, 1)
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_block_constant_even_gray_lossless_q50():
    """Pure-DC blocks with even values are exactly lossless at quality 50
    (the property the mm_image_jpeg_codec oracle is built on)."""
    v = (2 * ((np.arange(5)[:, None] * 7 + np.arange(4)[None, :] * 3) % 128)).astype(np.uint8)
    img = np.repeat(np.repeat(v, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    np.testing.assert_array_equal(out[:, :, 0], img)


@pytest.mark.parametrize("quality,floor", [(50, 40), (85, 46), (95, 52)])
def test_gray_quality_ladder(quality, floor):
    y, x = np.mgrid[0:64, 0:64]
    img = (128 + 60 * np.sin(y / 9.0) + 50 * np.cos(x / 7.0)).clip(0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality))[:, :, 0]
    assert psnr(img, out) > floor


def test_color_444_and_420():
    y, x = np.mgrid[0:48, 0:56]
    base = (128 + 60 * np.sin(y / 9.0) + 50 * np.cos(x / 7.0)).clip(0, 255).astype(np.uint8)
    img = np.stack([base, np.roll(base, 5, 0), 255 - base], -1)
    o444 = decode_jpeg(encode_jpeg(img, quality=90))
    o420 = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert o444.shape == img.shape and o420.shape == img.shape
    assert psnr(img, o444) > 40
    assert psnr(img, o420) > 30  # chroma subsampling is intentionally lossy
    assert len(encode_jpeg(img, quality=90, subsample=True)) < len(
        encode_jpeg(img, quality=90)
    )


@pytest.mark.parametrize("hw", [(37, 29), (8, 8), (1, 1), (17, 64)])
def test_odd_sizes_roundtrip_shape(hw):
    h, w = hw
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (h, w, 1)


def test_restart_markers_do_not_change_pixels():
    y, x = np.mgrid[0:80, 0:72]
    img = (128 + 60 * np.sin(y / 9.0) + 50 * np.cos(x / 7.0)).clip(0, 255).astype(np.uint8)
    enc = encode_jpeg(img, quality=85, restart_interval=3)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    np.testing.assert_array_equal(
        decode_jpeg(enc), decode_jpeg(encode_jpeg(img, quality=85))
    )
    imgc = np.stack([img, np.roll(img, 5, 0), 255 - img], -1)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(imgc, quality=90, subsample=True, restart_interval=2)),
        decode_jpeg(encode_jpeg(imgc, quality=90, subsample=True)),
    )


def test_hierarchical_refused():
    img = np.full((8, 8), 5, np.uint8)
    enc = bytearray(encode_jpeg(img))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless sequential)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(enc))


# ---- progressive (SOF2, Annex G) ------------------------------------------


def test_progressive_equals_baseline_gray_and_color():
    rng = np.random.default_rng(3)
    for shape, kw in [
        ((16, 16), {}),
        ((24, 33), {}),
        ((17, 23, 3), {}),
        ((32, 48, 3), {"subsample": True}),
    ]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for q in (50, 85):
            b = decode_jpeg(encode_jpeg(img, quality=q, **kw))
            p = decode_jpeg(encode_jpeg(img, quality=q, progressive=True, **kw))
            # same quantized coefficients ⇒ bit-identical pixels
            np.testing.assert_array_equal(b, p, err_msg=f"{shape} {kw} q{q}")


def test_progressive_eobrun_heavy():
    # flat image: every AC scan is one giant EOB run spanning all blocks
    img = np.full((64, 72), 128, np.uint8)
    p = decode_jpeg(encode_jpeg(img, quality=50, progressive=True))
    b = decode_jpeg(encode_jpeg(img, quality=50))
    np.testing.assert_array_equal(b, p)


def test_progressive_sparse_high_frequency():
    # single bright pixel per block → long zero runs (ZRL) in both AC
    # first and refinement scans
    img = np.full((40, 40), 30, np.uint8)
    img[::8, 7::8] = 255
    b = decode_jpeg(encode_jpeg(img, quality=75))
    p = decode_jpeg(encode_jpeg(img, quality=75, progressive=True))
    np.testing.assert_array_equal(b, p)


def test_progressive_dc_even_fixture_lossless():
    # the oracle-gated fixture: block-constant even values, quality 50
    by, bx = np.mgrid[0:2, 0:2]
    v = (2 * ((7 * 13 + by * 7 + bx * 3) % 128)).astype(np.uint8)
    img = np.repeat(np.repeat(v, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img, quality=50, progressive=True))
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_progressive_structure_is_multiscan():
    img = np.random.default_rng(5).integers(0, 256, (16, 16, 3), np.uint8)
    enc = encode_jpeg(img, quality=80, progressive=True)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    # 2 DC scans + 3 comps × 2 bands × 2 passes = 14 SOS markers
    assert enc.count(b"\xff\xda") == 14


def test_progressive_rejects_restart_interval():
    img = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(img, progressive=True, restart_interval=2)


def test_not_jpeg_refused():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n not a jpeg")


def test_quality_size_monotone():
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_through_decoder_seam():
    from odc_stac_spark.operators.multimodal import DECODERS

    img = np.full((16, 16), 42, np.uint8)
    out = DECODERS["image/jpeg"](encode_jpeg(img, quality=50))
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_fill_bytes_before_markers_accepted():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    img = np.full((16, 16), 100, np.uint8)
    enc = encode_jpeg(img, quality=50)
    assert enc[:2] == b"\xff\xd8"
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    out = decode_jpeg(padded)
    np.testing.assert_array_equal(out[:, :, 0], img)
