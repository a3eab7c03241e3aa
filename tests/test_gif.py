"""GIF codec tests (operators/gif.py — GIF87a/89a from the public spec).

Own-writer round trips on arbitrary paletted content (LZW width growth,
4096-entry dictionary reset, interlacing, animation, transparency,
disposal methods) plus an externally-encoded golden file — the classic
1×1 transparent GIF every web page shipped for a decade — proving the
decoder against a real foreign encoder's bitstream.
"""

import base64
import struct

import numpy as np
import pytest

from odc_stac_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode_gif,
    lzw_encode_gif,
)

RNG = np.random.default_rng(77)


# ---------------------------------------------------------------------------
# LZW


@pytest.mark.parametrize("mcs", [2, 3, 4, 6, 8])
def test_lzw_roundtrip_all_code_sizes(mcs):
    for n in (1, 10, 1000, 20000):  # 20k forces the 4096-entry reset
        idx = RNG.integers(0, 1 << mcs, n).astype(np.uint8).tobytes()
        assert lzw_decode_gif(lzw_encode_gif(idx, mcs), mcs) == idx


def test_lzw_repetitive_content_compresses():
    idx = bytes([5]) * 5000
    enc = lzw_encode_gif(idx, 4)
    assert len(enc) < 200
    assert lzw_decode_gif(enc, 4) == idx


def test_lzw_bad_code_rejected():
    with pytest.raises(ValueError, match="out of range"):
        # width 3 after clear; craft a first code beyond the table
        lzw_decode_gif(bytes([0b111_100_11, 0xFF]), 2)


# ---------------------------------------------------------------------------
# full-file round trips


def _pal_image(ncolors, shape):
    vals = RNG.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    vals[:, 0] = np.arange(ncolors) % 256  # force distinctness
    return vals[RNG.integers(0, ncolors, shape)]


@pytest.mark.parametrize("ncolors,shape", [(2, (8, 8)), (5, (30, 50)), (256, (40, 40))])
def test_single_frame_roundtrip(ncolors, shape):
    img = _pal_image(ncolors, shape)
    out = decode_gif(encode_gif(img))
    assert out.shape == img.shape and (out == img).all()


def test_interlaced_roundtrip():
    img = _pal_image(17, (29, 31))  # odd dims exercise the 4-pass split
    data = encode_gif(img, interlace=True)
    assert (decode_gif(data) == img).all()
    # interlace flag actually set in the image descriptor
    at = data.index(b"\x2c")
    assert data[at + 9] & 0x40


def test_animation_compositing_and_delays():
    base = _pal_image(9, (20, 24))
    f2 = base.copy()
    f2[3:8, 4:9] = base[0, 0]
    frames, delays = decode_gif_frames(encode_gif([base, f2], delays=[5, 12]))
    assert frames.shape == (2, 20, 24, 4)
    assert (frames[0][:, :, :3] == base).all()
    assert (frames[1][:, :, :3] == f2).all()
    assert (frames[:, :, :, 3] == 255).all()
    assert delays == [5, 12]


def test_animation_frame_sampling():
    fs = [_pal_image(4, (10, 10)) for _ in range(6)]
    frames, _ = decode_gif_frames(encode_gif(fs, delays=[1] * 6), every=2)
    assert frames.shape[0] == 3
    frames, _ = decode_gif_frames(encode_gif(fs, delays=[1] * 6), max_frames=2)
    assert frames.shape[0] == 2


def test_transparency():
    img = _pal_image(3, (6, 6))
    key = tuple(int(v) for v in img[0, 0])
    out = decode_gif(encode_gif(img, transparent_color=key))
    assert out.shape == (6, 6, 4)
    mask = (img == np.array(key, np.uint8)).all(axis=2)
    assert (out[mask][:, 3] == 0).all()
    assert (out[~mask][:, 3] == 255).all()
    assert (out[~mask][:, :3] == img[~mask]).all()


def test_too_many_colors_rejected():
    img = RNG.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_not_gif_rejected():
    with pytest.raises(ValueError, match="GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\nnope")


# ---------------------------------------------------------------------------
# foreign-encoder golden + hand-built disposal streams


def test_external_golden_transparent_pixel():
    # the classic web spacer: GIF89a, 2-entry GCT, GCE with transparency
    g = base64.b64decode("R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    out = decode_gif(g)
    assert out.shape == (1, 1, 4)
    assert out[0, 0, 3] == 0  # transparent


def _hand_gif(frames_bytes, w, h, gct, extra_blocks=b""):
    n_field = max(0, (len(gct) - 1).bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | n_field, 0, 0)
    pal = np.zeros((2 << n_field, 3), np.uint8)
    pal[: len(gct)] = gct
    out += pal.tobytes()
    out += extra_blocks
    for fb in frames_bytes:
        out += fb
    out += b"\x3b"
    return bytes(out)


def _hand_frame(left, top, w, h, indices, min_code, gce=None):
    from odc_stac_spark.operators.gif import _subblocks

    out = bytearray()
    if gce is not None:
        out += b"\x21\xf9\x04" + gce + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
    out += bytes([min_code])
    out += _subblocks(lzw_encode_gif(bytes(indices), min_code))
    return bytes(out)


def test_disposal_restore_background():
    # frame 1 full red; frame 2 draws a 1×1 green patch with disposal 2
    # (restore to background) — frame 3 sees that cell transparent-cleared
    gct = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    f1 = _hand_frame(0, 0, 2, 2, [0, 0, 0, 0], 2)
    # disposal 2 in GCE packed bits 2-4; no transparency
    f2 = _hand_frame(0, 0, 1, 1, [1], 2, gce=bytes([0x08, 0, 0, 0]))
    f3 = _hand_frame(1, 1, 1, 1, [2], 2)
    frames, _ = decode_gif_frames(_hand_gif([f1, f2, f3], 2, 2, gct))
    assert frames.shape[0] == 3
    assert frames[1][0, 0].tolist() == [0, 255, 0, 255]  # green shown
    assert frames[2][0, 0, 3] == 0  # then restored to transparent bg
    assert frames[2][1, 1].tolist() == [0, 0, 255, 255]


def test_disposal_restore_previous():
    gct = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    f1 = _hand_frame(0, 0, 2, 1, [0, 0], 2)
    # disposal 3 (restore previous)
    f2 = _hand_frame(0, 0, 1, 1, [1], 2, gce=bytes([0x0C, 0, 0, 0]))
    f3 = _hand_frame(1, 0, 1, 1, [1], 2)
    frames, _ = decode_gif_frames(_hand_gif([f1, f2, f3], 2, 1, gct))
    assert frames[1][0, 0].tolist() == [0, 255, 0, 255]
    # after disposal 3 the red pixel is back
    assert frames[2][0, 0].tolist() == [255, 0, 0, 255]
    assert frames[2][0, 1].tolist() == [0, 255, 0, 255]


def test_local_color_table_overrides_global():
    gct = np.array([[255, 0, 0]], np.uint8)
    lct = np.zeros((2, 3), np.uint8)
    lct[0] = [1, 2, 3]
    from odc_stac_spark.operators.gif import _subblocks

    frame = bytearray(b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0x80))
    frame += lct.tobytes()
    frame += bytes([2]) + _subblocks(lzw_encode_gif(b"\x00", 2))
    out = decode_gif(_hand_gif([bytes(frame)], 1, 1, gct))
    assert out[0, 0].tolist() == [1, 2, 3]


def test_decoder_seam_registration():
    from odc_stac_spark.operators.multimodal import DECODERS, VIDEO_DECODERS

    img = _pal_image(7, (12, 15))
    assert (DECODERS["image/gif"](encode_gif(img)) == img).all()
    vid = VIDEO_DECODERS["image/gif"](encode_gif([img, img], delays=[1, 1]))
    assert vid.shape == (2, 12, 15, 4)
