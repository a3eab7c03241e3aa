"""WebP VP8L codec tests (operators/webp.py — RFC 9649).

No foreign WebP encoder exists in this container, so the evidence
discipline mirrors sources/netcdf.py / sources/hdf5.py: own-writer round
trips on arbitrary content for every transform path, PLUS hand-assembled
bitstreams (built bit-by-bit against the spec, with expected pixels
derived independently by hand) for decoder features the encoder never
emits — meta prefix groups, simple-code read-order, out-of-range palette
indices, and the predictor TR edge rule.
"""

import struct

import numpy as np
import pytest

from odc_stac_spark.operators.webp import (
    BitWriter,
    _DISTANCE_MAP,
    _encode_image_stream,
    _lz77_symbol,
    _lz77_value,
    _write_prefix_code,
    BitReader,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    encode_webp,
)

RNG = np.random.default_rng(20260814)


# ---------------------------------------------------------------------------
# spec tables
# ---------------------------------------------------------------------------


def test_distance_map_matches_spec_table():
    # RFC 9649 §3.6.2.3 lists the 120-entry mapping explicitly; the module
    # generates it from its ordering rule — pin the listed entries
    expected_head = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
        (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
        (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
        (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
        (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
        (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
        (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
        (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    ]
    assert len(_DISTANCE_MAP) == 120
    assert _DISTANCE_MAP == expected_head


def test_lz77_prefix_coding_roundtrip():
    # §3.6.2.2: values 1..4 direct; beyond, prefix+extra-bits
    for v in list(range(1, 200)) + [1024, 4095, 4096]:
        sym, ev, eb = _lz77_symbol(v)
        bw = BitWriter()
        bw.write(ev, eb)
        br = BitReader(bw.getvalue())
        assert _lz77_value(sym, br) == v, v
    assert _lz77_symbol(1) == (0, 0, 0)
    assert _lz77_symbol(5) == (4, 0, 1)
    assert _lz77_symbol(7) == (5, 0, 1)
    assert _lz77_symbol(9) == (6, 0, 2)


# ---------------------------------------------------------------------------
# own-writer round trips (every encoder/decoder path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (3, 5, 3), (16, 24, 3), (33, 17, 3), (64, 64, 3), (7, 130, 3)]
)
def test_roundtrip_rgb(shape):
    img = RNG.integers(0, 256, shape, dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_roundtrip_rgba_and_gray():
    img = RNG.integers(0, 256, (20, 13, 4), dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    assert out.shape == img.shape and (out == img).all()
    gray = RNG.integers(0, 256, (11, 9), dtype=np.uint8)
    out = decode_webp(encode_webp(gray))
    assert out.shape == (11, 9, 3)
    assert (out == gray[:, :, None]).all()


def test_roundtrip_lz77_heavy():
    # flat + striped content drives the distance-1 / row-above run paths
    img = np.full((40, 50, 3), 127, np.uint8)
    data = encode_webp(img)
    assert len(data) < 120  # LZ77 must actually engage
    assert (decode_webp(data) == img).all()
    stripes = np.tile(RNG.integers(0, 256, (1, 50, 3), dtype=np.uint8), (40, 1, 1))
    assert (decode_webp(encode_webp(stripes)) == stripes).all()


def test_roundtrip_color_cache():
    img = (RNG.integers(0, 8, (30, 40, 3), dtype=np.uint8) * 32).astype(np.uint8)
    for bits in (1, 4, 6, 11):
        out = decode_webp(encode_webp(img, cache_bits=bits))
        assert (out == img).all(), bits


@pytest.mark.parametrize("ncol,shape", [(2, (10, 33)), (3, (12, 18)), (9, (9, 21)), (40, (16, 16)), (256, (32, 24))])
def test_roundtrip_palette_bundling(ncol, shape):
    vals = RNG.integers(0, 256, (ncol, 3), dtype=np.uint8)
    # ensure distinct colors so the palette really has ncol entries
    vals[:, 0] = np.arange(ncol) % 256
    idx = RNG.integers(0, ncol, shape)
    img = vals[idx]
    out = decode_webp(encode_webp(img, palette=True))
    assert out.shape == img.shape and (out == img).all()


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_all_predictor_modes(mode):
    img = RNG.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    out = decode_webp(encode_webp(img, predictor=mode))
    assert (out == img).all()


def test_roundtrip_cross_color_and_combined():
    img = RNG.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    for cc in [(10, -20, 33), (0, 0, 0), (-128, 127, 5)]:
        assert (decode_webp(encode_webp(img, cross_color=cc)) == img).all()
    out = decode_webp(
        encode_webp(img, predictor=11, cross_color=(7, -9, 13), cache_bits=4)
    )
    assert (out == img).all()


def test_riff_container_layout():
    img = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = encode_webp(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size == len(data) - 8
    assert data[12:16] == b"VP8L"
    (chunk_size,) = struct.unpack("<I", data[16:20])
    # chunk payload + optional pad byte closes the file exactly
    assert 20 + chunk_size + (chunk_size & 1) == len(data)
    # raw VP8L payload decodes identically
    assert (decode_vp8l(data[20 : 20 + chunk_size]) == img).all()


def test_encoder_determinism():
    img = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert encode_webp(img) == encode_webp(img.copy())


# ---------------------------------------------------------------------------
# hand-assembled bitstreams (decoder features the encoder never emits)
# ---------------------------------------------------------------------------


def _vp8l_header(bw: BitWriter, w: int, h: int):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def test_hand_meta_prefix_groups():
    # 8×2 image, meta_bits=2 (4-px blocks) → 2 groups; group 0 paints
    # color A, group 1 color B, each via 0-bit simple codes
    A, B = (10, 20, 30), (200, 150, 100)
    bw = BitWriter()
    _vp8l_header(bw, 8, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(0, 3)  # meta_bits = 2
    # 2×1 entropy image: group idx in (r<<8)|g → greens 0,1
    meta = np.array([[0xFF000000, 0xFF000100]], dtype=np.uint32)
    _encode_image_stream(bw, meta, use_lz77=False)
    for (r, g, b) in (A, B):
        _write_prefix_code(bw, {g: 1}, 256 + 24)  # green
        _write_prefix_code(bw, {r: 1}, 256)  # red
        _write_prefix_code(bw, {b: 1}, 256)  # blue
        _write_prefix_code(bw, {255: 1}, 256)  # alpha
        _write_prefix_code(bw, {}, 40)  # distance (unused)
    out = decode_vp8l(bw.getvalue())
    assert out.shape == (2, 8, 3)
    assert (out[:, :4] == np.array(A, np.uint8)).all()
    assert (out[:, 4:] == np.array(B, np.uint8)).all()


def test_hand_simple_code_read_order():
    # simple 2-symbol code: code 0 is the FIRST symbol READ (spec), even
    # when it is numerically larger — canonical-by-symbol would flip it
    bw = BitWriter()
    _vp8l_header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: simple, 2 symbols, 8-bit first: sym0=200, sym1=3
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(200, 8)
    bw.write(3, 8)
    _write_prefix_code(bw, {7: 1}, 256)  # red
    _write_prefix_code(bw, {9: 1}, 256)  # blue
    _write_prefix_code(bw, {255: 1}, 256)  # alpha
    _write_prefix_code(bw, {}, 40)  # distance
    bw.write(0, 1)  # pixel 0: green code 0 → 200
    bw.write(1, 1)  # pixel 1: green code 1 → 3
    out = decode_vp8l(bw.getvalue())
    assert out[0, 0].tolist() == [7, 200, 9]
    assert out[0, 1].tolist() == [7, 3, 9]


def test_hand_predictor_tr_edge_rule():
    # 2×2, predictor transform, single block, mode 3 (TR). For the
    # rightmost pixel of row 1, TR wraps to the leftmost pixel of the
    # SAME row (§3.5.1). Expected pixels derived by hand below.
    r00, r01, r10, r11 = (
        (1, 2, 3, 250),  # a, r, g, b residuals
        (4, 5, 6, 7),
        (8, 9, 10, 11),
        (12, 13, 14, 15),
    )

    def pack(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    bw = BitWriter()
    _vp8l_header(bw, 2, 2)
    bw.write(1, 1)  # a transform
    bw.write(0, 2)  # predictor
    bw.write(0, 3)  # size_bits = 2 (4-px blocks → 1×1 sub-image)
    sub = np.array([[0xFF000000 | (3 << 8)]], dtype=np.uint32)  # mode 3
    _encode_image_stream(bw, sub, use_lz77=False)
    bw.write(0, 1)  # end of transforms
    res = np.array(
        [[pack(*r00), pack(*r01)], [pack(*r10), pack(*r11)]], dtype=np.uint32
    )
    _encode_image_stream(bw, res, use_lz77=False, is_level0=True)
    out = decode_vp8l(bw.getvalue())
    # hand derivation (per-channel mod-256 adds):
    # p00 = r00 + (a=255 black)           = (256, 2, 3, 250) % 256
    p00 = ((1 + 255) % 256, 2, 3, 250)
    # p01: first row → L predictor        = r01 + p00
    p01 = tuple((x + y) % 256 for x, y in zip((4, 5, 6, 7), p00))
    # p10: first col → T predictor        = r10 + p00
    p10 = tuple((x + y) % 256 for x, y in zip((8, 9, 10, 11), p00))
    # p11: mode 3 TR, x==w-1 → TR = p10 (leftmost, same row)
    p11 = tuple((x + y) % 256 for x, y in zip((12, 13, 14, 15), p10))
    assert out.shape == (2, 2, 4)  # alpha ≠ 255 kept

    def rgba(p):
        return [p[1], p[2], p[3], p[0]]

    assert out[0, 0].tolist() == rgba(p00)
    assert out[0, 1].tolist() == rgba(p01)
    assert out[1, 0].tolist() == rgba(p10)
    assert out[1, 1].tolist() == rgba(p11)


def test_hand_palette_out_of_range_index():
    # §3.5.4: an index beyond the palette yields 0x00000000
    c0, c1, c2 = (255, 10, 20, 30), (255, 40, 50, 60), (255, 70, 80, 90)

    def pack(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    bw = BitWriter()
    _vp8l_header(bw, 4, 1)
    bw.write(1, 1)  # a transform
    bw.write(3, 2)  # color indexing
    bw.write(2, 8)  # n_colors - 1 = 2
    # palette sub-image: entries DELTA-coded per channel
    def delta(cur, prev):
        return pack(*[(c - p) % 256 for c, p in zip(cur, prev)])

    pal = np.array(
        [[pack(*c0), delta(c1, c0), delta(c2, c1)]], dtype=np.uint32
    )
    _encode_image_stream(bw, pal, use_lz77=False)
    bw.write(0, 1)  # end of transforms
    # n=3 → width_bits=2 → 4 indices per green byte, LSB-first:
    # indices [1, 2, 3, 0] — 3 is out of range for the 3-entry palette
    packed_green = 1 | (2 << 2) | (3 << 4) | (0 << 6)
    main = np.array([[0xFF000000 | (packed_green << 8)]], dtype=np.uint32)
    _encode_image_stream(bw, main, use_lz77=False, is_level0=True)
    out = decode_vp8l(bw.getvalue())
    assert out.shape == (1, 4, 4)  # transparent pixel forces RGBA
    assert out[0, 0].tolist() == [40, 50, 60, 255]  # index 1 → c1
    assert out[0, 1].tolist() == [70, 80, 90, 255]  # index 2 → c2
    assert out[0, 2].tolist() == [0, 0, 0, 0]  # index 3 → out of range
    assert out[0, 3].tolist() == [10, 20, 30, 255]  # index 0 → c0


def test_hand_lz77_2d_distance():
    # distance code 1 → (dx=0, dy=1): copy the pixel directly above
    bw = BitWriter()
    _vp8l_header(bw, 3, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: normal code over {literal 50, length-sym 256+2 (len 3)}
    codes_g = _write_prefix_code(bw, {50: 1, 256 + 2: 1}, 256 + 24)
    _write_prefix_code(bw, {60: 1}, 256)  # red
    _write_prefix_code(bw, {70: 1}, 256)  # blue
    _write_prefix_code(bw, {255: 1}, 256)  # alpha
    codes_d = _write_prefix_code(bw, {0: 1}, 40)  # distance sym 0 → value 1
    # row 0: three literals; row 1: one copy, length 3, distance code 1
    for _ in range(3):
        bw.write_code(*codes_g[50])
    bw.write_code(*codes_g[256 + 2])  # length symbol 2 → length 3
    bw.write_code(*codes_d[0])  # distance prefix 0 → plane code 1 → (0,1)
    out = decode_vp8l(bw.getvalue())
    assert out.shape == (2, 3, 3)
    assert (out == np.array([60, 50, 70], np.uint8)).all()


# ---------------------------------------------------------------------------
# refusals
# ---------------------------------------------------------------------------


def test_lossy_vp8_dispatches_to_vp8_decoder():
    # a corrupt VP8 chunk now reaches operators/vp8.py and fails ITS
    # validation (bad start code), proving the dispatch is wired
    payload = b"\x00" * 10
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(payload)) + payload
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError, match="vp8"):
        decode_webp(data)


def test_lossy_vp8_decodes_through_container():
    from odc_stac_spark.operators.vp8 import encode_webp_lossy_gray

    img = (np.arange(16)[:, None] // 4 * 32 + 16).astype(np.uint8).repeat(16, 1)
    out = decode_webp(encode_webp_lossy_gray(img))
    assert out.shape == (16, 16, 3)
    assert (out == img[:, :, None]).all()


def test_bad_signature_and_version():
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x01\x02")
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(0, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(5, 3)  # bad version
    with pytest.raises(ValueError, match="version"):
        decode_vp8l(bw.getvalue())
    with pytest.raises(ValueError):
        decode_webp(b"JUNKJUNKJUNKJUNK")


def test_dimension_and_dtype_guards():
    with pytest.raises(ValueError, match="uint8"):
        encode_vp8l(np.zeros((4, 4), np.uint16))
    with pytest.raises(ValueError, match="palette"):
        img = RNG.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        encode_vp8l(img, palette=True)  # way over 256 colors


# ---------------------------------------------------------------------------
# TIFF Compression=50001 integration
# ---------------------------------------------------------------------------


def test_tiff_webp_cog_roundtrip(tmp_path):
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import read_cog_file, write_cog_file

    ny, nx = 70, 90
    y, x = np.mgrid[0:ny, 0:nx]
    pix = ((y * 7 + x * 3) % 256).astype(np.uint8)
    gbox = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, 700.0), "EPSG:32635")
    p = str(tmp_path / "webp.tif")
    write_cog_file(p, pix, gbox, tile=64, compression="webp", overview_levels=[])
    d = read_cog_file(p)
    assert d["data"].dtype == np.uint8
    assert (d["data"] == pix).all()


def test_tiff_webp_guards(tmp_path):
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import write_cog_file

    gbox = GeoBox((8, 8), (10.0, 0.0, 0.0, 0.0, -10.0, 80.0), "EPSG:32635")
    with pytest.raises(ValueError, match="uint8"):
        write_cog_file(
            str(tmp_path / "a.tif"),
            np.zeros((8, 8), np.uint16),
            gbox,
            compression="webp",
        )
    with pytest.raises(ValueError, match="Predictor"):
        write_cog_file(
            str(tmp_path / "b.tif"),
            np.zeros((8, 8), np.uint8),
            gbox,
            compression="webp",
            predictor=2,
        )


def test_decoder_seam_registration():
    from odc_stac_spark.operators.multimodal import DECODERS

    img = RNG.integers(0, 256, (12, 15, 3), dtype=np.uint8)
    out = DECODERS["image/webp"](encode_webp(img))
    assert (out == img).all()
