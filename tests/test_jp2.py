"""From-scratch JPEG2000 Part-1 codec (operators/jp2.py) — MQ coder,
EBCOT T1, tag trees, 5/3 DWT, Tier-2 packets, JP2 container, file-level
windowed reads, TIFF Compression=34712, and loud out-of-profile refusals.
"""

import struct

import numpy as np
import pytest

from odc_stac_spark.operators.jp2 import (
    MQDecoder,
    MQEncoder,
    TagTree,
    _PkBitReader,
    _PkBitWriter,
    _tile_geometry,
    decode_block,
    decode_jp2,
    encode_block,
    encode_jp2,
    encode_jp2_codestream,
    fdwt53,
    idwt53,
    read_jp2_header,
    read_jp2_tile,
)

rng = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# MQ coder


def test_mq_roundtrip_fuzz():
    for trial in range(30):
        n = int(rng.integers(1, 2500))
        bits = rng.integers(0, 2, n).tolist()
        ctxs = rng.integers(0, 19, n).tolist()
        enc = MQEncoder()
        for b, c in zip(bits, ctxs):
            enc.encode(int(b), int(c))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == [int(b) for b in bits], trial


def test_mq_stuffing_invariant():
    """T.800 C: a byte after 0xFF carries at most 0x8F (7 data bits +
    carry slot) — values above 0x8F are reserved for markers."""
    for trial in range(25):
        n = int(rng.integers(200, 4000))
        # skewed bits maximize 0xFF emission
        bits = (rng.random(n) < 0.95).astype(int).tolist()
        ctxs = rng.integers(0, 19, n).tolist()
        enc = MQEncoder()
        for b, c in zip(bits, ctxs):
            enc.encode(int(b), int(c))
        data = enc.flush()
        for i in range(len(data) - 1):
            if data[i] == 0xFF:
                assert data[i + 1] <= 0x8F
        assert not data.endswith(b"\xff")


# ---------------------------------------------------------------------------
# tag trees + packet bit I/O


def test_tagtree_roundtrip():
    for (w, h) in ((1, 1), (3, 2), (5, 7), (8, 8)):
        vals = rng.integers(0, 9, (h, w))
        enc_tree = TagTree(w, h)
        for y in range(h):
            for x in range(w):
                enc_tree.set(x, y, int(vals[y, x]))
        enc_tree.finalize()
        bw = _PkBitWriter()
        for y in range(h):
            for x in range(w):
                t = 1
                while True:
                    enc_tree.encode(x, y, t, bw.put)
                    if int(vals[y, x]) < t:
                        break
                    t += 1
        br = _PkBitReader(bw.flush())
        dec_tree = TagTree(w, h)
        for y in range(h):
            for x in range(w):
                assert dec_tree.decode_value(x, y, br.get) == int(vals[y, x])


def test_packet_bitio_ff_stuffing():
    bw = _PkBitWriter()
    for _ in range(20):
        bw.put(1)  # long run of 1s forces 0xFF bytes + stuffed bits
    data = bw.flush()
    assert 0xFF in data
    br = _PkBitReader(data)
    assert [br.get() for _ in range(20)] == [1] * 20


# ---------------------------------------------------------------------------
# T1 block coder + DWT


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_t1_block_roundtrip(band):
    for shape in ((32, 32), (7, 5), (4, 4), (33, 17), (1, 9), (64, 64)):
        a = rng.integers(-3000, 3000, shape).astype(np.int32)
        a[rng.random(shape) < 0.5] = 0
        data, npasses, nbp = encode_block(a, band)
        out = decode_block(data, shape[1], shape[0], band, nbp, npasses)
        np.testing.assert_array_equal(out, a)


def test_t1_all_zero_block():
    data, npasses, nbp = encode_block(np.zeros((16, 16), np.int32), "HH")
    assert npasses == 0 and nbp == 0 and data == b""


def test_dwt53_reversible():
    for shape in ((64, 64), (65, 33), (100, 7), (1, 50), (13, 1), (257, 129)):
        for levels in (1, 2, 5):
            a = rng.integers(-9000, 9000, shape).astype(np.int64)
            np.testing.assert_array_equal(idwt53(fdwt53(a, levels), shape), a)


# ---------------------------------------------------------------------------
# full codestream / container roundtrips


def test_roundtrip_gray_u8():
    a = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    out = decode_jp2(encode_jp2(a, levels=2, cblk=16))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[:, :, 0], a)


def test_roundtrip_rgb_rct():
    a = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    out = decode_jp2(encode_jp2(a, levels=3, cblk=32))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, a)


def test_roundtrip_uint16_sentinel2_style():
    a = rng.integers(0, 10001, (64, 80), dtype=np.uint16)
    out = decode_jp2(encode_jp2(a, levels=3, cblk=32))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out[:, :, 0], a)


def test_roundtrip_int16_signed():
    a = rng.integers(-5000, 5000, (21, 30)).astype(np.int16)
    out = decode_jp2(encode_jp2(a, levels=2, cblk=16, signed=True, depth=16))
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out[:, :, 0], a)


def test_roundtrip_multitile():
    a = rng.integers(0, 4096, (75, 90), dtype=np.uint16)
    blob = encode_jp2_codestream(a, levels=2, cblk=16, tile_size=(32, 40))
    np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)


def test_windowed_decode_skips_tiles():
    a = rng.integers(0, 4096, (75, 90), dtype=np.uint16)
    blob = encode_jp2_codestream(a, levels=2, cblk=16, tile_size=(32, 40))
    win = decode_jp2(blob, window=(35, 70, 45, 90))[:, :, 0]
    np.testing.assert_array_equal(win[35:70, 45:90], a[35:70, 45:90])
    assert (win[:32, :40] == 0).all()  # non-window tile never decoded


def test_smooth_image_compresses():
    g = (np.add.outer(np.arange(96), np.arange(128)) % 251).astype(np.uint8)
    blob = encode_jp2(g, levels=3)
    assert len(blob) < g.nbytes // 4  # wavelet+EBCOT actually compress
    np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], g)


def test_codestream_markers_match_spec():
    """Spec-level byte assertions (T.800 Annex A) — writer and decoder
    can't share a marker-layout bug."""
    a = np.zeros((16, 16), np.uint8)
    cs = encode_jp2_codestream(a, levels=1, cblk=16)
    assert cs[:2] == b"\xff\x4f"  # SOC
    assert cs[2:4] == b"\xff\x51"  # SIZ first
    lsiz = struct.unpack_from(">H", cs, 4)[0]
    assert lsiz == 38 + 3  # fixed part + 1 component
    xs, ys = struct.unpack_from(">II", cs, 8)
    assert (xs, ys) == (16, 16)
    assert cs[-2:] == b"\xff\xd9"  # EOC
    assert b"\xff\x52" in cs and b"\xff\x5c" in cs  # COD, QCD
    # JP2 container: signature + ftyp boxes per Annex I
    jp2 = encode_jp2(a)
    assert jp2[4:8] == b"jP  " and jp2[8:12] == b"\x0d\x0a\x87\x0a"
    assert jp2[16:20] == b"ftyp"


# ---------------------------------------------------------------------------
# file-level API


def test_file_header_and_tile_reads(tmp_path):
    a = rng.integers(0, 10000, (75, 90), dtype=np.uint16)
    p = str(tmp_path / "t.jp2")
    with open(p, "wb") as f:
        f.write(encode_jp2(a, levels=2, cblk=16, tile_size=(32, 40)))
    hdr = read_jp2_header(p)
    assert len(hdr["tiles"]) == 9 and hdr["dtype"] == "uint16"
    for isot, _ in hdr["tiles"]:
        ty0, tx0, th, tw = _tile_geometry(hdr, isot)
        t = read_jp2_tile(p, hdr, isot)
        np.testing.assert_array_equal(t[:, :, 0], a[ty0 : ty0 + th, tx0 : tx0 + tw])


def test_reduced_resolution_read(tmp_path):
    """JPEG2000's native overview: decoding resolutions 0..r-1 yields the
    5/3 LL image — exactly the DWT of the source (verifiable!)."""
    a = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    p = str(tmp_path / "r.jp2")
    with open(p, "wb") as f:
        f.write(encode_jp2(a, levels=2, cblk=16))
    hdr = read_jp2_header(p)
    half = read_jp2_tile(p, hdr, 0, max_res=1)[:, :, 0]
    assert half.shape == (32, 32)
    # expected: LL of one 5/3 level on the level-shifted samples,
    # clamped to the component range (lowpass can overshoot a few counts)
    want = np.clip(fdwt53(a.astype(np.int64) - 128, 1)[0]["LL"] + 128, 0, 255)
    np.testing.assert_array_equal(half.astype(np.int64), want)


def test_load_pipeline_serves_jp2(spark, tmp_path):
    """.jp2 through the FULL load pipeline — reader dispatch by
    extension, per-tile byte-range reads, pixel equality."""
    from datetime import datetime

    from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterSource
    from odc_stac_spark.plans.load import Item, assemble_numpy, load

    ny, nx = 96, 120
    y, x = np.mgrid[0:ny, 0:nx]
    red = ((11 * y + 7 * x + 3) % 251).astype(np.uint16)
    p = str(tmp_path / "scene.jp2")
    with open(p, "wb") as f:
        f.write(encode_jp2(red, levels=2, cblk=32, tile_size=(48, 64)))
    g = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, 960.0), "EPSG:32735")
    item = Item(
        id="jp2-0",
        datetime=datetime(2021, 3, 3),
        bands={"red": RasterSource(p, geobox=g, meta=RasterBandMetadata("uint16", 0))},
    )
    tiles_df, plan = load(spark, [item], chunks=(48, 60))
    got = assemble_numpy(tiles_df, plan)
    np.testing.assert_array_equal(got["red"][0], red)


def test_jp2_in_tiff_compression_34712(tmp_path):
    from odc_stac_spark.model import GeoBox
    from odc_stac_spark.sources.geotiff import read_cog_file, write_cog_file

    a = ((np.add.outer(np.arange(100), np.arange(130)) * 17) % 4001).astype(np.uint16)
    g = GeoBox((100, 130), (10.0, 0.0, 0.0, 0.0, -10.0, 1000.0), "EPSG:32735")
    p = str(tmp_path / "jp2.tif")
    write_cog_file(p, a, g, tile=64, compression="jp2", overview_levels=[2])
    out = read_cog_file(p)
    np.testing.assert_array_equal(out["data"], a)


def test_multimodal_decoder_registered():
    from odc_stac_spark.operators.multimodal import DECODERS

    a = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    out = DECODERS["image/jp2"](encode_jp2(a, levels=1, cblk=16))
    np.testing.assert_array_equal(out[:, :, 0], a)


# ---------------------------------------------------------------------------
# loud refusals (out-of-profile must never mis-decode)


def _patched(cs: bytes, marker: bytes, offset: int, value: int) -> bytes:
    at = cs.index(marker) + 4 + offset
    return cs[:at] + bytes([value]) + cs[at + 1 :]


def test_rejects_97_with_no_quant_style():
    # 9/7 flagged but QCD says "no quantization": an inconsistent stream
    # (E.1 ties the reversible transform to style 0) — loud, not misdecoded
    cs = encode_jp2_codestream(np.zeros((8, 8), np.uint8), levels=1, cblk=16)
    bad = _patched(cs, b"\xff\x52", 9, 0)  # transform byte → 9/7
    with pytest.raises(ValueError, match="scalar quantization"):
        decode_jp2(bad)


def test_multilayer_all_progressions_roundtrip():
    """Quality layers + every Part-1 progression order (the shapes real
    Sentinel-2/OpenJPEG files use: typically 5 layers, RPCL)."""
    a = rng.integers(0, 4001, (70, 85), dtype=np.uint16)
    for layers in (2, 5):
        for prog in (0, 1, 2, 3, 4):
            blob = encode_jp2_codestream(a, levels=2, cblk=16, layers=layers, prog=prog)
            np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)
    blob = encode_jp2_codestream(
        a, levels=2, cblk=16, tile_size=(32, 40), layers=3, prog=2
    )
    np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)


def test_multilayer_reduced_resolution_read(tmp_path):
    from odc_stac_spark.operators.jp2 import fdwt53, read_jp2_header, read_jp2_tile

    a = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    p = str(tmp_path / "ml.jp2")
    cs = encode_jp2_codestream(a, levels=2, cblk=16, layers=4, prog=1)
    with open(p, "wb") as f:
        f.write(cs)
    hdr = read_jp2_header(p)
    assert hdr["layers"] == 4 and hdr["prog"] == 1
    full = read_jp2_tile(p, hdr, 0)
    np.testing.assert_array_equal(full[:, :, 0], a)
    half = read_jp2_tile(p, hdr, 0, max_res=1)[:, :, 0]
    want = np.clip(fdwt53(a.astype(np.int64) - 128, 1)[0]["LL"] + 128, 0, 255)
    np.testing.assert_array_equal(half.astype(np.int64), want)


def test_refuses_reserved_progression():
    cs = encode_jp2_codestream(np.zeros((8, 8), np.uint8), levels=1, cblk=16)
    bad = _patched(cs, b"\xff\x52", 1, 5)  # reserved order
    with pytest.raises(ValueError, match="progression"):
        decode_jp2(bad)


def test_rejects_quant_style_on_reversible():
    # 5/3 + scalar quantization is the inverse inconsistency
    cs = encode_jp2_codestream(np.zeros((8, 8), np.uint8), levels=1, cblk=16)
    at = cs.index(b"\xff\x5c") + 4
    bad = cs[:at] + bytes([cs[at] | 0x02]) + cs[at + 1 :]  # Sqcd style 2
    with pytest.raises(ValueError, match="style 0"):
        decode_jp2(bad)


def test_refuses_reserved_cblk_style_bits():
    # every DEFINED style flag decodes now; only reserved bits refuse
    cs = encode_jp2_codestream(np.zeros((8, 8), np.uint8), levels=1, cblk=16)
    bad = _patched(cs, b"\xff\x52", 8, 0x40)
    with pytest.raises(NotImplementedError, match="reserved"):
        decode_jp2(bad)


# ---------------------------------------------------------------------------
# selective arithmetic bypass (D.5, code-block style 0x01)


def test_bypass_segment_spans_schedule():
    from odc_stac_spark.operators.jp2 import _bypass_segment_spans

    assert _bypass_segment_spans(1) == [(0, 1)]
    assert _bypass_segment_spans(10) == [(0, 10)]
    # pass k: CP at k=0 then SPP/MRP/CP triples → raw runs [10,12), [13,15)
    assert _bypass_segment_spans(16) == [
        (0, 10), (10, 12), (12, 13), (13, 15), (15, 16)
    ]
    # a raw run truncated mid-way ends the block
    assert _bypass_segment_spans(11) == [(0, 10), (10, 11)]


def test_raw_bitio_stuffing_roundtrip():
    from odc_stac_spark.operators.jp2 import _RawBitReader, _RawBitWriter

    # 8 ones → 0xFF → next byte must carry only 7 bits (stuffed MSB)
    bits = [1] * 8 + [0, 1, 1, 0, 1, 0, 1] + [1, 0, 1]
    w = _RawBitWriter()
    for b in bits:
        w.put(b)
    seg = w.flush()
    assert seg[0] == 0xFF and seg[1] & 0x80 == 0  # stuffed zero MSB
    assert seg[-1] != 0xFF  # terminated segments never end in 0xFF
    r = _RawBitReader(seg)
    assert [r.get() for _ in range(len(bits))] == bits


def test_bypass_block_matches_style0_decode():
    """The same coefficients through both entropy paths must reconstruct
    identically — the bypass decoder (raw SPP/MRP + per-segment MQ) is a
    fully separate code path from the flat style-0 decoder."""
    from odc_stac_spark.operators.jp2 import (
        _bypass_segment_spans,
        _decode_block_bypass,
    )

    r = np.random.default_rng(11)
    for band in ("LL", "HL", "HH"):
        coefs = r.integers(-5000, 5000, (27, 21)).astype(np.int32)
        coefs[r.random((27, 21)) < 0.6] = 0
        data, np0, nbp = encode_block(coefs, band)
        segs, np1, nbp1 = encode_block(coefs, band, bypass=True)
        assert (np0, nbp) == (np1, nbp1)
        assert [sp for _, sp in segs] == [e - s for s, e in _bypass_segment_spans(np1)]
        ref = decode_block(data, 21, 27, band, nbp, np0)
        got = _decode_block_bypass([sd for sd, _ in segs], 21, 27, band, nbp, np1)
        np.testing.assert_array_equal(ref, coefs)
        np.testing.assert_array_equal(got, coefs)


def test_bypass_codestream_roundtrip_shapes():
    r = np.random.default_rng(5)
    img = r.integers(0, 60000, (70, 90)).astype(np.uint16)
    for kw in (
        dict(levels=3, cblk=32),
        dict(levels=2, cblk=16, tile_size=(48, 48)),
        dict(levels=3, cblk=32, precincts=(6, 6), prog=2, sop=True, eph=True),
    ):
        cs = encode_jp2_codestream(img, bypass=True, **kw)
        got = decode_jp2(cs)
        np.testing.assert_array_equal(got[:, :, 0], img)


def test_bypass_cod_style_byte_and_header():
    cs = encode_jp2_codestream(
        np.arange(64 * 64, dtype=np.uint16).reshape(64, 64) % 4096, bypass=True
    )
    at = cs.index(b"\xff\x52")
    assert cs[at + 4 + 8] == 0x01  # SPcod code-block style = selective bypass


def test_bypass_rgb_mct_and_lossy():
    r = np.random.default_rng(17)
    rgb = r.integers(0, 256, (40, 52, 3)).astype(np.uint8)
    np.testing.assert_array_equal(decode_jp2(encode_jp2(rgb, bypass=True)), rgb)
    img = r.integers(0, 60000, (48, 48)).astype(np.uint16)
    a = decode_jp2(encode_jp2_codestream(img, irreversible=True))
    b = decode_jp2(encode_jp2_codestream(img, irreversible=True, bypass=True))
    np.testing.assert_array_equal(a, b)  # identical quantized coefficients


def test_bypass_refuses_multilayer():
    img = np.zeros((16, 16), np.uint8)
    with pytest.raises(NotImplementedError, match="quality layers"):
        encode_jp2_codestream(img, layers=3, bypass=True)


def test_sop_eph_markers_roundtrip():
    """SOP/EPH packet markers (GDAL frequently writes EPH) parse
    correctly in every combination, incl. multi-layer tiled streams."""
    a = rng.integers(0, 4001, (60, 75), dtype=np.uint16)
    for sop in (False, True):
        for eph in (False, True):
            blob = encode_jp2_codestream(
                a, levels=2, cblk=16, layers=3, prog=2, sop=sop, eph=eph
            )
            np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)
    blob = encode_jp2_codestream(
        a, levels=2, cblk=16, tile_size=(32, 40), layers=2, sop=True, eph=True
    )
    np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)





def test_precincts_roundtrip_all_shapes():
    """User-defined precincts: per-precinct packets and tag trees,
    code-blocks clamped to the precinct partition."""
    a = rng.integers(0, 4001, (100, 130), dtype=np.uint16)
    for prog in (0, 1, 2):
        for layers in (1, 3):
            blob = encode_jp2_codestream(
                a, levels=2, cblk=16, layers=layers, prog=prog,
                precincts=(5, 5), eph=True,
            )
            np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)


def test_sentinel2_production_shape():
    """The exact feature combination real Sentinel-2 JP2s use: tiled,
    RPCL, 5 quality layers, precincts, SOP+EPH, uint16."""
    a = rng.integers(0, 10001, (100, 130), dtype=np.uint16)
    blob = encode_jp2_codestream(
        a, levels=3, cblk=32, tile_size=(64, 64), layers=5, prog=2,
        precincts=(6, 6), sop=True, eph=True,
    )
    np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)
    # precinct flag + sizes present in COD
    at = blob.index(b"\xff\x52") + 4
    assert blob[at] & 0x01 and blob[at] & 0x02 and blob[at] & 0x04


def test_pcrl_with_precincts_now_supported():
    # this combination was a loud refusal through round 7's first half;
    # it now round-trips (see test_pcrl_cprl_with_precincts_roundtrip) —
    # keep a direct probe that the decoder accepts a stream WRITTEN in
    # that order rather than merely not-crashing on a patched header
    a = rng.integers(0, 200, (64, 64), dtype=np.uint8)
    blob = encode_jp2_codestream(a, levels=2, cblk=16, precincts=(4, 4), prog=3)
    np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)


# ---------------------------------------------------------------------------
# 9/7 irreversible (lossy) profile


def _psnr(a, b, peak):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(peak * peak / mse)


def test_97_dwt_roundtrip_exact():
    from odc_stac_spark.operators.jp2 import (
        _fdwt97_1d,
        _idwt97_1d,
        fdwt97,
        idwt97,
    )

    for n in (1, 2, 3, 4, 5, 8, 17, 33, 100):
        x = rng.standard_normal((3, n))
        s, d = _fdwt97_1d(x)
        np.testing.assert_allclose(_idwt97_1d(s, d, n), x, atol=1e-10)
    for shape in ((16, 16), (33, 17), (5, 64), (3, 3)):
        x = rng.standard_normal(shape) * 100
        for lv in (1, 2, 3):
            np.testing.assert_allclose(idwt97(fdwt97(x, lv), shape), x, atol=1e-8)


def test_97_dc_gain_is_unity():
    # constant image: LL stays at the constant, high bands are zero —
    # the spec's nominal-range budgeting (E-3 gains) depends on this
    from odc_stac_spark.operators.jp2 import fdwt97

    b = fdwt97(np.full((32, 32), 100.0), 3)
    assert abs(float(b[-1]["LL"].mean()) - 100.0) < 1e-9
    assert float(np.abs(b[0]["HH"]).max()) < 1e-9


def test_lossy_rate_distortion_monotone():
    noise = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    sizes, psnrs = [], []
    for step in (1 / 4, 1 / 2, 1.0):
        cs = encode_jp2_codestream(noise, levels=2, irreversible=True, base_step=step)
        out = decode_jp2(cs)[:, :, 0]
        sizes.append(len(cs))
        psnrs.append(_psnr(noise, out, 255))
    assert sizes[0] > sizes[1] > sizes[2]  # coarser steps → smaller files
    assert psnrs[0] > psnrs[1] > psnrs[2] > 38  # and lower fidelity
    # lossy beats lossless size at every tested step
    assert sizes[0] < len(encode_jp2_codestream(noise, levels=2))


def test_lossy_fine_step_is_visually_lossless():
    noise = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    out = decode_jp2(
        encode_jp2_codestream(noise, levels=2, irreversible=True, base_step=1 / 1024)
    )[:, :, 0]
    assert int(np.abs(noise.astype(int) - out.astype(int)).max()) == 0


def test_lossy_rgb_ict_roundtrip():
    rgb = (rng.integers(0, 32, (40, 56, 3), dtype=np.uint8) * 8).astype(np.uint8)
    out = decode_jp2(
        encode_jp2_codestream(rgb, levels=2, irreversible=True, base_step=1 / 256)
    )
    assert out.shape == rgb.shape
    assert _psnr(rgb, out, 255) > 48


def test_lossy_derived_style_and_uint16():
    y, x = np.mgrid[0:64, 0:80]
    img = (127 + 100 * np.sin(y / 9.0) * np.cos(x / 11.0)).astype(np.uint8)
    out = decode_jp2(
        encode_jp2_codestream(img, levels=3, irreversible=True, qstyle="derived")
    )[:, :, 0]
    assert _psnr(img, out, 255) > 45
    img16 = ((y * 371 + x * 517) % 4096).astype(np.uint16)
    out16 = decode_jp2(
        encode_jp2_codestream(
            img16, levels=2, irreversible=True, depth=12, base_step=1 / 256
        )
    )[:, :, 0]
    assert _psnr(img16, out16, 4095) > 55


def test_lossy_tiled_multires():
    y, x = np.mgrid[0:96, 0:128]
    img = (127 + 100 * np.sin(y / 9.0) * np.cos(x / 11.0)).astype(np.uint8)
    cs = encode_jp2_codestream(
        img, levels=3, irreversible=True, tile_size=(48, 64), base_step=1 / 4
    )
    out = decode_jp2(cs)[:, :, 0]
    assert out.shape == img.shape
    assert _psnr(img, out, 255) > 45
    # no tile-seam artifacts: per-tile error is bounded like the interior
    assert int(np.abs(img.astype(int) - out.astype(int)).max()) < 8


def test_qcc_per_component_quantization():
    # coarser chroma steps emit QCC overrides (A.6.5) and shrink the file
    rng2 = np.random.default_rng(5)
    rgb = (rng2.integers(0, 32, (40, 56, 3), dtype=np.uint8) * 8).astype(np.uint8)
    cs = encode_jp2_codestream(
        rgb, levels=2, irreversible=True, base_step=[1 / 256, 1 / 16, 1 / 16]
    )
    assert cs.count(b"\xff\x5d") == 2  # two QCC markers (comps 1, 2)
    out = decode_jp2(cs)
    assert _psnr(rgb, out, 255) > 40
    uniform = encode_jp2_codestream(rgb, levels=2, irreversible=True, base_step=1 / 256)
    assert len(cs) < len(uniform)  # chroma really is coded coarser
    # fine per-component steps stay exactly lossless
    fine = encode_jp2_codestream(
        rgb, levels=2, irreversible=True, base_step=[1 / 1024] * 3
    )
    assert (decode_jp2(fine) == rgb).all()


def test_pcrl_cprl_with_precincts_roundtrip():
    # position-major progressions × real precinct partitions (B.12): the
    # corner-interleaved packet order must match between writer and reader
    a = rng.integers(0, 4001, (70, 85), dtype=np.uint16)
    for prog in (3, 4):
        for layers in (1, 3):
            for prec in ((3, 3), (4, 2)):
                blob = encode_jp2_codestream(
                    a, levels=2, cblk=16, layers=layers, prog=prog,
                    precincts=prec, sop=True, eph=True,
                )
                np.testing.assert_array_equal(decode_jp2(blob)[:, :, 0], a)
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    for prog in (3, 4):
        blob = encode_jp2_codestream(
            rgb, levels=2, cblk=16, prog=prog, precincts=(3, 3),
            tile_size=(32, 32),
        )
        np.testing.assert_array_equal(decode_jp2(blob), rgb)


def test_pcrl_corner_interleave_order():
    # the packet order really is corner-sorted, not resolution-blocked:
    # with 2 levels and 8px precincts, resolution corners interleave
    from odc_stac_spark.operators.jp2 import _packet_order

    order = _packet_order(
        3, 1, 3, 1,
        npre=[1, 2, 4],
        pp=[(3, 3)] * 3,
        res_dims=[(8, 8), (16, 16), (32, 32)],
    )
    rs = [r for (_, r, _, _) in order]
    # all three resolutions contribute their (0,0)-corner packet first
    assert rs[:3] == [0, 1, 2]
    assert len(order) == 1 + 2 + 4


def test_component_subsampling_420_and_422():
    # 4:2:0 chroma: native planes round-trip exactly; output presents
    # them replicated to the reference grid (the GDAL presentation)
    h, w = 40, 56
    luma = rng.integers(0, 256, (h, w)).astype(np.uint8)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cs = encode_jp2_codestream(
        [luma, cb, cr], levels=2, cblk=16,
        subsampling=[(1, 1), (2, 2), (2, 2)], size=(h, w),
    )
    out = decode_jp2(cs)
    assert out.shape == (h, w, 3)
    np.testing.assert_array_equal(out[:, :, 0], luma)
    np.testing.assert_array_equal(out[::2, ::2, 1], cb)
    np.testing.assert_array_equal(out[1::2, 1::2, 1], cb)
    np.testing.assert_array_equal(out[::2, ::2, 2], cr)
    # tiled 4:2:2 with odd dims (ceil-difference tile rectangles)
    h2, w2 = 35, 50
    y2 = rng.integers(0, 4000, (h2, w2)).astype(np.uint16)
    c2 = rng.integers(0, 4000, (h2, (w2 + 1) // 2)).astype(np.uint16)
    cs2 = encode_jp2_codestream(
        [y2, c2], levels=2, cblk=16,
        subsampling=[(1, 1), (2, 1)], size=(h2, w2), tile_size=(16, 24),
    )
    out2 = decode_jp2(cs2)
    np.testing.assert_array_equal(out2[:, :, 0], y2)
    np.testing.assert_array_equal(out2[:, ::2, 1], c2)


def test_subsampling_rlcp_layers_and_guards():
    h, w = 24, 32
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    c = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    blob = encode_jp2_codestream(
        [y, c], levels=1, cblk=16, subsampling=[(1, 1), (2, 2)],
        size=(h, w), prog=1, layers=3,
    )
    out = decode_jp2(blob)
    np.testing.assert_array_equal(out[:, :, 0], y)
    with pytest.raises(ValueError, match="plane shape"):
        encode_jp2_codestream(
            [y, y], levels=1, subsampling=[(1, 1), (2, 2)], size=(h, w)
        )
    with pytest.raises(ValueError, match="size"):
        encode_jp2_codestream([y], levels=1, subsampling=[(1, 1)])
    # non-uniform subsampling × position-interleaved progression refuses
    with pytest.raises(NotImplementedError, match="LRCP/RLCP"):
        blob2 = encode_jp2_codestream(
            [y, c], levels=1, cblk=16, subsampling=[(1, 1), (2, 2)],
            size=(h, w), prog=2,
        )
        decode_jp2(blob2)


def test_coc_codeblock_override():
    # COC (A.6.2): per-component code-block size — the common Kakadu
    # emission; writer emits COC for differing comps, reader applies it
    rgb = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    cs = encode_jp2_codestream(rgb, levels=2, cblk=32, comp_cblk=[32, 16, 16])
    assert cs.count(b"\xff\x53") == 2
    np.testing.assert_array_equal(decode_jp2(cs), rgb)
    cs2 = encode_jp2_codestream(
        rgb, levels=2, comp_cblk=[32, 8, 8], tile_size=(24, 32), layers=2
    )
    np.testing.assert_array_equal(decode_jp2(cs2), rgb)


def test_coc_unsupported_overrides_refuse():
    a = np.zeros((16, 16), np.uint8)
    cs = encode_jp2_codestream(a, levels=2, cblk=16)
    at = cs.index(b"\xff\x5c")
    # truncated COC → loud rejection
    with pytest.raises(ValueError, match="truncated COC"):
        decode_jp2(cs[:at] + b"\xff\x53" + struct.pack(">H", 4) + b"\x00\x00" + cs[at:])
    # COC changing decomposition levels → loud refusal
    coc = b"\xff\x53" + struct.pack(">H", 9) + bytes([0, 0, 1, 2, 2, 0, 1])
    with pytest.raises(NotImplementedError, match="decomposition-level"):
        decode_jp2(cs[:at] + coc + cs[at:])
    # COC flipping the transform → loud refusal
    coc2 = b"\xff\x53" + struct.pack(">H", 9) + bytes([0, 0, 2, 2, 2, 0, 0])
    with pytest.raises(NotImplementedError, match="transform"):
        decode_jp2(cs[:at] + coc2 + cs[at:])


# ---------------------------------------------------------------------------
# full code-block style matrix (reset 0x02 / termall 0x04 / segsym 0x20)


def test_all_style_combos_roundtrip_identically():
    """Every supported style combination must reconstruct the SAME
    pixels as style 0 — styles change entropy-coding framing, never
    coefficients."""
    r = np.random.default_rng(42)
    img = r.integers(0, 60000, (70, 90)).astype(np.uint16)
    base = decode_jp2(encode_jp2_codestream(img))
    for combo in (0x02, 0x04, 0x05, 0x06, 0x07, 0x20, 0x22, 0x25, 0x27):
        got = decode_jp2(encode_jp2_codestream(img, cblk_style=combo))
        np.testing.assert_array_equal(got, base, err_msg=hex(combo))


def test_styles_with_tiles_precincts_and_multilayer():
    r = np.random.default_rng(9)
    img = r.integers(0, 60000, (70, 90)).astype(np.uint16)
    cs = encode_jp2_codestream(
        img, cblk_style=0x27, tile_size=(48, 48), precincts=(6, 6),
        prog=2, sop=True, eph=True,
    )
    np.testing.assert_array_equal(decode_jp2(cs)[:, :, 0], img)
    # reset/segsym keep ONE continuous codeword → quality layers allowed
    cs = encode_jp2_codestream(img, cblk_style=0x22, layers=3)
    np.testing.assert_array_equal(decode_jp2(cs)[:, :, 0], img)
    # termall cannot split segments across layers → refuses
    with pytest.raises(NotImplementedError, match="quality layers"):
        encode_jp2_codestream(img, cblk_style=0x04, layers=2)


def test_segsym_detects_corruption():
    """The segmentation symbol exists FOR error detection: a corrupted
    cleanup pass must raise, not silently mis-decode."""
    r = np.random.default_rng(3)
    img = r.integers(0, 60000, (48, 48)).astype(np.uint16)
    cs = bytearray(encode_jp2_codestream(img, cblk_style=0x20))
    at = bytes(cs).index(b"\xff\x93") + 400
    cs[at] ^= 0xFF
    with pytest.raises(Exception):
        decode_jp2(bytes(cs))


def test_predictable_termination_flag_is_tolerated():
    """0x10 is an encoder-side property; a stream labeled with it (and
    nothing else) decodes exactly like style 0."""
    img = (np.arange(32 * 32, dtype=np.int64) % 251).reshape(32, 32).astype(np.uint8)
    cs = encode_jp2_codestream(img, levels=2)
    patched = _patched(cs, b"\xff\x52", 8, 0x10)
    np.testing.assert_array_equal(decode_jp2(patched), decode_jp2(cs))


def test_vertically_causal_full_matrix():
    """Vertically stripe-causal context formation (D.7, 0x08): every
    combination with the other flags reconstructs identically to
    style 0, AND the flag genuinely changes the bitstream (a stream
    relabeled without it mis-decodes — the masking is exercised, not a
    no-op)."""
    r = np.random.default_rng(5)
    img = r.integers(0, 60000, (64, 64)).astype(np.uint16)
    base = decode_jp2(encode_jp2_codestream(img))
    for combo in (0x08, 0x09, 0x0C, 0x0F, 0x28, 0x2F):
        got = decode_jp2(encode_jp2_codestream(img, cblk_style=combo))
        np.testing.assert_array_equal(got, base, err_msg=hex(combo))
    cs = encode_jp2_codestream(img, cblk_style=0x08)
    assert cs[100:] != encode_jp2_codestream(img)[100:]
    at = cs.index(b"\xff\x52") + 4 + 8
    relabeled = cs[:at] + bytes([0x02]) + cs[at + 1 :]
    try:
        wrong = decode_jp2(relabeled)
        assert not np.array_equal(wrong[:, :, 0], img)
    except Exception:
        pass  # an error is an equally valid outcome for a mislabeled stream


def test_decode_cap_is_per_component():
    """The allocation sanity cap bounds per-component pixels (ys*xs),
    not total samples — a multi-band image whose per-band frame fits
    the cap must decode even when bands x pixels exceeds it (a 3-band
    full Sentinel-2 scene is the real-world case)."""
    import os

    from odc_stac_spark.operators.jp2 import decode_jp2, encode_jp2

    rng = np.random.default_rng(42)
    img = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
    blob = encode_jp2(img, levels=1)
    old = os.environ.get("ODC_STAC_SPARK_JP2_MAX_PIXELS")
    try:
        # 64 per-component pixels: 3 components x 64 = 192 samples total,
        # which the old total-samples cap would have refused
        os.environ["ODC_STAC_SPARK_JP2_MAX_PIXELS"] = "64"
        np.testing.assert_array_equal(decode_jp2(blob), img)
        # and the per-component bound still bites
        os.environ["ODC_STAC_SPARK_JP2_MAX_PIXELS"] = "63"
        with pytest.raises(ValueError, match="sanity cap"):
            decode_jp2(blob)
    finally:
        if old is None:
            os.environ.pop("ODC_STAC_SPARK_JP2_MAX_PIXELS", None)
        else:
            os.environ["ODC_STAC_SPARK_JP2_MAX_PIXELS"] = old


def test_decode_cap_bounds_total_samples(monkeypatch):
    """Per-component cap alone leaves an OOM hole: a SIZ claiming
    cap-sized pixels x 16384 components (the Csiz spec max) passes both
    individual checks while asking for a multi-TiB buffer. The
    total-samples bound (default 16x the per-component cap,
    ODC_STAC_SPARK_JP2_MAX_SAMPLES override) closes it."""
    from odc_stac_spark.operators.jp2 import decode_jp2, encode_jp2

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
    blob = encode_jp2(img, levels=1)
    # default: 64 px/component * 16 = 1024 total >= 192 -> decodes
    monkeypatch.setenv("ODC_STAC_SPARK_JP2_MAX_PIXELS", "64")
    monkeypatch.delenv("ODC_STAC_SPARK_JP2_MAX_SAMPLES", raising=False)
    np.testing.assert_array_equal(decode_jp2(blob), img)
    # explicit total-samples bound below 8*8*3=192 bites even though the
    # per-component bound (64) is satisfied
    monkeypatch.setenv("ODC_STAC_SPARK_JP2_MAX_SAMPLES", "100")
    with pytest.raises(ValueError, match="sanity cap"):
        decode_jp2(blob)


# ---------------------------------------------------------------------------
# multiple tile-parts (ISO 15444-1 A.4.2 — Kakadu-default archives split
# each tile's packets across several SOT..SOD segments)


def _split_tileparts(cs: bytes, nparts: int = 2) -> bytes:
    """Rewrite a single-part-per-tile codestream so every tile's payload
    is carved into ``nparts`` tile-parts (TPsot 0..n-1, correct Psot)."""
    out = bytearray(cs[:2])
    p = 2
    while p + 4 <= len(cs):
        code, ln = struct.unpack(">HH", cs[p : p + 4])
        if code == 0xFFD9:
            out += cs[p : p + 2]
            break
        if code == 0xFF90:
            isot, psot = struct.unpack(">HI", cs[p + 4 : p + 10])
            tile_end = p + psot
            payload = cs[p + 2 + ln + 2 : tile_end]  # past SOT body + SOD
            k = max(1, len(payload) // nparts)
            chunks = [payload[i : i + k] for i in range(0, len(payload), k)]
            if len(chunks) > nparts:
                chunks[nparts - 1 :] = [b"".join(chunks[nparts - 1 :])]
            for tp, ch in enumerate(chunks):
                out += struct.pack(
                    ">HHHIBB", 0xFF90, 10, isot, 12 + 2 + len(ch), tp, len(chunks)
                )
                out += b"\xff\x93" + ch
            p = tile_end
            continue
        out += cs[p : p + 2 + ln]
        p += 2 + ln
    return bytes(out)


def test_multiple_tileparts_decode():
    a = rng.integers(0, 4096, (75, 90), dtype=np.uint16)
    base = encode_jp2_codestream(a, levels=2, cblk=16, tile_size=(32, 40))
    for nparts in (2, 3):
        split = _split_tileparts(base, nparts)
        assert split != base
        np.testing.assert_array_equal(decode_jp2(split)[:, :, 0], a)


def test_multiple_tileparts_windowed():
    a = rng.integers(0, 4096, (75, 90), dtype=np.uint16)
    split = _split_tileparts(
        encode_jp2_codestream(a, levels=2, cblk=16, tile_size=(32, 40)), 2
    )
    win = decode_jp2(split, window=(35, 70, 45, 90))[:, :, 0]
    np.testing.assert_array_equal(win[35:70, 45:90], a[35:70, 45:90])
    assert (win[:32, :40] == 0).all()


def test_multiple_tileparts_file_reads(tmp_path):
    a = rng.integers(0, 255, (64, 80), dtype=np.uint8)
    split = _split_tileparts(
        encode_jp2_codestream(a, levels=1, cblk=32, tile_size=(32, 40)), 2
    )
    path = tmp_path / "mtp.j2c"
    path.write_bytes(split)
    hdr = read_jp2_header(str(path))
    assert len(hdr["tiles"]) == 4
    assert all(len(spans) == 2 for _, spans in hdr["tiles"])
    for isot, _ in hdr["tiles"]:
        ty0, tx0, th, tw = _tile_geometry(hdr, isot)
        t = read_jp2_tile(str(path), hdr, isot)
        np.testing.assert_array_equal(
            t[:, :, 0], a[ty0 : ty0 + th, tx0 : tx0 + tw]
        )


def test_tilepart_out_of_order_refuses():
    a = rng.integers(0, 255, (40, 40), dtype=np.uint8)
    split = bytearray(
        _split_tileparts(encode_jp2_codestream(a, levels=1, cblk=32), 2)
    )
    # find the second SOT and corrupt its TPsot (1 -> 2: a gap)
    p, seen = 2, 0
    while p + 4 <= len(split):
        code, ln = struct.unpack(">HH", split[p : p + 4])
        if code == 0xFF90:
            seen += 1
            if seen == 2:
                split[p + 10] = 2
                break
            psot = struct.unpack(">I", split[p + 6 : p + 10])[0]
            p += psot
            continue
        p += 2 + ln
    with pytest.raises(ValueError, match="out of order"):
        decode_jp2(bytes(split))


# ---------------------------------------------------------------------------
# r16 optimization: the flat style-0 encoder (_encode_block_flat) must stay
# byte-identical to the general/styled encoder, and the flattened decoder's
# incremental context keys must survive truncated-pass (layered) decodes.


def test_flat_encoder_matches_general_byte_for_byte():
    from odc_stac_spark.operators.jp2 import (
        _encode_block_flat,
        _encode_block_general,
        decode_block,
    )

    r = np.random.default_rng(1234)
    for trial in range(48):
        h = int(r.integers(1, 34))
        w = int(r.integers(1, 34))
        band = ("LL", "LH", "HL", "HH")[trial % 4]
        kind = trial % 4
        if kind == 0:  # dense mid-range
            coefs = r.integers(-300, 300, (h, w)).astype(np.int64)
        elif kind == 1:  # sparse spikes (lossy-quantized profile)
            coefs = np.zeros((h, w), np.int64)
            nz = int(r.integers(0, h * w + 1))
            pos = r.choice(h * w, size=nz, replace=False)
            coefs.ravel()[pos] = r.integers(-500000, 500000, nz)
        elif kind == 2:  # all-zero block
            coefs = np.zeros((h, w), np.int64)
        else:  # ±1 noise (run-mode heavy)
            coefs = r.integers(-2, 2, (h, w)).astype(np.int64)
        flat = _encode_block_flat(coefs.copy(), band)
        general = _encode_block_general(coefs.copy(), band, 0)
        assert flat == general, (trial, h, w, band, kind)
        data, npasses, nbp = flat
        back = decode_block(data, w, h, band, nbp, npasses)
        assert np.array_equal(back, coefs)
        # truncated decode (layered streams stop mid-pass-sequence):
        # the incremental zck/sck state must match a fresh full decode
        if npasses > 2:
            k = int(r.integers(1, npasses))
            part = decode_block(data, w, h, band, nbp, k)
            assert part.shape == (h, w)


def test_reflect4_idx_matches_np_pad():
    # r16 change 15: the 9/7 lifting's whole-sample symmetric extension
    # is a cached-index gather; it must equal np.pad(mode="reflect")
    # for every axis length, including the multi-bounce n < 5 cases.
    from odc_stac_spark.operators.jp2 import _reflect4_idx

    for n in range(2, 48):
        a = np.arange(n) * 1.5 - 7
        assert np.array_equal(
            a[_reflect4_idx(n)], np.pad(a, (4, 4), mode="reflect")
        ), n


def test_partial_decode_every_truncation_point():
    # r16 change 15: the decoder's SPP frontier must leave layered
    # (truncated-pass) decodes bit-identical at EVERY cut, not just the
    # full-pass roundtrip the other tests pin.
    from odc_stac_spark.operators.jp2 import decode_block, encode_block

    r = np.random.default_rng(31337)
    for trial in range(24):
        h = int(r.integers(2, 34))
        w = int(r.integers(2, 34))
        band = ("LL", "LH", "HL", "HH")[trial % 4]
        coefs = np.zeros((h, w), np.int64)
        nz = int(r.integers(1, h * w + 1))
        pos = r.choice(h * w, size=nz, replace=False)
        coefs.ravel()[pos] = r.integers(-500000, 500000, nz)
        data, npasses, nbp = encode_block(coefs, band)
        prev_err = None
        for k in range(npasses + 1):
            part = decode_block(data, w, h, band, nbp, k)
            # refinement must be monotone: error never grows with passes
            err = int(np.abs(part.astype(np.int64) - coefs).sum())
            if prev_err is not None:
                assert err <= prev_err, (trial, k)
            prev_err = err
        assert prev_err == 0  # full decode exact
