"""H.264/AVC baseline intra codec tests — ITU-T H.264.

The encoder (encode_h264_gray) emits spec-valid IDR streams whose
reconstruction is EXACT for 4x4-lattice grayscale content (DC-only
residuals at QP=0, deblocking disabled), which is what lets the decoder
be gated against a first-principles pixel oracle. When a native decoder
(PIL-ffmpeg / PyAV) is importable, streams are additionally
cross-validated.
"""

from __future__ import annotations

import numpy as np
import pytest

from odc_stac_spark.operators.h264 import (
    BLK_ZSCAN,
    CBP_INTRA_FROM_CODE,
    BitReader,
    BitWriter,
    _check_vlc_tables,
    _level_scale_4x4,
    decode_cavlc_block,
    decode_h264,
    decode_h264_planes,
    encode_h264_gray,
    escape_rbsp,
    hadamard_4x4,
    itransform_4x4,
    parse_pps,
    parse_sps,
    split_annexb,
    unescape_rbsp,
)


def _lattice(seed: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cells = rng.integers(0, 256, ((h + 3) // 4, (w + 3) // 4)).astype(np.uint8)
    return cells.repeat(4, 0).repeat(4, 1)[:h, :w]


# ---------------------------------------------------------------------------
# tables + bit I/O


def test_vlc_tables_structural():
    _check_vlc_tables()
    assert sorted(CBP_INTRA_FROM_CODE) == list(range(48))
    assert len(BLK_ZSCAN) == 16 and len(set(BLK_ZSCAN)) == 16


def test_exp_golomb_roundtrip():
    w = BitWriter()
    vals = [0, 1, 2, 7, 8, 255, 1023]
    svals = [0, 1, -1, 3, -7, 100, -255]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = BitReader(w.getvalue())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_rbsp_escape_roundtrip():
    payloads = [b"\x00\x00\x00", b"\x00\x00\x01\x02", b"\x00\x00\x03\x00\x00\x02",
                bytes(range(256)) * 3]
    for p in payloads:
        esc = escape_rbsp(p)
        # no start-code emulation survives
        assert b"\x00\x00\x00" not in esc and b"\x00\x00\x01" not in esc
        assert unescape_rbsp(esc) == p


# ---------------------------------------------------------------------------
# transforms (§8.5) — DC-only shortcuts and known identities


def test_itransform_dc_only():
    for dc in (-640, -10, 0, 10, 640):
        d = np.zeros((4, 4), np.int64)
        d[0, 0] = dc
        assert (itransform_4x4(d) == (dc + 32) >> 6).all()


def test_hadamard_dc_only_uniform():
    c = np.zeros((4, 4), np.int64)
    c[0, 0] = 37
    assert (hadamard_4x4(c) == 37).all()


def test_level_scale_qp0():
    ls = _level_scale_4x4(0)
    assert ls[0, 0] == 10 and ls[1, 1] == 16 and ls[0, 1] == 13


# ---------------------------------------------------------------------------
# CAVLC block coder round trip (via the module's own writer helpers)


def test_cavlc_dc_only_roundtrip():
    from odc_stac_spark.operators.h264 import _write_dc_only_block

    for nc in (0, 1, 2, 3, 4, 7, 8, 20):
        for level in (0, 1, -1, 2, -2, 7, -13, 200, -900, 1634):
            w = BitWriter()
            tc = _write_dc_only_block(w, nc, level)
            w.rbsp_trailing()
            out = decode_cavlc_block(BitReader(w.getvalue()), nc, 16)
            assert out[0] == level and not any(out[1:])
            assert tc == (1 if level else 0)


def test_cavlc_chroma_dc_empty():
    from odc_stac_spark.operators.h264 import _coeff_token_str

    w = BitWriter()
    w.write_str(_coeff_token_str(-1, 0, 0))
    w.rbsp_trailing()
    out = decode_cavlc_block(BitReader(w.getvalue()), -1, 4)
    assert out == [0, 0, 0, 0]


# ---------------------------------------------------------------------------
# encoder/decoder round trip (the pixel-oracle contract)


@pytest.mark.parametrize("h,w", [(16, 16), (16, 24), (20, 16), (36, 44), (4, 4), (8, 64)])
def test_roundtrip_exact(h, w):
    img = _lattice(h * 100 + w, h, w)
    y, u, v = decode_h264_planes(encode_h264_gray(img))
    assert y.shape == (h, w)
    assert (y == img).all()
    assert (u == 128).all() and (v == 128).all()
    assert u.shape == (h // 2, w // 2)


def test_roundtrip_extreme_residuals():
    cells = (np.indices((8, 8)).sum(0) % 2 * 255).astype(np.uint8)
    img = cells.repeat(4, 0).repeat(4, 1)
    y, _, _ = decode_h264_planes(encode_h264_gray(img))
    assert (y == img).all()


def test_mode_variety_roundtrip():
    # V stripes, H stripes, uniform (16x16 skips), Hadamard offsets and a
    # lattice quadrant in one image
    img = np.full((48, 48), 120, np.uint8)
    img[:, 16:32] = np.tile((np.arange(16) // 4 * 12 + 60).astype(np.uint8), (48, 1))
    img[32:, :16] = 160  # offset from DC pred → Hadamard path
    img[16:32, 32:] = _lattice(11, 16, 16)
    y, _, _ = decode_h264_planes(encode_h264_gray(img))
    assert (y == img).all()


def test_pcm_roundtrip():
    img = _lattice(7, 32, 32)
    y, u, v = decode_h264_planes(encode_h264_gray(img, pcm_every=2))
    assert (y == img).all() and (u == 128).all() and (v == 128).all()


def test_rgb_output_gray_exact():
    img = _lattice(5, 24, 24)
    rgb = decode_h264(encode_h264_gray(img))
    assert rgb.shape == (24, 24, 3)
    assert (rgb == img[:, :, None]).all()


def test_all_intra4x4_modes_decode():
    """Exercise every Intra_4x4 mode + 16x16 plane mode on a synthetic
    stream: encode a lattice, then decode a hand-modified stream is
    fragile — instead run the mode predictors directly over a decoded
    frame for shape/determinism, and pin the full set by round-trip of
    many random lattices (mode decision covers V/H/DC/Hadamard/I_4x4)."""
    from odc_stac_spark.operators.h264 import _pred4x4, _pred16x16, _pred_chroma

    plane = np.zeros((33, 33), np.uint8)
    plane[0, :] = np.arange(33) % 256
    plane[:, 0] = (np.arange(33) * 7) % 256
    rng = np.random.default_rng(3)
    plane[1:, 1:] = rng.integers(0, 256, (32, 32))
    for mode in range(9):
        out = _pred4x4(mode, plane, 5, 5, True, True, True)
        assert out.shape == (4, 4) and out.min() >= 0 and out.max() <= 255
    for mode in range(4):
        out = _pred16x16(mode, plane, 1, 1, True, True)
        assert out.shape == (16, 16) and out.min() >= 0 and out.max() <= 255
        outc = _pred_chroma(mode, plane, 1, 1, True, True)
        assert outc.shape == (8, 8) and outc.min() >= 0 and outc.max() <= 255


# ---------------------------------------------------------------------------
# header parsing + refusals


def test_sps_pps_roundtrip():
    from odc_stac_spark.operators.h264 import build_pps_rbsp, build_sps_rbsp

    sps = parse_sps(build_sps_rbsp(24, 16))
    assert (sps["width"], sps["height"]) == (24, 16)
    assert (sps["mb_w"], sps["mb_h"]) == (2, 1)
    pps = parse_pps(build_pps_rbsp())
    assert pps["pic_init_qp"] == 0 and pps["deblocking_control"] == 1


def test_cabac_refuses():
    w = BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(1, 1)  # entropy_coding_mode: CABAC
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="CABAC"):
        parse_pps(w.getvalue())


def test_inter_slice_refuses():
    img = _lattice(1, 16, 16)
    data = bytearray(encode_h264_gray(img))
    # find the IDR slice NAL and flip slice_type I(7 → ue "0001000")
    # simpler: decode a hand-built P header
    from odc_stac_spark.operators.h264 import build_pps_rbsp, build_sps_rbsp, decode_islice

    sps = parse_sps(build_sps_rbsp(16, 16))
    pps = parse_pps(build_pps_rbsp())
    w = BitWriter()
    w.ue(0)  # first_mb
    w.ue(5)  # slice_type P (5)
    w.ue(0)
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="I slices"):
        decode_islice(sps, pps, w.getvalue(), 1, 3)


def test_decode_caps_and_truncation():
    img = _lattice(9, 16, 16)
    data = encode_h264_gray(img)
    nals = split_annexb(data)
    assert [n[0] & 0x1F for n in nals] == [7, 8, 5]
    # oversized SPS dims refuse via the pixel cap
    from odc_stac_spark.operators.h264 import build_sps_rbsp

    with pytest.raises(ValueError, match="cap"):
        parse_sps(build_sps_rbsp(16368, 16368))
    # truncation anywhere must raise a typed error, never hang
    for cut in (4, 8, 12, len(data) // 2, len(data) - 2):
        try:
            decode_h264_planes(data[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_fuzz_single_byte_corruption():
    img = _lattice(8, 16, 24)
    base = bytearray(encode_h264_gray(img))
    rng = np.random.default_rng(3)
    positions = rng.integers(0, len(base), 60).tolist()
    for pos in positions:
        for delta in (1, 0x80):
            buf = bytearray(base)
            buf[pos] = (buf[pos] + delta) % 256
            try:
                decode_h264_planes(bytes(buf))
            except (ValueError, NotImplementedError, KeyError):
                pass  # loud, typed refusal is the contract


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="constant per 4x4"):
        encode_h264_gray(np.arange(256, dtype=np.uint8).reshape(16, 16))
    with pytest.raises(ValueError, match="even"):
        encode_h264_gray(np.zeros((15, 16), np.uint8))


# ---------------------------------------------------------------------------
# mp4 integration


def test_mp4_avc1_mux_demux_roundtrip():
    from odc_stac_spark.operators.codecs import decode_mp4_mjpeg, encode_mp4_h264

    rng = np.random.default_rng(2)
    frames = [
        rng.integers(0, 256, (5, 6)).astype(np.uint8).repeat(4, 0).repeat(4, 1)
        for _ in range(4)
    ]
    mp4 = encode_mp4_h264(frames, fps=5)
    out = decode_mp4_mjpeg(mp4)
    assert out.shape == (4, 20, 24, 3)
    for i, f in enumerate(frames):
        assert (out[i] == f[:, :, None]).all()
    sampled = decode_mp4_mjpeg(mp4, every=2)
    assert sampled.shape[0] == 2


def test_mp4_video_seam_dispatches_avc1():
    from odc_stac_spark.operators.multimodal import VIDEO_DECODERS

    frames = [_lattice(3, 16, 16)]
    from odc_stac_spark.operators.codecs import encode_mp4_h264

    out = VIDEO_DECODERS["video/mp4"](encode_mp4_h264(frames))
    assert out.shape == (1, 16, 16, 3)
    assert (out[0] == frames[0][:, :, None]).all()


def test_cross_validate_against_native_decoder():
    """When PyAV (ffmpeg bindings) is importable, our encoder's stream
    must decode identically there."""
    av = pytest.importorskip("av")
    import io

    from odc_stac_spark.operators.codecs import encode_mp4_h264

    img = _lattice(23, 32, 32)
    mp4 = encode_mp4_h264([img])
    with av.open(io.BytesIO(mp4)) as container:
        frame = next(container.decode(video=0))
        native = frame.to_ndarray(format="gray")
    assert (native == img).all()


# ---------------------------------------------------------------------------
# in-loop deblocking (§8.7)


def _scalar_deblock_luma_normal(row, bS, qp):
    """Independent scalar transcription of §8.7.2.3 (bS < 4, luma) used
    to cross-check the vectorized implementation."""
    from odc_stac_spark.operators.h264 import (
        _DEBLOCK_ALPHA,
        _DEBLOCK_BETA,
        _DEBLOCK_TC0,
    )

    p3, p2, p1, p0, q0, q1, q2, q3 = [int(v) for v in row]
    alpha, beta = _DEBLOCK_ALPHA[qp], _DEBLOCK_BETA[qp]
    out = list(row)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta and abs(q1 - q0) < beta):
        return out
    ap, aq = abs(p2 - p0) < beta, abs(q2 - q0) < beta
    tc0 = _DEBLOCK_TC0[bS - 1][qp]
    tc = tc0 + int(ap) + int(aq)
    delta = max(-tc, min(tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3))
    out[3] = max(0, min(255, p0 + delta))
    out[4] = max(0, min(255, q0 - delta))
    if ap:
        out[2] = p1 + max(-tc0, min(tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
    if aq:
        out[5] = q1 + max(-tc0, min(tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
    return out


def test_deblock_core_matches_scalar_reference():
    from odc_stac_spark.operators.h264 import _deblock_core

    rng = np.random.default_rng(9)
    for qp in (20, 28, 36, 44):
        for bS in (1, 2, 3):
            blk = rng.integers(0, 256, (32, 8)).astype(np.int64)
            # bias half the rows toward small gradients so the filter fires
            blk[16:] = rng.integers(100, 112, (16, 8))
            got = _deblock_core(blk.copy(), bS, qp, False)
            want = np.array(
                [_scalar_deblock_luma_normal(r, bS, qp) for r in blk], np.int64
            )
            np.testing.assert_array_equal(got, want)


def test_deblock_strong_filter_properties():
    from odc_stac_spark.operators.h264 import _deblock_core

    # a hard step edge with small local gradients: bS=4 strong filter
    # must smooth it; output stays in range and is deterministic
    blk = np.tile(np.array([[100, 100, 100, 100, 116, 116, 116, 116]]), (16, 1)).astype(np.int64)
    out = _deblock_core(blk.copy(), 4, 36, False)
    assert (out != blk).any()
    assert out.min() >= 0 and out.max() <= 255
    # monotone across the edge after filtering
    assert (np.diff(out, axis=1) >= 0).all()
    np.testing.assert_array_equal(out, _deblock_core(blk.copy(), 4, 36, False))


def test_deblock_enabled_stream_is_noop_at_qp0():
    # QP 0 → alpha = beta = 0 → §8.7 provably never fires: an encoder
    # stream with the filter ENABLED still reconstructs exactly, while
    # exercising the full deblock code path
    img = _lattice(31, 32, 48)
    y, u, v = decode_h264_planes(encode_h264_gray(img, deblock=True))
    assert (y == img).all() and (u == 128).all() and (v == 128).all()


def test_deblock_frame_modifies_synthetic_high_qp():
    from odc_stac_spark.operators.h264 import deblock_intra_frame

    rng = np.random.default_rng(5)
    Y = np.zeros((33, 33), np.uint8)
    U = np.zeros((17, 17), np.uint8)
    V = np.zeros((17, 17), np.uint8)
    # blocky content: constant 16x16 tiles with a step at the MB edge
    Y[1:17, 1:17] = 100
    Y[1:17, 17:] = 120
    Y[17:, 1:17] = 80
    Y[17:, 17:] = 140
    U[1:] = 90
    V[1:] = 160
    before = Y.copy()
    deblock_intra_frame(Y, U, V, [30, 30, 30, 30], 2, 2, 0)
    assert (Y != before).any()
    deblocked_once = Y.copy()
    # determinism
    Y2 = before.copy()
    U2 = np.full_like(U, 0)
    U2[1:] = 90
    V2 = np.full_like(V, 0)
    V2[1:] = 160
    deblock_intra_frame(Y2, U2, V2, [30, 30, 30, 30], 2, 2, 0)
    np.testing.assert_array_equal(deblocked_once, Y2)
