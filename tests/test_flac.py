"""FLAC codec tests (operators/flac.py — RFC 9639 from scratch).

Own-writer round trips cover constant/fixed/verbatim subframes, block
splitting, stereo and mid/side; hand-assembled single-frame streams
(built bit-by-bit against the spec with expectations derived by hand)
cover the decoder-only surface: LPC subframes with quantized shift,
RICE2 residuals, partition orders > 0, escaped raw partitions, wasted
bits, and the left/side and right/side channel assignments. CRC-8,
CRC-16 and STREAMINFO-MD5 tampering all fail loudly.
"""

import hashlib
import struct

import numpy as np
import pytest

from odc_stac_spark.operators.flac import (
    _BitWriter,
    _write_rice,
    _write_utf8_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)

RNG = np.random.default_rng(123)


# ---------------------------------------------------------------------------
# round trips


def test_roundtrip_demo_fixture():
    i = np.arange(1200)
    s = (((7 * 31 + i * 7) % 201) - 100).astype(np.int16)
    out, rate = decode_flac(encode_flac(s, rate=16000))
    assert rate == 16000 and out.dtype == np.int16
    np.testing.assert_array_equal(out, s)


def test_roundtrip_noise_multiblock():
    s = RNG.integers(-32768, 32768, 10000).astype(np.int16)
    np.testing.assert_array_equal(decode_flac(encode_flac(s, block_size=1024))[0], s)


def test_roundtrip_smooth_compresses():
    t = np.arange(8000)
    s = (3000 * np.sin(t / 50)).astype(np.int16)
    enc = encode_flac(s)
    assert len(enc) < s.nbytes // 3  # fixed predictors genuinely engage
    np.testing.assert_array_equal(decode_flac(enc)[0], s)


def test_roundtrip_constant_and_tiny():
    s = np.full(5000, 123, np.int16)
    enc = encode_flac(s)
    assert len(enc) < 200
    np.testing.assert_array_equal(decode_flac(enc)[0], s)
    tiny = np.array([5, -3, 7], np.int16)
    np.testing.assert_array_equal(decode_flac(encode_flac(tiny))[0], tiny)


def test_roundtrip_stereo_and_mid_side():
    st = RNG.integers(-2000, 2000, (3000, 2)).astype(np.int16)
    st[:, 1] = (st[:, 0] + RNG.integers(-50, 50, 3000)).astype(np.int16)
    for ms in (False, True):
        out, _ = decode_flac(encode_flac(st, mid_side=ms))
        assert out.shape == (3000, 2)
        np.testing.assert_array_equal(out, st)
    # mid/side on correlated stereo is genuinely smaller
    assert len(encode_flac(st, mid_side=True)) < len(encode_flac(st))


def test_roundtrip_odd_rates_and_bps():
    s = RNG.integers(-100, 100, 500).astype(np.int16)
    for rate in (16000, 44100, 11025):
        out, r = decode_flac(encode_flac(s, rate=rate))
        assert r == rate
    out, _ = decode_flac(encode_flac(s.astype(np.int32), bps=24))
    np.testing.assert_array_equal(out, s)


# ---------------------------------------------------------------------------
# hand-assembled decoder-only features


def _hand_flac(nch, bps, block_size, write_subframes, md5_pcm, ch_code=None):
    """Build a one-frame FLAC file; ``write_subframes(bw)`` emits the
    subframe bits, ``md5_pcm`` is the interleaved little-endian PCM."""
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(block_size, 36)
    streaminfo = si.getvalue() + hashlib.md5(md5_pcm).digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    hdr = bytearray()
    h = _BitWriter()
    h.write(0x3FFE, 14)
    h.write(0, 2)
    h.write(7, 4)  # 16-bit block size follows
    h.write(5, 4)  # 16 kHz
    h.write(ch_code if ch_code is not None else nch - 1, 4)
    h.write({8: 1, 16: 4}[bps], 3)
    h.write(0, 1)
    hdr += h.getvalue()
    _write_utf8_number(hdr, 0)
    hdr += struct.pack(">H", block_size - 1)
    hdr.append(crc8(bytes(hdr)))
    bw = _BitWriter()
    write_subframes(bw)
    bw.align()
    frame = bytes(hdr) + bw.getvalue()
    frame += struct.pack(">H", crc16(frame))
    return bytes(out) + frame


def _pcm_bytes(arr, nbytes=2):
    raw = bytearray()
    for v in np.asarray(arr).reshape(-1):
        raw += int(v).to_bytes(nbytes, "little", signed=True)
    return bytes(raw)


def test_hand_lpc_subframe():
    # order-2 LPC with coefs [3, -1], shift 1: x[i] = res[i] + ((3*x[i-1]
    # - x[i-2]) >> 1) — expected reconstruction derived by hand
    warm = [100, 104]
    res = [2, -3, 5, 0]
    x = list(warm)
    for e in res:
        x.append(e + ((3 * x[-1] - 1 * x[-2]) >> 1))

    def subs(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)  # LPC order 2 (type = 31 + order)
        bw.write(0, 1)  # no wasted bits
        for v in warm:
            bw.write(v, 16)
        bw.write(4, 4)  # precision-1 → 5-bit coefs
        bw.write(1, 5)  # shift 1
        bw.write(3, 5)
        bw.write(-1, 5)
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # partition order 0
        bw.write(2, 4)  # rice param 2
        _write_rice(bw, np.array(res), 2)

    data = _hand_flac(1, 16, 6, subs, _pcm_bytes(x))
    out, _ = decode_flac(data)
    assert out.tolist() == x


def test_hand_rice2_and_partition_order():
    # fixed order-1, RICE2 (5-bit params), partition order 1: two
    # partitions with different params over an 8-sample block
    x = [10, 12, 11, 15, 14, 20, 5, 9]
    res = [x[i + 1] - x[i] for i in range(7)]  # order-1 residuals

    def subs(bw):
        bw.write(0, 1)
        bw.write(8 + 1, 6)  # FIXED order 1
        bw.write(0, 1)
        bw.write(x[0], 16)
        bw.write(1, 2)  # rice method 1 → 5-bit params
        bw.write(1, 4)  # partition order 1 → 2 partitions
        bw.write(1, 5)  # param for partition 0 (3 samples: 8/2 − order)
        _write_rice(bw, np.array(res[:3]), 1)
        bw.write(3, 5)  # param for partition 1 (4 samples)
        _write_rice(bw, np.array(res[3:]), 3)

    out, _ = decode_flac(_hand_flac(1, 16, 8, subs, _pcm_bytes(x)))
    assert out.tolist() == x


def test_hand_escaped_raw_partition():
    # escape param (11111 under RICE2) → raw 6-bit residuals
    x = [7, 7 + 31, 7 + 31 - 25]
    res = [31, -25]

    def subs(bw):
        bw.write(0, 1)
        bw.write(8 + 1, 6)
        bw.write(0, 1)
        bw.write(x[0], 16)
        bw.write(1, 2)
        bw.write(0, 4)
        bw.write(31, 5)  # escape
        bw.write(6, 5)  # 6-bit raw residuals
        bw.write(31, 6)
        bw.write(-25 & 0x3F, 6)

    out, _ = decode_flac(_hand_flac(1, 16, 3, subs, _pcm_bytes(x)))
    assert out.tolist() == x


def test_hand_wasted_bits():
    # all samples share a low zero bit: coded at bps-1 with wasted=1
    x = [4, 8, -6, 10]

    def subs(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(0)  # unary(k-1) = 0 → k = 1
        for v in x:
            bw.write(v >> 1, 15)

    out, _ = decode_flac(_hand_flac(1, 16, 4, subs, _pcm_bytes(x)))
    assert out.tolist() == x


@pytest.mark.parametrize("ch_code", [8, 9])
def test_hand_left_side_and_right_side(ch_code):
    l = [100, 120, 90]
    r = [95, 125, 91]
    side = [a - b for a, b in zip(l, r)]

    def subs(bw):
        def verb(vals, bits):
            bw.write(0, 1)
            bw.write(1, 6)
            bw.write(0, 1)
            for v in vals:
                bw.write(v, bits)

        if ch_code == 8:  # left/side
            verb(l, 16)
            verb(side, 17)
        else:  # right/side
            verb(side, 17)
            verb(r, 16)

    pcm = _pcm_bytes(np.stack([l, r], axis=-1))
    out, _ = decode_flac(_hand_flac(2, 16, 3, subs, pcm, ch_code=ch_code))
    assert out[:, 0].tolist() == l and out[:, 1].tolist() == r


# ---------------------------------------------------------------------------
# integrity checks fail loudly


def test_crc_and_md5_tampering_detected():
    s = RNG.integers(-500, 500, 600).astype(np.int16)
    enc = bytearray(encode_flac(s))
    # flip a bit inside the last frame's audio payload → CRC-16 trips
    bad = bytearray(enc)
    bad[-5] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # tamper the STREAMINFO MD5 → decoded-PCM verification trips
    bad2 = bytearray(enc)
    bad2[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad2))
    # ...unless verification is waived
    decode_flac(bytes(bad2), verify_md5=False)


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"RIFFxxxxWAVE")


def test_audio_seam_registration():
    from odc_stac_spark.operators.multimodal import AUDIO_DECODERS

    s = RNG.integers(-100, 100, 800).astype(np.int16)
    out, rate = AUDIO_DECODERS["audio/flac"](encode_flac(s, rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(out, s)
