"""Real pure-stdlib codecs (PNG/BMP/WAV) — operators/codecs.py."""

import base64
import struct
import zlib

import numpy as np
import pytest

from odc_stac_spark.operators.codecs import (
    PNG_SIGNATURE,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)
from odc_stac_spark.operators.multimodal import synth_image

rng = np.random.default_rng(42)


# ---- PNG ------------------------------------------------------------------


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip_channels(c):
    img = rng.integers(0, 256, size=(13, 17, c), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == (13, 17, c)
    assert np.array_equal(out, img)


def test_png_roundtrip_2d_gray():
    g = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g)), g[:, :, None])


def _png_with_filters(img: np.ndarray, filters: list) -> bytes:
    """Hand-assemble a PNG whose rows use the given filter types (applying
    the spec's filter functions forward), to prove the decoder's unfilter
    path — our encoder only ever emits filter 0."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for r in range(h):
        ft = filters[r % len(filters)]
        line = flat[r]
        prev = flat[r - 1] if r else np.zeros(stride, np.int32)

        def left(row):
            out = np.zeros(stride, np.int32)
            out[c:] = row[:-c]
            return out

        a, b = left(line), prev
        cc = left(prev)
        if ft == 0:
            filt = line
        elif ft == 1:
            filt = line - a
        elif ft == 2:
            filt = line - b
        elif ft == 3:
            filt = line - ((a + b) >> 1)
        elif ft == 4:
            p = a + b - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
            filt = line - pred
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(filters):
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_png_with_filters(img, filters)), img)


def test_png_decode_external_golden():
    # Well-known externally-encoded 1×1 RGBA PNG (the classic web "blank
    # pixel") — produced by a different encoder, exercising real-world
    # chunk layout + zlib stream + CRCs against our decoder.
    b = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
        "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    img = decode_png(b)
    assert img.shape == (1, 1, 4)
    assert img.tolist() == [[[0, 0, 255, 127]]]
    # and our encoder re-encodes it to the same pixels
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_palette_decode():
    # hand-build a color-type-3 (palette) PNG
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, palette[idx])


def test_png_bad_crc_rejected():
    data = bytearray(encode_png(synth_image(3, 8, 8, 3)))
    data[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_not_png_rejected():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png stream at all")


# ---- BMP ------------------------------------------------------------------


@pytest.mark.parametrize("wh", [(5, 4), (7, 3), (16, 16)])  # odd widths hit row padding
def test_bmp_roundtrip(wh):
    w, h = wh
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_gray_promotes_to_rgb():
    g = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    out = decode_bmp(encode_bmp(g))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


# ---- WAV ------------------------------------------------------------------


def test_wav_roundtrip_mono():
    s = rng.integers(-32768, 32768, size=1777, dtype=np.int16)
    d, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert d.shape == (1777,)
    assert np.array_equal(d, s)


def test_wav_roundtrip_stereo():
    s = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    d, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and d.shape == (500, 2)
    assert np.array_equal(d, s)


def _wav_raw(fmt_code, channels, rate, bits, payload):
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, rate, rate * channels * bits // 8, channels * bits // 8, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm8_maps_to_int16():
    raw = np.array([0, 128, 255], dtype=np.uint8)
    d, rate = decode_wav(_wav_raw(1, 1, 16000, 8, raw.tobytes()))
    assert np.array_equal(d, (raw.astype(np.int16) - 128) << 8)


def test_wav_float32_passthrough():
    f = np.array([0.5, -0.25, 1.0], dtype=np.float32)
    d, _ = decode_wav(_wav_raw(3, 1, 16000, 32, f.tobytes()))
    assert d.dtype == np.float32 and np.array_equal(d, f)


def test_wav_odd_sized_extra_chunk_skipped():
    # a 3-byte (odd) metadata chunk before data must be word-aligned past
    s = np.array([1, -2, 3], dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    body += b"data" + struct.pack("<I", 6) + s.tobytes()
    d, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.array_equal(d, s)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wave")


# ---- AVI / Motion-JPEG ----------------------------------------------------


def _lossless_frames(n, seed=0):
    fr = []
    for f in range(n):
        v = (
            2 * ((seed * 13 + f * 11 + np.arange(2)[:, None] * 7 + np.arange(3)[None, :] * 3) % 128)
        ).astype(np.uint8)
        fr.append(np.repeat(np.repeat(v, 8, 0), 8, 1))
    return fr


def test_avi_mjpeg_roundtrip_lossless_frames():
    from odc_stac_spark.operators.codecs import decode_avi_mjpeg, encode_avi_mjpeg

    fr = _lossless_frames(6)
    out = decode_avi_mjpeg(encode_avi_mjpeg(fr, quality=50))
    assert out.shape == (6, 16, 24, 1)
    for f in range(6):
        np.testing.assert_array_equal(out[f, :, :, 0], fr[f])


def test_avi_frame_sampling_and_cap():
    from odc_stac_spark.operators.codecs import decode_avi_mjpeg, encode_avi_mjpeg

    fr = _lossless_frames(9)
    avi = encode_avi_mjpeg(fr, quality=50)
    sub = decode_avi_mjpeg(avi, every=3)
    assert sub.shape[0] == 3
    np.testing.assert_array_equal(sub[2, :, :, 0], fr[6])
    capped = decode_avi_mjpeg(avi, max_frames=2)
    assert capped.shape[0] == 2


def test_avi_structure_is_valid_riff():
    from odc_stac_spark.operators.codecs import encode_avi_mjpeg

    avi = encode_avi_mjpeg(_lossless_frames(3), fps=25, quality=50)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    assert riff_size + 8 == len(avi)
    assert b"MJPG" in avi and b"idx1" in avi and b"00dc" in avi


def test_avi_rejects_non_avi():
    from odc_stac_spark.operators.codecs import decode_avi_mjpeg

    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")


def test_avi_through_video_decoder_seam():
    from odc_stac_spark.operators.codecs import encode_avi_mjpeg
    from odc_stac_spark.operators.multimodal import VIDEO_DECODERS

    fr = _lossless_frames(4, seed=5)
    out = VIDEO_DECODERS["video/x-msvideo"](encode_avi_mjpeg(fr, quality=50))
    assert out.shape[0] == 4
    np.testing.assert_array_equal(out[1, :, :, 0], fr[1])


def test_png_16bit_roundtrip():
    a = rng.integers(0, 65536, (13, 9, 3), dtype=np.uint16)
    out = decode_png(encode_png(a))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, a)


def test_png_16bit_filtered_stream_decodes():
    """External 16-bit PNGs filter over BYTE pairs (bpp = 2*channels):
    hand-build one per the spec and check byte-exact reconstruction."""
    img16 = rng.integers(0, 65536, (8, 6), dtype=np.uint16)
    as_bytes = img16[:, :, None].astype(">u2").view(np.uint8).reshape(8, 12)
    # reuse the 8-bit filter builder at the byte level (c=2 byte lanes)
    png = _png_with_filters(as_bytes.reshape(8, 6, 2), [1, 2, 3, 4])
    # patch IHDR: depth 16, color type 0, width 6
    body = bytearray(png)
    import struct as _s

    ihdr_off = 8 + 8
    body[ihdr_off : ihdr_off + 13] = _s.pack(">IIBBBBB", 6, 8, 16, 0, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + bytes(body[ihdr_off : ihdr_off + 13]))
    body[ihdr_off + 13 : ihdr_off + 17] = _s.pack(">I", crc)
    out = decode_png(bytes(body))
    assert out.dtype == np.uint16 and out.shape == (8, 6, 1)
    np.testing.assert_array_equal(out[:, :, 0], img16)


# ---------------------------------------------------------------------------
# PNG Adam7 interlacing + sub-byte depths (round-7 upgrade)


def _png_hand(w, h, depth, ctype, raw, extra=b""):
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + extra
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_adam7_roundtrip_all_shapes():
    rng = np.random.default_rng(9)
    for shape in [(1, 1), (2, 3), (7, 7), (8, 8), (16, 24, 3), (33, 17, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(img, interlace=True))
        exp = img if img.ndim == 3 else img[:, :, None]
        assert out.shape == exp.shape and (out == exp).all(), shape
    img16 = rng.integers(0, 65536, (13, 9), dtype=np.uint16)
    assert (decode_png(encode_png(img16, interlace=True))[:, :, 0] == img16).all()


def test_png_adam7_pass_structure():
    # interlace flag set in IHDR; decoded pixels match non-interlaced
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    data = encode_png(img, interlace=True)
    assert data[8 + 8 + 12] == 1  # IHDR interlace byte
    assert np.array_equal(decode_png(data), decode_png(encode_png(img)))


def test_png_1bit_gray():
    # hand-built: 1-bit gray, 10×2, samples pack MSB-first (spec §7.2);
    # decoder scales to 0/255
    bits = np.array(
        [[1, 0, 1, 1, 0, 0, 1, 0, 1, 1], [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]], np.uint8
    )
    rows = bytearray()
    for r in range(2):
        packed = bytearray()
        for byte_i in range(2):  # ceil(10/8) = 2 bytes per row
            b = 0
            for k in range(8):
                x = byte_i * 8 + k
                if x < 10:
                    b |= int(bits[r, x]) << (7 - k)
            packed.append(b)
        rows += b"\x00" + bytes(packed)
    out = decode_png(_png_hand(10, 2, 1, 0, bytes(rows)))
    assert out.shape == (2, 10, 1)
    assert np.array_equal(out[:, :, 0], bits * 255)


def test_png_2bit_and_4bit_gray_scaling():
    # 2-bit: values 0..3 scale by 85; 4-bit: 0..15 scale by 17
    vals2 = np.array([[0, 1, 2, 3, 1]], np.uint8)
    packed = bytes([0b00011011, 0b01000000])  # MSB-first, padded
    out = decode_png(_png_hand(5, 1, 2, 0, b"\x00" + packed))
    assert np.array_equal(out[0, :, 0], vals2[0] * 85)
    vals4 = np.array([[0, 15, 7, 12, 3]], np.uint8)
    packed4 = bytes([0x0F, 0x7C, 0x30])
    out4 = decode_png(_png_hand(5, 1, 4, 0, b"\x00" + packed4))
    assert np.array_equal(out4[0, :, 0], vals4[0] * 17)


def test_png_4bit_palette():
    # 4-bit palette indices (the classic small-icon format)
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8
    )

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    rows = bytearray()
    for r in range(2):
        rows += b"\x00" + bytes(
            [(int(idx[r, 0]) << 4) | int(idx[r, 1]), int(idx[r, 2]) << 4]
        )
    png = _png_hand(3, 2, 4, 3, bytes(rows), extra=chunk(b"PLTE", palette.tobytes()))
    out = decode_png(png)
    assert np.array_equal(out, palette[idx])


def test_png_invalid_depth_combo_rejected():
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(_png_hand(2, 1, 4, 2, b"\x00\x00\x00"))  # 4-bit RGB illegal


# ---------------------------------------------------------------------------
# WAV: 24-bit PCM, WAVE_FORMAT_EXTENSIBLE, IMA-ADPCM (round-7)

_PCM_GUID = bytes.fromhex("0100000000001000800000aa00389b71")


def _wav_bytes(fmt_tag, channels, rate, bits, payload, extensible=False,
               block_align=None):
    ba = block_align if block_align is not None else max(1, channels * bits // 8)
    if extensible:
        body = struct.pack("<HHIIHH", 0xFFFE, channels, rate, rate * ba, ba, bits)
        body += struct.pack("<HHI", 22, bits, 0)
        body += struct.pack("<H", fmt_tag) + _PCM_GUID[2:]
    else:
        body = struct.pack("<HHIIHH", fmt_tag, channels, rate, rate * ba, ba, bits)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + len(payload)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(body)) + body
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return out


def test_wav_24bit_pcm():
    from odc_stac_spark.operators.codecs import decode_wav

    vals = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321], np.int32)
    pl = b"".join(int(v).to_bytes(3, "little", signed=True) for v in vals)
    s, r = decode_wav(_wav_bytes(1, 1, 44100, 24, pl))
    assert r == 44100
    np.testing.assert_array_equal(s, vals)
    # stereo interleave
    st = np.array([[1000, -1000], [70000, -70000]], np.int32)
    pl2 = b"".join(int(v).to_bytes(3, "little", signed=True) for v in st.reshape(-1))
    s2, _ = decode_wav(_wav_bytes(1, 2, 48000, 24, pl2))
    np.testing.assert_array_equal(s2, st)


def test_wav_extensible_wraps_pcm_and_float():
    from odc_stac_spark.operators.codecs import decode_wav

    sig = np.array([100, -100, 32000, -32000], np.int16)
    s, r = decode_wav(_wav_bytes(1, 1, 16000, 16, sig.tobytes(), extensible=True))
    assert r == 16000
    np.testing.assert_array_equal(s, sig)
    f = np.array([0.5, -0.25, 1.0], np.float32)
    s2, _ = decode_wav(_wav_bytes(3, 1, 22050, 32, f.tobytes(), extensible=True))
    np.testing.assert_array_equal(s2, f)


def _ima_encode_ref(sig, block_samples=505, channels=1):
    """Independent test-side IMA-ADPCM encoder (the canonical DVI
    algorithm) — returns (payload, block_align, reconstruction)."""
    from odc_stac_spark.operators.codecs import _IMA_INDEX, _IMA_STEPS

    ba = 4 * channels + ((block_samples - 1) // 8) * 4 * channels
    out = bytearray()
    recon = []
    i = 0
    sig = [int(v) for v in sig]
    while i < len(sig):
        blk = sig[i : i + block_samples]
        pred = blk[0]
        idx = 0
        out += struct.pack("<hBB", pred, idx, 0)
        recon.append(pred)
        nibbles = []
        for v in blk[1:]:
            step = _IMA_STEPS[idx]
            delta = v - pred
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            # decoder-side reconstruction
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
            nibbles.append(nib)
            recon.append(pred)
        while len(nibbles) % 8:
            nibbles.append(0)
            # padding nibbles also advance decoder state; track them
            step = _IMA_STEPS[idx]
            diff = step >> 3
            pred = max(-32768, min(32767, pred + diff))
            idx = max(0, min(88, idx + _IMA_INDEX[0]))
            recon.append(pred)
        for k in range(0, len(nibbles), 2):
            out.append(nibbles[k] | (nibbles[k + 1] << 4))
        i += block_samples
    return bytes(out), ba, recon


def test_wav_ima_adpcm_mono():
    from odc_stac_spark.operators.codecs import decode_wav

    t = np.arange(1200)
    sig = (3000 * np.sin(t / 20.0)).astype(np.int16)
    payload, ba, recon = _ima_encode_ref(sig, block_samples=505)
    s, r = decode_wav(_wav_bytes(0x11, 1, 8000, 4, payload, block_align=ba))
    assert r == 8000
    # decoder must track the encoder's state machine EXACTLY
    np.testing.assert_array_equal(s[: len(recon)], np.asarray(recon, np.int16))
    # and the lossy reconstruction stays close to the input
    n = min(len(s), len(sig))
    err = np.abs(s[:n].astype(int) - sig[:n].astype(int))
    assert float(np.mean(err)) < 200


# ---------------------------------------------------------------------------
# BMP 32-bit / paletted / RLE8 + ICO container (round-7)


def _bmp_info(w, h, bpp, comp, n_colors=0):
    return (
        struct.pack("<IiiHHI", 40, w, h, 1, bpp, comp)
        + struct.pack("<III", 0, 0, 0)
        + struct.pack("<II", n_colors, 0)
    )


def test_bmp_32bit_bgra():
    from odc_stac_spark.operators.codecs import decode_bmp

    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    body = _bmp_info(5, 4, 32, 0) + rgba[:, :, [2, 1, 0, 3]][::-1].tobytes()
    bmp = b"BM" + struct.pack("<IHHI", 14 + len(body), 0, 0, 14 + 40) + body
    np.testing.assert_array_equal(decode_bmp(bmp), rgba)


def _paletted_bmp(pal, idx, comp=0, payload=None):
    h, w = idx.shape
    quads = np.zeros((len(pal), 4), np.uint8)
    quads[:, :3] = pal[:, [2, 1, 0]]
    if payload is None:
        stride = w + ((-w) % 4)
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = idx
        payload = rows[::-1].tobytes()
    body = _bmp_info(w, h, 8, comp, len(pal)) + quads.tobytes() + payload
    off = 14 + 40 + len(pal) * 4
    return b"BM" + struct.pack("<IHHI", 14 + len(body), 0, 0, off) + body


def test_bmp_8bit_palette_and_rle8():
    from odc_stac_spark.operators.codecs import decode_bmp

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 7), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(_paletted_bmp(pal, idx)), pal[idx])
    # RLE8: per-row encoded runs + EOL markers + EOB (spec layout)
    rle = bytearray()
    for r in range(6):
        for v in idx[5 - r]:
            rle += bytes([1, int(v)])
        rle += b"\x00\x00"
    rle += b"\x00\x01"
    np.testing.assert_array_equal(
        decode_bmp(_paletted_bmp(pal, idx, comp=1, payload=bytes(rle))), pal[idx]
    )
    # absolute-mode + delta: [abs 3 px][delta +2,+0][run]
    idx2 = np.zeros((2, 8), np.uint8)
    idx2[1, :3] = [1, 2, 3]
    idx2[1, 5:8] = 7
    rle2 = bytes([0, 3, 1, 2, 3, 0]) + bytes([0, 2, 2, 0]) + bytes([3, 7])
    rle2 += b"\x00\x00" + b"\x00\x00" + b"\x00\x01"
    pal2 = np.arange(30, dtype=np.uint8).reshape(10, 3)
    got = decode_bmp(_paletted_bmp(pal2, idx2, comp=1, payload=rle2))
    np.testing.assert_array_equal(got, pal2[idx2])


def test_ico_png_and_bmp_entries():
    from odc_stac_spark.operators.codecs import decode_ico, encode_png

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (10, 13, 3), dtype=np.uint8)
    png = encode_png(img)
    ico = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 1)
        + bytes([13, 10, 0, 0]) + struct.pack("<HHII", 1, 32, len(png), 22)
        + png
    )
    np.testing.assert_array_equal(decode_ico(ico)[:, :, :3], img)
    # BMP-fragment entry: doubled-height info header + AND mask
    frag_px = img[::-1][:, :, ::-1]
    pad = (-3 * 13) % 4
    rows = np.zeros((10, 3 * 13 + pad), np.uint8)
    rows[:, : 3 * 13] = frag_px.reshape(10, -1)
    and_stride = ((13 + 31) // 32) * 4
    frag = (
        struct.pack("<IiiHHI", 40, 13, 20, 1, 24, 0) + b"\x00" * 20
        + rows.tobytes() + b"\x00" * (and_stride * 10)
    )
    ico2 = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 1)
        + bytes([13, 10, 0, 0]) + struct.pack("<HHII", 1, 24, len(frag), 22)
        + frag
    )
    np.testing.assert_array_equal(decode_ico(ico2), img)
    with pytest.raises(ValueError, match="ICO"):
        decode_ico(b"\x00\x00\x02\x00junk")


def test_ico_top_down_bmp_fragment():
    # negative (top-down) fragment height is ALSO doubled; the patch must
    # halve its magnitude or the AND mask decodes as pixel rows
    from odc_stac_spark.operators.codecs import decode_ico

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (10, 13, 3), dtype=np.uint8)
    frag_px = img[:, :, ::-1]  # top-down: rows in natural order, BGR
    pad = (-3 * 13) % 4
    rows = np.zeros((10, 3 * 13 + pad), np.uint8)
    rows[:, : 3 * 13] = frag_px.reshape(10, -1)
    and_stride = ((13 + 31) // 32) * 4
    frag = (
        struct.pack("<IiiHHI", 40, 13, -20, 1, 24, 0) + b"\x00" * 20
        + rows.tobytes() + b"\x00" * (and_stride * 10)
    )
    ico = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 1)
        + bytes([13, 10, 0, 0]) + struct.pack("<HHII", 1, 24, len(frag), 22)
        + frag
    )
    np.testing.assert_array_equal(decode_ico(ico), img)


def test_ico_through_decoder_seam():
    from odc_stac_spark.operators.codecs import encode_png
    from odc_stac_spark.operators.multimodal import DECODERS

    img = np.random.default_rng(6).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    png = encode_png(img)
    ico = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 1)
        + bytes([8, 8, 0, 0]) + struct.pack("<HHII", 1, 32, len(png), 22)
        + png
    )
    np.testing.assert_array_equal(DECODERS["image/x-icon"](ico)[:, :, :3], img)
