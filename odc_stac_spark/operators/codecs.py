"""Real image/audio codecs in pure stdlib + numpy — no PIL, no ffmpeg.

The engine's multimodal seam (operators/multimodal.py DECODERS /
AUDIO_DECODERS) was designed so a real codec drops in without touching any
Spark plumbing. This module provides three genuinely real, dependency-free
codecs and registers them as defaults:

- **PNG** (``image/png``): full decoder for every legal bit depth
  (1/2/4/8/16 — sub-byte samples unpack MSB-first and grays scale to
  the 8-bit range), color types 0/2/3/4/6 (gray, RGB, palette,
  gray+alpha, RGBA), all five scanline filters (None/Sub/Up/Average/
  Paeth — applied per byte with bpp = channels × bytes-per-sample,
  rounded up to one, per spec §9), and Adam7 interlacing (§8.2 — each
  pass unfilters independently then scatters into the grid); plus an
  encoder (filter 0 + zlib; uint16 input → 16-bit big-endian samples;
  ``interlace=True`` writes Adam7). Spec: W3C PNG (ISO/IEC 15948).
- **BMP** (``image/bmp``): 24/32-bit BI_RGB and 8-bit paletted decode
  incl. BI_RLE8 run-length (runs, absolute mode, deltas, EOL/EOB);
  24-bit encode (bottom-up, BGR, 4-byte row padding).
- **ICO** (``image/x-icon``): the favicon container — PNG entries and
  BMP fragments (doubled-height header + AND mask) both decode; the
  largest entry is served.
- **WAV** (``audio/wav``): RIFF/WAVE decode for PCM 8/16/24/32-bit,
  IEEE float32, WAVE_FORMAT_EXTENSIBLE (the pro-audio wrapper — the
  wrapped format tag is read from the SubFormat GUID), and IMA/DVI
  ADPCM (format 0x11, per-block headers + 4-bit nibble state machine),
  any channel count; encoder writes 16-bit PCM.

Reference parity: the reference delegates all media decode to external
native libraries; here the formats most common in web-scraped training
corpora after JPEG are implemented from the public specs so the
decode → feature pipeline is real end-to-end, not a stand-in.

Scale note: decoders run inside Arrow-batched ``mapInPandas`` closures on
executors; they are pure functions of the payload bytes with no shared
state, so they parallelize trivially and the per-row numpy cost is the
same codec cost any native pipeline pays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6, interlace: bool = False) -> bytes:
    """(h, w) or (h, w, c) uint8/uint16 → PNG bytes (filter 0 rows, zlib).
    uint16 input writes a 16-bit-depth PNG (big-endian samples per spec);
    ``interlace=True`` writes Adam7 passes (spec §8.2)."""
    a = np.asarray(arr)
    if a.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"PNG encoder takes uint8 or uint16, got {a.dtype}")
    depth = 8 * a.dtype.itemsize
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in _PNG_COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, _PNG_COLOR_TYPE[c], 0, 0, 1 if interlace else 0
    )
    if depth == 16:
        a = a.astype(">u2")
    passes = (
        [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        if interlace
        else [(0, 0, 1, 1)]
    )
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = a[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        flat = np.ascontiguousarray(sub).reshape(sub.shape[0], -1)
        for r in range(flat.shape[0]):
            raw.append(0)  # filter type None
            raw += flat[r].tobytes()
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters → (h, stride) uint8 of reconstructed bytes.

    Filters per the spec §9: 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth.
    Sub is a per-lane prefix sum mod 256 (uint8 accumulate wraps exactly);
    Up is a vector add; Average/Paeth genuinely depend on the left pixel so
    they walk the row, vectorized across the bpp lane.
    """
    recon = np.zeros((h, stride), np.uint8)
    rowlen = stride + 1
    if len(raw) < h * rowlen:
        raise ValueError("PNG: truncated image data")
    for r in range(h):
        ft = raw[r * rowlen]
        line = np.frombuffer(raw, np.uint8, stride, offset=r * rowlen + 1)
        prev = recon[r - 1] if r else np.zeros(stride, np.uint8)
        if ft == 0:
            recon[r] = line
        elif ft == 1:  # Sub: recon[i] = line[i] + recon[i-bpp]
            lanes = line.reshape(-1, bpp)
            recon[r] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).reshape(-1)
        elif ft == 2:  # Up
            recon[r] = line + prev
        elif ft == 3:  # Average
            out = recon[r]
            prev16 = prev.astype(np.uint16)
            for i in range(0, stride, bpp):
                a = out[i - bpp : i].astype(np.uint16) if i else np.zeros(bpp, np.uint16)
                out[i : i + bpp] = line[i : i + bpp] + ((a + prev16[i : i + bpp]) >> 1).astype(
                    np.uint8
                )
        elif ft == 4:  # Paeth
            out = recon[r]
            prev16 = prev.astype(np.int16)
            for i in range(0, stride, bpp):
                a = out[i - bpp : i].astype(np.int16) if i else np.zeros(bpp, np.int16)
                b = prev16[i : i + bpp]
                cc = prev16[i - bpp : i] if i else np.zeros(bpp, np.int16)
                p = a + b - cc
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
                out[i : i + bpp] = line[i : i + bpp] + pred.astype(np.uint8)
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
    return recon


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8/uint16. Bit depths 1/2/4/8/16, color
    types 0/2/3/4/6, interlaced (Adam7) or not. Chunk CRCs are verified
    (a corrupt stream fails loudly, matching libpng's default)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    palette = None
    trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("PNG: unknown compression/filter method")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG: invalid bit depth {bit_depth}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError(f"PNG: bit depth {bit_depth} invalid for color type {color_type}")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"PNG: invalid color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    sample_dt = np.uint16 if bit_depth == 16 else np.uint8
    img = np.zeros((height, width, channels), sample_dt)
    #: Adam7 pass grid (x0, y0, dx, dy) per spec §8.2; non-interlaced is
    #: a single whole-image pass of the same machinery
    passes = (
        [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        if interlace
        else [(0, 0, 1, 1)]
    )
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes no scanlines at all
        stride = (pw * channels * bit_depth + 7) // 8
        # filters operate on BYTES with bpp = channels × bytes-per-sample,
        # rounded up to one for sub-byte depths (spec §9); 16-bit samples
        # filter as byte pairs
        bpp = max(1, channels * bit_depth // 8)
        recon = _png_unfilter(raw[off : off + ph * (stride + 1)], ph, stride, bpp)
        off += ph * (stride + 1)
        if bit_depth == 16:
            sub = (
                recon.reshape(ph, -1).view(">u2").astype(np.uint16)
                .reshape(ph, pw, channels)
            )
        elif bit_depth == 8:
            sub = recon.reshape(ph, pw, channels)
        else:
            # sub-byte: samples pack MSB-first within each byte (§7.2)
            per = 8 // bit_depth
            shifts = [8 - bit_depth * (k + 1) for k in range(per)]
            cols = [(recon >> s) & ((1 << bit_depth) - 1) for s in shifts]
            sub = (
                np.stack(cols, axis=-1).reshape(ph, -1)[:, : pw * channels]
                .reshape(ph, pw, channels)
            )
        img[y0::dy, x0::dx] = sub
    if color_type == 0 and bit_depth < 8:
        # grayscale sub-byte samples scale to full 8-bit range (libpng
        # presentation: 255/(2^d − 1) is an exact integer for d=1,2,4)
        img = (img * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    if color_type == 3:  # palette -> RGB (plus alpha when tRNS present)
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        rgb = palette[img[:, :, 0]]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: trns.size] = trns
            return np.concatenate([rgb, alpha[img[:, :, 0]][:, :, None]], axis=2)
        return rgb
    return img


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP (bottom-up, BGR, padded rows)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("BMP encoder takes RGB (h, w, 3)")
    pad = (-3 * w) % 4
    rows = bytearray()
    bgr = a[:, :, ::-1]
    for r in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[r].tobytes() + b"\x00" * pad
    pixel_data = bytes(rows)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP → (h, w, 3|4) uint8 RGB(A): 24/32-bit BI_RGB, 8-bit paletted
    (BI_RGB or BI_RLE8 run-length), top-down negative-height files."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, planes, bppx, compression = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    top_down = h < 0
    h = abs(h)
    if bppx == 24 and compression == 0:
        pad = (-3 * w) % 4
        stride = 3 * w + pad
        rows = np.frombuffer(data, np.uint8, stride * h, offset=off).reshape(h, stride)
        img = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return img if top_down else img[::-1].copy()
    if bppx == 32 and compression == 0:
        rows = np.frombuffer(data, np.uint8, 4 * w * h, offset=off).reshape(h, w, 4)
        img = rows[:, :, [2, 1, 0, 3]]  # BGRA -> RGBA
        return img if top_down else img[::-1].copy()
    if bppx == 8:
        # palette sits right after the info header: BGRX quads
        (n_colors,) = struct.unpack_from("<I", data, 14 + 32)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, np.uint8, n_colors * 4, offset=pal_off).reshape(
            -1, 4
        )[:, [2, 1, 0]]
        if compression == 0:
            stride = w + ((-w) % 4)
            rows = np.frombuffer(data, np.uint8, stride * h, offset=off).reshape(
                h, stride
            )
            idx = rows[:, :w]
        elif compression == 1:  # BI_RLE8 (spec: runs, absolute mode, deltas)
            idx = np.zeros((h, w), np.uint8)
            p, x, y = off, 0, 0
            while p + 1 < len(data):
                n, v = data[p], data[p + 1]
                p += 2
                if n > 0:  # encoded run
                    idx[y, x : x + n] = v
                    x += n
                elif v == 0:  # end of line
                    x, y = 0, y + 1
                    if y >= h:
                        break
                elif v == 1:  # end of bitmap
                    break
                elif v == 2:  # delta
                    x += data[p]
                    y += data[p + 1]
                    p += 2
                else:  # absolute mode: v literal pixels, word-aligned
                    idx[y, x : x + v] = np.frombuffer(data, np.uint8, v, offset=p)
                    x += v
                    p += v + (v & 1)
        else:
            raise NotImplementedError(f"BMP: 8-bit compression {compression} not supported")
        img = pal[np.minimum(idx, len(pal) - 1)]
        return img if top_down else img[::-1].copy()
    raise NotImplementedError(
        f"BMP: {bppx}-bit / compression {compression} not supported"
    )


def decode_ico(data: bytes) -> np.ndarray:
    """ICO (favicon) container → largest image as uint8 RGB(A). Entries
    are PNG (modern) or BMP-fragments (an info header with DOUBLED height
    covering the XOR mask + AND mask, no file header) per the public
    Windows format."""
    if data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO stream")
    (count,) = struct.unpack_from("<H", data, 4)
    if count == 0:
        raise ValueError("ICO: no images")
    best = None
    for i in range(count):
        e = data[6 + 16 * i : 6 + 16 * i + 16]
        w, h = e[0] or 256, e[1] or 256
        size, off = struct.unpack_from("<II", e, 8)
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, off, size)
    w, h, off, size = best
    body = data[off : off + size]
    if body[:8] == PNG_SIGNATURE:
        return decode_png(body)
    # BMP fragment: BITMAPINFOHEADER with height = 2 × image height
    # (XOR pixels + AND mask); rebuild a plain BMP with the true height
    hdr_size, bw, bh2, planes, bppx, comp = struct.unpack_from("<IiiHHI", body, 0)
    patched = bytearray(body)
    # height is DOUBLED regardless of sign; a negative (top-down) fragment
    # must halve the magnitude too or the AND mask decodes as pixel rows
    struct.pack_into("<i", patched, 8, bh2 // 2 if bh2 > 0 else -((-bh2) // 2))
    pal_entries = (
        (struct.unpack_from("<I", body, 32)[0] or 256) if bppx == 8 else 0
    )
    pixel_off = 14 + hdr_size + pal_entries * 4
    full = b"BM" + struct.pack("<IHHI", 14 + len(patched), 0, 0, pixel_off)
    return decode_bmp(full + bytes(patched))


# ---------------------------------------------------------------------------
# WAV (RIFF PCM / IEEE float)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples, shape (n,) mono or (n, c) interleaved → PCM WAV."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, c = s.shape
    data = np.ascontiguousarray(s).tobytes()
    fmt = struct.pack("<HHIIHH", 1, c, sample_rate, sample_rate * c * 2, c * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """WAV bytes → (samples, sample_rate). Mono returns shape (n,); multi-
    channel returns (n, c). PCM 8-bit maps to int16 (<<8 centered), 16-bit
    passes through, 32-bit PCM and float32 return their native dtype."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    fmt_body = b""
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
            fmt_body = body
        elif cid == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt[:6]
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE (pro-audio wrapper)
        # cbSize(2) + validBits(2) + channelMask(4) + SubFormat GUID: the
        # first two GUID bytes are the wrapped wFormatTag
        if len(fmt_body) < 26:
            raise ValueError("WAV: truncated EXTENSIBLE fmt chunk")
        audio_format = struct.unpack_from("<H", fmt_body, 24)[0]
    if audio_format == 1:  # PCM
        if bits == 8:
            s = (np.frombuffer(payload, np.uint8).astype(np.int16) - 128) << 8
        elif bits == 16:
            s = np.frombuffer(payload, np.int16)
        elif bits == 24:
            # 3-byte little-endian samples → int32 (sign via arithmetic
            # shift after packing into the top bytes)
            n3 = len(payload) // 3
            b = np.frombuffer(payload, np.uint8, n3 * 3).reshape(-1, 3)
            s = (
                (
                    b[:, 0].astype(np.uint32) << 8
                    | b[:, 1].astype(np.uint32) << 16
                    | b[:, 2].astype(np.uint32) << 24
                ).astype(np.int32)
                >> 8
            )
        elif bits == 32:
            s = np.frombuffer(payload, np.int32)
        else:
            raise NotImplementedError(f"WAV: PCM {bits}-bit not supported")
    elif audio_format == 3 and bits == 32:  # IEEE float
        s = np.frombuffer(payload, np.float32)
    elif audio_format == 0x11:  # IMA ADPCM (DVI), 4-bit
        s = _decode_ima_adpcm(payload, channels, block_align)
        if channels > 1:
            return s, rate  # already (n, c)
        return s.reshape(-1), rate
    else:
        raise NotImplementedError(f"WAV: format {audio_format}/{bits}-bit not supported")
    if channels > 1:
        s = s[: (s.size // channels) * channels].reshape(-1, channels)
    return s, rate


#: IMA-ADPCM step table + index deltas (the public DVI/IMA spec tables)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _decode_ima_adpcm(payload: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (WAV format 0x11): per-block 4-byte channel headers
    (predictor int16, step index, reserved) then interleaved 4-byte
    channel words of eight 4-bit nibbles each."""
    out: list = [[] for _ in range(channels)]
    ba = block_align or len(payload)
    for b0 in range(0, len(payload), ba):
        block = payload[b0 : b0 + ba]
        if len(block) < 4 * channels:
            break
        preds, idxs = [], []
        for c in range(channels):
            pred = struct.unpack_from("<h", block, 4 * c)[0]
            idx = block[4 * c + 2]
            preds.append(pred)
            idxs.append(min(88, idx))
            out[c].append(pred)
        p = 4 * channels
        while p + 4 * channels <= len(block):
            for c in range(channels):
                word = block[p + 4 * c : p + 4 * c + 4]
                for byte in word:
                    for nib in (byte & 0xF, byte >> 4):
                        step = _IMA_STEPS[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            preds[c] -= diff
                        else:
                            preds[c] += diff
                        preds[c] = max(-32768, min(32767, preds[c]))
                        idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX[nib & 7]))
                        out[c].append(preds[c])
            p += 4 * channels
    n = min(len(ch) for ch in out)
    return np.stack([np.asarray(ch[:n], np.int16) for ch in out], axis=-1)


#: Real decoders by media type, ready for multimodal.register_decoder /
#: register_audio_decoder. Kept here (not auto-side-effecting) so importing
#: the codec module has no global effect; multimodal.py installs these as
#: defaults at its module bottom.
IMAGE_CODECS = {"image/png": decode_png, "image/bmp": decode_bmp, "image/x-icon": decode_ico, "image/vnd.microsoft.icon": decode_ico}
AUDIO_CODECS = {"audio/wav": decode_wav, "audio/x-wav": decode_wav}


# ---------------------------------------------------------------------------
# AVI / Motion-JPEG video (RIFF container, one JPEG per frame)
# ---------------------------------------------------------------------------
# Public layout (Microsoft AVI RIFF spec): RIFF('AVI ' LIST('hdrl' avih
# LIST('strl' strh strf)) LIST('movi' '00dc'...) idx1). MJPG streams carry
# one baseline JPEG per '00dc' chunk — with the in-repo JPEG codec this
# makes video decode a real path, not a stub: decode → frame-sample →
# features runs on genuine bytes a stock player accepts.


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(list_type: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 85) -> bytes:
    """Iterable of (h, w) / (h, w, c) uint8 arrays → MJPG AVI bytes."""
    from .jpeg import encode_jpeg

    frames = list(frames)
    if not frames:
        raise ValueError("AVI: need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # µs per frame
        max_size * fps,    # max bytes/sec
        0, 0x10,           # padding, flags (AVIF_HASINDEX)
        n, 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_size, 0xFFFFFFFF, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_payload = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_payload))
        movi_payload += _riff_chunk(b"00dc", j)
    movi = _riff_chunk(b"LIST", movi_payload)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(j))
        for off, j in zip(offsets, jpegs)
    )
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes, every: int = 1, max_frames: int = 0) -> "np.ndarray":
    """MJPG AVI bytes → (n, h, w, c) uint8, sampling every k-th frame.
    Walks the RIFF tree; only '00dc'/'00db' video chunks are decoded, so
    frame-sampling skips the JPEG decode cost of dropped frames."""
    from .jpeg import decode_jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    frames = []
    idx = 0

    def walk(pos: int, end: int):
        nonlocal idx
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc in (b"00dc", b"00db"):
                if idx % every == 0 and (not max_frames or len(frames) < max_frames):
                    frames.append(decode_jpeg(data[body_start : body_start + size]))
                idx += 1
            pos = body_start + size + (size & 1)

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    if not frames:
        raise ValueError("AVI: no video frames found")
    return np.stack(frames)


# ---------------------------------------------------------------------------
# mp4 (ISO Base Media File Format, ISO/IEC 14496-12) with Motion-JPEG
# samples — the dominant video container. The muxer writes a fully valid
# single-track file (ftyp/mdat/moov with the complete stbl sample
# tables); the demuxer walks the box tree and sample tables generically,
# so any single-track MJPEG ('jpeg'/'mjpa') mp4 demuxes natively while
# compressed codecs (avc1/hev1/mp4v...) refuse loudly toward the
# documented ffmpeg seam. Frame decode reuses the in-house JPEG codec.


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _mp4_full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _mp4_box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


_MP4_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_mjpeg(frames, fps: int = 10, quality: int = 85) -> bytes:
    """Iterable of (h, w[, c]) uint8 arrays → MJPEG-in-mp4 bytes."""
    from .jpeg import encode_jpeg

    frames = list(frames)
    if not frames:
        raise ValueError("mp4: need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _mp4_box(b"mdat", b"".join(jpegs))
    first_sample_off = len(ftyp) + 8  # absolute offset of sample 1

    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _mp4_full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", duration)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _MP4_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language "und"
    )
    hdlr = _mp4_full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    # VisualSampleEntry 'jpeg' (QuickTime Motion-JPEG in ISO BMFF)
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)  # SampleEntry: reserved + dref idx
        + struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + _mp4_box(b"jpeg", entry))
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _mp4_full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _mp4_full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = _mp4_full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_full(b"dref", 0, 0, struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b""))
    dinf = _mp4_box(b"dinf", dref)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mp4_h264(frames, fps: int = 10, pcm_every: int = 0) -> bytes:
    """Iterable of grayscale 4x4-lattice (h, w) uint8 arrays → AVC
    (avc1)-in-mp4 bytes. Every sample is its own IDR keyframe encoded by
    the exact-lattice coder (operators/h264.py); SPS/PPS ride in the
    avcC decoder-configuration record, samples are 4-byte-length-prefixed
    slice NALUs — the standard ISO 14496-15 layout."""
    from .h264 import build_pps_rbsp, build_sps_rbsp, encode_h264_gray, escape_rbsp, split_annexb

    frames = list(frames)
    if not frames:
        raise ValueError("mp4: need at least one frame")
    h, w = frames[0].shape[:2]
    samples = []
    for f in frames:
        nals = split_annexb(encode_h264_gray(np.asarray(f), pcm_every=pcm_every))
        idr = next(n for n in nals if (n[0] & 0x1F) == 5)
        samples.append(struct.pack(">I", len(idr)) + idr)
    sps_nal = b"\x67" + escape_rbsp(build_sps_rbsp(w, h))
    pps_nal = b"\x68" + escape_rbsp(build_pps_rbsp())
    avcc = (
        bytes([1, 66, 0, 30, 0xFF, 0xE1])  # ver, profile, compat, level, 4-byte lengths, 1 SPS
        + struct.pack(">H", len(sps_nal)) + sps_nal
        + bytes([1]) + struct.pack(">H", len(pps_nal)) + pps_nal
    )
    n = len(samples)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2avc1mp41")
    mdat = _mp4_box(b"mdat", b"".join(samples))
    first_sample_off = len(ftyp) + 8

    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _mp4_full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", duration)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _MP4_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _mp4_full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + _mp4_box(b"avcC", avcc)
    )
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + _mp4_box(b"avc1", entry))
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _mp4_full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _mp4_full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _mp4_full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_full(b"dref", 0, 0, struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b""))
    dinf = _mp4_box(b"dinf", dref)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mp4_mjpeg_fragmented(
    frames, fps: int = 10, quality: int = 85, frames_per_fragment: int = 2
) -> bytes:
    """Iterable of (h, w[, c]) uint8 arrays → FRAGMENTED MJPEG mp4
    (ISO 14496-12 §8.8 movie fragments: ftyp + moov[mvex/trex, empty
    sample tables] + per-fragment moof[mfhd, traf[tfhd/tfdt/trun]] +
    mdat) — the segmented layout streaming corpora actually contain
    (DASH/CMAF/HLS-fMP4)."""
    from .jpeg import encode_jpeg

    frames = list(frames)
    if not frames:
        raise ValueError("mp4: need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    timescale = 1000
    delta = timescale // fps

    ftyp = _mp4_box(
        b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5iso6mp41"
    )
    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, 0)  # duration unknown (fragments)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _mp4_full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", 0)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _MP4_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, 0) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _mp4_full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + _mp4_box(b"jpeg", entry))
    # fragmented layout: sample tables are EMPTY, samples live in truns
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _mp4_full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _mp4_full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _mp4_full(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_full(b"dref", 0, 0, struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b""))
    minf = _mp4_box(b"minf", vmhd + _mp4_box(b"dinf", dref) + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    trex = _mp4_full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, delta, 0, 0))
    moov = _mp4_box(b"moov", mvhd + trak + _mp4_box(b"mvex", trex))

    out = bytearray(ftyp + moov)
    t = 0
    for seq, frag0 in enumerate(range(0, len(jpegs), frames_per_fragment), start=1):
        chunk = jpegs[frag0 : frag0 + frames_per_fragment]
        k = len(chunk)
        mfhd = _mp4_full(b"mfhd", 0, 0, struct.pack(">I", seq))
        # tfhd flags: 0x020000 default-base-is-moof | 0x08 default-duration
        tfhd = _mp4_full(b"tfhd", 0, 0x020008, struct.pack(">II", 1, delta))
        tfdt = _mp4_full(b"tfdt", 1, 0, struct.pack(">Q", t))
        # trun flags: 0x01 data-offset present | 0x200 sample sizes present.
        # Box sizes are value-independent, so the moof length (and thus the
        # mdat-relative data offset) is computable before assembly.
        trun_payload_len = 8 + 4 * k
        moof_size = 8 + len(mfhd) + 8 + len(tfhd) + len(tfdt) + (12 + trun_payload_len)
        trun = _mp4_full(
            b"trun", 0, 0x000201,
            struct.pack(">Ii", k, moof_size + 8)
            + b"".join(struct.pack(">I", len(j)) for j in chunk),
        )
        traf = _mp4_box(b"traf", tfhd + tfdt + trun)
        moof = _mp4_box(b"moof", mfhd + traf)
        assert len(moof) == moof_size
        out += moof + _mp4_box(b"mdat", b"".join(chunk))
        t += k * delta
    return bytes(out)


def _mp4_children(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        yield btype, pos + hdr, pos + size
        pos += size


def _mp4_find(data: bytes, pos: int, end: int, *path: bytes):
    for btype, b0, b1 in _mp4_children(data, pos, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _mp4_find(data, b0, b1, *path[1:])
    return None


def decode_mp4_mjpeg(data: bytes, every: int = 1, max_frames: int = 0) -> "np.ndarray":
    """MJPEG mp4 bytes → (n, h, w, c) uint8, sampling every k-th frame.
    Generic sample-table walk (stsd/stsz/stsc/stco), so chunk layouts
    other than the muxer's single-chunk one demux too. Non-MJPEG codecs
    refuse loudly (the ffmpeg seam)."""
    from .jpeg import decode_jpeg

    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (mp4) stream")
    n = len(data)
    # find the video track: moov → trak* → mdia → hdlr == vide
    moov = _mp4_find(data, 0, n, b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    stbl = None
    video_track_id = 1
    for btype, b0, b1 in _mp4_children(data, *moov):
        if btype != b"trak":
            continue
        mdia = _mp4_find(data, b0, b1, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _mp4_find(data, b0, b1, b"tkhd")
        if tkhd is not None:
            # track_ID at +12 (version 0: 32-bit times) or +20 (version 1)
            off = 12 if data[tkhd[0]] == 0 else 20
            (video_track_id,) = struct.unpack_from(">I", data, tkhd[0] + off)
        stbl = _mp4_find(data, *mdia, b"minf", b"stbl")
        break
    if stbl is None:
        raise ValueError("mp4: no video track")
    boxes = {t: (b0, b1) for t, b0, b1 in _mp4_children(data, *stbl)}
    for need in (b"stsd", b"stsz", b"stsc", b"stco"):
        if need not in boxes:
            raise ValueError(f"mp4: missing {need.decode()} box")
    sd0 = boxes[b"stsd"][0]
    codec = data[sd0 + 8 + 4 : sd0 + 8 + 8]  # first sample entry fourcc
    avcc = None
    if codec == b"avc1":
        # avcC decoder config: child box after the 78-byte
        # VisualSampleEntry fields (ISO 14496-15 §5.3.4)
        entry0 = sd0 + 8  # stsd payload: ver/flags(4)+count(4), then entry
        (entry_size,) = struct.unpack_from(">I", data, entry0)
        for t2, b0, b1 in _mp4_children(data, entry0 + 8 + 78, entry0 + entry_size):
            if t2 == b"avcC":
                avcc = data[b0:b1]
                break
        if avcc is None:
            raise ValueError("mp4: avc1 entry without avcC record")
    elif codec not in (b"jpeg", b"mjpa", b"MJPG"):
        raise NotImplementedError(
            f"mp4: codec {codec!r} needs ffmpeg; MJPEG ('jpeg'/'mjpa') and "
            "AVC intra ('avc1' — operators/h264.py) demux+decode natively "
            "(operators/multimodal.py ffmpeg seam)"
        )
    z0, _ = boxes[b"stsz"]
    fixed, count = struct.unpack_from(">II", data, z0 + 4)
    sizes = (
        [fixed] * count
        if fixed
        else [struct.unpack_from(">I", data, z0 + 12 + 4 * i)[0] for i in range(count)]
    )
    c0, _ = boxes[b"stco"]
    (nchunks,) = struct.unpack_from(">I", data, c0 + 4)
    chunk_offs = [struct.unpack_from(">I", data, c0 + 8 + 4 * i)[0] for i in range(nchunks)]
    s0, _ = boxes[b"stsc"]
    (nsc,) = struct.unpack_from(">I", data, s0 + 4)
    stsc = [struct.unpack_from(">III", data, s0 + 8 + 12 * i) for i in range(nsc)]

    # expand sample → absolute byte ranges via the chunk map
    spans = []
    si = 0
    for ci in range(nchunks):
        per = next(
            (e[1] for e in reversed(stsc) if e[0] <= ci + 1), stsc[0][1]
        )
        off = chunk_offs[ci]
        for _ in range(per):
            if si >= count:
                break
            spans.append((off, sizes[si]))
            off += sizes[si]
            si += 1

    # movie fragments (ISO 14496-12 §8.8): fMP4/DASH/CMAF segments keep
    # the moov sample tables empty and describe samples in per-fragment
    # moof → traf → trun runs
    trex_size = 0
    mvex = _mp4_find(data, *moov, b"mvex")
    if mvex is not None:
        for t2, t0, _ in _mp4_children(data, *mvex):
            if t2 == b"trex":
                tid, _, _, tsz = struct.unpack_from(">IIII", data, t0 + 4)[:4]
                if tid == video_track_id:
                    trex_size = tsz
    for btype, b0, b1 in _mp4_children(data, 0, n):
        if btype != b"moof":
            continue
        moof_start = b0 - 8
        for t2, t0, t1 in _mp4_children(data, b0, b1):
            if t2 != b"traf":
                continue
            tfhd = _mp4_find(data, t0, t1, b"tfhd")
            if tfhd is None:
                raise ValueError("mp4: traf without tfhd")
            tf_flags = int.from_bytes(data[tfhd[0] : tfhd[0] + 4], "big") & 0xFFFFFF
            q = tfhd[0] + 4
            (track_id,) = struct.unpack_from(">I", data, q)
            q += 4
            base = moof_start
            if tf_flags & 0x01:  # explicit base_data_offset
                (base,) = struct.unpack_from(">Q", data, q)
                q += 8
            if tf_flags & 0x02:
                q += 4  # sample-description-index
            if tf_flags & 0x08:
                q += 4  # default-sample-duration
            def_size = trex_size
            if tf_flags & 0x10:
                (def_size,) = struct.unpack_from(">I", data, q)
                q += 4
            if track_id != video_track_id:
                continue
            cur = None
            for t3, u0, u1 in _mp4_children(data, t0, t1):
                if t3 != b"trun":
                    continue
                tr_flags = int.from_bytes(data[u0 : u0 + 4], "big") & 0xFFFFFF
                q2 = u0 + 4
                (cnt,) = struct.unpack_from(">I", data, q2)
                q2 += 4
                if tr_flags & 0x01:
                    (doff,) = struct.unpack_from(">i", data, q2)
                    q2 += 4
                    cur = base + doff
                elif cur is None:
                    cur = base  # no offset: data starts at the base
                if tr_flags & 0x04:
                    q2 += 4  # first-sample-flags
                for _ in range(cnt):
                    if tr_flags & 0x100:
                        q2 += 4  # duration
                    size = def_size
                    if tr_flags & 0x200:
                        (size,) = struct.unpack_from(">I", data, q2)
                        q2 += 4
                    if tr_flags & 0x400:
                        q2 += 4  # flags
                    if tr_flags & 0x800:
                        q2 += 4  # composition offset
                    if size == 0:
                        raise ValueError("mp4: fragment sample with no size")
                    spans.append((cur, size))
                    cur += size
    if avcc is not None:
        from .h264 import decode_avcc_frame, yuv420_to_rgb

        def _decode(sample: bytes) -> np.ndarray:
            return yuv420_to_rgb(*decode_avcc_frame(avcc, sample))

    else:
        _decode = decode_jpeg
    frames = []
    for i, (off, sz) in enumerate(spans):
        if i % every == 0 and (not max_frames or len(frames) < max_frames):
            frames.append(_decode(data[off : off + sz]))
    if not frames:
        raise ValueError("mp4: no video frames found")
    return np.stack(frames)
