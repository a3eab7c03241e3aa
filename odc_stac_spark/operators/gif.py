"""From-scratch GIF codec (GIF87a/GIF89a) — pure stdlib + numpy.

GIF remains ubiquitous in web-scraped corpora (icons, memes, short
animations); the reference reads it via PIL/GDAL. Implemented from the
public spec (CompuServe GIF89a, 1990):

decoder
  - logical screen descriptor, global + local color tables
  - variable-width LZW (clear/EOI codes, width growth to 12 bits,
    4096-entry cap, sub-block reassembly)
  - row interlacing (the 4-pass 8/8/4/2 scheme)
  - GIF89a extensions: graphic control (transparency index, frame delay,
    disposal methods 0-3 incl. restore-to-background and
    restore-to-previous), NETSCAPE looping, comments (skipped)
  - full animation compositing: ``decode_gif`` returns the first
    composited frame (the image seam), ``decode_gif_frames`` returns
    (n, h, w, 4) RGBA with per-frame delays (the video seam — GIF *is*
    a video format for sampling purposes)

encoder (fixtures / round-trip tests)
  - ≤256-color palette built across all frames, optional transparency,
    animation with per-frame delays + loop extension, LZW with mid-frame
    dictionary resets at the 4096 cap

Evidence discipline: own-writer round trips on arbitrary paletted
content (incl. streams crossing every LZW width boundary and the 4096
reset), PLUS the classic externally-encoded 1×1 transparent GIF golden
(a real foreign encoder's bitstream) in tests/test_gif.py.

Scale note: like every codec here, decode runs inside Arrow-batched
``mapInPandas`` closures on executors — a pure function of the blob.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

_MAX_CODES = 4096


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first, clear/EOI)
# ---------------------------------------------------------------------------


def lzw_decode_gif(data: bytes, min_code_size: int) -> bytes:
    """Concatenated sub-block payload → index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: Optional[bytes] = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated: tolerate missing EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first LZW code out of range")
            entry = table[code]
            out += entry
            prev = entry
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF: LZW code out of range")
        out += entry
        if len(table) < _MAX_CODES:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def lzw_encode_gif(indices: bytes, min_code_size: int) -> bytes:
    """Index stream → LZW bytes (caller wraps into ≤255-byte sub-blocks)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    emit(clear, width)
    codes = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    seq = b""
    for b in indices:
        cand = seq + bytes([b])
        if cand in codes:
            seq = cand
            continue
        emit(codes[seq], width)
        if next_code < _MAX_CODES:
            codes[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            codes = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        seq = bytes([b])
    if seq:
        emit(codes[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


#: interlace pass row starts/strides (spec appendix E)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        cnt = len(range(start, h, step))
        out[start::step] = rows[src : src + cnt]
        src += cnt
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    parts = [rows[start::step] for start, step in _INTERLACE_PASSES]
    return np.concatenate(parts, axis=0) if h else rows


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_gif_frames(
    data: bytes, every: int = 1, max_frames: int = 0
) -> Tuple[np.ndarray, List[int]]:
    """GIF bytes → ((n, h, w, 4) uint8 RGBA composited frames,
    per-kept-frame delays in centiseconds). ``every``/``max_frames``
    mirror the AVI/mp4 video decoders (all frames still composite —
    GIF frames are deltas — but only every k-th is kept)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, offset=pos).reshape(-1, 3)
        pos += n * 3
    canvas = np.zeros((sh, sw, 4), np.uint8)  # transparent black
    frames: List[np.ndarray] = []
    delays: List[int] = []
    transparent: Optional[int] = None
    disposal = 0
    delay = 0
    idx_out = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = data[pos]
                gpacked = data[pos + 1]
                delay = struct.unpack_from("<H", data, pos + 2)[0]
                tidx = data[pos + 4]
                disposal = (gpacked >> 2) & 0x07
                transparent = tidx if gpacked & 0x01 else None
                pos += 1 + sz
                if data[pos] != 0:
                    raise ValueError("GIF: unterminated graphic control")
                pos += 1
            else:  # application / comment / plain text: skip sub-blocks
                while data[pos]:
                    pos += 1 + data[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(data, np.uint8, n * 3, offset=pos).reshape(-1, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF: image without any color table")
        min_code = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos]:
            ln = data[pos]
            payload += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx_stream = lzw_decode_gif(bytes(payload), min_code)
        if len(idx_stream) < fw * fh:
            raise ValueError("GIF: truncated LZW index stream")
        idx = np.frombuffer(idx_stream[: fw * fh], np.uint8).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF: color index out of table range")
        prev_rect = canvas[top : top + fh, left : left + fw].copy()
        rgba = np.concatenate(
            [table[idx], np.full((fh, fw, 1), 255, np.uint8)], axis=2
        )
        if transparent is not None:
            mask = idx == transparent
            rgba[mask] = canvas[top : top + fh, left : left + fw][mask]
        canvas[top : top + fh, left : left + fw] = rgba
        if idx_out % max(1, every) == 0:
            frames.append(canvas.copy())
            delays.append(delay)
            if max_frames and len(frames) >= max_frames:
                break
        idx_out += 1
        # disposal AFTER presenting the frame
        if disposal == 2:  # restore to background (transparent)
            canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3:  # restore to previous
            canvas[top : top + fh, left : left + fw] = prev_rect
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return np.stack(frames), delays


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → first composited frame: (h, w, 3) uint8, or (h, w, 4)
    when transparency survives compositing (the image-seam entry)."""
    frames, _ = decode_gif_frames(data, max_frames=1)
    f = frames[0]
    if bool((f[:, :, 3] != 255).any()):
        return f
    return np.ascontiguousarray(f[:, :, :3])


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_gif(
    frames,
    delays: Optional[List[int]] = None,
    loop: int = 0,
    transparent_color: Optional[Tuple[int, int, int]] = None,
    interlace: bool = False,
) -> bytes:
    """One (h, w, 3) uint8 frame or a list of same-shaped frames → GIF.
    A single global palette is built across all frames (≤256 distinct
    colors required — this is a palette format). ``delays`` are
    per-frame centiseconds (animation implies the NETSCAPE loop block);
    ``transparent_color`` maps that exact RGB to a transparent index."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("GIF encoder takes (h, w, 3) uint8 frames of one size")
    allpix = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(
        allpix.view([("", np.uint8)] * 3), return_inverse=True
    )
    palette = colors.view(np.uint8).reshape(-1, 3)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <= 256 distinct colors, got {len(palette)}")
    tr_idx = None
    if transparent_color is not None:
        want = np.asarray(transparent_color, np.uint8)
        hit = np.where((palette == want).all(axis=1))[0]
        if hit.size == 0:
            raise ValueError("transparent_color not present in any frame")
        tr_idx = int(hit[0])
    depth = max(1, int(len(palette) - 1).bit_length())
    # the table stores 2^(n_field+1) entries, n_field in 0..7
    n_field = max(0, depth - 1)
    gct_size = 2 << n_field
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n_field << 4) | n_field, 0, 0)
    pal = np.zeros((gct_size, 3), np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    animated = len(frames) > 1
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    inv = inverse.reshape(len(frames), h, w).astype(np.uint8)
    for fi in range(len(frames)):
        if animated or tr_idx is not None:
            delay = (delays[fi] if delays else 10) if animated else 0
            gpacked = 0x01 if tr_idx is not None else 0x00
            out += b"\x21\xf9\x04" + bytes([gpacked]) + struct.pack("<H", delay)
            out += bytes([tr_idx or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, (0x40 if interlace else 0)
        )
        idx = inv[fi]
        if interlace:
            idx = _interlace(idx)
        min_code = max(2, depth)
        out += bytes([min_code])
        out += _subblocks(lzw_encode_gif(idx.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)
