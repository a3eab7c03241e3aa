"""From-scratch WebP lossless (VP8L) codec — RFC 9649, pure stdlib + numpy.

WebP is the third most common image format in web-scraped training corpora
(after JPEG/PNG) and the TIFF ``Compression=50001`` payload GDAL writes for
modern 8-bit COGs; the reference reads both through native libraries
(rasterio/GDAL — ``/root/reference/odc/stac/loader/_rio.py:374-475``).
This module implements the LOSSLESS half of the format (VP8L bitstream,
RFC 9649 §3) entirely from the public spec:

decoder (full profile)
  - RIFF/WEBP container walk (plain ``VP8L`` and extended ``VP8X`` files);
    lossy ``VP8 `` payloads dispatch to the RFC 6386 keyframe decoder in
    ``operators/vp8.py``
  - canonical prefix codes: "simple" (1-2 symbol) and normal
    (code-length-coded with 16/17/18 repeat codes, limited max_symbol)
  - meta prefix codes (entropy image) selecting per-tile code groups
  - color cache (hash 0x1e35a7bd, 1..11 bits) interleaved with decode
  - LZ77 backward references: length/distance prefix+extra-bits coding
    and the 120-entry 2D distance-to-neighbour mapping
  - all four transforms, inverted in reverse bitstream order:
    predictor (14 modes), cross-color, subtract-green, and color
    indexing incl. sub-byte pixel bundling (1/2/4-bit packed indices)

encoder (lossless, used for fixtures / TIFF 50001 tiles)
  - subtract-green + greedy LZ77 (distance 1 / row-above runs) +
    per-alphabet canonical Huffman, single code group
  - optional forward transforms (predictor / cross-color / palette /
    color cache) so round-trip tests drive every decoder path on
    arbitrary content — the same own-writer + hand-assembled-golden
    discipline sources/netcdf.py and sources/hdf5.py follow

Being exactly lossless, the full bitstream is SQL-verifiable: the
``mm_image_webp_codec`` query hash-gates encode → Arrow → decode → stats
against a first-principles DuckDB pixel oracle, and ``r_webp_cog_zonal``
gates the TIFF Compression=50001 tile path end-to-end.

Scale note: codecs run inside Arrow-batched ``mapInPandas`` closures on
executors — pure functions of the payload bytes, trivially parallel.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# constants (RFC 9649 §3)
# ---------------------------------------------------------------------------

VP8L_SIGNATURE = 0x2F
_MAX_CACHE_BITS = 11
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_CODE_LENGTH_CODES = 19
#: order in which code-length-code lengths are stored (RFC 9649 §3.7.1.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _make_distance_map() -> List[Tuple[int, int]]:
    """The 120 closest (dx, dy) neighbour offsets, in the spec's order:
    ascending euclidean distance, ties by |dx| then positive dx first
    (RFC 9649 §3.6.2.3 lists the table explicitly; this generates it from
    its ordering rule — the known prefix/suffix entries are asserted in
    tests/test_webp.py)."""
    cand = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cand[:120]


_DISTANCE_MAP = _make_distance_map()
#: (dx, dy) -> 1-based distance code, for the encoder
_DISTANCE_MAP_INV = {off: i + 1 for i, off in enumerate(_DISTANCE_MAP)}


# ---------------------------------------------------------------------------
# bit I/O (LSB-first, per spec)
# ---------------------------------------------------------------------------


class BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # absolute bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p, out, got = self.pos, 0, 0
        data = self.data
        while got < n:
            byte = data[p >> 3] if (p >> 3) < len(data) else 0
            avail = 8 - (p & 7)
            take = min(avail, n - got)
            out |= ((byte >> (p & 7)) & ((1 << take) - 1)) << got
            got += take
            p += take
        self.pos = p
        return out


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """n bits of value, LSB first."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits: canonical code MSB-first into the LSB-first
        stream (same convention as DEFLATE)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths) -> Dict[int, Tuple[int, int]]:
    """lengths[sym] -> {sym: (code, len)} with DEFLATE-style canonical
    assignment (shorter codes first, then by symbol)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes, code, prev_len = {}, 0, 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixDecoder:
    """Flat-LUT decoder: index by the next ``maxlen`` stream bits
    (LSB-first ⇒ bit-reversed canonical codes, as in DEFLATE)."""

    __slots__ = ("table", "maxlen", "single")

    def __init__(self, lengths):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("webp: empty prefix code")
        if len(nz) == 1:
            # degenerate: zero bits per symbol
            self.single = nz[0][0]
            self.table = None
            self.maxlen = 0
            return
        self.single = None
        maxlen = max(l for _, l in nz)
        if maxlen > 15:
            raise ValueError("webp: code length > 15")
        # completeness check (Kraft sum must be exactly 1)
        kraft = sum(1 << (maxlen - l) for _, l in nz)
        if kraft != (1 << maxlen):
            raise ValueError("webp: invalid (incomplete/oversubscribed) prefix code")
        self.maxlen = maxlen
        table = np.zeros(1 << maxlen, dtype=np.uint32)
        codes = _canonical_codes(lengths)
        for s, (code, l) in codes.items():
            rev = int(f"{code:0{l}b}"[::-1], 2)
            step = 1 << l
            entry = (s << 4) | l
            table[rev::step] = entry
        self.table = table

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        # peek maxlen bits without committing
        p = br.pos
        chunk = 0
        data = br.data
        base = p >> 3
        for i in range(((p & 7) + self.maxlen + 7) >> 3):
            b = data[base + i] if base + i < len(data) else 0
            chunk |= b << (8 * i)
        idx = (chunk >> (p & 7)) & ((1 << self.maxlen) - 1)
        entry = int(self.table[idx])
        l = entry & 0xF
        if l == 0:
            raise ValueError("webp: invalid prefix code bits")
        br.pos = p + l
        return entry >> 4


# ---------------------------------------------------------------------------
# reading prefix codes from the stream (§3.7.1)
# ---------------------------------------------------------------------------


def _read_prefix_code(br: BitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 == sym1:
                raise ValueError("webp: duplicate symbol in simple code")
            # spec: code 0 is the FIRST symbol read, code 1 the second
            # (read order, NOT canonical-by-symbol order)
            dec = _PrefixDecoder.__new__(_PrefixDecoder)
            dec.single = None
            dec.maxlen = 1
            dec.table = np.array(
                [(sym0 << 4) | 1, (sym1 << 4) | 1], dtype=np.uint32
            )
            return dec
        dec = _PrefixDecoder.__new__(_PrefixDecoder)
        dec.single = sym0  # single-symbol code reads 0 bits
        dec.table = None
        dec.maxlen = 0
        return dec
    # normal: code-length-coded lengths
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * _CODE_LENGTH_CODES
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8  # spec default
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = cl_dec.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("webp: code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixDecoder(lengths)


def _lz77_value(sym: int, br: BitReader) -> int:
    """Length/distance prefix symbol -> value (§3.6.2.2)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_symbol(value: int) -> Tuple[int, int, int]:
    """value -> (prefix symbol, extra_bits_value, extra_bits_count);
    inverse of :func:`_lz77_value`."""
    if value <= 4:
        return value - 1, 0, 0
    u = value - 1  # in [(2+b)<<extra, ...): u = offset + extra_val
    extra = u.bit_length() - 2
    b = (u >> extra) & 1
    offset = (2 + b) << extra
    return 2 * extra + 2 + b, u - offset, extra


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DISTANCE_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# spatially-coded image decode (§3.7.2)
# ---------------------------------------------------------------------------


def _cache_hash(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_image_stream(
    br: BitReader, xsize: int, ysize: int, is_level0: bool
) -> np.ndarray:
    """Decode one ARGB image stream (the main image when ``is_level0``,
    else a transform/entropy sub-image) -> uint32 array (ysize, xsize)
    holding a<<24|r<<16|g<<8|b."""
    transforms: List[tuple] = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("webp: duplicate transform")
            seen.add(ttype)
            xsize_t = xsize
            if ttype == 0 or ttype == 1:  # predictor / cross-color
                size_bits = br.read(3) + 2
                bs = 1 << size_bits
                sub = _decode_image_stream(
                    br, (xsize_t + bs - 1) >> size_bits,
                    (ysize + bs - 1) >> size_bits, False,
                )
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append((2,))
            else:  # color indexing
                n_colors = br.read(8) + 1
                palette = _decode_image_stream(br, n_colors, 1, False)[0]
                # palette entries are delta-coded per channel
                pal = palette.view(np.uint8).reshape(-1, 4)
                pal = np.cumsum(pal.astype(np.uint16), axis=0).astype(np.uint8)
                palette = pal.copy().view(np.uint32).reshape(-1)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, palette, xsize))
                xsize = (xsize + (1 << width_bits) - 1) >> width_bits
    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= _MAX_CACHE_BITS):
            raise ValueError(f"webp: invalid color cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix codes (main image only)
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image_stream(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, _NUM_DISTANCE_CODES)
        groups.append((g, r, b, a, d))

    npix = xsize * ysize
    out = np.zeros(npix, dtype=np.uint32)
    pos = 0
    gcode, rcode, bcode, acode, dcode = groups[0]
    cur_meta_row = -1
    meta_row = None
    while pos < npix:
        if meta is not None:
            y, x = pos // xsize, pos % xsize
            my = y >> meta_bits
            if my != cur_meta_row:
                meta_row = meta[my]
                cur_meta_row = my
            gcode, rcode, bcode, acode, dcode = groups[int(meta_row[x >> meta_bits])]
        s = gcode.read(br)
        if s < 256:
            red = rcode.read(br)
            blue = bcode.read(br)
            alpha = acode.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _lz77_value(s - 256, br)
            dist_sym = dcode.read(br)
            dist = _plane_code_to_distance(xsize, _lz77_value(dist_sym, br))
            if dist > pos or pos + length > npix:
                raise ValueError("webp: LZ77 reference out of bounds")
            if cache is not None:
                for _ in range(length):
                    px = int(out[pos - dist])
                    out[pos] = px
                    cache[_cache_hash(px, cache_bits)] = px
                    pos += 1
            elif dist >= length:
                out[pos : pos + length] = out[pos - dist : pos - dist + length]
                pos += length
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
        else:
            if cache is None:
                raise ValueError("webp: cache symbol without color cache")
            px = cache[s - 256 - _NUM_LENGTH_CODES]
            out[pos] = px
            pos += 1
    img = out.reshape(ysize, xsize)
    # apply inverse transforms in reverse reading order
    for t in reversed(transforms):
        if t[0] == 3:
            img = _inv_color_index(img, t[1], t[2], t[3])
        elif t[0] == 2:
            img = _inv_subtract_green(img)
        elif t[0] == 1:
            img = _inv_color_transform(img, t[1], t[2])
        else:
            img = _inv_predictor(img, t[1], t[2])
    return img


# ---------------------------------------------------------------------------
# inverse transforms (§3.5)
# ---------------------------------------------------------------------------


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    ch = img.view(np.uint8).reshape(img.shape[0], img.shape[1], 4)
    # little-endian uint32 -> byte order b, g, r, a
    g = ch[:, :, 1].astype(np.uint16)
    ch = ch.copy()
    ch[:, :, 0] = ((ch[:, :, 0] + g) & 0xFF).astype(np.uint8)
    ch[:, :, 2] = ((ch[:, :, 2] + g) & 0xFF).astype(np.uint8)
    return ch.view(np.uint32).reshape(img.shape)


def _inv_color_index(
    img: np.ndarray, width_bits: int, palette: np.ndarray, out_width: int
) -> np.ndarray:
    h = img.shape[0]
    idx = ((img >> 8) & 0xFF).astype(np.uint32)
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits
        cols = []
        for k in range(per):
            cols.append((idx >> (k * bits)) & ((1 << bits) - 1))
        idx = np.stack(cols, axis=-1).reshape(h, -1)[:, :out_width]
    n = len(palette)
    safe = np.where(idx < n, idx, 0)
    out = palette[safe]
    out[idx >= n] = 0  # out-of-range palette index -> transparent black
    return out


def _inv_color_transform(img: np.ndarray, size_bits: int, sub: np.ndarray) -> np.ndarray:
    h, w = img.shape
    ch = img.view(np.uint8).reshape(h, w, 4).copy()  # b, g, r, a
    by = np.arange(h) >> size_bits
    bx = np.arange(w) >> size_bits
    cte = sub[np.ix_(by, bx)]  # uint32 per pixel
    g2r = (cte & 0xFF).astype(np.int8).astype(np.int32)  # blue channel
    g2b = ((cte >> 8) & 0xFF).astype(np.int8).astype(np.int32)  # green channel
    r2b = ((cte >> 16) & 0xFF).astype(np.int8).astype(np.int32)  # red channel
    g = ch[:, :, 1].astype(np.int8).astype(np.int32)
    red = (ch[:, :, 2].astype(np.int32) + ((g2r * g) >> 5)) & 0xFF
    ch[:, :, 2] = red.astype(np.uint8)
    rs = red.astype(np.uint8).astype(np.int8).astype(np.int32)
    blue = (ch[:, :, 0].astype(np.int32) + ((g2b * g) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    ch[:, :, 0] = blue.astype(np.uint8)
    return ch.view(np.uint32).reshape(h, w)


def _avg2(a: int, b: int) -> int:
    # per-channel (a+b)>>1 on packed ARGB
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (0, 8, 16, 24):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << shift
    return out


def _clamp_add_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for shift in (0, 8, 16, 24):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        v = a + int((a - b) / 2)  # C truncation toward zero
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << shift
    return out


def _select(t: int, l: int, tl: int) -> int:
    pa = pb = 0
    for shift in (0, 8, 16, 24):
        tc = (t >> shift) & 0xFF
        lc = (l >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        p = tc + lc - tlc
        pa += abs(p - tc)
        pb += abs(p - lc)
    return t if pa <= pb else l


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_full(l, t, tl)
    if mode == 13:
        return _clamp_add_half(l, t, tl)
    raise ValueError(f"webp: invalid predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    # per-channel modular addition on packed ARGB
    out = 0
    for shift in (0, 8, 16, 24):
        out |= (((residual >> shift) + (pred >> shift)) & 0xFF) << shift
    return out


def _inv_predictor(img: np.ndarray, size_bits: int, sub: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.astype(np.uint32).copy()
    modes = ((sub >> 8) & 0xFF).astype(np.int64)
    for y in range(h):
        mrow = modes[y >> size_bits]
        for x in range(w):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # mode 1 (L) forced on first row
            elif x == 0:
                pred = int(out[y - 1, 0])  # mode 2 (T) forced on first col
            else:
                mode = int(mrow[x >> size_bits])
                l = int(out[y, x - 1])
                t = int(out[y - 1, x])
                tl = int(out[y - 1, x - 1])
                # TR of the rightmost column is the leftmost pixel of the
                # SAME row (RFC 9649 §3.5.1 — the rows-in-one-buffer rule)
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                pred = _predict(mode, l, t, tl, tr)
            out[y, x] = _add_pixels(int(out[y, x]), pred)
    return out


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def decode_vp8l(data: bytes) -> np.ndarray:
    """Raw VP8L bitstream -> (h, w, 3|4) uint8 (alpha kept only when the
    header's alpha-hint is set or any pixel is non-opaque)."""
    if not data or data[0] != VP8L_SIGNATURE:
        raise ValueError("webp: bad VP8L signature")
    br = BitReader(data, pos=8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"webp: unsupported VP8L version {version}")
    img = _decode_image_stream(br, w, h, True)
    ch = img.view(np.uint8).reshape(h, w, 4)  # b, g, r, a (little-endian)
    rgba = ch[:, :, [2, 1, 0, 3]]
    if alpha_hint or bool((rgba[:, :, 3] != 255).any()):
        return np.ascontiguousarray(rgba)
    return np.ascontiguousarray(rgba[:, :, :3])


def decode_webp(data: bytes) -> np.ndarray:
    """WebP file (RIFF container) or raw VP8L stream -> uint8 array."""
    if data[:1] == bytes([VP8L_SIGNATURE]):
        return decode_vp8l(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(payload)
        if fourcc == b"VP8 ":
            # lossy half: RFC 6386 keyframe decoder (operators/vp8.py)
            from .vp8 import decode_vp8

            return decode_vp8(payload)
        # VP8X / ALPH / ICCP / EXIF / XMP / ANIM: keep walking for VP8L
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk found")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: Dict[int, int], maxlen: int = 15) -> Dict[int, int]:
    """Frequency map -> optimal length-limited code lengths via
    package-merge (Larmore-Hirschberg). Always yields a COMPLETE code
    (Kraft sum exactly 1), which the strict decoder requires."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    n = len(syms)
    if n == 0:
        return {}
    if n == 1:
        return {syms[0]: 1}
    if n > (1 << maxlen):
        raise ValueError("webp: alphabet larger than 2^maxlen")
    leaves = sorted((freqs[s], s, (s,)) for s in syms)
    p: List[tuple] = list(leaves)
    for _ in range(maxlen - 1):
        packaged = [
            (
                p[i][0] + p[i + 1][0],
                min(p[i][1], p[i + 1][1]),
                p[i][2] + p[i + 1][2],
            )
            for i in range(0, len(p) - 1, 2)
        ]
        p = sorted(packaged + leaves)
    depths = {s: 0 for s in syms}
    for item in p[: 2 * n - 2]:
        for s in item[2]:
            depths[s] += 1
    return depths


def _write_prefix_code(bw: BitWriter, lengths_map: Dict[int, int], alphabet: int):
    """Emit one prefix code (simple when possible, else code-length coded).
    Returns {sym: (code, len)} for subsequent symbol writes."""
    syms = sorted(lengths_map)
    if len(syms) == 0:
        # unused code: simple, 1 symbol = 0
        bw.write(1, 1)
        bw.write(0, 1)  # num_symbols - 1 = 0
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(0, 1)  # symbol 0
        return {0: (0, 0)}
    if len(syms) == 1 and syms[0] <= 255:
        s = syms[0]
        bw.write(1, 1)
        bw.write(0, 1)
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
        return {s: (0, 0)}
    if len(syms) == 2 and syms[0] <= 255 and syms[1] <= 255:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        s0, s1 = syms
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # normal code
    lengths = [0] * alphabet
    for s, l in lengths_map.items():
        lengths[s] = max(l, 1)
    if len(lengths_map) == 1:
        # a 1-symbol code can't be complete under normal coding: pad with a
        # dummy partner (never emitted) so both get length 1
        only = next(iter(lengths_map))
        lengths[0 if only != 0 else 1] = 1
        lengths[only] = 1
    bw.write(0, 1)
    # serialize lengths with the code-length code (16/17/18 repeats)
    cl_syms: List[Tuple[int, int, int]] = []  # (cl symbol, extra value, extra bits)
    i = 0
    n = alphabet
    # trim trailing zeros (decoder fills the rest with 0 when max_symbol used;
    # we always emit the whole alphabet for simplicity)
    prev_nz = 8
    while i < n:
        l = lengths[i]
        if l == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                cl_syms.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                cl_syms.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                cl_syms.append((0, 0, 0))
            i += run
        else:
            run = 1
            while i + run < n and lengths[i + run] == l:
                run += 1
            left = run
            cl_syms.append((l, 0, 0))  # first occurrence literal
            left -= 1
            if l == prev_nz:
                # can't use 16 immediately after a different prev? 16 repeats
                # the PREVIOUS emitted nonzero length, which is l only after
                # we emit the literal above — safe either way since we just
                # emitted l
                pass
            while left >= 3:
                take = min(left, 6)
                cl_syms.append((16, take - 3, 2))
                left -= take
            for _ in range(left):
                cl_syms.append((l, 0, 0))
            prev_nz = l
            i += run
    cl_freq: Dict[int, int] = {}
    for s, _, _ in cl_syms:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, maxlen=7)
    if len(cl_lengths) == 1:
        ((only, _),) = cl_lengths.items()
        cl_lengths = {only: 1}
        # a 1-entry code can't be canonical-complete; add a dummy partner
        partner = 0 if only != 0 else 1
        cl_lengths[partner] = 1
    full_cl = [0] * _CODE_LENGTH_CODES
    for s, l in cl_lengths.items():
        full_cl[s] = l
    bw.write(15, 4)  # num_code_lengths = 19
    for s in _CL_ORDER:
        bw.write(full_cl[s], 3)
    bw.write(0, 1)  # no max_symbol
    cl_codes = _canonical_codes(full_cl)
    for s, ev, eb in cl_syms:
        code, l = cl_codes[s]
        bw.write_code(code, l)
        if eb:
            bw.write(ev, eb)
    codes = _canonical_codes(lengths)
    return codes


def _forward_predictor(rgba: np.ndarray, mode: int, size_bits: int) -> np.ndarray:
    """Apply the forward predictor transform with a single fixed mode
    (test/fixture path — exercises the decoder's inverse)."""
    h, w, _ = rgba.shape
    packed = _pack_argb(rgba)
    res = packed.copy()
    for y in range(h - 1, -1, -1):
        for x in range(w - 1, -1, -1):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(packed[0, x - 1])
            elif x == 0:
                pred = int(packed[y - 1, 0])
            else:
                l = int(packed[y, x - 1])
                t = int(packed[y - 1, x])
                tl = int(packed[y - 1, x - 1])
                tr = int(packed[y - 1, x + 1]) if x + 1 < w else int(packed[y, 0])
                pred = _predict(mode, l, t, tl, tr)
            out = 0
            cur = int(packed[y, x])
            for shift in (0, 8, 16, 24):
                out |= (((cur >> shift) - (pred >> shift)) & 0xFF) << shift
            res[y, x] = out
    return res


def _pack_argb(rgba: np.ndarray) -> np.ndarray:
    h, w, c = rgba.shape
    ch = np.zeros((h, w, 4), np.uint8)  # b, g, r, a little-endian
    ch[:, :, 0] = rgba[:, :, 2]
    ch[:, :, 1] = rgba[:, :, 1]
    ch[:, :, 2] = rgba[:, :, 0]
    ch[:, :, 3] = rgba[:, :, 3] if c == 4 else 255
    return ch.view(np.uint32).reshape(h, w)


def encode_vp8l(
    arr: np.ndarray,
    use_lz77: bool = True,
    cache_bits: int = 0,
    predictor: Optional[int] = None,
    cross_color: Optional[Tuple[int, int, int]] = None,
    palette: bool = False,
    subtract_green: bool = True,
) -> bytes:
    """(h, w[, c]) uint8 -> raw VP8L bitstream (always lossless).

    The default profile is subtract-green + greedy LZ77 + canonical
    Huffman. ``predictor=<mode>`` / ``cross_color=(g2r, g2b, r2b)`` /
    ``palette=True`` / ``cache_bits=n`` additionally apply those
    transforms (single global block) so round-trip tests drive every
    decoder path; they compose like the real encoder's transform chain.
    """
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("webp: only uint8 input")
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim == 3 and a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    h, w, c = a.shape
    if c not in (3, 4):
        raise ValueError("webp: need 1, 3 or 4 channels")
    if h > 16384 or w > 16384:
        raise ValueError("webp: dimension > 16384")
    has_alpha = c == 4 and bool((a[:, :, 3] != 255).any())

    bw = BitWriter()
    bw.write(VP8L_SIGNATURE, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    packed = _pack_argb(a)
    xsize = w

    if palette:
        colors, inverse = np.unique(packed.reshape(-1), return_inverse=True)
        if len(colors) > 256:
            raise ValueError("webp: palette encode needs <= 256 colors")
        n_colors = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(n_colors - 1, 8)
        # delta-code the palette, emit as a 1×n sub-image
        pal = colors.view(np.uint8).reshape(-1, 4).astype(np.int16)
        deltas = pal.copy()
        deltas[1:] = (pal[1:] - pal[:-1]) % 256
        pal_img = deltas.astype(np.uint8).reshape(-1).view(np.uint32)
        _encode_image_stream(bw, pal_img.reshape(1, -1), use_lz77=False)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        idx = inverse.reshape(h, w).astype(np.uint32)
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            pad_w = (w + per - 1) // per * per
            padded = np.zeros((h, pad_w), np.uint32)
            padded[:, :w] = idx
            packed_idx = np.zeros((h, pad_w // per), np.uint32)
            for k in range(per):
                packed_idx |= padded[:, k::per] << (k * bits)
            idx = packed_idx
            xsize = pad_w // per
        packed = (0xFF000000 | (idx << 8)).astype(np.uint32)
    else:
        if predictor is not None:
            bw.write(1, 1)
            bw.write(0, 2)  # predictor
            size_bits = max(
                4,
                (max(w - 1, 1)).bit_length(),
                (max(h - 1, 1)).bit_length(),
            )
            size_bits = min(size_bits, 9)
            if ((w + (1 << size_bits) - 1) >> size_bits) != 1 or (
                (h + (1 << size_bits) - 1) >> size_bits
            ) != 1:
                raise ValueError("webp: predictor encode limited to <=512px")
            bw.write(size_bits - 2, 3)
            rgba4 = np.dstack([a, np.full((h, w), 255, np.uint8)]) if c == 3 else a
            packed = _forward_predictor(rgba4, predictor, size_bits)
            sub = np.array([[0xFF000000 | (predictor << 8)]], np.uint32)
            _encode_image_stream(bw, sub, use_lz77=False)
        if cross_color is not None:
            g2r, g2b, r2b = cross_color
            bw.write(1, 1)
            bw.write(1, 2)  # cross-color
            size_bits = min(
                9,
                max(
                    4,
                    (max(w - 1, 1)).bit_length(),
                    (max(h - 1, 1)).bit_length(),
                ),
            )
            if ((w + (1 << size_bits) - 1) >> size_bits) != 1 or (
                (h + (1 << size_bits) - 1) >> size_bits
            ) != 1:
                raise ValueError("webp: cross-color encode limited to <=512px")
            bw.write(size_bits - 2, 3)
            packed = _forward_color_transform(packed, g2r, g2b, r2b)
            cte = (
                0xFF000000
                | ((r2b & 0xFF) << 16)
                | ((g2b & 0xFF) << 8)
                | (g2r & 0xFF)
            )
            sub = np.array([[cte]], np.uint32)
            _encode_image_stream(bw, sub, use_lz77=False)
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # subtract green
            ch = packed.view(np.uint8).reshape(h, w, 4).copy()
            g = ch[:, :, 1].astype(np.uint16)
            ch[:, :, 0] = ((ch[:, :, 0] - g) & 0xFF).astype(np.uint8)
            ch[:, :, 2] = ((ch[:, :, 2] - g) & 0xFF).astype(np.uint8)
            packed = ch.view(np.uint32).reshape(h, w)
    bw.write(0, 1)  # end of transforms
    _encode_image_stream(
        bw, packed, use_lz77=use_lz77, cache_bits=cache_bits, is_level0=True
    )
    return bw.getvalue()


def _forward_color_transform(packed: np.ndarray, g2r: int, g2b: int, r2b: int):
    h, w = packed.shape
    ch = packed.view(np.uint8).reshape(h, w, 4).copy()
    g = ch[:, :, 1].astype(np.int8).astype(np.int32)
    red_orig = ch[:, :, 2].astype(np.int32)
    d_g2r = np.int32(np.int8(g2r))
    d_g2b = np.int32(np.int8(g2b))
    d_r2b = np.int32(np.int8(r2b))
    new_red = (red_orig - ((d_g2r * g) >> 5)) & 0xFF
    ch[:, :, 2] = new_red.astype(np.uint8)
    # the inverse adds delta(r2b, red_FINAL); red_final here is red_orig
    rf = red_orig.astype(np.uint8).astype(np.int8).astype(np.int32)
    new_blue = (
        ch[:, :, 0].astype(np.int32) - ((d_g2b * g) >> 5) - ((d_r2b * rf) >> 5)
    ) & 0xFF
    ch[:, :, 0] = new_blue.astype(np.uint8)
    return ch.view(np.uint32).reshape(h, w)


def _encode_image_stream(
    bw: BitWriter,
    packed: np.ndarray,
    use_lz77: bool = True,
    cache_bits: int = 0,
    is_level0: bool = False,
) -> None:
    """Entropy-code one packed-ARGB image (no transforms at this level)."""
    h, w = packed.shape
    flat = packed.reshape(-1)
    npix = len(flat)
    # tokenize: (kind, payload)
    #   ('lit', argb) / ('copy', length, dist_code_value) / ('cache', idx)
    tokens: List[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    flat_int = flat.astype(np.int64)
    while i < npix:
        if use_lz77 and i > 0:
            # greedy: try distance 1 (previous pixel) and distance w (above)
            best_len, best_dist = 0, 0
            for dist in (1, w):
                if dist > i:
                    continue
                run = 0
                limit = min(npix - i, 4096)
                while run < limit and flat_int[i + run] == flat_int[i + run - dist]:
                    run += 1
                if run > best_len:
                    best_len, best_dist = run, dist
            if best_len >= 3:
                if best_dist == 1:
                    code_val = _DISTANCE_MAP_INV[(1, 0)]
                elif best_dist == w and (0, 1) in _DISTANCE_MAP_INV and w >= 1:
                    code_val = _DISTANCE_MAP_INV[(0, 1)]
                else:
                    code_val = best_dist + 120
                tokens.append(("copy", best_len, code_val))
                if cache is not None:
                    for k in range(best_len):
                        px = int(flat_int[i + k])
                        cache[_cache_hash(px, cache_bits)] = px
                i += best_len
                continue
        px = int(flat_int[i])
        if cache is not None:
            hidx = _cache_hash(px, cache_bits)
            if cache[hidx] == px:
                tokens.append(("cache", hidx))
                i += 1
                continue
            cache[hidx] = px
        tokens.append(("lit", px))
        i += 1

    # histograms
    gf: Dict[int, int] = {}
    rf: Dict[int, int] = {}
    bf: Dict[int, int] = {}
    af: Dict[int, int] = {}
    df: Dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
            rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
            bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
            af[(px >> 24) & 0xFF] = af.get((px >> 24) & 0xFF, 0) + 1
        elif t[0] == "copy":
            ls, _, _ = _lz77_symbol(t[1])
            gf[256 + ls] = gf.get(256 + ls, 0) + 1
            ds, _, _ = _lz77_symbol(t[2])
            df[ds] = df.get(ds, 0) + 1
        else:
            gf[256 + _NUM_LENGTH_CODES + t[1]] = (
                gf.get(256 + _NUM_LENGTH_CODES + t[1], 0) + 1
            )

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if is_level0:
        bw.write(0, 1)  # no meta prefix codes (single group); the meta bit
        # exists only in the top-level image stream, never in sub-images
    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    g_lengths = _huffman_lengths(gf)
    r_lengths = _huffman_lengths(rf)
    b_lengths = _huffman_lengths(bf)
    a_lengths = _huffman_lengths(af)
    d_lengths = _huffman_lengths(df)
    g_codes = _write_prefix_code(bw, g_lengths, green_alpha)
    r_codes = _write_prefix_code(bw, r_lengths, 256)
    b_codes = _write_prefix_code(bw, b_lengths, 256)
    a_codes = _write_prefix_code(bw, a_lengths, 256)
    d_codes = _write_prefix_code(bw, d_lengths, _NUM_DISTANCE_CODES)

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            cg, lg = g_codes[(px >> 8) & 0xFF]
            bw.write_code(cg, lg)
            cr, lr = r_codes[(px >> 16) & 0xFF]
            bw.write_code(cr, lr)
            cb, lb = b_codes[px & 0xFF]
            bw.write_code(cb, lb)
            ca, la = a_codes[(px >> 24) & 0xFF]
            bw.write_code(ca, la)
        elif t[0] == "copy":
            ls, ev, eb = _lz77_symbol(t[1])
            cg, lg = g_codes[256 + ls]
            bw.write_code(cg, lg)
            if eb:
                bw.write(ev, eb)
            ds, dev, deb = _lz77_symbol(t[2])
            cd, ld = d_codes[ds]
            bw.write_code(cd, ld)
            if deb:
                bw.write(dev, deb)
        else:
            cg, lg = g_codes[256 + _NUM_LENGTH_CODES + t[1]]
            bw.write_code(cg, lg)


def encode_webp(arr: np.ndarray, **kw) -> bytes:
    """uint8 array -> complete RIFF/WEBP file with a VP8L chunk."""
    payload = encode_vp8l(arr, **kw)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
