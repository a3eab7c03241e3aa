"""Zstandard decoder — RFC 8878 (public IETF spec), pure stdlib.

ZSTD is the modern COG/parquet compression (GDAL TIFF Compression=50000;
the reference reads such rasters via GDAL, ``loader/_rio.py:374-475``).
This module implements a complete single-frame DECODER from the RFC:

- frame header (window descriptor, dictionary-id refusal, frame content
  size), raw / RLE / compressed blocks, content-checksum skip
- literals: raw, RLE, Huffman-compressed (1 and 4 streams, direct or
  FSE-compressed weight tables), treeless (table reuse across blocks)
- sequences: predefined / RLE / FSE-compressed / repeat modes for the
  literals-length, offset and match-length registers; interleaved
  backward bitstream; repeat-offset logic incl. the ``ll == 0`` shift
- FSE: normalized-count parsing (zero runs, low-probability symbols),
  spread-step table construction, state-machine decode
- Huffman: canonical weight→length tables, single-table lookup decode

Validation: tests/test_zstd.py checks this decoder against frames
produced by REAL encoders present in the environment (the libzstd CLI
and pyarrow's bundled zstd) across levels and content shapes — a
foreign-encoder golden gate, not an own-writer roundtrip.

Scale: used as the last-resort backend of the TIFF ZSTD seam
(sources/geotiff.py) — per-tile decode inside executor tasks, bounded
by tile size. Python-level throughput is the documented ceiling; any
native backend earlier in the chain displaces it automatically.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

_MAGIC = b"\x28\xb5\x2f\xfd"
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

_M64 = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (public xxHash spec) — zstd's content checksum."""
    n = len(data)
    p = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while p + 32 <= n:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                lane = int.from_bytes(data[p + off : p + off + 8], "little")
                if v == 1:
                    v1 = (_rotl((v1 + lane * _P2) & _M64, 31) * _P1) & _M64
                elif v == 2:
                    v2 = (_rotl((v2 + lane * _P2) & _M64, 31) * _P1) & _M64
                elif v == 3:
                    v3 = (_rotl((v3 + lane * _P2) & _M64, 31) * _P1) & _M64
                else:
                    v4 = (_rotl((v4 + lane * _P2) & _M64, 31) * _P1) & _M64
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _M64, 31) * _P1 & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while p + 8 <= n:
        lane = int.from_bytes(data[p : p + 8], "little")
        h = (_rotl(h ^ (_rotl((lane * _P2) & _M64, 31) * _P1 & _M64), 27) * _P1 + _P4) & _M64
        p += 8
    if p + 4 <= n:
        lane = int.from_bytes(data[p : p + 4], "little")
        h = (_rotl(h ^ ((lane * _P1) & _M64), 23) * _P2 + _P3) & _M64
        p += 4
    while p < n:
        h = (_rotl(h ^ ((data[p] * _P5) & _M64), 11) * _P1) & _M64
        p += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# bitstreams


class _BackBits:
    """Backward bitstream (§3.1.1.3.2.1.1): written LSB-first, read from
    the end after stripping the 1-bit sentinel + zero padding."""

    __slots__ = ("buf", "bitpos")

    def __init__(self, buf: bytes) -> None:
        if not buf:
            raise ValueError("zstd: empty bitstream")
        last = buf[-1]
        if last == 0:
            raise ValueError("zstd: bitstream has no sentinel bit")
        self.buf = buf
        self.bitpos = len(buf) * 8 - (8 - last.bit_length()) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.bitpos -= n
        p = self.bitpos
        if p < 0:
            # states may legally drain the stream exactly; reads beyond
            # return zero bits for the low part (zstd's bit container
            # behaves the same within its tolerance)
            chunk = int.from_bytes(self.buf[0 : (p + n + 7) >> 3], "little")
            return (chunk << -p) & ((1 << n) - 1) if -p < n else 0
        lo = p >> 3
        hi = (p + n + 7) >> 3
        chunk = int.from_bytes(self.buf[lo:hi], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def empty(self) -> bool:
        return self.bitpos <= 0


class _FwdBits:
    """Forward LSB-first bitstream (FSE table descriptions, §4.1.1)."""

    __slots__ = ("buf", "bitpos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.bitpos = 0

    def read(self, n: int) -> int:
        p = self.bitpos
        lo = p >> 3
        hi = (p + n + 7) >> 3
        chunk = int.from_bytes(self.buf[lo:hi], "little")
        self.bitpos = p + n
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.bitpos
        lo = p >> 3
        hi = (p + n + 7) >> 3
        chunk = int.from_bytes(self.buf[lo:hi], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def bytes_used(self) -> int:
        return (self.bitpos + 7) >> 3


# ---------------------------------------------------------------------------
# FSE


def _read_ncount(bits: _FwdBits, max_symbol: int, max_log: int) -> Tuple[List[int], int]:
    """Normalized counts (§4.1.1) → (counts incl. -1 low-prob, tableLog)."""
    table_log = bits.read(4) + 5
    if table_log > max_log:
        raise ValueError(f"zstd: FSE accuracy {table_log} > max {max_log}")
    remaining = (1 << table_log) + 1
    threshold = 1 << table_log
    nbits = table_log + 1
    counts: List[int] = []
    previous0 = False
    while remaining > 1 and len(counts) <= max_symbol:
        if previous0:
            # zero-run lengths, 2 bits each; 3 = continue
            while bits.peek(2) == 3:
                bits.read(2)
                counts.extend([0, 0, 0])
            counts.extend([0] * bits.read(2))
            previous0 = False
            continue
        mx = 2 * threshold - 1 - remaining
        val = bits.peek(nbits - 1)
        if val < mx:
            bits.read(nbits - 1)
            count = val
        else:
            val = bits.peek(nbits)
            bits.read(nbits)
            if val >= threshold:
                val -= mx
            count = val
        count -= 1  # -1 encodes the "less than 1" probability
        remaining -= -count if count < 0 else count
        counts.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE normalized counts")
    counts.extend([0] * (max_symbol + 1 - len(counts)))
    return counts, table_log


def _fse_table(counts: List[int], table_log: int) -> List[Tuple[int, int, int]]:
    """§4.1.1 spread + state table → [(symbol, nb_bits, baseline)]."""
    size = 1 << table_log
    table = [0] * size
    high = size - 1
    # low-probability (-1) symbols take single cells from the TOP
    for s, c in enumerate(counts):
        if c == -1:
            table[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE table spread")
    nxt = [c if c != -1 else 1 for c in counts]
    out: List[Tuple[int, int, int]] = [None] * size  # type: ignore[list-item]
    for i in range(size):
        s = table[i]
        x = nxt[s]
        nxt[s] = x + 1
        nb = table_log - (x.bit_length() - 1)
        out[i] = (s, nb, (x << nb) - size)
    return out


def _fse_rle_table(symbol: int) -> List[Tuple[int, int, int]]:
    return [(symbol, 0, 0)]


class _FseState:
    __slots__ = ("table", "log", "state")

    def __init__(self, table: List[Tuple[int, int, int]], bits: _BackBits) -> None:
        self.table = table
        self.log = (len(table) - 1).bit_length()
        self.state = bits.read(self.log)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bits: _BackBits) -> None:
        _, nb, base = self.table[self.state]
        self.state = base + bits.read(nb)


# predefined distributions (§3.1.1.3.2.2); accuracy logs 6/5/6
_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
]
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, -1, -1, -1, -1, -1,
]
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1, -1, -1,
]
_LL_TABLE_DEFAULT = _fse_table(_LL_DEFAULT, 6)
_OF_TABLE_DEFAULT = _fse_table(_OF_DEFAULT, 5)
_ML_TABLE_DEFAULT = _fse_table(_ML_DEFAULT, 6)

# literals-length and match-length code baselines/extra bits (§3.1.1.3.2.1.1)
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


# ---------------------------------------------------------------------------
# Huffman


def _huf_weights(src: bytes) -> Tuple[List[int], int]:
    """Huffman-tree description (§4.2.1) → (weights incl. implied last,
    header bytes consumed)."""
    hbyte = src[0]
    if hbyte >= 128:  # direct: 4-bit weights
        n = hbyte - 127
        weights = []
        for i in range(n):
            b = src[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        used = 1 + (n + 1) // 2
    else:  # FSE-compressed weights, two interleaved states
        csize = hbyte
        sub = src[1 : 1 + csize]
        fwd = _FwdBits(sub)
        counts, tlog = _read_ncount(fwd, 255, 6)
        table = _fse_table(counts, tlog)
        stream = sub[fwd.bytes_used() :]
        bits = _BackBits(stream)
        s1 = _FseState(table, bits)
        s2 = _FseState(table, bits)
        weights = []
        # two interleaved states; when one state's update over-reads the
        # stream, the OTHER state emits its pending symbol and decoding
        # stops (FSE_decompress tail protocol)
        while True:
            weights.append(s1.symbol())
            s1.update(bits)
            if bits.bitpos < 0:
                weights.append(s2.symbol())
                break
            weights.append(s2.symbol())
            s2.update(bits)
            if bits.bitpos < 0:
                weights.append(s1.symbol())
                break
            if len(weights) > 255:
                raise ValueError("zstd: too many Huffman weights")
        used = 1 + csize
    # implied last weight: totals must complete the next power of two
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman tree")
    p = 1
    while p <= total:
        p <<= 1
    left = p - total
    if left & (left - 1):
        raise ValueError("zstd: corrupt Huffman weights")
    weights.append(left.bit_length())  # log2(left) + 1
    return weights, used


def _huf_table(weights: List[int]) -> Tuple[List[Tuple[int, int]], int]:
    """weights → (lookup table of size 2^max_bits [(symbol, length)],
    max_bits). Table fill per HUF_readDTableX1: by weight ascending,
    natural symbol order within a weight."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = total.bit_length() - 1
    if (1 << max_bits) != total:
        raise ValueError("zstd: Huffman weights do not sum to a power of two")
    size = 1 << max_bits
    table: List[Tuple[int, int]] = [(-1, 0)] * size
    pos = 0
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            length = max_bits + 1 - w
            run = 1 << (w - 1)
            table[pos : pos + run] = [(sym, length)] * run
            pos += run
    if pos != size:
        raise ValueError("zstd: Huffman table underfilled")
    return table, max_bits


def _huf_decode_stream(
    stream: bytes, table: List[Tuple[int, int]], max_bits: int, n_out: int
) -> bytes:
    bits = _BackBits(stream)
    out = bytearray()
    mask = (1 << max_bits) - 1
    # maintain a peek window: read max_bits then give back unused bits
    for _ in range(n_out):
        p = bits.bitpos - max_bits
        if p >= 0:
            lo = p >> 3
            hi = (p + max_bits + 7) >> 3
            chunk = int.from_bytes(bits.buf[lo:hi], "little")
            idx = (chunk >> (p & 7)) & mask
        else:
            hi = (bits.bitpos + 7) >> 3
            chunk = int.from_bytes(bits.buf[0:hi], "little")
            avail = bits.bitpos
            idx = (chunk << (max_bits - avail)) & mask if avail > 0 else 0
        sym, length = table[idx]
        if sym < 0:
            raise ValueError("zstd: invalid Huffman code")
        out.append(sym)
        bits.bitpos -= length
    return bytes(out)


# ---------------------------------------------------------------------------
# literals + sequences


def _decode_literals(block: bytes, ctx: dict) -> Tuple[bytes, int]:
    """Literals section (§3.1.1.3.1) → (literals, bytes consumed)."""
    b0 = block[0]
    ltype = b0 & 3
    if ltype in (0, 1):  # raw / RLE
        if b0 & 4 == 0:  # 1-bit size format (xx0): 5-bit size
            size = b0 >> 3
            used = 1
        elif (b0 >> 2) & 3 == 1:  # 01: 12-bit
            size = (b0 >> 4) + (block[1] << 4)
            used = 2
        else:  # 11: 20-bit
            size = (b0 >> 4) + (block[1] << 4) + (block[2] << 12)
            used = 3
        if ltype == 0:
            return bytes(block[used : used + size]), used + size
        return bytes([block[used]]) * size, used + 1
    # compressed (2) / treeless (3)
    sf = (b0 >> 2) & 3
    if sf == 0:
        regen = (b0 >> 4) + ((block[1] & 0x3F) << 4)
        csize = (block[1] >> 6) + (block[2] << 2)
        streams, used = 1, 3
    elif sf == 1:
        regen = (b0 >> 4) + ((block[1] & 0x3F) << 4)
        csize = (block[1] >> 6) + (block[2] << 2)
        streams, used = 4, 3
    elif sf == 2:
        regen = (b0 >> 4) + (block[1] << 4) + ((block[2] & 3) << 12)
        csize = (block[2] >> 2) + (block[3] << 6)
        streams, used = 4, 4
    else:
        regen = (b0 >> 4) + (block[1] << 4) + ((block[2] & 0x3F) << 12)
        csize = (block[2] >> 6) + (block[3] << 2) + (block[4] << 10)
        streams, used = 4, 5
    payload = block[used : used + csize]
    if ltype == 2:
        weights, wused = _huf_weights(payload)
        ctx["huf"] = _huf_table(weights)
        payload = payload[wused:]
    elif "huf" not in ctx:
        raise ValueError("zstd: treeless literals with no previous table")
    table, max_bits = ctx["huf"]
    if streams == 1:
        lits = _huf_decode_stream(payload, table, max_bits, regen)
    else:
        s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
        body = payload[6:]
        seg = (regen + 3) // 4
        sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
        outs = []
        off = 0
        for i, sz in enumerate(sizes):
            n = seg if i < 3 else regen - 3 * seg
            outs.append(_huf_decode_stream(body[off : off + sz], table, max_bits, n))
            off += sz
        lits = b"".join(outs)
    if len(lits) != regen:
        raise ValueError("zstd: literals size mismatch")
    return lits, used + csize


def _seq_table(
    mode: int,
    bits_fwd: _FwdBits,
    default: List[Tuple[int, int, int]],
    max_symbol: int,
    max_log: int,
    prev: Optional[List[Tuple[int, int, int]]],
    raw: bytes,
) -> Tuple[List[Tuple[int, int, int]], int]:
    """One register's table per its compression mode → (table, bytes)."""
    if mode == 0:
        return default, 0
    if mode == 1:  # RLE: one byte symbol
        return _fse_rle_table(raw[0]), 1
    if mode == 2:
        fwd = _FwdBits(raw)
        counts, tlog = _read_ncount(fwd, max_symbol, max_log)
        return _fse_table(counts, tlog), fwd.bytes_used()
    if prev is None:
        raise ValueError("zstd: repeat mode with no previous table")
    return prev, 0


def _decode_sequences(
    block: bytes, lits: bytes, out: bytearray, ctx: dict
) -> None:
    """Sequences section (§3.1.1.3.2) + execution (§3.1.1.4)."""
    b0 = block[0]
    if b0 == 0:
        out += lits
        return
    if b0 < 128:
        nseq, p = b0, 1
    elif b0 < 255:
        nseq, p = ((b0 - 128) << 8) + block[1], 2
    else:
        nseq, p = block[1] + (block[2] << 8) + 0x7F00, 3
    modes = block[p]
    p += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, (modes >> 2) & 3
    ll_t, used = _seq_table(
        ll_mode, None, _LL_TABLE_DEFAULT, 35, 9, ctx.get("ll"), block[p:]
    )
    p += used
    of_t, used = _seq_table(
        of_mode, None, _OF_TABLE_DEFAULT, 31, 8, ctx.get("of"), block[p:]
    )
    p += used
    ml_t, used = _seq_table(
        ml_mode, None, _ML_TABLE_DEFAULT, 52, 9, ctx.get("ml"), block[p:]
    )
    p += used
    ctx["ll"], ctx["of"], ctx["ml"] = ll_t, of_t, ml_t

    bits = _BackBits(block[p:])
    ll_s = _FseState(ll_t, bits)
    of_s = _FseState(of_t, bits)
    ml_s = _FseState(ml_t, bits)
    reps = ctx["reps"]
    lit_pos = 0
    for i in range(nseq):
        of_code = of_s.symbol()
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        offset_val = (1 << of_code) + bits.read(of_code)
        ml_code = ml_s.symbol()
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_s.symbol()
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        # repeat-offset resolution (§3.1.1.5)
        if offset_val > 3:
            offset = offset_val - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = offset_val + (1 if ll == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 3:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0 and code 3 → rep1 - 1
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        out += lits[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:  # overlapping copy
            start = len(out) - offset
            for _ in range(ml):
                out.append(out[start])
                start += 1
        if i + 1 < nseq:
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
    out += lits[lit_pos:]


# ---------------------------------------------------------------------------
# frame


def zstd_frame_content_size(data: bytes) -> Optional[int]:
    """Frame_Content_Size from the header, or None when absent."""
    if len(data) < 5 or data[:4] != _MAGIC:
        return None
    fhd = data[4]
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    p = 5 + (0 if single else 1)
    p += (0, 1, 2, 4)[fhd & 3]  # dictionary id
    if fcs_flag == 0:
        return data[p] if single else None
    if fcs_flag == 1:
        return struct.unpack_from("<H", data, p)[0] + 256
    if fcs_flag == 2:
        return struct.unpack_from("<I", data, p)[0]
    return struct.unpack_from("<Q", data, p)[0]


def decode_zstd(data: bytes) -> bytes:
    """Decode concatenated zstd frames (skippable frames skipped)."""
    data = bytes(data)
    out = bytearray()
    p = 0
    while p + 4 <= len(data):
        magic = struct.unpack_from("<I", data, p)[0]
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            size = struct.unpack_from("<I", data, p + 4)[0]
            p += 8 + size
            continue
        if data[p : p + 4] != _MAGIC:
            raise ValueError("zstd: bad magic")
        p = _decode_frame(data, p + 4, out)
    return bytes(out)


def _decode_frame(data: bytes, p: int, out: bytearray) -> int:
    frame_out_start = len(out)
    fhd = data[p]
    p += 1
    single = (fhd >> 5) & 1
    checksum = (fhd >> 2) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    fcs_flag = fhd >> 6
    if (fhd >> 3) & 1:
        raise ValueError("zstd: reserved frame header bit set")
    if not single:
        p += 1  # window descriptor (we keep the whole output in memory)
    if did_size:
        raise NotImplementedError("zstd: dictionary frames not supported")
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
    p += fcs_size

    ctx = {"reps": [1, 4, 8]}
    while True:
        hdr = int.from_bytes(data[p : p + 3], "little")
        p += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if btype == 0:  # raw
            out += data[p : p + bsize]
            p += bsize
        elif btype == 1:  # RLE
            out += data[p : p + 1] * bsize
            p += 1
        elif btype == 2:
            block = data[p : p + bsize]
            p += bsize
            lits, used = _decode_literals(block, ctx)
            _decode_sequences(block[used:], lits, out, ctx)
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if checksum:
        want = struct.unpack_from("<I", data, p)[0]
        got = xxh64(bytes(out[frame_out_start:])) & 0xFFFFFFFF
        if got != want:
            raise ValueError(
                f"zstd: content checksum mismatch ({got:#010x} != {want:#010x})"
            )
        p += 4
    return p
