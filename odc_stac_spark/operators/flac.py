"""From-scratch FLAC codec — the Free Lossless Audio Codec (RFC 9639).

FLAC is the dominant lossless audio format in scraped corpora and
speech/music datasets (LibriSpeech, MusicDB dumps ship as FLAC); the
reference delegates audio to external libraries. Implemented from the
public spec:

decoder (full subset-profile)
  - fLaC marker + metadata blocks (STREAMINFO parsed, others skipped)
  - frame headers: sync, blocking strategy, all block-size / sample-rate
    codes (incl. the 8/16-bit escape forms), UTF-8-style coded frame /
    sample numbers, CRC-8 verification
  - channel assignments: 1-8 independent, left/side, right/side,
    mid/side (side channel decoded at +1 bit width per spec)
  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
    (QLP precision + signed shift + coefficients), wasted-bits unary
  - residuals: 4-bit RICE and 5-bit RICE2 partitioned coding, partition
    orders 0-15, escape-to-raw partitions, zigzag mapping
  - frame CRC-16 verification and STREAMINFO MD5 verification of the
    decoded PCM (a decode bug cannot slip through silently)

encoder (fixtures / round trips)
  - per-channel best-of (constant / verbatim / fixed order 0-2) with
    single-partition rice residuals; optional mid/side for stereo;
    correct CRCs and STREAMINFO MD5

Being exactly lossless, the full bitstream is SQL-verifiable: the
``mm_audio_flac_codec`` query hash-gates encode → Arrow → decode → DSP
against the same first-principles sample oracle as the WAV query.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (spec: CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0)
# ---------------------------------------------------------------------------


def _make_crc8_table():
    tbl = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
        tbl.append(r)
    return tbl


def _make_crc16_table():
    tbl = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
        tbl.append(r)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# bit I/O (MSB-first)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        # spec: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        out = 0
        p = self.bitpos
        data = self.data
        end = p + n
        if end > len(data) * 8:
            raise ValueError("FLAC: truncated stream")
        while n > 0:
            byte = data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n)
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            p += take
            n -= take
        self.bitpos = p
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        self.bitpos = (self.bitpos + 7) & ~7

    @property
    def bytepos(self) -> int:
        return self.bitpos >> 3


# ---------------------------------------------------------------------------
# rice residual coding
# ---------------------------------------------------------------------------


def _zigzag(e: np.ndarray) -> np.ndarray:
    return np.where(e >= 0, e.astype(np.int64) * 2, -2 * e.astype(np.int64) - 1)


def _write_rice(bw: _BitWriter, residual: np.ndarray, param: int):
    u = _zigzag(residual)
    for v in u:
        v = int(v)
        bw.write_unary(v >> param)
        if param:
            bw.write(v & ((1 << param) - 1), param)


def _read_rice(br: _BitReader, n: int, param: int) -> List[int]:
    out = []
    for _ in range(n):
        q = br.read_unary()
        u = (q << param) | (br.read(param) if param else 0)
        out.append((u >> 1) ^ -(u & 1))
    return out


def _read_residual(br: _BitReader, block_size: int, order: int) -> List[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    po = br.read(4)
    nparts = 1 << po
    if po and block_size % nparts:
        raise ValueError("FLAC: block size not divisible by partition count")
    out: List[int] = []
    for part in range(nparts):
        n = (block_size >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: invalid partition order")
        param = br.read(pbits)
        if param == (1 << pbits) - 1:  # escape: raw n-bit residuals
            raw_bits = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw_bits) if raw_bits else 0)
        else:
            out.extend(_read_rice(br, n, param))
    return out


# ---------------------------------------------------------------------------
# fixed predictors (spec §9.2.1: orders 0-4)
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _restore_prediction(warmup: List[int], residual: List[int], coefs, shift: int, n: int):
    out = list(warmup)
    order = len(coefs)
    for i in range(len(residual)):
        pred = 0
        base = len(out)
        for j, c in enumerate(coefs):
            pred += c * out[base - 1 - j]
        out.append(residual[i] + (pred >> shift))
    return out[:n]


# ---------------------------------------------------------------------------
# frame-header tables
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                   256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                   8192: 13, 16384: 14, 32768: 15}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODE.items()}


def _write_utf8_number(out: bytearray, v: int):
    if v < 0x80:
        out.append(v)
        return
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC), (7, 0xFE)):
        if v < (1 << (5 * nbytes + 1)) or nbytes == 7:
            cont = [(v >> (6 * k)) & 0x3F for k in range(nbytes - 1)]
            out.append(lead | (v >> (6 * (nbytes - 1))))
            out.extend(0x80 | c for c in reversed(cont))
            return


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("FLAC: invalid coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_flac(data: bytes, verify_md5: bool = True) -> Tuple[np.ndarray, int]:
    """FLAC bytes → (samples, sample_rate). Mono → (n,), multichannel →
    (n, ch); dtype int16 when bps ≤ 16 else int32. CRC-8/CRC-16 are
    checked per frame; the STREAMINFO MD5 of the decoded PCM is verified
    unless ``verify_md5=False`` (files may legally carry a zero MD5)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)
    si.read(24)  # min/max frame size
    rate = si.read(20)
    nch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5 = streaminfo[18:34]

    channels: List[List[int]] = [[] for _ in range(nch)]
    while pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: bad frame sync")
        if br.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        fbps = bps if bps_code == 0 else _BPS_FROM_CODE.get(bps_code)
        if fbps is None:
            raise ValueError(f"FLAC: reserved sample-size code {bps_code}")
        header_len = br.bytepos - frame_start
        if crc8(data[frame_start : frame_start + header_len]) != br.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code <= 7:
            n_sub = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            n_sub = 2
            side = ch_code
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        if n_sub != nch:
            raise ValueError("FLAC: frame channel count != STREAMINFO")

        subs = []
        for sub_i in range(n_sub):
            sub_bps = fbps
            # the side channel carries one extra bit (spec §9.1.3)
            if side == 8 and sub_i == 1:
                sub_bps += 1
            elif side == 9 and sub_i == 0:
                sub_bps += 1
            elif side == 10 and sub_i == 1:
                sub_bps += 1
            if br.read(1):
                raise ValueError("FLAC: subframe pad bit set")
            stype = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = br.read_unary() + 1
                sub_bps -= wasted
            if stype == 0:  # CONSTANT
                x = [br.read_signed(sub_bps)] * block_size
            elif stype == 1:  # VERBATIM
                x = [br.read_signed(sub_bps) for _ in range(block_size)]
            elif 8 <= stype <= 12:  # FIXED order 0-4
                order = stype - 8
                warm = [br.read_signed(sub_bps) for _ in range(order)]
                resid = _read_residual(br, block_size, order)
                x = _restore_prediction(
                    warm, resid, _FIXED_COEFS[order], 0, block_size
                )
            elif stype >= 32:  # LPC order 1-32
                order = stype - 31
                warm = [br.read_signed(sub_bps) for _ in range(order)]
                prec = br.read(4) + 1
                if prec == 16:
                    raise ValueError("FLAC: invalid QLP precision")
                shift = br.read_signed(5)
                if shift < 0:
                    raise ValueError("FLAC: negative QLP shift")
                coefs = [br.read_signed(prec) for _ in range(order)]
                resid = _read_residual(br, block_size, order)
                x = _restore_prediction(warm, resid, coefs, shift, block_size)
            else:
                raise ValueError(f"FLAC: reserved subframe type {stype}")
            if wasted:
                x = [v << wasted for v in x]
            subs.append(x)
        br.align()
        crc_read_at = br.bytepos
        if crc16(data[frame_start:crc_read_at]) != br.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = br.bytepos

        if side == 8:  # left/side: right = left - side
            left, s = subs
            subs = [left, [l - d for l, d in zip(left, s)]]
        elif side == 9:  # right/side: left = right + side
            s, right = subs
            subs = [[r + d for r, d in zip(right, s)], right]
        elif side == 10:  # mid/side
            mid, s = subs
            lr = []
            for m, d in zip(mid, s):
                m = (m << 1) | (d & 1)
                lr.append(((m + d) >> 1, (m - d) >> 1))
            subs = [[a for a, _ in lr], [b for _, b in lr]]
        for ci in range(nch):
            channels[ci].extend(subs[ci])

    n = total if total else len(channels[0])
    dt = np.int16 if bps <= 16 else np.int32
    arr = np.stack([np.asarray(c[:n], np.int64) for c in channels], axis=-1)
    if verify_md5 and md5 != b"\x00" * 16:
        nbytes = (bps + 7) // 8
        raw = bytearray()
        flat = arr.reshape(-1)
        for v in flat:
            raw += int(v).to_bytes(nbytes, "little", signed=True)
        if hashlib.md5(bytes(raw)).digest() != md5:
            raise ValueError("FLAC: decoded PCM fails the STREAMINFO MD5 check")
    out = arr.astype(dt)
    return (out[:, 0], rate) if nch == 1 else (out, rate)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _best_subframe(x: np.ndarray, bps: int) -> Tuple[str, int, np.ndarray]:
    """Pick constant / fixed 0-2 / verbatim by estimated cost."""
    if (x == x[0]).all():
        return "constant", 0, x
    best = ("verbatim", 0, x, bps * len(x))
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        res = _fixed_residual(x, order)
        u = _zigzag(res)
        mean = max(1.0, float(u.mean()))
        param = min(30, max(0, int(np.log2(mean)) if mean >= 1 else 0))
        cost = order * bps + int(np.sum((u >> param) + 1 + param))
        if cost < best[3]:
            best = ("fixed", order, res, cost)
    return best[0], best[1], best[2]


def _rice_param_for(res: np.ndarray) -> int:
    u = _zigzag(res)
    mean = float(u.mean()) if len(u) else 0.0
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int):
    kind, order, payload = _best_subframe(x, bps)
    bw.write(0, 1)  # pad
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]), bps)
        return
    if kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
        return
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for v in x[:order]:
        bw.write(int(v), bps)
    res = payload
    bw.write(0, 2)  # rice method 0 (4-bit params)
    bw.write(0, 4)  # partition order 0
    param = min(14, _rice_param_for(res))
    bw.write(param, 4)
    _write_rice(bw, res, param)


def encode_flac(
    samples: np.ndarray,
    rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """(n,) or (n, ch) int samples → FLAC bytes (always lossless).
    ``mid_side=True`` uses the mid/side stereo decorrelation for 2-channel
    input (exercises the decoder's reconstruction path)."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not 1 <= nch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if mid_side and nch != 2:
        raise ValueError("mid_side needs exactly 2 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if x.min(initial=0) < lo or x.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bps}-bit range")
    x = x.astype(np.int64)

    nbytes = (bps + 7) // 8
    raw = bytearray()
    for v in x.reshape(-1):
        raw += int(v).to_bytes(nbytes, "little", signed=True)
    md5 = hashlib.md5(bytes(raw)).digest()

    frames = bytearray()
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = x[start : start + block_size]
        bs = blk.shape[0]
        if bs == 0:
            break
        hdr = bytearray()
        bw_h = _BitWriter()
        bw_h.write(0x3FFE, 14)
        bw_h.write(0, 1)
        bw_h.write(0, 1)  # fixed blocking
        bs_code = _BLOCKSIZE_CODE.get(bs, 7)
        bw_h.write(bs_code, 4)
        sr_inv = {v: k for k, v in _SAMPLE_RATES.items()}
        bw_h.write(sr_inv.get(rate, 0), 4)
        ch_code = 10 if mid_side else nch - 1
        bw_h.write(ch_code, 4)
        bw_h.write(_BPS_CODE.get(bps, 0), 3)
        bw_h.write(0, 1)
        hdr += bw_h.getvalue()
        _write_utf8_number(hdr, frame_no)
        if bs_code == 7:
            hdr += struct.pack(">H", bs - 1)
        hdr.append(crc8(bytes(hdr)))

        bw = _BitWriter()
        if mid_side:
            l, r = blk[:, 0], blk[:, 1]
            mid = (l + r) >> 1
            sidec = l - r
            _write_subframe(bw, mid, bps)
            _write_subframe(bw, sidec, bps + 1)
        else:
            for ci in range(nch):
                _write_subframe(bw, blk[:, ci], bps)
        bw.align()
        body = bw.getvalue()
        frame = bytes(hdr) + body
        frame += struct.pack(">H", crc16(frame))
        frames += frame
        frame_no += 1

    si = _BitWriter()
    si.write(min(block_size, n if n else block_size), 16)
    si.write(min(block_size, n if n else block_size), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80 | 0x00]) + len(streaminfo).to_bytes(3, "big")
    out += streaminfo
    out += frames
    return bytes(out)
