"""From-scratch H.264/AVC baseline-profile INTRA (IDR keyframe) codec —
ITU-T H.264 / ISO 14496-10, pure stdlib + numpy. Supplies the ``avc1``
half of MP4 video decode (demux already lives in operators/codecs.py).

Scope: I-slice decode with CAVLC entropy coding — what a keyframe /
thumbnail / scene-cut extraction pipeline touches: NAL unescaping,
SPS/PPS/slice-header parse (Exp-Golomb), macroblock types I_4x4,
I_16x16 and I_PCM, all nine Intra_4x4 and four Intra_16x16 luma
prediction modes plus the four chroma modes, CAVLC residual decoding
(coeff_token / level prefix+suffix / total_zeros / run_before with the
context-adaptive table selection of §9.2), dequantization and the
integer inverse 4x4 transform incl. the Intra_16x16 luma-DC Hadamard
and the 2x2 chroma-DC transform. Inter slices (P/B) raise
NotImplementedError toward the native-codec seam (ffmpeg slot in
operators/multimodal.py), exactly like VP8 inter frames.

The reference (odc-stac) never decodes video itself — a training-data
pipeline does; GDAL/ffmpeg would be its delegate. Here the format is
decoded from the public spec so the engine has no native dependency.

A deliberately tiny encoder (``encode_h264_gray``) emits spec-valid
IDR streams for grayscale content whose 4x4 blocks are each constant
(DC-only residual lattice at QP=0, where (10·c + 32) >> 6 can hit any
residual constant exactly) with the deblocking filter disabled — which
is what lets H.264 queries be hash-gated against a first-principles
pixel oracle; tests cross-validate against ffmpeg/PIL when importable.

Entropy tables are the normative VLCs of ITU-T H.264 §9.2 (Tables 9-5,
9-7/9-8/9-9, 9-10); each is structurally self-checked (prefix-free,
expected cardinality) at import.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


def _max_decode_pixels() -> int:
    """Allocation/time sanity cap (corrupt SPS must not OOM/stall an
    executor); raise via ``ODC_STAC_SPARK_H264_MAX_PIXELS``."""
    return int(os.environ.get("ODC_STAC_SPARK_H264_MAX_PIXELS", str(1 << 24)))


# ---------------------------------------------------------------------------
# bit I/O — NAL payloads are MSB-first with Exp-Golomb codes (§9.1)


class BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def read1(self) -> int:
        p = self.pos
        if p >= len(self.buf) * 8:
            raise ValueError("h264: bitstream overrun")
        self.pos = p + 1
        return (self.buf[p >> 3] >> (7 - (p & 7))) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read1()
        return v

    def ue(self) -> int:
        """ue(v) Exp-Golomb (§9.1): leadingZeroBits capped — a corrupt
        stream of zeros must fail, not spin/alloc 2^large."""
        zeros = 0
        while self.read1() == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264: exp-golomb code too long")
        return (1 << zeros) - 1 + (self.read(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_aligned(self) -> bool:
        return self.pos % 8 == 0

    def more_rbsp_data(self) -> bool:
        """True while payload bits remain before the rbsp_stop_one_bit."""
        total = len(self.buf) * 8
        if self.pos >= total:
            return False
        # find last set bit (the stop bit) — everything after is padding
        last = total - 1
        while last >= 0:
            if (self.buf[last >> 3] >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last


class BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: List[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def write_str(self, s: str) -> None:
        self.bits.extend(1 if c == "1" else 0 for c in s)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.write(0, n - 1)
        self.write(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def getvalue(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def unescape_rbsp(data: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 → 00 00), §7.4.1.1."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def escape_rbsp(data: bytes) -> bytes:
    """Insert emulation-prevention bytes (00 00 0x → 00 00 03 0x, x<4)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# ---------------------------------------------------------------------------
# normative CAVLC tables — ITU-T H.264 §9.2. Stored as code-string maps
# (transcription-auditable against the published tables); each table is
# structurally validated at import (_check_vlc_tables).

# Table 9-5: coeff_token → (TrailingOnes, TotalCoeff); one map per nC
# class: 0≤nC<2, 2≤nC<4, 4≤nC<8 (nC≥8 is the 6-bit FLC handled in code),
# and nC==-1 (chroma DC, 4:2:0).
COEFF_TOKEN_NC0 = {
    "1": (0, 0),
    "000101": (0, 1), "01": (1, 1),
    "00000111": (0, 2), "000100": (1, 2), "001": (2, 2),
    "000000111": (0, 3), "00000110": (1, 3), "0000101": (2, 3), "00011": (3, 3),
    "0000000111": (0, 4), "000000110": (1, 4), "00000101": (2, 4), "000011": (3, 4),
    "00000000111": (0, 5), "0000000110": (1, 5), "000000101": (2, 5), "0000100": (3, 5),
    "0000000001111": (0, 6), "00000000110": (1, 6), "0000000101": (2, 6), "00000100": (3, 6),
    "0000000001011": (0, 7), "0000000001110": (1, 7), "00000000101": (2, 7), "000000100": (3, 7),
    "0000000001000": (0, 8), "0000000001010": (1, 8), "0000000001101": (2, 8), "0000000100": (3, 8),
    "00000000001111": (0, 9), "00000000001110": (1, 9), "0000000001001": (2, 9), "00000000100": (3, 9),
    "00000000001011": (0, 10), "00000000001010": (1, 10), "00000000001101": (2, 10), "0000000001100": (3, 10),
    "000000000001111": (0, 11), "000000000001110": (1, 11), "00000000001001": (2, 11), "00000000001100": (3, 11),
    "000000000001011": (0, 12), "000000000001010": (1, 12), "000000000001101": (2, 12), "00000000001000": (3, 12),
    "0000000000001111": (0, 13), "000000000000001": (1, 13), "000000000001001": (2, 13), "000000000001100": (3, 13),
    "0000000000001011": (0, 14), "0000000000001110": (1, 14), "0000000000001101": (2, 14), "000000000001000": (3, 14),
    "0000000000000111": (0, 15), "0000000000001010": (1, 15), "0000000000001001": (2, 15), "0000000000001100": (3, 15),
    "0000000000000100": (0, 16), "0000000000000110": (1, 16), "0000000000000101": (2, 16), "0000000000001000": (3, 16),
}

COEFF_TOKEN_NC2 = {
    "11": (0, 0),
    "001011": (0, 1), "10": (1, 1),
    "000111": (0, 2), "00111": (1, 2), "011": (2, 2),
    "0000111": (0, 3), "001010": (1, 3), "001001": (2, 3), "0101": (3, 3),
    "00000111": (0, 4), "000110": (1, 4), "000101": (2, 4), "0100": (3, 4),
    "00000100": (0, 5), "0000110": (1, 5), "0000101": (2, 5), "00110": (3, 5),
    "000000111": (0, 6), "00000110": (1, 6), "00000101": (2, 6), "001000": (3, 6),
    "00000001111": (0, 7), "000000110": (1, 7), "000000101": (2, 7), "000100": (3, 7),
    "00000001011": (0, 8), "00000001110": (1, 8), "00000001101": (2, 8), "0000100": (3, 8),
    "000000001111": (0, 9), "00000001010": (1, 9), "00000001001": (2, 9), "000000100": (3, 9),
    "000000001011": (0, 10), "000000001110": (1, 10), "000000001101": (2, 10), "00000001100": (3, 10),
    "000000001000": (0, 11), "000000001010": (1, 11), "000000001001": (2, 11), "00000001000": (3, 11),
    "0000000001111": (0, 12), "0000000001110": (1, 12), "0000000001101": (2, 12), "000000001100": (3, 12),
    "0000000001011": (0, 13), "0000000001010": (1, 13), "0000000001001": (2, 13), "0000000001100": (3, 13),
    "0000000000111": (0, 14), "00000000001011": (1, 14), "0000000000110": (2, 14), "0000000001000": (3, 14),
    "00000000001001": (0, 15), "00000000001000": (1, 15), "00000000001010": (2, 15), "0000000000001": (3, 15),
    "00000000000111": (0, 16), "00000000000110": (1, 16), "00000000000101": (2, 16), "00000000000100": (3, 16),
}

COEFF_TOKEN_NC4 = {
    "1111": (0, 0),
    "001111": (0, 1), "1110": (1, 1),
    "001011": (0, 2), "01111": (1, 2), "1101": (2, 2),
    "001000": (0, 3), "01100": (1, 3), "01110": (2, 3), "1100": (3, 3),
    "0001111": (0, 4), "01010": (1, 4), "01011": (2, 4), "1011": (3, 4),
    "0001011": (0, 5), "01000": (1, 5), "01001": (2, 5), "1010": (3, 5),
    "0001001": (0, 6), "001110": (1, 6), "001101": (2, 6), "1001": (3, 6),
    "0001000": (0, 7), "001010": (1, 7), "001001": (2, 7), "1000": (3, 7),
    "00001111": (0, 8), "0001110": (1, 8), "0001101": (2, 8), "01101": (3, 8),
    "00001011": (0, 9), "00001110": (1, 9), "0001010": (2, 9), "001100": (3, 9),
    "000001111": (0, 10), "00001010": (1, 10), "00001101": (2, 10), "0001100": (3, 10),
    "000001011": (0, 11), "000001110": (1, 11), "00001001": (2, 11), "00001100": (3, 11),
    "000001000": (0, 12), "000001010": (1, 12), "000001101": (2, 12), "00001000": (3, 12),
    "0000001101": (0, 13), "000000111": (1, 13), "000001001": (2, 13), "000001100": (3, 13),
    "0000001001": (0, 14), "0000001100": (1, 14), "0000001011": (2, 14), "0000001010": (3, 14),
    "0000000101": (0, 15), "0000001000": (1, 15), "0000000111": (2, 15), "0000000110": (3, 15),
    "0000000001": (0, 16), "0000000100": (1, 16), "0000000011": (2, 16), "0000000010": (3, 16),
}

COEFF_TOKEN_CHROMA_DC = {
    "01": (0, 0),
    "000111": (0, 1), "1": (1, 1),
    "000100": (0, 2), "000110": (1, 2), "001": (2, 2),
    "000011": (0, 3), "0000011": (1, 3), "0000010": (2, 3), "000101": (3, 3),
    "000010": (0, 4), "00000011": (1, 4), "00000010": (2, 4), "0000000": (3, 4),
}

# Tables 9-7/9-8: total_zeros for 4x4 blocks, indexed by TotalCoeff 1..15;
# each inner map code → total_zeros.
TOTAL_ZEROS_4x4 = {
    1: {"1": 0, "011": 1, "010": 2, "0011": 3, "0010": 4, "00011": 5,
        "00010": 6, "000011": 7, "000010": 8, "0000011": 9, "0000010": 10,
        "00000011": 11, "00000010": 12, "000000011": 13, "000000010": 14,
        "000000001": 15},
    2: {"111": 0, "110": 1, "101": 2, "100": 3, "011": 4, "0101": 5,
        "0100": 6, "0011": 7, "0010": 8, "00011": 9, "00010": 10,
        "000011": 11, "000010": 12, "000001": 13, "000000": 14},
    3: {"0101": 0, "111": 1, "110": 2, "101": 3, "0100": 4, "0011": 5,
        "100": 6, "011": 7, "0010": 8, "00011": 9, "00010": 10,
        "000001": 11, "00001": 12, "000000": 13},
    4: {"00011": 0, "111": 1, "0101": 2, "0100": 3, "110": 4, "101": 5,
        "100": 6, "0011": 7, "011": 8, "0010": 9, "00010": 10, "00001": 11,
        "00000": 12},
    5: {"0101": 0, "0100": 1, "0011": 2, "111": 3, "110": 4, "101": 5,
        "100": 6, "011": 7, "0010": 8, "00001": 9, "0001": 10, "00000": 11},
    6: {"000001": 0, "00001": 1, "111": 2, "110": 3, "101": 4, "100": 5,
        "011": 6, "010": 7, "0001": 8, "001": 9, "000000": 10},
    7: {"000001": 0, "00001": 1, "101": 2, "100": 3, "011": 4, "11": 5,
        "010": 6, "0001": 7, "001": 8, "000000": 9},
    8: {"000001": 0, "0001": 1, "00001": 2, "011": 3, "11": 4, "10": 5,
        "010": 6, "001": 7, "000000": 8},
    9: {"000001": 0, "000000": 1, "0001": 2, "11": 3, "10": 4, "001": 5,
        "01": 6, "00001": 7},
    10: {"00001": 0, "00000": 1, "001": 2, "11": 3, "10": 4, "01": 5,
         "0001": 6},
    11: {"0000": 0, "0001": 1, "001": 2, "010": 3, "1": 4, "011": 5},
    12: {"0000": 0, "0001": 1, "01": 2, "1": 3, "001": 4},
    13: {"000": 0, "001": 1, "1": 2, "01": 3},
    14: {"00": 0, "01": 1, "1": 2},
    15: {"0": 0, "1": 1},
}

# Table 9-9(a): total_zeros for chroma DC (4:2:0), TotalCoeff 1..3
TOTAL_ZEROS_CHROMA_DC = {
    1: {"1": 0, "01": 1, "001": 2, "000": 3},
    2: {"1": 0, "01": 1, "00": 2},
    3: {"1": 0, "0": 1},
}

# Table 9-10: run_before, indexed by min(zerosLeft, 7)
RUN_BEFORE = {
    1: {"1": 0, "0": 1},
    2: {"1": 0, "01": 1, "00": 2},
    3: {"11": 0, "10": 1, "01": 2, "00": 3},
    4: {"11": 0, "10": 1, "01": 2, "001": 3, "000": 4},
    5: {"11": 0, "10": 1, "011": 2, "010": 3, "001": 4, "000": 5},
    6: {"11": 0, "000": 1, "001": 2, "011": 3, "010": 4, "101": 5, "100": 6},
    7: {"111": 0, "110": 1, "101": 2, "100": 3, "011": 4, "010": 5,
        "001": 6, "0001": 7, "00001": 8, "000001": 9, "0000001": 10,
        "00000001": 11, "000000001": 12, "0000000001": 13, "00000000001": 14},
}


def _check_vlc_tables() -> None:
    """Structural validation: every table is prefix-free with the spec's
    cardinality (62 coeff_token entries per 4x4 nC class, 17 chroma-DC;
    total_zeros row k has 17-k entries, chroma rows 4/3/2)."""

    def prefix_free(codes):
        s = sorted(codes)
        for a, b in zip(s, s[1:]):
            assert not b.startswith(a), (a, b)

    for tbl, n in ((COEFF_TOKEN_NC0, 62), (COEFF_TOKEN_NC2, 62),
                   (COEFF_TOKEN_NC4, 62), (COEFF_TOKEN_CHROMA_DC, 14)):
        assert len(tbl) == n, (len(tbl), n)
        prefix_free(tbl.keys())
        assert sorted(set(tbl.values())) == sorted(
            (t1, tc) for tc in range(0, 17 if n == 62 else 5)
            for t1 in range(0, min(tc, 3) + 1)
        )
    for k, row in TOTAL_ZEROS_4x4.items():
        assert len(row) == 17 - k if k <= 15 else False
        assert sorted(row.values()) == list(range(16 - k + 1))
        prefix_free(row.keys())
    for k, row in TOTAL_ZEROS_CHROMA_DC.items():
        assert sorted(row.values()) == list(range(4 - k + 1))
        prefix_free(row.keys())
    for k, row in RUN_BEFORE.items():
        prefix_free(row.keys())
        assert sorted(row.values()) == list(range(len(row)))


_check_vlc_tables()


def _read_vlc(r: BitReader, table: Dict[str, object], what: str):
    """Walk a code-string table bit by bit (tables are tiny; decode cost
    is bounded by the longest code)."""
    code = ""
    maxlen = max(len(k) for k in table)
    while len(code) < maxlen:
        code += "1" if r.read1() else "0"
        if code in table:
            return table[code]
    raise ValueError(f"h264: invalid {what} code {code!r}")


# ---------------------------------------------------------------------------
# dequantization + inverse transforms (§8.5)

# zigzag scan for 4x4 blocks (§8.5.6)
ZIGZAG_4x4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# LevelScale V matrix per QP%6 (§8.5.9): positions (0,0),(0,2),(2,0),(2,2)
# use v0; (1,1),(1,3),(3,1),(3,3) use v1; the rest v2.
_V_TABLE = [
    (10, 16, 13),
    (11, 18, 14),
    (13, 20, 16),
    (14, 23, 18),
    (16, 25, 20),
    (18, 29, 23),
]


def _level_scale_4x4(qp_rem: int) -> np.ndarray:
    v0, v1, v2 = _V_TABLE[qp_rem]
    m = np.full((4, 4), v2, np.int64)
    for i in (0, 2):
        for j in (0, 2):
            m[i, j] = v0
    for i in (1, 3):
        for j in (1, 3):
            m[i, j] = v1
    return m


def itransform_4x4(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2 core inverse transform on SCALED coefficients d (int64
    (4,4)) → residual (4,4) after the (x + 32) >> 6 rounding."""
    e = np.empty((4, 4), np.int64)
    for i in range(4):
        d0, d1, d2, d3 = d[i]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        e[i] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    out = np.empty((4, 4), np.int64)
    for j in range(4):
        d0, d1, d2, d3 = e[:, j]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        out[:, j] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    return (out + 32) >> 6


def hadamard_4x4(c: np.ndarray) -> np.ndarray:
    """§8.5.10 inverse Hadamard for the Intra_16x16 luma DC plane."""
    f = np.empty((4, 4), np.int64)
    for i in range(4):
        c0, c1, c2, c3 = c[i]
        s0, s1 = c0 + c2, c0 - c2
        s2, s3 = c1 - c3, c1 + c3
        f[i] = (s0 + s3, s1 + s2, s1 - s2, s0 - s3)
    out = np.empty((4, 4), np.int64)
    for j in range(4):
        c0, c1, c2, c3 = f[:, j]
        s0, s1 = c0 + c2, c0 - c2
        s2, s3 = c1 - c3, c1 + c3
        out[:, j] = (s0 + s3, s1 + s2, s1 - s2, s0 - s3)
    return out

# ---------------------------------------------------------------------------
# parameter sets + slice header (§7.3.2, §7.3.3) — baseline intra profile


def parse_sps(rbsp: bytes) -> Dict:
    r = BitReader(rbsp)
    profile_idc = r.read(8)
    r.read(8)  # constraint flags + reserved
    level_idc = r.read(8)
    sps_id = r.ue()
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.read1()
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.read1()  # qpprime_y_zero_transform_bypass
        if r.read1():  # seq_scaling_matrix_present
            raise NotImplementedError("h264: scaling matrices not supported")
        if chroma_format_idc != 1:
            raise NotImplementedError("h264: only 4:2:0 chroma supported")
    log2_max_frame_num = r.ue() + 4
    pic_order_cnt_type = r.ue()
    if pic_order_cnt_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        r.read1()
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.read1()  # gaps_in_frame_num_value_allowed
    pw_mbs = r.ue() + 1
    ph_map_units = r.ue() + 1
    frame_mbs_only = r.read1()
    if not frame_mbs_only:
        raise NotImplementedError("h264: interlaced (MBAFF/fields) not supported")
    r.read1()  # direct_8x8_inference
    crop = [0, 0, 0, 0]
    if r.read1():  # frame_cropping
        crop = [r.ue(), r.ue(), r.ue(), r.ue()]
    width = pw_mbs * 16 - 2 * (crop[0] + crop[1])
    height = ph_map_units * 16 - 2 * (crop[2] + crop[3])
    if width <= 0 or height <= 0:
        raise ValueError("h264: bad cropped dimensions")
    if pw_mbs * 16 * ph_map_units * 16 > _max_decode_pixels():
        raise ValueError(
            "h264: SPS claims a frame over the decode sanity cap "
            "(ODC_STAC_SPARK_H264_MAX_PIXELS)"
        )
    return {
        "sps_id": sps_id, "profile": profile_idc, "level": level_idc,
        "mb_w": pw_mbs, "mb_h": ph_map_units,
        "width": width, "height": height,
        "crop": crop, "log2_max_frame_num": log2_max_frame_num,
        "poc_type": pic_order_cnt_type,
    }


def parse_pps(rbsp: bytes) -> Dict:
    r = BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy_cabac = r.read1()
    if entropy_cabac:
        raise NotImplementedError(
            "h264: CABAC entropy coding needs a native decoder (ffmpeg "
            "seam); baseline CAVLC decodes in-repo"
        )
    r.read1()  # bottom_field_pic_order_in_frame_present
    if r.ue() != 0:  # num_slice_groups_minus1
        raise NotImplementedError("h264: FMO slice groups not supported")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.read1()  # weighted_pred_flag
    r.read(2)  # weighted_bipred_idc
    pic_init_qp = r.se() + 26
    r.se()  # pic_init_qs
    chroma_qp_index_offset = r.se()
    deblocking_control = r.read1()
    constrained_intra = r.read1()
    r.read1()  # redundant_pic_cnt_present
    return {
        "pps_id": pps_id, "sps_id": sps_id,
        "pic_init_qp": pic_init_qp,
        "chroma_qp_index_offset": chroma_qp_index_offset,
        "deblocking_control": deblocking_control,
        "constrained_intra": constrained_intra,
    }


# ---------------------------------------------------------------------------
# CAVLC residual block (§9.2): returns coefficient LEVELS in zigzag order


def decode_cavlc_block(r: BitReader, nc: int, max_coeffs: int) -> List[int]:
    """Decode one residual block's levels (length ``max_coeffs``, scan
    order). ``nc`` is the prediction context (avg of neighbor TotalCoeff;
    -1 for chroma DC)."""
    if nc == -1:
        t1s, total = _read_vlc(r, COEFF_TOKEN_CHROMA_DC, "coeff_token")
    elif nc < 2:
        t1s, total = _read_vlc(r, COEFF_TOKEN_NC0, "coeff_token")
    elif nc < 4:
        t1s, total = _read_vlc(r, COEFF_TOKEN_NC2, "coeff_token")
    elif nc < 8:
        t1s, total = _read_vlc(r, COEFF_TOKEN_NC4, "coeff_token")
    else:  # 6-bit FLC (§9.2.1): (TotalCoeff-1)<<2 | T1s, 000011 = (0,0)
        v = r.read(6)
        if v == 0b000011:
            t1s, total = 0, 0
        else:
            t1s, total = v & 3, (v >> 2) + 1
    if total > max_coeffs:
        raise ValueError("h264: TotalCoeff exceeds block size")
    levels = [0] * max_coeffs
    if total == 0:
        return levels
    # levels, highest frequency first
    lv: List[int] = []
    for _ in range(t1s):
        lv.append(-1 if r.read1() else 1)
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for k in range(t1s, total):
        # §9.2.2.1, verbatim: level_prefix, levelSuffixSize, levelCode
        prefix = 0
        while r.read1() == 0:
            prefix += 1
            if prefix > 19:
                raise ValueError("h264: level_prefix too long")
        if prefix == 14 and suffix_len == 0:
            sz = 4
        elif prefix >= 15:
            sz = prefix - 3
        else:
            sz = suffix_len
        suffix = r.read(sz) if sz else 0
        code = (min(15, prefix) << suffix_len) + suffix
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if k == t1s and t1s < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        lv.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if total < max_coeffs:
        if nc == -1:
            tz = _read_vlc(r, TOTAL_ZEROS_CHROMA_DC[total], "total_zeros")
        else:
            tz = _read_vlc(r, TOTAL_ZEROS_4x4[total], "total_zeros")
    else:
        tz = 0
    # runs of zeros before each coefficient, highest frequency first
    runs = [0] * total
    zeros_left = tz
    for k in range(total - 1):
        if zeros_left > 0:
            run = _read_vlc(r, RUN_BEFORE[min(zeros_left, 7)], "run_before")
        else:
            run = 0
        if run > zeros_left:
            raise ValueError("h264: run_before exceeds zerosLeft")
        runs[k] = run
        zeros_left -= run
    runs[total - 1] = zeros_left
    # place levels into scan order (§9.2.4)
    pos = -1
    for k in range(total - 1, -1, -1):
        pos += runs[k] + 1
        if pos >= max_coeffs:
            raise ValueError("h264: coefficient index out of range")
        levels[pos] = lv[k]
    return levels

# ---------------------------------------------------------------------------
# coded_block_pattern mapping — Table 9-4 (me(v), Intra_4x4 column)

CBP_INTRA_FROM_CODE = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
assert sorted(CBP_INTRA_FROM_CODE) == list(range(48))
CBP_INTRA_TO_CODE = {v: i for i, v in enumerate(CBP_INTRA_FROM_CODE)}

# luma4x4BlkIdx z-scan → (row, col) in 4x4-block units (§6.4.3)
BLK_ZSCAN = [
    (0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (0, 3), (1, 2), (1, 3),
    (2, 0), (2, 1), (3, 0), (3, 1), (2, 2), (2, 3), (3, 2), (3, 3),
]

# chroma QP mapping (Table 8-15); qPi < 30 maps to itself
_QPC_TABLE = {30: 29, 31: 30, 32: 31, 33: 32, 34: 32, 35: 33, 36: 34,
              37: 34, 38: 35, 39: 35, 40: 36, 41: 36, 42: 37, 43: 37,
              44: 37, 45: 38, 46: 38, 47: 38, 48: 39, 49: 39, 50: 39, 51: 39}


def _chroma_qp(qp: int, offset: int) -> int:
    qpi = max(0, min(51, qp + offset))
    return _QPC_TABLE.get(qpi, qpi)


# ---------------------------------------------------------------------------
# intra prediction (§8.3) over padded planes. Planes carry NO border
# trickery (unlike vp8): availability is explicit per the spec.


def _pred4x4(mode: int, plane, by: int, bx: int, avail_up: bool,
             avail_left: bool, avail_ur: bool) -> np.ndarray:
    """9 Intra_4x4 modes (§8.3.1.2). (by, bx) are pixel coords of the
    block's top-left in the luma plane. Above-right samples fall back to
    p[3,-1]-replication when unavailable, per the spec."""
    A = plane[by - 1, bx : bx + 4].astype(np.int32) if avail_up else None
    L = plane[by : by + 4, bx - 1].astype(np.int32) if avail_left else None
    X = int(plane[by - 1, bx - 1]) if (avail_up and avail_left) else 0
    if avail_up:
        if avail_ur:
            AR = plane[by - 1, bx + 4 : bx + 8].astype(np.int32)
        else:
            AR = np.full(4, int(A[3]), np.int32)
    else:
        AR = None
    d = np.empty((4, 4), np.int32)
    if mode == 0:  # Vertical
        if A is None:
            raise ValueError("h264: V pred without above samples")
        d[:] = A[None, :]
    elif mode == 1:  # Horizontal
        if L is None:
            raise ValueError("h264: H pred without left samples")
        d[:] = L[:, None]
    elif mode == 2:  # DC
        if A is not None and L is not None:
            d[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
        elif A is not None:
            d[:] = (int(A.sum()) + 2) >> 2
        elif L is not None:
            d[:] = (int(L.sum()) + 2) >> 2
        else:
            d[:] = 128
    elif mode == 3:  # Diagonal Down-Left
        if A is None:
            raise ValueError("h264: DDL pred without above samples")
        p = np.concatenate([A, AR])
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    d[y, x] = (p[6] + 3 * p[7] + 2) >> 2
                else:
                    k = x + y
                    d[y, x] = (p[k] + 2 * p[k + 1] + p[k + 2] + 2) >> 2
    elif mode == 4:  # Diagonal Down-Right
        if A is None or L is None:
            raise ValueError("h264: DDR pred needs above+left")
        e = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), X,
             int(A[0]), int(A[1]), int(A[2]), int(A[3])]
        for y in range(4):
            for x in range(4):
                k = x - y + 4
                d[y, x] = (e[k - 1] + 2 * e[k] + e[k + 1] + 2) >> 2
    elif mode == 5:  # Vertical-Right (§8.3.1.2.6), zVR = 2x - y
        if A is None or L is None:
            raise ValueError("h264: VR pred needs above+left")
        # e[m+5] = p[m,-1] (above), e[3-y] = p[-1,y] (left), e[4] = p[-1,-1]
        e = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), X,
             int(A[0]), int(A[1]), int(A[2]), int(A[3])]
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                k = x - (y >> 1)
                if z >= 0 and z % 2 == 0:
                    d[y, x] = (e[k + 4] + e[k + 5] + 1) >> 1
                elif z >= 0:
                    d[y, x] = (e[k + 3] + 2 * e[k + 4] + e[k + 5] + 2) >> 2
                elif z == -1:
                    d[y, x] = (e[3] + 2 * e[4] + e[5] + 2) >> 2
                else:  # zVR -2/-3: left-column taps p[-1, y-1..y-3]
                    d[y, x] = (e[4 - y] + 2 * e[5 - y] + e[6 - y] + 2) >> 2
    elif mode == 6:  # Horizontal-Down (§8.3.1.2.7), zHD = 2y - x
        if A is None or L is None:
            raise ValueError("h264: HD pred needs above+left")
        e = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), X,
             int(A[0]), int(A[1]), int(A[2]), int(A[3])]
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                k = y - (x >> 1)  # p[-1, k] = e[3-k]
                if z >= 0 and z % 2 == 0:
                    d[y, x] = (e[4 - k] + e[3 - k] + 1) >> 1
                elif z >= 0:
                    d[y, x] = (e[5 - k] + 2 * e[4 - k] + e[3 - k] + 2) >> 2
                elif z == -1:
                    d[y, x] = (e[3] + 2 * e[4] + e[5] + 2) >> 2
                else:  # zHD -2/-3: above-row taps p[x-1..x-3, -1]
                    d[y, x] = (e[x + 2] + 2 * e[x + 3] + e[x + 4] + 2) >> 2
    elif mode == 7:  # Vertical-Left
        if A is None:
            raise ValueError("h264: VL pred without above samples")
        p = np.concatenate([A, AR])
        for y in range(4):
            for x in range(4):
                k = x + (y >> 1)
                if y % 2 == 0:
                    d[y, x] = (p[k] + p[k + 1] + 1) >> 1
                else:
                    d[y, x] = (p[k] + 2 * p[k + 1] + p[k + 2] + 2) >> 2
    elif mode == 8:  # Horizontal-Up
        if L is None:
            raise ValueError("h264: HU pred without left samples")
        lv = [int(v) for v in L]
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z < 5 and z % 2 == 0:
                    d[y, x] = (lv[y + (x >> 1)] + lv[y + (x >> 1) + 1] + 1) >> 1
                elif z < 5:
                    d[y, x] = (
                        lv[y + (x >> 1)] + 2 * lv[y + (x >> 1) + 1]
                        + lv[y + (x >> 1) + 2] + 2
                    ) >> 2
                elif z == 5:
                    d[y, x] = (lv[2] + 3 * lv[3] + 2) >> 2
                else:
                    d[y, x] = lv[3]
    else:
        raise ValueError(f"h264: bad intra4x4 mode {mode}")
    return d


def _pred16x16(mode: int, plane, y0: int, x0: int, avail_up: bool,
               avail_left: bool) -> np.ndarray:
    """Intra_16x16 modes (§8.3.3): 0=V 1=H 2=DC 3=Plane."""
    d = np.empty((16, 16), np.int32)
    A = plane[y0 - 1, x0 : x0 + 16].astype(np.int32) if avail_up else None
    L = plane[y0 : y0 + 16, x0 - 1].astype(np.int32) if avail_left else None
    if mode == 0:
        if A is None:
            raise ValueError("h264: 16x16 V pred without above")
        d[:] = A[None, :]
    elif mode == 1:
        if L is None:
            raise ValueError("h264: 16x16 H pred without left")
        d[:] = L[:, None]
    elif mode == 2:
        if A is not None and L is not None:
            d[:] = (int(A.sum()) + int(L.sum()) + 16) >> 5
        elif A is not None:
            d[:] = (int(A.sum()) + 8) >> 4
        elif L is not None:
            d[:] = (int(L.sum()) + 8) >> 4
        else:
            d[:] = 128
    elif mode == 3:  # Plane (§8.3.3.4)
        if A is None or L is None:
            raise ValueError("h264: 16x16 plane pred needs above+left")
        X = int(plane[y0 - 1, x0 - 1])
        h = sum((i + 1) * (int(A[8 + i]) - (int(A[6 - i]) if i < 7 else X))
                for i in range(8))
        v = sum((i + 1) * (int(L[8 + i]) - (int(L[6 - i]) if i < 7 else X))
                for i in range(8))
        a = 16 * (int(A[15]) + int(L[15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        yy, xx = np.mgrid[0:16, 0:16]
        d[:] = np.clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5, 0, 255)
    else:
        raise ValueError(f"h264: bad intra16x16 mode {mode}")
    return d


def _pred_chroma(mode: int, plane, y0: int, x0: int, avail_up: bool,
                 avail_left: bool) -> np.ndarray:
    """Chroma 8x8 modes (§8.3.4): 0=DC 1=H 2=V 3=Plane. DC is per-4x4
    quadrant with the spec's corner-specific neighbor choices."""
    d = np.empty((8, 8), np.int32)
    A = plane[y0 - 1, x0 : x0 + 8].astype(np.int32) if avail_up else None
    L = plane[y0 : y0 + 8, x0 - 1].astype(np.int32) if avail_left else None
    if mode == 0:
        for qy in range(2):
            for qx in range(2):
                a = A[qx * 4 : qx * 4 + 4] if A is not None else None
                l = L[qy * 4 : qy * 4 + 4] if L is not None else None
                if qy == 0 and qx == 1:
                    # top-right block prefers above
                    if a is not None:
                        dc = (int(a.sum()) + 2) >> 2
                    elif l is not None:
                        dc = (int(l.sum()) + 2) >> 2
                    else:
                        dc = 128
                elif qy == 1 and qx == 0:
                    # bottom-left block prefers left
                    if l is not None:
                        dc = (int(l.sum()) + 2) >> 2
                    elif a is not None:
                        dc = (int(a.sum()) + 2) >> 2
                    else:
                        dc = 128
                else:
                    if a is not None and l is not None:
                        dc = (int(a.sum()) + int(l.sum()) + 4) >> 3
                    elif a is not None:
                        dc = (int(a.sum()) + 2) >> 2
                    elif l is not None:
                        dc = (int(l.sum()) + 2) >> 2
                    else:
                        dc = 128
                d[qy * 4 : qy * 4 + 4, qx * 4 : qx * 4 + 4] = dc
    elif mode == 1:
        if L is None:
            raise ValueError("h264: chroma H pred without left")
        d[:] = L[:, None]
    elif mode == 2:
        if A is None:
            raise ValueError("h264: chroma V pred without above")
        d[:] = A[None, :]
    elif mode == 3:
        if A is None or L is None:
            raise ValueError("h264: chroma plane pred needs above+left")
        X = int(plane[y0 - 1, x0 - 1])
        h = sum((i + 1) * (int(A[4 + i]) - (int(A[2 - i]) if i < 3 else X))
                for i in range(4))
        v = sum((i + 1) * (int(L[4 + i]) - (int(L[2 - i]) if i < 3 else X))
                for i in range(4))
        a = 16 * (int(A[7]) + int(L[7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        yy, xx = np.mgrid[0:8, 0:8]
        d[:] = np.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5, 0, 255)
    else:
        raise ValueError(f"h264: bad chroma mode {mode}")
    return d

# ---------------------------------------------------------------------------
# slice decode — I slices, single slice group, frame_mbs_only


def parse_slice_header(r: BitReader, sps: Dict, pps: Dict, nal_type: int,
                       nal_ref_idc: int) -> Dict:
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 != 2:  # 2/7 = I (4/9 SI unsupported)
        raise NotImplementedError(
            "h264: only I slices decode in-repo (P/B inter prediction is "
            "the ffmpeg seam)"
        )
    pps_id = r.ue()
    frame_num = r.read(sps["log2_max_frame_num"])
    if nal_type == 5:  # IDR
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        raise NotImplementedError("h264: poc_type 0 header fields not kept by SPS parse")
    # dec_ref_pic_marking (IDR only carries two flags)
    if nal_ref_idc != 0:
        if nal_type == 5:
            r.read1()  # no_output_of_prior_pics
            r.read1()  # long_term_reference_flag
        else:
            if r.read1():  # adaptive_ref_pic_marking_mode
                raise NotImplementedError("h264: adaptive ref marking")
    slice_qp_delta = r.se()
    disable_deblock = 0
    off_a = off_b = 0
    if pps["deblocking_control"]:
        disable_deblock = r.ue()
        if disable_deblock != 1:
            off_a = 2 * r.se()
            off_b = 2 * r.se()
    return {
        "first_mb": first_mb,
        "qp": pps["pic_init_qp"] + slice_qp_delta,
        "disable_deblock": disable_deblock,
        "filter_offset_a": off_a,
        "filter_offset_b": off_b,
        "frame_num": frame_num,
    }


def _nc_context(total_coeffs: Dict[Tuple[int, int], int], by: int, bx: int,
                min_x: int, min_y: int) -> int:
    """§9.2.1 nC from left/above neighbor TotalCoeff maps keyed by
    4x4-block coords (luma or per-component chroma grid)."""
    a = total_coeffs.get((by, bx - 1)) if bx > min_x else None
    b = total_coeffs.get((by - 1, bx)) if by > min_y else None
    if a is not None and b is not None:
        return (a + b + 1) >> 1
    if a is not None:
        return a
    if b is not None:
        return b
    return 0


def decode_islice(sps: Dict, pps: Dict, rbsp: bytes, nal_type: int,
                  nal_ref_idc: int):
    """Decode one I slice covering the whole frame → (Y, U, V) uint8
    planes (§7.3.4/§7.3.5 CAVLC syntax, §8.3/§8.5 reconstruction)."""
    r = BitReader(rbsp)
    hdr = parse_slice_header(r, sps, pps, nal_type, nal_ref_idc)
    if hdr["first_mb"] != 0:
        raise NotImplementedError("h264: multi-slice pictures not supported")
    mb_w, mb_h = sps["mb_w"], sps["mb_h"]
    W, H = mb_w * 16, mb_h * 16
    # planes padded by 1 on top/left so prediction reads are uniform;
    # availability flags (not border values) gate edge behavior
    Y = np.zeros((H + 1, W + 1), np.uint8)
    U = np.zeros((H // 2 + 1, W // 2 + 1), np.uint8)
    V = np.zeros((H // 2 + 1, W // 2 + 1), np.uint8)

    qp = hdr["qp"]
    if not (0 <= qp <= 51):
        raise ValueError("h264: QP out of range")
    # per-4x4-block TotalCoeff maps for nC contexts (frame-global coords)
    tc_luma: Dict[Tuple[int, int], int] = {}
    tc_u: Dict[Tuple[int, int], int] = {}
    tc_v: Dict[Tuple[int, int], int] = {}
    # per-4x4-block intra mode map for Intra_4x4 mode prediction
    mode4: Dict[Tuple[int, int], int] = {}
    mb_kinds: List[str] = []
    mb_qps: List[int] = []

    for mb_idx in range(mb_w * mb_h):
        my, mx = divmod(mb_idx, mb_w)
        mb_type = r.ue()
        if mb_type > 25:
            raise ValueError(f"h264: bad I-slice mb_type {mb_type}")
        y0, x0 = my * 16 + 1, mx * 16 + 1
        cy0, cx0 = my * 8 + 1, mx * 8 + 1
        up, left = my > 0, mx > 0

        if mb_type == 25:  # I_PCM (§7.3.5: pcm_alignment + raw samples)
            while not r.byte_aligned():
                if r.read1():
                    raise ValueError("h264: nonzero pcm_alignment bit")
            luma = np.array([r.read(8) for _ in range(256)], np.uint8)
            Y[y0 : y0 + 16, x0 : x0 + 16] = luma.reshape(16, 16)
            cb = np.array([r.read(8) for _ in range(64)], np.uint8)
            cr = np.array([r.read(8) for _ in range(64)], np.uint8)
            U[cy0 : cy0 + 8, cx0 : cx0 + 8] = cb.reshape(8, 8)
            V[cy0 : cy0 + 8, cx0 : cx0 + 8] = cr.reshape(8, 8)
            # PCM blocks count TotalCoeff 16 for neighbor contexts (§9.2.1)
            for byy in range(4):
                for bxx in range(4):
                    tc_luma[(my * 4 + byy, mx * 4 + bxx)] = 16
                    mode4[(my * 4 + byy, mx * 4 + bxx)] = 2
            for byy in range(2):
                for bxx in range(2):
                    tc_u[(my * 2 + byy, mx * 2 + bxx)] = 16
                    tc_v[(my * 2 + byy, mx * 2 + bxx)] = 16
            mb_kinds.append("pcm")
            mb_qps.append(0)  # §8.7: I_PCM counts QPy = 0 for deblocking
            continue

        if mb_type == 0:  # I_4x4
            modes = []
            for blk in range(16):
                byy, bxx = BLK_ZSCAN[blk]
                gby, gbx = my * 4 + byy, mx * 4 + bxx
                ma = mode4.get((gby, gbx - 1), -1) if gbx > 0 else -1
                mb_ = mode4.get((gby - 1, gbx), -1) if gby > 0 else -1
                pred_mode = 2 if (ma < 0 or mb_ < 0) else min(ma, mb_)
                if r.read1():  # prev_intra4x4_pred_mode_flag
                    m = pred_mode
                else:
                    rem = r.read(3)
                    m = rem if rem < pred_mode else rem + 1
                modes.append(m)
                mode4[(gby, gbx)] = m
            chroma_mode = r.ue()
            cbp_code = r.ue()
            if cbp_code > 47:
                raise ValueError("h264: coded_block_pattern code out of range")
            cbp = CBP_INTRA_FROM_CODE[cbp_code]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            i16_mode = None
        else:  # I_16x16
            i16_mode = (mb_type - 1) % 4
            cbp_chroma = ((mb_type - 1) // 4) % 3
            cbp_luma = 15 if mb_type - 1 >= 12 else 0
            chroma_mode = r.ue()
            modes = None

        if cbp_luma or cbp_chroma or i16_mode is not None:
            qp = qp + r.se()  # mb_qp_delta
            if not (0 <= qp <= 51):
                raise ValueError("h264: QP out of range after delta")
        ls = _level_scale_4x4(qp % 6)
        qp_shift = qp // 6
        qpc = _chroma_qp(qp, pps["chroma_qp_index_offset"])
        lsc = _level_scale_4x4(qpc % 6)
        qpc_shift = qpc // 6

        # ---- residual parse (§7.3.5.3.3 CAVLC ordering)
        dc_plane = None
        if i16_mode is not None:
            nc = _nc_context(tc_luma, my * 4, mx * 4, 0, 0)
            dc_levels = decode_cavlc_block(r, nc, 16)
            c = np.zeros((4, 4), np.int64)
            for k, lv in enumerate(dc_levels):
                c[ZIGZAG_4x4[k] // 4, ZIGZAG_4x4[k] % 4] = lv
            f = hadamard_4x4(c)
            if qp >= 12:
                dc_plane = (f * int(ls[0, 0])) << (qp_shift - 2)
            else:
                dc_plane = (f * int(ls[0, 0]) + (1 << (1 - qp_shift))) >> (
                    2 - qp_shift
                )
            # NB: Intra16x16DCLevel does NOT update nC maps (§9.2.1 uses
            # the AC/luma TotalCoeff of the 4x4 blocks)

        luma_res: List[Optional[np.ndarray]] = [None] * 16
        for blk8 in range(4):
            for sub in range(4):
                blk = blk8 * 4 + sub
                byy, bxx = BLK_ZSCAN[blk]
                gby, gbx = my * 4 + byy, mx * 4 + bxx
                if not (cbp_luma & (1 << blk8)):
                    tc_luma[(gby, gbx)] = 0
                    continue
                nc = _nc_context(tc_luma, gby, gbx, 0, 0)
                if i16_mode is not None:
                    levels = decode_cavlc_block(r, nc, 15)
                    start = 1
                else:
                    levels = decode_cavlc_block(r, nc, 16)
                    start = 0
                tc_luma[(gby, gbx)] = sum(1 for v in levels if v)
                d = np.zeros((4, 4), np.int64)
                for k, lv in enumerate(levels):
                    if lv:
                        zz = ZIGZAG_4x4[k + start]
                        d[zz // 4, zz % 4] = lv * int(ls[zz // 4, zz % 4]) << qp_shift
                luma_res[blk] = d
        # chroma DC (2x2 per component) + AC
        chroma_dc = {0: np.zeros((2, 2), np.int64), 1: np.zeros((2, 2), np.int64)}
        if cbp_chroma:
            for comp in range(2):
                levels = decode_cavlc_block(r, -1, 4)
                # 2x2 "Hadamard": raster order c00 c01 c10 c11
                c = np.array(
                    [[levels[0], levels[1]], [levels[2], levels[3]]], np.int64
                )
                f = np.array(
                    [
                        [c[0, 0] + c[0, 1] + c[1, 0] + c[1, 1],
                         c[0, 0] - c[0, 1] + c[1, 0] - c[1, 1]],
                        [c[0, 0] + c[0, 1] - c[1, 0] - c[1, 1],
                         c[0, 0] - c[0, 1] - c[1, 0] + c[1, 1]],
                    ],
                    np.int64,
                )
                chroma_dc[comp] = (f * int(lsc[0, 0]) << qpc_shift) >> 5
        chroma_res = {0: [None] * 4, 1: [None] * 4}
        if cbp_chroma & 2:
            for comp in range(2):
                tc_map = tc_u if comp == 0 else tc_v
                for blk in range(4):
                    byy, bxx = blk // 2, blk % 2
                    gby, gbx = my * 2 + byy, mx * 2 + bxx
                    nc = _nc_context(tc_map, gby, gbx, 0, 0)
                    levels = decode_cavlc_block(r, nc, 15)
                    tc_map[(gby, gbx)] = sum(1 for v in levels if v)
                    d = np.zeros((4, 4), np.int64)
                    for k, lv in enumerate(levels):
                        if lv:
                            zz = ZIGZAG_4x4[k + 1]
                            d[zz // 4, zz % 4] = (
                                lv * int(lsc[zz // 4, zz % 4]) << qpc_shift
                            )
                    chroma_res[comp][blk] = d
        else:
            for comp, tc_map in ((0, tc_u), (1, tc_v)):
                for blk in range(4):
                    tc_map[(my * 2 + blk // 2, mx * 2 + blk % 2)] = 0

        # ---- reconstruction
        if i16_mode is not None:
            pred = _pred16x16(i16_mode, Y, y0, x0, up, left)
            out = pred.copy()
            for blk in range(16):
                byy, bxx = BLK_ZSCAN[blk]
                d = luma_res[blk]
                if d is None:
                    d = np.zeros((4, 4), np.int64)
                else:
                    d = d.copy()
                d[0, 0] = int(dc_plane[byy, bxx])
                res = itransform_4x4(d)
                out[byy * 4 : byy * 4 + 4, bxx * 4 : bxx * 4 + 4] += res.astype(
                    np.int32
                )
            Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(out, 0, 255)
            for byy in range(4):
                for bxx in range(4):
                    mode4[(my * 4 + byy, mx * 4 + bxx)] = 2  # DC for neighbors
            mb_kinds.append("i16")
            mb_qps.append(qp)
        else:
            # I_4x4: per-block predict+reconstruct in z-scan decode order
            for blk in range(16):
                byy, bxx = BLK_ZSCAN[blk]
                by, bx = y0 + byy * 4, x0 + bxx * 4
                avail_up = up or byy > 0
                avail_left = left or bxx > 0
                # above-right availability (§8.3.1.2): sample row exists
                # AND is already decoded in raster/z order
                gby, gbx = my * 4 + byy, mx * 4 + bxx
                if byy == 0:
                    avail_ur = up and (gbx + 1 < mb_w * 4)
                else:
                    # within the MB: above-right block must precede in z
                    if bxx == 3:
                        avail_ur = False
                    else:
                        nb = BLK_ZSCAN.index((byy - 1, bxx + 1))
                        avail_ur = nb < blk
                pred = _pred4x4(modes[blk], Y, by, bx, avail_up, avail_left,
                                avail_ur)
                d = luma_res[blk]
                if d is not None:
                    pred = pred + itransform_4x4(d).astype(np.int32)
                Y[by : by + 4, bx : bx + 4] = np.clip(pred, 0, 255)
            mb_kinds.append("i4")
            mb_qps.append(qp)

        for comp, plane, cdc in ((0, U, chroma_dc[0]), (1, V, chroma_dc[1])):
            pred = _pred_chroma(chroma_mode, plane, cy0, cx0, up, left)
            out = pred.copy()
            for blk in range(4):
                byy, bxx = blk // 2, blk % 2
                d = chroma_res[comp][blk]
                if d is None:
                    d = np.zeros((4, 4), np.int64)
                else:
                    d = d.copy()
                d[0, 0] = int(cdc[byy, bxx])
                if d.any():
                    res = itransform_4x4(d)
                    out[byy * 4 : byy * 4 + 4, bxx * 4 : bxx * 4 + 4] += (
                        res.astype(np.int32)
                    )
            plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(out, 0, 255)

    if hdr["disable_deblock"] != 1:
        # idc 0 (and 2 — slice-edge suppression is moot for a
        # single-slice picture) → §8.7 in-loop filter
        deblock_intra_frame(
            Y, U, V, mb_qps, mb_w, mb_h, pps["chroma_qp_index_offset"],
            hdr["filter_offset_a"], hdr["filter_offset_b"],
        )
    w, h = sps["width"], sps["height"]
    return (
        np.ascontiguousarray(Y[1 : h + 1, 1 : w + 1]),
        np.ascontiguousarray(U[1 : h // 2 + 1, 1 : (w + 1) // 2 + 1]),
        np.ascontiguousarray(V[1 : h // 2 + 1, 1 : (w + 1) // 2 + 1]),
    )

# ---------------------------------------------------------------------------
# stream-level decode entry points


def split_annexb(data: bytes) -> List[bytes]:
    """Annex-B byte stream → raw NAL units (3- or 4-byte start codes)."""
    nals = []
    i, n = 0, len(data)
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            j = i + 3
            k = j
            while k + 3 <= n and not (
                data[k] == 0 and data[k + 1] == 0 and data[k + 2] == 1
            ):
                k += 1
            end = k if k + 3 <= n else n
            # trim the optional 0 of a 4-byte start code belonging to next
            while end > j and data[end - 1] == 0 and end < n:
                end -= 1
            nals.append(data[j:end])
            i = k
        else:
            i += 1
    if not nals:
        raise ValueError("h264: no NAL start codes found")
    return nals


def decode_h264_planes(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Annex-B stream (SPS + PPS + one IDR/I slice) → (Y, U, V) planes."""
    sps = pps = None
    for nal in split_annexb(data):
        if not nal:
            continue
        if nal[0] & 0x80:
            raise ValueError("h264: forbidden_zero_bit set")
        ref_idc = (nal[0] >> 5) & 3
        ntype = nal[0] & 0x1F
        rbsp = unescape_rbsp(nal[1:])
        if ntype == 7:
            sps = parse_sps(rbsp)
        elif ntype == 8:
            pps = parse_pps(rbsp)
        elif ntype in (1, 5):
            if sps is None or pps is None:
                raise ValueError("h264: slice before SPS/PPS")
            return decode_islice(sps, pps, rbsp, ntype, ref_idc)
        # SEI (6), AUD (9) etc.: skipped
    raise ValueError("h264: no slice NAL found")


def decode_avcc_frame(avcc: bytes, sample: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """MP4 'avcC' decoder-config + one length-prefixed sample → planes."""
    if len(avcc) < 7 or avcc[0] != 1:
        raise ValueError("h264: bad avcC configuration record")
    nal_len_size = (avcc[4] & 3) + 1
    pos = 5
    n_sps = avcc[pos] & 0x1F
    pos += 1
    sps = pps = None
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", avcc, pos)
        pos += 2
        sps = parse_sps(unescape_rbsp(avcc[pos + 1 : pos + ln]))
        pos += ln
    n_pps = avcc[pos]
    pos += 1
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", avcc, pos)
        pos += 2
        pps = parse_pps(unescape_rbsp(avcc[pos + 1 : pos + ln]))
        pos += ln
    if sps is None or pps is None:
        raise ValueError("h264: avcC carries no SPS/PPS")
    i = 0
    while i + nal_len_size <= len(sample):
        ln = int.from_bytes(sample[i : i + nal_len_size], "big")
        i += nal_len_size
        if ln == 0 or i + ln > len(sample):
            raise ValueError("h264: bad sample NAL length")
        nal = sample[i : i + ln]
        i += ln
        ntype = nal[0] & 0x1F
        if ntype in (1, 5):
            return decode_islice(
                sps, pps, unescape_rbsp(nal[1:]), ntype, (nal[0] >> 5) & 3
            )
    raise ValueError("h264: sample contains no slice NAL")


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Same sample-and-hold + full-range BT.601 integer conversion as the
    VP8 path (operators/vp8.py) — gray content is exact by construction."""
    h, w = y.shape
    uu = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    vv = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    yy = y.astype(np.int32)
    r = yy + ((91881 * vv + 32768) >> 16)
    g = yy - ((22554 * uu + 46802 * vv + 32768) >> 16)
    b = yy + ((116130 * uu + 32768) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_h264(data: bytes) -> np.ndarray:
    """Annex-B IDR stream → (h, w, 3) uint8 RGB."""
    return yuv420_to_rgb(*decode_h264_planes(data))


# ---------------------------------------------------------------------------
# encoder — spec-valid IDR streams for 4x4-lattice grayscale content.

_COEFF_TOKEN_ENC = {
    0: {v: k for k, v in COEFF_TOKEN_NC0.items()},
    2: {v: k for k, v in COEFF_TOKEN_NC2.items()},
    4: {v: k for k, v in COEFF_TOKEN_NC4.items()},
    -1: {v: k for k, v in COEFF_TOKEN_CHROMA_DC.items()},
}
_TZ_ENC = {k: {v2: k2 for k2, v2 in row.items()} for k, row in TOTAL_ZEROS_4x4.items()}


def _coeff_token_str(nc: int, t1s: int, total: int) -> str:
    if nc == -1:
        return _COEFF_TOKEN_ENC[-1][(t1s, total)]
    if nc < 2:
        return _COEFF_TOKEN_ENC[0][(t1s, total)]
    if nc < 4:
        return _COEFF_TOKEN_ENC[2][(t1s, total)]
    if nc < 8:
        return _COEFF_TOKEN_ENC[4][(t1s, total)]
    if total == 0:
        return "000011"
    return format(((total - 1) << 2) | t1s, "06b")


def _write_dc_only_block(w: BitWriter, nc: int, level: int) -> int:
    """Emit a CAVLC block whose only coefficient is ``level`` at scan
    position 0 (or an empty block when level == 0); returns TotalCoeff."""
    if level == 0:
        w.write_str(_coeff_token_str(nc, 0, 0))
        return 0
    if abs(level) == 1:
        w.write_str(_coeff_token_str(nc, 1, 1))
        w.write(1 if level < 0 else 0, 1)  # trailing-one sign
    else:
        w.write_str(_coeff_token_str(nc, 0, 1))
        base = 2 * abs(level) - 2 if level > 0 else 2 * abs(level) - 1
        tcode = base - 2  # decoder adds 2 for the first coeff (T1s<3)
        if tcode < 14:
            w.write(0, tcode)
            w.write(1, 1)
        elif tcode < 30:
            w.write(0, 14)
            w.write(1, 1)
            w.write(tcode - 14, 4)
        elif tcode < 30 + 4096:
            w.write(0, 15)
            w.write(1, 1)
            w.write(tcode - 30, 12)
        else:
            raise ValueError("h264: level too large for baseline escape")
    # total_zeros (TotalCoeff=1 < maxNumCoeff): 0 zeros
    w.write_str({v: k for k, v in TOTAL_ZEROS_4x4[1].items()}[0])
    return 1


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + escape_rbsp(rbsp)


def build_sps_rbsp(w_px: int, h_px: int) -> bytes:
    if w_px % 2 or h_px % 2:
        raise ValueError("h264: 4:2:0 requires even dimensions")
    mb_w, mb_h = (w_px + 15) // 16, (h_px + 15) // 16
    w = BitWriter()
    w.write(66, 8)  # profile_idc: baseline
    w.write(0, 8)  # constraint flags
    w.write(30, 8)  # level 3.0
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type
    w.ue(0)  # max_num_ref_frames
    w.write(0, 1)  # gaps_in_frame_num
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)  # frame_mbs_only
    w.write(0, 1)  # direct_8x8_inference
    crop_r = (mb_w * 16 - w_px) // 2
    crop_b = (mb_h * 16 - h_px) // 2
    if crop_r or crop_b:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.write(0, 1)
    w.write(0, 1)  # vui_parameters_present
    w.rbsp_trailing()
    return w.getvalue()


def build_pps_rbsp() -> bytes:
    w = BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.write(0, 1)  # entropy: CAVLC
    w.write(0, 1)  # bottom_field_pic_order
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0
    w.ue(0)  # num_ref_idx_l1
    w.write(0, 1)  # weighted_pred
    w.write(0, 2)  # weighted_bipred_idc
    w.se(-26)  # pic_init_qp_minus26 → QP 0
    w.se(0)  # pic_init_qs
    w.se(0)  # chroma_qp_index_offset
    w.write(1, 1)  # deblocking_filter_control_present
    w.write(0, 1)  # constrained_intra_pred
    w.write(0, 1)  # redundant_pic_cnt_present
    w.rbsp_trailing()
    return w.getvalue()


def _plan_h264_mb(pad: np.ndarray, my: int, mx: int, mb_w: int, mb_h: int,
                  pcm: bool) -> Dict:
    """Mode decision (QP=0, exact lattice contract): I_PCM when forced,
    16x16 V/H/DC with zero residual, 16x16 DC + single Hadamard level
    for uniform offsets (|c| ≤ 80 — baseline level escape bound), else
    I_4x4 DC with one level per 4x4 block."""
    y0, x0 = my * 16 + 1, mx * 16 + 1
    tgt = pad[y0 : y0 + 16, x0 : x0 + 16].astype(np.int32)
    up, left = my > 0, mx > 0
    if pcm:
        return {"kind": "pcm", "tgt": tgt}
    for m in (0, 1, 2):  # V, H, DC — V/H need availability
        if (m == 0 and not up) or (m == 1 and not left):
            continue
        pred = _pred16x16(m, pad, y0, x0, up, left)
        if (pred == tgt).all():
            return {"kind": "i16", "mode": m, "dc_level": 0}
    dc_pred = _pred16x16(2, pad, y0, x0, up, left)
    diff = tgt - dc_pred
    c0 = int(diff[0, 0])
    if c0 != 0 and abs(c0) <= 80 and (diff == c0).all():
        # single Hadamard DC level L: all 16 luma DCs = (10L+2)>>2, each
        # block residual = (dcY+32)>>6 — search the |ΔdcY|≈2.5 lattice
        for L in range(int(25.6 * c0) - 4, int(25.6 * c0) + 5):
            dcy = (10 * L + 2) >> 2
            if (dcy + 32) >> 6 == c0 and abs(L) >= 2:
                return {"kind": "i16", "mode": 2, "dc_level": L}
    levels = []
    for blk in range(16):
        byy, bxx = BLK_ZSCAN[blk]
        blkv = tgt[byy * 4 : byy * 4 + 4, bxx * 4 : bxx * 4 + 4]
        v0 = int(blkv[0, 0])
        if not (blkv == v0).all():
            raise ValueError(
                "encode_h264_gray: content must be constant per 4x4 block "
                "(the DC-only exact-lattice contract; see module docstring)"
            )
        levels.append(v0)  # target value; residual resolved at write time
    return {"kind": "i4", "targets": levels}


def encode_h264_gray(img: np.ndarray, pcm_every: int = 0,
                     deblock: bool = False) -> bytes:
    """Encode grayscale 4x4-lattice content into a spec-valid Annex-B IDR
    stream that reconstructs EXACTLY (QP=0 — where §8.7's alpha/beta
    thresholds are both 0, so even an ENABLED deblocking filter is a
    provable no-op; ``deblock=True`` writes idc 0 to exercise that
    path). ``pcm_every`` > 0 forces every Nth macroblock to I_PCM
    (raw samples — also exact)."""
    if img.ndim == 3:
        if img.shape[2] != 1:
            raise ValueError("encode_h264_gray: grayscale input only")
        img = img[:, :, 0]
    h_px, w_px = img.shape
    if w_px % 2 or h_px % 2:
        raise ValueError("encode_h264_gray: 4:2:0 needs even dimensions")
    mb_w, mb_h = (w_px + 15) // 16, (h_px + 15) // 16
    pad = np.pad(img.astype(np.uint8),
                 ((1, mb_h * 16 - h_px), (1, mb_w * 16 - w_px)), mode="edge")
    # pad[0,:] / pad[:,0] are never read (availability flags gate edges)

    w = BitWriter()
    # slice header (IDR, I slice, QP 0, deblocking off)
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type: I (all slices in picture)
    w.ue(0)  # pps_id
    w.write(0, 4)  # frame_num
    w.ue(0)  # idr_pic_id
    w.write(0, 1)  # no_output_of_prior_pics
    w.write(0, 1)  # long_term_reference
    w.se(0)  # slice_qp_delta
    if deblock:
        w.ue(0)  # filter on (a no-op at QP 0: alpha = beta = 0)
        w.se(0)  # slice_alpha_c0_offset_div2
        w.se(0)  # slice_beta_offset_div2
    else:
        w.ue(1)  # disable_deblocking_filter_idc

    tc_luma: Dict[Tuple[int, int], int] = {}
    tc_u: Dict[Tuple[int, int], int] = {}
    tc_v: Dict[Tuple[int, int], int] = {}
    mode4: Dict[Tuple[int, int], int] = {}
    for mb_idx in range(mb_w * mb_h):
        my, mx = divmod(mb_idx, mb_w)
        pcm = pcm_every > 0 and mb_idx % pcm_every == 0
        plan = _plan_h264_mb(pad, my, mx, mb_w, mb_h, pcm)
        if plan["kind"] == "pcm":
            w.ue(25)
            while len(w.bits) % 8:
                w.bits.append(0)  # pcm_alignment_zero_bit
            for v in plan["tgt"].flatten():
                w.write(int(v), 8)
            for _ in range(128):
                w.write(128, 8)  # flat chroma
            for byy in range(4):
                for bxx in range(4):
                    tc_luma[(my * 4 + byy, mx * 4 + bxx)] = 16
                    mode4[(my * 4 + byy, mx * 4 + bxx)] = 2
            for byy in range(2):
                for bxx in range(2):
                    tc_u[(my * 2 + byy, mx * 2 + bxx)] = 16
                    tc_v[(my * 2 + byy, mx * 2 + bxx)] = 16
            continue
        if plan["kind"] == "i16":
            # mb_type 1..24: 1 + mode (+12 would set luma CBP 15 — never
            # needed: our I16 MBs are AC-free)
            w.ue(1 + plan["mode"])
            w.ue(0)  # intra_chroma_pred_mode: DC
            w.se(0)  # mb_qp_delta (always present for I_16x16)
            nc = _nc_context(tc_luma, my * 4, mx * 4, 0, 0)
            _write_dc_only_block(w, nc, plan["dc_level"])
            for byy in range(4):
                for bxx in range(4):
                    tc_luma[(my * 4 + byy, mx * 4 + bxx)] = 0
                    mode4[(my * 4 + byy, mx * 4 + bxx)] = 2
            for comp, tc_map in ((0, tc_u), (1, tc_v)):
                for blk in range(4):
                    tc_map[(my * 2 + blk // 2, mx * 2 + blk % 2)] = 0
            continue
        # ---- I_4x4: resolve residual levels against the exact recon
        # state (pad IS the reconstruction), writing modes then residuals
        w.ue(0)  # mb_type I_4x4
        y0, x0 = my * 16 + 1, mx * 16 + 1
        up, left = my > 0, mx > 0
        blk_levels = []
        for blk in range(16):
            byy, bxx = BLK_ZSCAN[blk]
            gby, gbx = my * 4 + byy, mx * 4 + bxx
            ma = mode4.get((gby, gbx - 1), -1) if gbx > 0 else -1
            mb_ = mode4.get((gby - 1, gbx), -1) if gby > 0 else -1
            pred_mode = 2 if (ma < 0 or mb_ < 0) else min(ma, mb_)
            if pred_mode == 2:
                w.write(1, 1)  # prev_intra4x4_pred_mode_flag → DC
            else:
                w.write(0, 1)
                rem = 2 if 2 < pred_mode else 1  # rem maps to mode 2
                w.write(rem, 3)
            mode4[(gby, gbx)] = 2
            # DC prediction value from the exact recon state
            by, bx = y0 + byy * 4, x0 + bxx * 4
            avail_up = up or byy > 0
            avail_left = left or bxx > 0
            A = pad[by - 1, bx : bx + 4].astype(np.int32) if avail_up else None
            L = pad[by : by + 4, bx - 1].astype(np.int32) if avail_left else None
            if A is not None and L is not None:
                dc = (int(A.sum()) + int(L.sum()) + 4) >> 3
            elif A is not None:
                dc = (int(A.sum()) + 2) >> 2
            elif L is not None:
                dc = (int(L.sum()) + 2) >> 2
            else:
                dc = 128
            c = plan["targets"][blk] - dc
            if c == 0:
                blk_levels.append(0)
            else:
                # (10L + 32) >> 6 == c  →  10L ∈ [64c-32, 64c+31]
                L10 = -((32 - 64 * c) // 10) if c > 0 else -((32 - 64 * c) // 10)
                L10 = (64 * c - 32 + 9) // 10  # ceil
                assert (10 * L10 + 32) >> 6 == c, (c, L10)
                blk_levels.append(L10)
        w.ue(0)  # intra_chroma_pred_mode: DC
        cbp_luma = 0
        for blk8 in range(4):
            if any(blk_levels[blk8 * 4 + s] for s in range(4)):
                cbp_luma |= 1 << blk8
        w.ue(CBP_INTRA_TO_CODE[cbp_luma])  # chroma CBP 0
        if cbp_luma:
            w.se(0)  # mb_qp_delta
        for blk8 in range(4):
            for sub in range(4):
                blk = blk8 * 4 + sub
                byy, bxx = BLK_ZSCAN[blk]
                gby, gbx = my * 4 + byy, mx * 4 + bxx
                if not (cbp_luma & (1 << blk8)):
                    tc_luma[(gby, gbx)] = 0
                    continue
                nc = _nc_context(tc_luma, gby, gbx, 0, 0)
                tc_luma[(gby, gbx)] = _write_dc_only_block(
                    w, nc, blk_levels[blk]
                )
        for comp, tc_map in ((0, tc_u), (1, tc_v)):
            for blk in range(4):
                tc_map[(my * 2 + blk // 2, mx * 2 + blk % 2)] = 0
    w.rbsp_trailing()
    slice_rbsp = w.getvalue()
    return (
        _nal(7, 3, build_sps_rbsp(w_px, h_px))
        + _nal(8, 3, build_pps_rbsp())
        + _nal(5, 3, slice_rbsp)
    )

# ---------------------------------------------------------------------------
# in-loop deblocking filter — §8.7 (intra pictures: bS 4 on MB edges,
# 3 on internal transform edges). Vectorized along each edge.

_DEBLOCK_ALPHA = [0] * 16 + [
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
    226, 255, 255,
]
_DEBLOCK_BETA = [0] * 16 + [
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
    11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18,
]
# tC0 (Table 8-17) rows for bS 1..3
_DEBLOCK_TC0 = [
    [0] * 16 + [0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
                2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13],
    [0] * 16 + [0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
                2, 3, 3, 3, 4, 4, 5, 6, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17],
    [0] * 16 + [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3,
                4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25],
]
assert all(len(t) == 52 for t in (_DEBLOCK_ALPHA, _DEBLOCK_BETA, *_DEBLOCK_TC0))


def _deblock_core(blk: np.ndarray, bS: int, qp: int, chroma: bool,
                  off_a: int = 0, off_b: int = 0) -> np.ndarray:
    """Filter one edge. ``blk``: (n, 8) int32 rows [p3..p0 q0..q3] across
    the edge. Returns the filtered copy (§8.7.2.3/8.7.2.4). indexA/B =
    Clip3(0, 51, qp + slice filter offset) per §8.7.2.2."""
    ia = max(0, min(51, qp + off_a))
    ib = max(0, min(51, qp + off_b))
    alpha, beta = _DEBLOCK_ALPHA[ia], _DEBLOCK_BETA[ib]
    p3, p2, p1, p0, q0, q1, q2, q3 = (blk[:, k] for k in range(8))
    filt = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    out = blk.copy()
    if not filt.any():
        return out
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    if bS == 4:
        deep = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        if chroma:
            out[:, 3] = np.where(filt, (2 * p1 + p0 + q1 + 2) >> 2, p0)
            out[:, 4] = np.where(filt, (2 * q1 + q0 + p1 + 2) >> 2, q0)
        else:
            sp = filt & ap & deep
            sq = filt & aq & deep
            out[:, 3] = np.where(
                sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                np.where(filt, (2 * p1 + p0 + q1 + 2) >> 2, p0),
            )
            out[:, 2] = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
            out[:, 1] = np.where(
                sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2
            )
            out[:, 4] = np.where(
                sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                np.where(filt, (2 * q1 + q0 + p1 + 2) >> 2, q0),
            )
            out[:, 5] = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
            out[:, 6] = np.where(
                sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2
            )
        return out
    tc0 = _DEBLOCK_TC0[bS - 1][ia]
    if chroma:
        tc = tc0 + 1
    else:
        tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
    delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    out[:, 3] = np.where(filt, np.clip(p0 + delta, 0, 255), p0)
    out[:, 4] = np.where(filt, np.clip(q0 - delta, 0, 255), q0)
    if not chroma:
        dp1 = np.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
        out[:, 2] = np.where(filt & ap, p1 + dp1, p1)
        dq1 = np.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
        out[:, 5] = np.where(filt & aq, q1 + dq1, q1)
    return out


def _deblock_edge_v(plane, x, y0, n, bS, qp, chroma, off_a=0, off_b=0):
    blk = plane[y0 : y0 + n, x - 4 : x + 4].astype(np.int32)
    plane[y0 : y0 + n, x - 4 : x + 4] = np.clip(
        _deblock_core(blk, bS, qp, chroma, off_a, off_b), 0, 255
    )


def _deblock_edge_h(plane, y, x0, n, bS, qp, chroma, off_a=0, off_b=0):
    blk = np.ascontiguousarray(plane[y - 4 : y + 4, x0 : x0 + n].T).astype(np.int32)
    plane[y - 4 : y + 4, x0 : x0 + n] = np.clip(
        _deblock_core(blk, bS, qp, chroma, off_a, off_b), 0, 255
    ).T


def deblock_intra_frame(Y, U, V, mb_qps: List[int], mb_w: int, mb_h: int,
                        chroma_qp_offset: int, off_a: int = 0,
                        off_b: int = 0) -> None:
    """Apply §8.7 to a fully-intra picture in MB raster order (vertical
    edges left→right then horizontal top→bottom, on already-filtered
    samples). Planes carry the decoder's 1-px top/left pad; the views
    below strip it (every filtered edge is ≥4 samples from the frame
    edge, so the p3..p0 gathers stay in-bounds)."""
    Yv = Y[1:, 1:]
    Uv, Vv = U[1:, 1:], V[1:, 1:]
    for my in range(mb_h):
        for mx in range(mb_w):
            qp = mb_qps[my * mb_w + mx]
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            if mx > 0:
                qp_avg = (mb_qps[my * mb_w + mx - 1] + qp + 1) >> 1
                _deblock_edge_v(Yv, x0, y0, 16, 4, qp_avg, False, off_a, off_b)
                qpc = (
                    _chroma_qp(mb_qps[my * mb_w + mx - 1], chroma_qp_offset)
                    + _chroma_qp(qp, chroma_qp_offset) + 1
                ) >> 1
                _deblock_edge_v(Uv, cx0, cy0, 8, 4, qpc, True, off_a, off_b)
                _deblock_edge_v(Vv, cx0, cy0, 8, 4, qpc, True, off_a, off_b)
            qpc_own = _chroma_qp(qp, chroma_qp_offset)
            for dx in (4, 8, 12):
                _deblock_edge_v(Yv, x0 + dx, y0, 16, 3, qp, False, off_a, off_b)
            _deblock_edge_v(Uv, cx0 + 4, cy0, 8, 3, qpc_own, True, off_a, off_b)
            _deblock_edge_v(Vv, cx0 + 4, cy0, 8, 3, qpc_own, True, off_a, off_b)
            if my > 0:
                qp_avg = (mb_qps[(my - 1) * mb_w + mx] + qp + 1) >> 1
                _deblock_edge_h(Yv, y0, x0, 16, 4, qp_avg, False, off_a, off_b)
                qpc = (
                    _chroma_qp(mb_qps[(my - 1) * mb_w + mx], chroma_qp_offset)
                    + _chroma_qp(qp, chroma_qp_offset) + 1
                ) >> 1
                _deblock_edge_h(Uv, cy0, cx0, 8, 4, qpc, True, off_a, off_b)
                _deblock_edge_h(Vv, cy0, cx0, 8, 4, qpc, True, off_a, off_b)
            for dy in (4, 8, 12):
                _deblock_edge_h(Yv, y0 + dy, x0, 16, 3, qp, False, off_a, off_b)
            _deblock_edge_h(Uv, cy0 + 4, cx0, 8, 3, qpc_own, True, off_a, off_b)
            _deblock_edge_h(Vv, cy0 + 4, cx0, 8, 3, qpc_own, True, off_a, off_b)
