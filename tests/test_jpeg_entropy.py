"""Independent-writer verification of the baseline JPEG entropy decoder
(operators/jpeg.py) with VARIABLE-length Huffman tables.

The shipped encoder emits uniform-length canonical tables (every symbol
8 bits, module docstring), so own-encoder roundtrips never exercise the
decoder's general DHT path: canonical code reconstruction across mixed
code lengths, the 16-bit-peek LUT fill for short codes, receive/extend
magnitude decoding at every category, ZRL runs, mid-block EOB, DC
prediction and RSTn predictor resets under codes of assorted lengths —
exactly the layer a real-world (Annex-K-table) JPEG hits first.

This file closes that gap the same way the VP8/H.264 suites do: a
test-local bit writer assembles complete JFIF streams from hand-chosen
variable-length tables (lengths 2..9) and spec-transcribed DHT/SOF/SOS
segments, expected pixels come from an independent scalar IDCT model,
and the shipped decoder must reproduce them exactly. The tables are NOT
the encoder's; nothing here calls the shipped encoder or its helpers.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from odc_stac_spark.operators.jpeg import decode_jpeg

# ---------------------------------------------------------------------------
# independent bit writer with 0xFF byte stuffing


class BitW:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def finish(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3
        return bytes(self.bytes)


# ---------------------------------------------------------------------------
# variable-length canonical tables (hand-chosen; NOT the encoder's uniform
# tables and NOT Annex K — lengths 2..9 so the decoder's multi-length
# reconstruction actually matters)

# DC: categories 0..11, lengths 2..8 (Kraft sum 0.74 — valid and
# prefix-free under the canonical assignment).
DC_BITS = [0, 1, 2, 2, 2, 2, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]

# AC: the COMPLETE baseline symbol set (EOB, ZRL, every run/size pair —
# 162 symbols) across lengths 2..9, common symbols shortest. Kraft sum
# 0.947.
_AC_SHORT = [
    0x00,                                # len 2 (EOB)
    0xF0,                                # len 3 (ZRL)
    0x01, 0x11,                          # len 4
    0x02, 0x21,                          # len 5
    0x03, 0x12, 0x31,                    # len 6
    0x04, 0x13, 0x22, 0x41,              # len 7
    0x51, 0x05, 0x61, 0x14, 0x32, 0x71, 0x06, 0x81,  # len 8
]
_AC_ALL = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
AC_VALS = _AC_SHORT + sorted(s for s in _AC_ALL if s not in _AC_SHORT)
AC_BITS = [0, 1, 1, 2, 2, 3, 4, 8, 141, 0, 0, 0, 0, 0, 0, 0]
assert sum(AC_BITS) == len(AC_VALS) == 162


def canonical(bits, vals):
    """DHT semantics (B.2.4.2): canonical (code, length) per symbol."""
    out, code, k = {}, 0, 0
    for L in range(1, 17):
        for _ in range(bits[L - 1]):
            out[vals[k]] = (code, L)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODE = canonical(DC_BITS, DC_VALS)
AC_CODE = canonical(AC_BITS, AC_VALS)

ZIGZAG = [  # §A.3.6, raster index of zigzag position k
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _put_magnitude(w: BitW, v: int, t: int) -> None:
    if t:
        w.put(v if v > 0 else v + (1 << t) - 1, t)


def write_block(w: BitW, coefs: dict, pred: int) -> int:
    """coefs: zigzag position -> value (position 0 = DC, absolute)."""
    dc = coefs.get(0, 0)
    diff = dc - pred
    t = _category(diff)
    code, length = DC_CODE[t]
    w.put(code, length)
    _put_magnitude(w, diff, t)
    k, last = 1, max([p for p in coefs if p and coefs[p]], default=0)
    while k <= last:
        run = 0
        while coefs.get(k, 0) == 0:
            run += 1
            k += 1
        while run >= 16:
            code, length = AC_CODE[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        v = coefs[k]
        t = _category(v)
        code, length = AC_CODE[(run << 4) | t]
        w.put(code, length)
        _put_magnitude(w, v, t)
        k += 1
    if last < 63:
        code, length = AC_CODE[0x00]  # EOB
        w.put(code, length)
    return dc


# ---------------------------------------------------------------------------
# independent JFIF assembly (B.2: SOI DQT DHT SOF0 [DRI] SOS ... EOI)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def build_jpeg(blocks, mb_w: int, mb_h: int, restart_interval: int = 0) -> bytes:
    """blocks: list of {zigzag_pos: value} dicts, raster MCU order, one
    8x8 grayscale block per MCU; quant table all-ones."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id0, 8-bit, all 1s
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC0
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC0
    h, wdt = mb_h * 8, mb_w * 8
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + wdt.to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))  # SOF0: 1 component, 1x1, qtab 0
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    pred, rst = 0, 0
    w = BitW()
    for i, coefs in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            out += w.finish()
            out += bytes([0xFF, 0xD0 + rst])  # RSTn
            rst = (rst + 1) % 8
            pred = 0  # predictor reset
            w = BitW()
        pred = write_block(w, coefs, pred)
    out += w.finish()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# independent scalar reconstruction model


def ref_idct8(coef):
    """Scalar type-II inverse DCT (A.3.3), orthonormal scaling."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = math.sqrt(0.125) if u == 0 else 0.5
                for v in range(8):
                    cv = math.sqrt(0.125) if v == 0 else 0.5
                    s += (cu * cv * coef[u][v]
                          * math.cos((2 * y + 1) * u * math.pi / 16)
                          * math.cos((2 * x + 1) * v * math.pi / 16))
            out[y, x] = s
    return out


def ref_pixels(blocks, mb_w: int, mb_h: int) -> np.ndarray:
    img = np.zeros((mb_h * 8, mb_w * 8))
    for i, coefs in enumerate(blocks):
        my, mx = divmod(i, mb_w)
        c = np.zeros((8, 8))
        for k, v in coefs.items():
            r = ZIGZAG[k]
            c[r // 8, r % 8] = v  # dequant x1 (all-ones table)
        img[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = ref_idct8(c) + 128.0
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)


def _assert_decodes(blocks, mb_w, mb_h, restart_interval=0):
    data = build_jpeg(blocks, mb_w, mb_h, restart_interval)
    got = decode_jpeg(data)
    assert got.shape == (mb_h * 8, mb_w * 8, 1)
    np.testing.assert_array_equal(got[:, :, 0], ref_pixels(blocks, mb_w, mb_h))


# ---------------------------------------------------------------------------
# tests


def test_dc_every_category_and_sign():
    """DC differences spanning categories 1..7, both signs, chained
    through the predictor — every magnitude width under variable-length
    DC codes."""
    dcs = [1, -1, 3, -6, 10, -25, 60, -120, 7, 0]
    blocks = [{0: v} for v in np.cumsum(dcs).tolist()]
    _assert_decodes(blocks, len(blocks), 1)


def test_ac_runs_zrl_and_eob():
    """AC coefficients with zero runs 0..5, a ZRL (16-zero) run, a
    full-to-63 block (no EOB) and an immediate-EOB block."""
    blocks = [
        {0: 4, 1: 5, 2: -3, 5: 2, 9: -1},          # short runs
        {0: -8, 17: 6},                              # run>16 → ZRL + code
        {0: 0, 63: 1},                               # ZRLs to the last slot
        {0: 2, **{k: (1 if k % 2 else -1) for k in range(1, 64)}},  # dense, no EOB
        {0: -30},                                    # immediate EOB
    ]
    _assert_decodes(blocks, len(blocks), 1)


def test_two_dimensional_mcu_grid():
    rng = np.random.default_rng(5)
    blocks = []
    for i in range(12):  # 4x3 grid
        coefs = {0: int(rng.integers(-40, 40))}
        for _ in range(int(rng.integers(0, 6))):
            coefs[int(rng.integers(1, 64))] = int(rng.integers(-15, 16)) or 1
        blocks.append(coefs)
    _assert_decodes(blocks, 4, 3)


def test_restart_markers_reset_predictor():
    """DRI=3 with RST0..RSTn between segments: bit stream re-aligns to a
    byte boundary and the DC predictor resets to 0."""
    blocks = [{0: v, 3: (v % 5) - 2} for v in (10, -20, 35, -40, 55, -60, 7, 8, -9)]
    _assert_decodes(blocks, 3, 3, restart_interval=3)


def test_fuzz_streams():
    rng = np.random.default_rng(99)
    for trial in range(20):
        mb_w, mb_h = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        ri = int(rng.choice([0, 0, 2, 4]))
        blocks = []
        for _ in range(mb_w * mb_h):
            coefs = {0: int(rng.integers(-100, 100))}
            for _ in range(int(rng.integers(0, 8))):
                coefs[int(rng.integers(1, 64))] = int(rng.integers(-30, 31)) or 2
            blocks.append(coefs)
        _assert_decodes(blocks, mb_w, mb_h, restart_interval=ri)


def test_writer_tables_are_genuinely_variable_length():
    """Self-check: the suite exercises code lengths 2..9 (the uniform
    8-bit encoder tables can never cover this decoder surface)."""
    lengths = {L for _, L in DC_CODE.values()} | {L for _, L in AC_CODE.values()}
    assert min(lengths) <= 2 and max(lengths) >= 9 and len(lengths) >= 6
