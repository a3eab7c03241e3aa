"""Functional verification of vp8.py's AC / multi-coefficient entropy
decode (VERDICT r11 #1).

The shipped roundtrip tests are encoder↔decoder self-consistency on
DC-only lattices — DC-only streams never touch coefficient positions
1-15 (bands 1-7), which is exactly where the r10 coeff-prob corruption
hid. This file decodes AC-bearing token streams built by an INDEPENDENT
writer that shares no code with the decoder:

- ``IndepBoolWriter`` is the carry-chain register formulation of the
  RFC 6386 §7 boolean encoder (output bytes + explicit carry
  propagation, the libvpx ``vp8_encode_bool`` shape) — structurally
  disjoint from ``operators.vp8.BoolEnc``'s unbounded-integer design.
- Token bit paths are HARD-CODED from the RFC 6386 §13.2 coefficient
  tree figure (no tree walker shared with the decoder), and the band
  map / zigzag / category bases / context-evolution rules are
  independent test-local transcriptions of §13.2-§13.3 / §14.1.
- Probability VALUES are read from the shipped default table. This is
  deliberate: in a boolean arithmetic coder the probabilities affect
  only compression efficiency, never decodability — any (writer,
  decoder) pair agreeing on p decodes exactly, so prob values are an
  interop property (gated by the structural anchors in vp8.py and by
  the importorskip native cross-checks), while everything a prob-table
  INDEXING or token-grammar bug could break is exercised here with
  independent logic.

Coverage: every coefficient position 1-15 (so every band 1-7), all 3
contexts, all 4 block types, token categories 1-6 with extra bits, zero
runs (the tree-start-skip + context-collapse path), early EOB at every
position, dequantization, multi-block single-stream decoding, and a
seeded 300-block fuzz.
"""

from __future__ import annotations

import random

import pytest

from odc_stac_spark.operators import vp8

# ---------------------------------------------------------------------------
# independent boolean encoder (RFC 6386 §7 / Appendix A, carry-chain form)


class IndepBoolWriter:
    """Register + output-buffer + carry-propagation bool encoder."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.low = 0  # 32-bit register (masked like the C formulation)
        self.range = 255
        self.count = -24

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low = (self.low + split) & 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        shift = 8 - self.range.bit_length()  # 0 once range >= 128
        self.range <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (self.low << (offset - 1)) & 0x80000000:
                # propagate the carry into already-emitted bytes
                x = len(self.buf) - 1
                while x >= 0 and self.buf[x] == 0xFF:
                    self.buf[x] = 0
                    x -= 1
                assert x >= 0, "carry out of stream start"
                self.buf[x] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF

    def finish(self) -> bytes:
        for _ in range(32):
            self.put(0, 128)
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# independent §13 token-stream writer

# RFC 6386 §13.2 coefficient tree, resolved by hand to per-token
# (probability-node, bit) paths.  Node numbering: the tree array index i
# consumes probs[i >> 1]; EOB hangs off node 0 bit 0, "10" is DCT_0,
# "110" DCT_1, then the magnitude/category subtree.
EOB = "EOB"
TOKEN_PATHS = {
    EOB: [(0, 0)],
    0: [(0, 1), (1, 0)],
    1: [(0, 1), (1, 1), (2, 0)],
    2: [(0, 1), (1, 1), (2, 1), (3, 0), (4, 0)],
    3: [(0, 1), (1, 1), (2, 1), (3, 0), (4, 1), (5, 0)],
    4: [(0, 1), (1, 1), (2, 1), (3, 0), (4, 1), (5, 1)],
    5: [(0, 1), (1, 1), (2, 1), (3, 1), (6, 0), (7, 0)],  # cat1
    6: [(0, 1), (1, 1), (2, 1), (3, 1), (6, 0), (7, 1)],  # cat2
    7: [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 0), (9, 0)],  # cat3
    8: [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 0), (9, 1)],  # cat4
    9: [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 1), (10, 0)],  # cat5
    10: [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 1), (10, 1)],  # cat6
}

# §13.3 position → band, §14.1 zigzag, §13.2 category bases/extra probs
BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
CAT_BASE = [5, 7, 11, 19, 35, 67]
CAT_EXTRA_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]


def _magnitude_token(mag: int) -> int:
    if mag <= 4:
        return mag
    for cat in range(5, -1, -1):
        if mag >= CAT_BASE[cat]:
            return 5 + cat
    raise AssertionError(mag)


def write_block(w: IndepBoolWriter, probs_t, ctx: int, first: int,
                values: list) -> None:
    """Emit one 4x4 block's token run. ``values`` are the signed
    coefficient values at zigzag positions first..first+len-1 (0 allowed,
    but not in the trailing slot — a zero cannot precede EOB)."""
    assert not values or values[-1] != 0, "grammar: EOB unreachable after a zero"
    c = ctx
    after_zero = False
    i = first
    for v in values:
        probs = probs_t[BANDS[i]][c]
        tok = 0 if v == 0 else _magnitude_token(abs(v))
        path = TOKEN_PATHS[tok][1:] if after_zero else TOKEN_PATHS[tok]
        for node, bit in path:
            w.put(bit, probs[node])
        if v == 0:
            c, after_zero = 0, True
        else:
            if tok >= 5:
                extra = abs(v) - CAT_BASE[tok - 5]
                pbs = CAT_EXTRA_PROBS[tok - 5]
                assert 0 <= extra < (1 << len(pbs)), (v, tok)
                for k, pb in enumerate(pbs):
                    w.put((extra >> (len(pbs) - 1 - k)) & 1, pb)
            w.put(1 if v < 0 else 0, 128)
            c, after_zero = (1 if tok == 1 else 2), False
        i += 1
    if i < 16:
        probs = probs_t[BANDS[i]][c]
        for node, bit in TOKEN_PATHS[EOB]:
            w.put(bit, probs[node])


def expected_raster(values: list, first: int, qdc: int, qac: int) -> list:
    out = [0] * 16
    for k, v in enumerate(values):
        i = first + k
        out[ZIGZAG[i]] = v * (qdc if i == 0 else qac)
    return out


PROBS = vp8._coeff_probs_default()


def _decode_one(data: bytes, t: int, ctx: int, first: int,
                qdc: int = 1, qac: int = 1):
    d = vp8.BoolDec(data)
    return vp8._decode_coeffs(d, PROBS[t], ctx, first, qdc, qac)


# ---------------------------------------------------------------------------
# the arithmetic coder itself, cross-checked writer → shipped decoder


def test_boolcoder_crosscheck_random_bits():
    rng = random.Random(0xC0DE)
    seq = [(rng.randint(0, 1), rng.randint(1, 255)) for _ in range(5000)]
    w = IndepBoolWriter()
    for bit, prob in seq:
        w.put(bit, prob)
    d = vp8.BoolDec(w.finish())
    for k, (bit, prob) in enumerate(seq):
        assert d.get(prob) == bit, f"bit {k}"


def test_boolcoder_carry_propagation():
    # long runs of improbable 1s force low toward the top of the interval,
    # exercising the multi-byte 0xff carry chain
    w = IndepBoolWriter()
    pattern = [(1, 2)] * 200 + [(0, 254)] * 3 + [(1, 2)] * 200
    for bit, prob in pattern:
        w.put(bit, prob)
    d = vp8.BoolDec(w.finish())
    for k, (bit, prob) in enumerate(pattern):
        assert d.get(prob) == bit, f"bit {k}"


# ---------------------------------------------------------------------------
# AC token decode, every band / context / type


@pytest.mark.parametrize("t", [0, 1, 2, 3])
@pytest.mark.parametrize("ctx", [0, 1, 2])
def test_single_ac_every_position(t, ctx):
    """One nonzero coefficient at each zigzag position 1-15 — every band
    1-7 and the EOB-after-token path, for all types and contexts."""
    first = 1 if t == 0 else 0
    for pos in range(max(first, 1), 16):
        for mag in (1, 3, 5, 9, 15, 25, 50, 100, 1000):
            values = [0] * (pos - first) + [mag if pos % 2 else -mag]
            if values[0] == 0 and pos == first:
                values = values[1:]
            w = IndepBoolWriter()
            write_block(w, PROBS[t], ctx, first, values)
            coeffs, nz = _decode_one(w.finish(), t, ctx, first)
            assert coeffs == expected_raster(values, first, 1, 1), (pos, mag)
            assert nz == 1


@pytest.mark.parametrize("t", [0, 1, 2, 3])
@pytest.mark.parametrize("ctx", [0, 1, 2])
def test_dense_block_all_categories(t, ctx):
    """All 16 (or 15) positions nonzero with magnitudes spanning literal
    tokens 1-4 and categories 1-6 — multi-coefficient context evolution
    through every band with no EOB (i reaches 16)."""
    first = 1 if t == 0 else 0
    mags = [1, 2, 3, 4, 5, 7, 11, 19, 35, 67, 200, 800, 2000, 6, 10, 18]
    values = [(m if k % 2 == 0 else -m) for k, m in enumerate(mags)][first:]
    w = IndepBoolWriter()
    write_block(w, PROBS[t], ctx, first, values)
    coeffs, nz = _decode_one(w.finish(), t, ctx, first)
    assert coeffs == expected_raster(values, first, 1, 1)
    assert nz == 1


def test_zero_runs_context_collapse():
    """Zeros inside the run: after a zero the decoder must restart the
    tree at node 2 (EOB branch skipped) and collapse the context to 0."""
    cases = [
        [0, 5],
        [1, 0, 0, 7],
        [0, 0, 0, 0, 0, 0, 0, 1],
        [4, 0, 1, 0, 2, 0, 0, 0, 67],
        [0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1],
    ]
    for values in cases:
        for t, ctx in ((3, 0), (2, 1), (1, 2), (0, 2)):
            first = 1 if t == 0 else 0
            vals = values[: 16 - first]
            if vals[-1] == 0:
                vals = vals[:-1] + [3]
            w = IndepBoolWriter()
            write_block(w, PROBS[t], ctx, first, vals)
            coeffs, _nz = _decode_one(w.finish(), t, ctx, first)
            assert coeffs == expected_raster(vals, first, 1, 1), (values, t, ctx)


def test_dequantization_applied():
    """DC uses qdc, positions >0 use qac (§14.1)."""
    values = [3, -1, 6, 0, 0, 35]
    w = IndepBoolWriter()
    write_block(w, PROBS[3], 0, 0, values)
    coeffs, nz = _decode_one(w.finish(), 3, 0, 0, qdc=8, qac=17)
    assert coeffs == expected_raster(values, 0, 8, 17)
    assert nz == 1


def test_eob_at_every_position():
    """Early EOB after k coefficients, for k = 1..15 — EOB is read with
    the band of the NEXT position and the context of the last token."""
    for k in range(1, 16):
        values = [(2 + (j % 5)) * (1 if j % 2 else -1) for j in range(k)]
        w = IndepBoolWriter()
        write_block(w, PROBS[3], 0, 0, values)
        coeffs, _ = _decode_one(w.finish(), 3, 0, 0)
        assert coeffs == expected_raster(values, 0, 1, 1), k


def test_multi_block_single_stream():
    """Many blocks back-to-back in ONE bool-coder stream (as in a real
    token partition): decoder state must carry across blocks exactly."""
    rng = random.Random(7)
    plan = []
    w = IndepBoolWriter()
    for _ in range(64):
        t = rng.randrange(4)
        ctx = rng.randrange(3)
        first = 1 if t == 0 else 0
        n = rng.randint(1, 16 - first)
        values = [
            0 if rng.random() < 0.3 else rng.randint(1, 2114) * rng.choice((1, -1))
            for _ in range(n)
        ]
        if values[-1] == 0:
            values[-1] = rng.randint(1, 4)
        plan.append((t, ctx, first, values))
        write_block(w, PROBS[t], ctx, first, values)
    d = vp8.BoolDec(w.finish())
    for t, ctx, first, values in plan:
        coeffs, _ = vp8._decode_coeffs(d, PROBS[t], ctx, first, 1, 1)
        assert coeffs == expected_raster(values, first, 1, 1)


def test_fuzz_300_random_blocks():
    """Seeded fuzz: 300 independent random blocks, each written by the
    independent writer and decoded exactly."""
    rng = random.Random(0xA5A5)
    for trial in range(300):
        t = rng.randrange(4)
        ctx = rng.randrange(3)
        first = 1 if t == 0 else 0
        n = rng.randint(1, 16 - first)
        values = []
        for _ in range(n):
            if rng.random() < 0.35:
                values.append(0)
            else:
                mag = rng.choice(
                    (rng.randint(1, 4), rng.randint(5, 66), rng.randint(67, 2114))
                )
                values.append(mag * rng.choice((1, -1)))
        if values[-1] == 0:
            values[-1] = 1
        qdc, qac = rng.choice(((1, 1), (4, 4), (8, 17), (157, 284)))
        w = IndepBoolWriter()
        write_block(w, PROBS[t], ctx, first, values)
        coeffs, nz = _decode_one(w.finish(), t, ctx, first, qdc, qac)
        assert coeffs == expected_raster(values, first, qdc, qac), (
            trial, t, ctx, first, values,
        )
        assert nz == (1 if any(values) else 0)
