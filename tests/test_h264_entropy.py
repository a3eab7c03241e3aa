"""Functional verification of h264.py's multi-coefficient CAVLC decode
(VERDICT r11 #1).

The shipped encoder writes DC-only blocks (one level, TotalCoeff=1), so
``decode_cavlc_block``'s multi-coefficient machinery — level_prefix /
levelSuffixSize evolution (§9.2.2.1), escape prefixes 15+, the
k==TrailingOnes levelCode offset, total_zeros and run_before (§9.2.3),
and the §9.2.4 placement loop — was exercised by no test that decodes
it. This file builds CAVLC blocks with an INDEPENDENT writer:

- the §9.2.2.1 level coding is INVERTED here from the spec's decode
  rules (prefix/suffix split per suffixLength, the suffixLength
  escalation thresholds, the prefix-14 four-bit case, the prefix>=15
  escape offsets) — no code shared with decode_cavlc_block;
- TrailingOnes / total_zeros / run_before are derived from the target
  level array by an independent transcription of the §9.2 grammar;
- the VLC code-string TABLES are reused as data (inverted): they are
  normative constants (Tables 9-5..9-10), already structurally
  validated at import and transcription-auditable — what this file
  verifies is the decode LOGIC that consumes them.

Coverage: TotalCoeff 1..16 over all nC classes (0, 2, 4, the >=8 FLC,
and chroma DC), suffixLength escalation to 6, escape prefixes 15/16/17,
zero runs exhausting zerosLeft mid-loop, blocks ending at max_coeffs
(no total_zeros), multi-block single-stream decode, and a seeded
500-block fuzz.
"""

from __future__ import annotations

import random

import pytest

from odc_stac_spark.operators import h264

# inverted normative tables: (T1s, TotalCoeff) -> code string
_INV_NC0 = {v: k for k, v in h264.COEFF_TOKEN_NC0.items()}
_INV_NC2 = {v: k for k, v in h264.COEFF_TOKEN_NC2.items()}
_INV_NC4 = {v: k for k, v in h264.COEFF_TOKEN_NC4.items()}
_INV_CHROMA = {v: k for k, v in h264.COEFF_TOKEN_CHROMA_DC.items()}
_INV_TZ4 = {n: {v: k for k, v in row.items()} for n, row in h264.TOTAL_ZEROS_4x4.items()}
_INV_TZC = {n: {v: k for k, v in row.items()} for n, row in h264.TOTAL_ZEROS_CHROMA_DC.items()}
_INV_RUN = {n: {v: k for k, v in row.items()} for n, row in h264.RUN_BEFORE.items()}


def _encode_level(level: int, suffix_len: int, k: int, t1s: int) -> str:
    """§9.2.2.1 inverted: signed level -> level_prefix + level_suffix
    bits under the current suffixLength."""
    level_code = 2 * level - 2 if level > 0 else -2 * level - 1
    if k == t1s and t1s < 3:
        # the first non-trailing-one level cannot be ±1, so two codes
        # are reclaimed (decoder adds 2 back)
        level_code -= 2
        assert level_code >= 0, "first non-T1 level must have |level| >= 2"
    if suffix_len == 0:
        if level_code < 14:
            return "0" * level_code + "1"
        if level_code < 30:
            return "0" * 14 + "1" + format(level_code - 14, "04b")
        level_code -= 30  # decoder: code = 15 + suffix, then += 15
        prefix, width = 15, 12
        while level_code >= (1 << width):
            # decoder: prefix >= 16 adds (1 << (prefix-3)) - 4096
            level_code -= 1 << width
            prefix += 1
            width += 1
        return "0" * prefix + "1" + format(level_code, f"0{width}b")
    q, rem = level_code >> suffix_len, level_code & ((1 << suffix_len) - 1)
    if q < 15:
        return "0" * q + "1" + format(rem, f"0{suffix_len}b")
    level_code -= 15 << suffix_len
    prefix, width = 15, 12
    while level_code >= (1 << width):
        level_code -= 1 << width
        prefix += 1
        width += 1
    return "0" * prefix + "1" + format(level_code, f"0{width}b")


def encode_cavlc_block(levels: list, nc: int, max_coeffs: int) -> str:
    """Independent §9.2 writer: scan-order level array -> bit string."""
    assert len(levels) == max_coeffs
    positions = [i for i, v in enumerate(levels) if v != 0]
    total = len(positions)
    # decode order is highest scan position first
    lv = [levels[p] for p in reversed(positions)]
    t1s = 0
    while t1s < min(3, total) and abs(lv[t1s]) == 1:
        t1s += 1
    bits = ""
    if nc == -1:
        bits += _INV_CHROMA[(t1s, total)]
    elif nc < 2:
        bits += _INV_NC0[(t1s, total)]
    elif nc < 4:
        bits += _INV_NC2[(t1s, total)]
    elif nc < 8:
        bits += _INV_NC4[(t1s, total)]
    else:  # 6-bit FLC: (TotalCoeff-1)<<2 | T1s; (0,0) is 000011
        bits += format(0b000011 if total == 0 else ((total - 1) << 2) | t1s, "06b")
    if total == 0:
        return bits
    for k in range(t1s):
        bits += "1" if lv[k] < 0 else "0"
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for k in range(t1s, total):
        level = lv[k]
        bits += _encode_level(level, suffix_len, k, t1s)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    tz = positions[-1] - (total - 1)
    if total < max_coeffs:
        bits += _INV_TZC[total][tz] if nc == -1 else _INV_TZ4[total][tz]
    # run_before, highest frequency first: runs[k] is the zero gap below
    # lv[k]'s position; the last (lowest-frequency) run is implicit
    runs = [0] * total
    runs[total - 1] = positions[0]
    for j in range(1, total):
        runs[total - 1 - j] = positions[j] - positions[j - 1] - 1
    zeros_left = tz
    for k in range(total - 1):
        if zeros_left <= 0:
            assert runs[k] == 0
            continue
        bits += _INV_RUN[min(zeros_left, 7)][runs[k]]
        zeros_left -= runs[k]
    return bits


def _bits_to_reader(bits: str) -> h264.BitReader:
    padded = bits + "0" * (-len(bits) % 8)
    return h264.BitReader(bytes(int(padded[i : i + 8], 2) for i in range(0, len(padded), 8)))


def _roundtrip(levels: list, nc: int, max_coeffs: int) -> list:
    r = _bits_to_reader(encode_cavlc_block(levels, nc, max_coeffs))
    return h264.decode_cavlc_block(r, nc, max_coeffs)


def _first_non_t1_ok(levels: list) -> bool:
    """Grammar: with fewer than 3 trailing ones, the first non-T1 level
    must have |level| >= 2 — true by construction of T1s (a ±1 there
    would itself be a trailing one), so any array is encodable; kept as
    a self-check for generated cases."""
    nz = [levels[p] for p in reversed([i for i, v in enumerate(levels) if v])]
    t1s = 0
    while t1s < min(3, len(nz)) and abs(nz[t1s]) == 1:
        t1s += 1
    return t1s == 3 or t1s == len(nz) or abs(nz[t1s]) >= 2


@pytest.mark.parametrize("nc", [0, 1, 2, 3, 4, 7, 8, 20])
def test_totalcoeff_sweep_all_nc_classes(nc):
    """TotalCoeff 2..16 with mixed magnitudes at spread positions, every
    nC class (incl. the >=8 FLC)."""
    for total in range(2, 17):
        levels = [0] * 16
        step = 16 // total
        mags = [1, 1, 2, 3, 5, 9, 17, 33, 65, 129, 257, 513, 1025, 7, 4, 2]
        for j in range(total):
            pos = min(15, j * step)
            while levels[pos] != 0:
                pos += 1
            levels[pos] = mags[j] * (1 if j % 2 else -1)
        assert _first_non_t1_ok(levels)
        assert _roundtrip(levels, nc, 16) == levels, (nc, total, levels)


def test_trailing_ones_0_to_3():
    """T1s 0..3, including >3 natural trailing ones (the 4th is coded as
    a normal level without the +2 reclaim)."""
    cases = [
        [0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # t1s=0
        [7, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # t1s=1
        [4, 1, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # t1s=2
        [9, -1, 1, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # t1s=3
        [1, 1, -1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # 4 ones: t1s=3
        [-1, 1, 1, -1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # 6 ones
    ]
    for levels in cases:
        for nc in (0, 2, 4, 8):
            assert _roundtrip(levels, nc, 16) == levels, (nc, levels)


def test_suffix_length_escalation_to_6():
    """Monotonically huge levels drive suffixLength 0→6; also hits the
    escape prefixes (15, 16, 17) and the prefix-14 4-bit suffix case."""
    levels = [0] * 16
    big = [2, 4, 8, 25, 49, 97, 193, 385, 769, 1537, 3073, 6145, 12289, 24577, 30000, 2]
    for i, m in enumerate(big):
        levels[i] = m * (1 if i % 2 else -1)
    assert _first_non_t1_ok(levels)
    for nc in (0, 2, 4, 8):
        assert _roundtrip(levels, nc, 16) == levels


def test_prefix14_fourbit_suffix_case():
    """suffixLength==0, levelCode in [14, 30): prefix 14 carries a 4-bit
    suffix (§9.2.2.1's special case)."""
    for level_code in range(14, 30):
        # levelCode = 2|l|-2 (positive, k>t1s? here k==t1s with t1s=0 →
        # code -= 2, so pick |l| = (code+2+2)/2 for even codes)
        lc = level_code + 2  # undo the k==t1s reclaim
        level = (lc + 2) // 2 if lc % 2 == 0 else -((lc + 1) // 2)
        levels = [level] + [0] * 15
        assert _roundtrip(levels, 0, 16) == levels, level


def test_zero_runs_and_total_zeros():
    """Zero gaps of every shape: leading zeros, interior runs longer than
    7 (RUN_BEFORE row 7's extended codes), zerosLeft exhausted mid-loop."""
    cases = [
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, -1],
        [5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -2],  # gap 14
        [2, -3, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
        [0, 2, 0, 3, 0, 4, 0, 5, 0, 6, 0, 7, 0, 8, 0, 9],
        [6, 5, 4, 3, 2, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, -1],
    ]
    for levels in cases:
        for nc in (0, 2, 4, 8):
            assert _roundtrip(levels, nc, 16) == levels, (nc, levels)


def test_full_block_no_total_zeros():
    """TotalCoeff == max_coeffs: total_zeros is NOT coded (§9.2.3)."""
    levels = [3, -1, 1, 1, 2, -2, 4, -4, 8, -8, 5, -5, 9, -9, 6, -6]
    for nc in (0, 2, 4, 8):
        assert _roundtrip(levels, nc, 16) == levels
    # and for the 15-coefficient AC block shape
    levels15 = levels[:15]
    for nc in (0, 2, 4, 8):
        assert _roundtrip(levels15, nc, 15) == levels15


def test_chroma_dc_blocks():
    """nC == -1: 4-coefficient chroma DC with its own coeff_token and
    total_zeros tables, including the full block (no total_zeros)."""
    cases = [
        [5, 0, 0, 0],
        [0, 0, 0, 7],
        [1, -1, 0, 0],
        [2, 1, -1, 1],  # full: no total_zeros
        [0, 3, 0, -1],
        [9, -1, 1, -1],
    ]
    for levels in cases:
        assert _roundtrip(levels, -1, 4) == levels, levels


def test_empty_blocks_every_class():
    for nc in (0, 2, 4, 8):
        assert _roundtrip([0] * 16, nc, 16) == [0] * 16
    assert _roundtrip([0] * 4, -1, 4) == [0] * 4


def test_multi_block_single_stream():
    """Blocks written back-to-back into one bit stream (as in a real
    macroblock): the reader position must land exactly on each block
    boundary — any under/over-read desynchronizes the rest."""
    rng = random.Random(11)
    plan = []
    bits = ""
    for _ in range(80):
        nc = rng.choice((0, 1, 2, 3, 4, 7, 8, 16, -1))
        mc = 4 if nc == -1 else rng.choice((15, 16))
        levels = _random_levels(rng, mc)
        plan.append((levels, nc, mc))
        bits += encode_cavlc_block(levels, nc, mc)
    r = _bits_to_reader(bits)
    for levels, nc, mc in plan:
        assert h264.decode_cavlc_block(r, nc, mc) == levels, (nc, mc, levels)


def _random_levels(rng: random.Random, max_coeffs: int) -> list:
    levels = [0] * max_coeffs
    total = rng.randint(0, max_coeffs)
    for pos in rng.sample(range(max_coeffs), total):
        mag = rng.choice(
            (1, 1, rng.randint(1, 3), rng.randint(2, 30), rng.randint(31, 30000))
        )
        levels[pos] = mag * rng.choice((1, -1))
    return levels


def test_fuzz_500_random_blocks():
    rng = random.Random(0x264)
    for trial in range(500):
        nc = rng.choice((0, 1, 2, 3, 4, 5, 6, 7, 8, 12, 30, -1))
        mc = 4 if nc == -1 else rng.choice((15, 16))
        levels = _random_levels(rng, mc)
        assert _first_non_t1_ok(levels)
        assert _roundtrip(levels, nc, mc) == levels, (trial, nc, mc, levels)
