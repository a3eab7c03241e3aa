"""Mutation-kill proofs for the independent-writer entropy suites
(VERDICT r12 "next" #4).

test_vp8_entropy / test_h264_entropy / test_vp8_frame_ac /
test_h264_slice_ac exist to verify the shipped decoders against writers
and reconstruction models that share no logic with them. That guarantee
only holds while the suites can actually DETECT a wrong decoder — which
was verified ad hoc in round 12 but never committed. These tests make
the kill power permanent CI state: each case injects a realistic decoder
mutation (the r10 coeff-prob corruption class: band-map indexing, scan
order, magnitude bases, VLC code tables, dequant constants) via
monkeypatch and asserts the corresponding writer/decoder comparison
FAILS, then re-runs it clean to prove the harness itself is green.

If a future refactor quietly makes a suite self-referential (writer and
decoder sharing a table), the mutation stops killing and the test here
goes red — the independence guarantee cannot silently rot.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from odc_stac_spark.operators import h264, vp8

from . import test_h264_entropy as the
from . import test_h264_slice_ac as ths
from . import test_vp8_entropy as tve
from . import test_vp8_frame_ac as tvf

# ---------------------------------------------------------------------------
# comparison runners: small, deterministic images of each suite's checks


def _vp8_block_check() -> None:
    """Dense + zero-run blocks through every band, two types/contexts —
    the independent writer's stream must decode to the expected raster."""
    for t, ctx in ((1, 0), (2, 1), (0, 2)):
        first = 1 if t == 0 else 0
        mags = [1, 2, 3, 4, 5, 7, 11, 19, 35, 67, 200, 800, 2000, 6, 10, 18]
        values = [(m if k % 2 == 0 else -m) for k, m in enumerate(mags)][first:]
        for vals in (values, [0, 5, 0, 0, 7, 0, 0, 0, 1]):
            w = tve.IndepBoolWriter()
            tve.write_block(w, tve.PROBS[t], ctx, first, vals)
            coeffs, _nz = tve._decode_one(w.finish(), t, ctx, first)
            assert coeffs == tve.expected_raster(vals, first, 1, 1), (t, ctx)


def _vp8_frame_check() -> None:
    rng = random.Random(1)
    plans = tvf._rand_plans(rng, 2, 2)
    tvf._assert_frame_matches(2, 2, plans)


def _h264_block_check() -> None:
    """Random level arrays across every nC class roundtrip through the
    independent §9.2 writer and the shipped CAVLC decoder."""
    rng = random.Random(99)
    corners = [
        [1] + [0] * 15,  # (T1s, TotalCoeff) = (1, 1)
        [-1, 0, 1] + [0] * 13,  # (2, 2)
        [3, 0, -1, 1] + [0] * 12,  # (2, 3), a non-T1 level
        [0] * 14 + [1, -1],  # trailing positions, tz = 14
    ]
    for nc in (0, 2, 4, 8):
        for levels in corners + [the._random_levels(rng, 16) for _ in range(25)]:
            assert the._roundtrip(levels, nc, 16) == levels, nc
    for _ in range(25):
        levels = the._random_levels(rng, 4)
        assert the._roundtrip(levels, -1, 4) == levels


def _h264_slice_check() -> None:
    rng = random.Random(20)
    plans = ths._rand_plans(rng, 2, 2, kinds=("i16",))
    for p in plans:
        p["cbp_luma"], p["cbp_chroma"] = 15, 2
    ths._assert_stream_matches(2, 2, plans, slice_qp=28)


def _killed(check) -> bool:
    """True when the suite's comparison detects the injected mutation —
    either a value mismatch (AssertionError) or a loud decode error."""
    try:
        check()
    except Exception:  # noqa: BLE001 - any failure mode counts as a kill
        return True
    return False


# ---------------------------------------------------------------------------
# VP8 decoder mutations (each a realistic r10-class corruption)


def _swapped(seq, i, j):
    out = list(seq)
    out[i], out[j] = out[j], out[i]
    return out


VP8_BLOCK_MUTATIONS = {
    # position→band map corruption: positions 4/5 read bands 4/6 swapped,
    # so the decoder walks the tree under the wrong probability row —
    # exactly where the r10 coeff-prob corruption hid
    "band_map": ("COEFF_BANDS", lambda: _swapped(vp8.COEFF_BANDS, 4, 5)),
    # scan-order corruption: coefficients land in the wrong raster cells
    "zigzag": ("ZIGZAG", lambda: _swapped(vp8.ZIGZAG, 6, 7)),
    # category base off-by-one: every cat-3 magnitude reconstructs wrong
    "cat_base": ("CAT_BASE", lambda: _swapped(vp8.CAT_BASE, 2, 3)),
    # extra-bit probability table: the arithmetic decode of category
    # extras diverges from the writer's bit placement
    "cat_probs": (
        "CAT_PROBS",
        lambda: [list(r) for r in vp8.CAT_PROBS[:2]]
        + [[100] + list(vp8.CAT_PROBS[2][1:])]
        + [list(r) for r in vp8.CAT_PROBS[3:]],
    ),
    # token-tree corruption: leaves for tokens 3 and 4 swapped
    "coef_tree": ("COEF_TREE", lambda: _swapped(vp8.COEF_TREE, 10, 11)),
}


@pytest.mark.parametrize("name", sorted(VP8_BLOCK_MUTATIONS))
def test_vp8_block_suite_kills_decoder_mutation(name, monkeypatch):
    attr, make = VP8_BLOCK_MUTATIONS[name]
    _vp8_block_check()  # harness green unmutated
    monkeypatch.setattr(vp8, attr, make())
    assert _killed(_vp8_block_check), f"mutation {name} survived the suite"


VP8_FRAME_MUTATIONS = {
    # IDCT cosine constant: every AC-bearing block reconstructs wrong
    # pixels while the entropy layer still decodes cleanly
    "idct_c1": ("_C1", lambda: 20000),
    # dequant table: qi=0 AC factor 4 -> 5 diverges from the frame
    # suite's independent Q transcription
    "ac_qlookup": ("AC_QLOOKUP", lambda: [5] + list(vp8.AC_QLOOKUP[1:])),
}


@pytest.mark.parametrize("name", sorted(VP8_FRAME_MUTATIONS))
def test_vp8_frame_suite_kills_decoder_mutation(name, monkeypatch):
    attr, make = VP8_FRAME_MUTATIONS[name]
    _vp8_frame_check()
    monkeypatch.setattr(vp8, attr, make())
    assert _killed(_vp8_frame_check), f"mutation {name} survived the suite"


def _vp8_loopfilter_check() -> None:
    from . import test_vp8_loopfilter_ac as tvl

    rng = random.Random(31)
    plans = tvl._smooth_plans(rng, 3, 2, kinds=("b",))
    tvl._assert_filtered_matches(3, 2, plans, lvl=20)


def test_vp8_loopfilter_suite_kills_hev_mutation(monkeypatch):
    """Break the §15.2 keyframe hev-threshold row (never flag high edge
    variance): every hev-gated pixel takes the wrong filter arm and the
    output diverges from the independent scalar model."""
    _vp8_loopfilter_check()
    orig = vp8._lf_limits
    monkeypatch.setattr(vp8, "_lf_limits", lambda lvl, sharp: (orig(lvl, sharp)[0], 255))
    assert _killed(_vp8_loopfilter_check), "loop-filter hev mutation survived"


def test_h264_deblock_suite_kills_tc0_mutation(monkeypatch):
    """Bump one §8.7 tC0 row entry: bS<4 clipping widens and the filtered
    pixels diverge from the independent scalar model."""
    from . import test_h264_deblock_ac as thd

    def check():
        rng = random.Random(20)
        plans = thd._smooth_plans(rng, 3, 2, kinds=("i16",))
        thd._assert_deblocked_matches(3, 2, plans, slice_qp=28)

    check()
    row = list(h264._DEBLOCK_TC0[2])
    row[28] += 1  # indexA for the qp-28 internal edges
    monkeypatch.setattr(h264, "_DEBLOCK_TC0", [h264._DEBLOCK_TC0[0], h264._DEBLOCK_TC0[1], row])
    assert _killed(check), "deblock tC0 mutation survived"


def _jpeg_entropy_check() -> None:
    from . import test_jpeg_entropy as tje

    blocks = [
        {0: 4, 1: 5, 2: -3, 5: 2, 9: -1},
        {0: -8, 17: 6},
        {0: 2, **{k: (1 if k % 2 else -1) for k in range(1, 64)}},
    ]
    tje._assert_decodes(blocks, len(blocks), 1)


def test_jpeg_suite_kills_zigzag_mutation(monkeypatch):
    """Swap two entries of the decoder's de-zigzag order: AC coefficients
    land in the wrong raster cells and the independent IDCT model
    diverges."""
    from odc_stac_spark.operators import jpeg

    _jpeg_entropy_check()
    z = jpeg.ZIGZAG.copy()
    z[5], z[6] = z[6], z[5]
    monkeypatch.setattr(jpeg, "ZIGZAG", z)
    assert _killed(_jpeg_entropy_check), "jpeg zigzag mutation survived"


# ---------------------------------------------------------------------------
# H.264 decoder mutations


def test_h264_block_suite_kills_coeff_token_mutation(monkeypatch):
    """Swap the (T1s, TotalCoeff) meanings of two nC<2 coeff_token codes:
    "01"=(1,1) <-> "001"=(2,2)."""
    _h264_block_check()
    monkeypatch.setitem(h264.COEFF_TOKEN_NC0, "01", (2, 2))
    monkeypatch.setitem(h264.COEFF_TOKEN_NC0, "001", (1, 1))
    assert _killed(_h264_block_check), "coeff_token mutation survived"


def test_h264_block_suite_kills_total_zeros_mutation(monkeypatch):
    """Corrupt one total_zeros code so the zero budget the decoder hands
    to run_before is wrong."""
    _h264_block_check()
    for total, row in sorted(h264.TOTAL_ZEROS_4x4.items()):
        monkeypatch.setattr(
            h264,
            "TOTAL_ZEROS_4x4",
            {
                t: ({k: (v + 1) % (17 - t) for k, v in r.items()} if t == total else r)
                for t, r in h264.TOTAL_ZEROS_4x4.items()
            },
        )
        break
    assert _killed(_h264_block_check), "total_zeros mutation survived"


def test_h264_block_suite_kills_run_before_mutation(monkeypatch):
    """Swap the two zerosLeft==1 run_before codes."""
    _h264_block_check()
    monkeypatch.setitem(h264.RUN_BEFORE, 1, {"1": 1, "0": 0})
    assert _killed(_h264_block_check), "run_before mutation survived"


H264_SLICE_MUTATIONS = {
    # 8x8-group zig scan: residual blocks land in the wrong 4x4 cells
    "blk_zscan": ("BLK_ZSCAN", lambda: _swapped(h264.BLK_ZSCAN, 1, 2)),
    # dequant V row for qp%6==4 (slice_qp 28): scaling diverges from the
    # slice suite's independent _V transcription
    "v_table": (
        "_V_TABLE",
        lambda: [
            ((r[0] + 1, r[1], r[2]) if i == 4 else r)
            for i, r in enumerate(h264._V_TABLE)
        ],
    ),
}


@pytest.mark.parametrize("name", sorted(H264_SLICE_MUTATIONS))
def test_h264_slice_suite_kills_decoder_mutation(name, monkeypatch):
    attr, make = H264_SLICE_MUTATIONS[name]
    _h264_slice_check()
    monkeypatch.setattr(h264, attr, make())
    assert _killed(_h264_slice_check), f"mutation {name} survived the suite"


def test_mutation_harness_is_green_after_teardown():
    """All tables restored: every comparison passes again (guards against
    a mutation leaking into other test files through module state)."""
    _vp8_block_check()
    _h264_block_check()
    assert np.all(np.array(vp8.COEFF_BANDS) == np.array(tve.BANDS))
