"""Frame-level verification of VP8 AC decode (VERDICT r11 #1, layer 2).

test_vp8_entropy.py verifies ``_decode_coeffs`` in isolation with an
explicit context argument. This file verifies the FRAME plumbing around
it that DC-only roundtrips exercise only trivially: the per-block
nonzero-context bookkeeping across blocks / macroblocks / rows
(§13.4), Y2 WHT DC substitution with multi-coefficient Y2 blocks, the
dequantization-factor wiring (including the y2ac ≥ 8 floor), AC
residual reconstruction through the real iDCT (not the DC shortcut),
chroma AC, and multi-partition row interleaving.

Whole keyframes are assembled by an independent test-local builder
(IndepBoolWriter + hand-derived mode-tree paths + the independent token
writer from test_vp8_entropy), and the expected pixels come from an
independent scalar reconstruction model with its own transcriptions of
the §14.2/§14.3 inverse transforms and §12 DC predictors. The only
shipped code under test is ``decode_vp8_planes`` itself.
"""

from __future__ import annotations

import random
import struct

import numpy as np

from odc_stac_spark.operators import vp8

from .test_vp8_entropy import ZIGZAG, IndepBoolWriter, write_block

# mode-tree bit paths, resolved by hand from the RFC 6386 §11.2 figures
# (node index i consumes probs[i >> 1], same convention as the token tree)
YMODE_B_PRED_PATH = [(0, 0)]
YMODE_DC_PATH = [(0, 1), (1, 0), (2, 0)]
UV_DC_PATH = [(0, 0)]
BMODE_B_DC_PATH = [(0, 0)]

PROBS = vp8._coeff_probs_default()

# dequantization factors at yac_qi = 0, no deltas (§14.1):
# dc/ac lookup[0] = 4; y2dc doubles; y2ac = 4*155//100 = 6 floors to 8
Q = {"y1dc": 4, "y1ac": 4, "y2dc": 8, "y2ac": 8, "uvdc": 4, "uvac": 4}


def _literal(w: IndepBoolWriter, v: int, n: int) -> None:
    for i in range(n - 1, -1, -1):
        w.put((v >> i) & 1, 128)


def _path(w: IndepBoolWriter, path, probs) -> None:
    for node, bit in path:
        w.put(bit, probs[node])


def build_frame(mb_w: int, mb_h: int, plans, log2_parts: int = 0,
                filter_level: int = 0) -> bytes:
    """Assemble a keyframe. ``plans``: per-MB dicts (raster order) with
    "ymode" ("b" = B_PRED all-B_DC, "dc16" = 16x16 DC), "y2" (value list
    for the Y2 block, dc16 only), "y" (16 value lists), "u"/"v" (4 value
    lists each). Value lists follow write_block's convention (may be
    empty = immediate EOB)."""
    # ---- first partition: prologue + modes
    w0 = IndepBoolWriter()
    _literal(w0, 0, 1)  # color_space
    _literal(w0, 0, 1)  # clamping
    _literal(w0, 0, 1)  # segmentation off
    _literal(w0, 0, 1)  # normal (not simple) filter
    _literal(w0, filter_level, 6)  # 0: loop filter off
    _literal(w0, 0, 3)  # sharpness
    _literal(w0, 0, 1)  # lf deltas off
    _literal(w0, log2_parts, 2)
    _literal(w0, 0, 7)  # yac_qi = 0
    for _ in range(5):  # no quantizer deltas
        w0.put(0, 128)
    _literal(w0, 1, 1)  # refresh_entropy
    for t in range(4):  # no coefficient-probability updates
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    w0.put(0, vp8._update_prob(t, b, c, p))
    _literal(w0, 1, 1)  # mb_no_skip_coeff
    _literal(w0, 128, 8)  # skip_prob
    for plan in plans:
        w0.put(0, 128)  # skip = 0
        if plan["ymode"] == "b":
            _path(w0, YMODE_B_PRED_PATH, vp8.KF_YMODE_PROBS)
            # all sub-modes B_DC; with every MB either B_PRED/all-B_DC or
            # dc16 (implied B_DC), the (above, left) context is always
            # (B_DC, B_DC)
            for _ in range(16):
                _path(w0, BMODE_B_DC_PATH, vp8._kf_bmode_probs(0, 0))
        else:
            _path(w0, YMODE_DC_PATH, vp8.KF_YMODE_PROBS)
        _path(w0, UV_DC_PATH, vp8.KF_UV_PROBS)
    part0 = w0.finish()

    # ---- token partitions with independent §13.4 context bookkeeping
    n = 1 << log2_parts
    writers = [IndepBoolWriter() for _ in range(n)]
    above_y, above_u, above_v = [0] * (mb_w * 4), [0] * (mb_w * 2), [0] * (mb_w * 2)
    above_y2 = [0] * mb_w
    for my in range(mb_h):
        w = writers[my % n]
        left_y, left_u, left_v, left_y2 = [0] * 4, [0] * 2, [0] * 2, 0
        for mx in range(mb_w):
            plan = plans[my * mb_w + mx]
            if plan["ymode"] == "dc16":
                c = above_y2[mx] + left_y2
                write_block(w, PROBS[1], c, 0, plan["y2"])
                above_y2[mx] = left_y2 = 1 if any(plan["y2"]) else 0
                first, ptype = 1, 0
            else:
                first, ptype = 0, 3
            for i in range(4):
                for j in range(4):
                    vals = plan["y"][i * 4 + j]
                    c = above_y[mx * 4 + j] + left_y[i]
                    write_block(w, PROBS[ptype], c, first, vals)
                    above_y[mx * 4 + j] = left_y[i] = 1 if any(vals) else 0
            for above, left, key in ((above_u, left_u, "u"), (above_v, left_v, "v")):
                for i in range(2):
                    for j in range(2):
                        vals = plan[key][i * 2 + j]
                        c = above[mx * 2 + j] + left[i]
                        write_block(w, PROBS[2], c, 0, vals)
                        above[mx * 2 + j] = left[i] = 1 if any(vals) else 0
    parts = [w.finish() for w in writers]

    tag = 0 | (0 << 1) | (1 << 4) | (len(part0) << 5)
    return (
        tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
        + struct.pack("<HH", mb_w * 16, mb_h * 16) + part0
        + b"".join(len(p).to_bytes(3, "little") for p in parts[:-1])
        + b"".join(parts)
    )


# ---------------------------------------------------------------------------
# independent reconstruction model (scalar §14.2/§14.3 transforms, §12
# DC predictors, §12.2 borders)

_C1, _C2 = 20091, 35468


def ref_idct(c):
    t = [0] * 16
    for i in range(4):
        a = c[i] + c[i + 8]
        b = c[i] - c[i + 8]
        x = ((c[i + 4] * _C2) >> 16) - (c[i + 12] + ((c[i + 12] * _C1) >> 16))
        y = (c[i + 4] + ((c[i + 4] * _C1) >> 16)) + ((c[i + 12] * _C2) >> 16)
        t[i], t[i + 12], t[i + 4], t[i + 8] = a + y, a - y, b + x, b - x
    out = np.empty((4, 4), np.int64)
    for i in range(4):
        r = t[4 * i : 4 * i + 4]
        a, b = r[0] + r[2], r[0] - r[2]
        x = ((r[1] * _C2) >> 16) - (r[3] + ((r[3] * _C1) >> 16))
        y = (r[1] + ((r[1] * _C1) >> 16)) + ((r[3] * _C2) >> 16)
        out[i] = [(a + y + 4) >> 3, (b + x + 4) >> 3, (b - x + 4) >> 3, (a - y + 4) >> 3]
    return out


def ref_iwht(c):
    t = [0] * 16
    for i in range(4):
        a, b = c[i] + c[i + 12], c[i + 4] + c[i + 8]
        cc, d = c[i + 4] - c[i + 8], c[i] - c[i + 12]
        t[i], t[i + 4], t[i + 8], t[i + 12] = a + b, cc + d, a - b, d - cc
    out = [0] * 16
    for i in range(4):
        r = t[4 * i : 4 * i + 4]
        a, b = r[0] + r[3], r[1] + r[2]
        cc, d = r[1] - r[2], r[0] - r[3]
        out[4 * i : 4 * i + 4] = [(a + b + 3) >> 3, (cc + d + 3) >> 3,
                                  (a - b + 3) >> 3, (d - cc + 3) >> 3]
    return out


def _deq(vals, first, dc, ac):
    """value list at zigzag positions first.. -> dequantized raster order."""
    c = [0] * 16
    for k, v in enumerate(vals):
        i = first + k
        c[ZIGZAG[i]] = v * (dc if i == 0 else ac)
    return c


def ref_reconstruct(mb_w: int, mb_h: int, plans):
    yb = np.full((mb_h * 16 + 1, mb_w * 16 + 1 + 4), 127, np.int64)
    ub = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, np.int64)
    vb = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, np.int64)
    yb[1:, 0] = ub[1:, 0] = vb[1:, 0] = 129
    for my in range(mb_h):
        for mx in range(mb_w):
            plan = plans[my * mb_w + mx]
            y0, x0 = my * 16 + 1, mx * 16 + 1
            if plan["ymode"] == "b":
                for i in range(4):
                    for j in range(4):
                        ry, rx = y0 + i * 4, x0 + j * 4
                        pred = (int(yb[ry - 1, rx : rx + 4].sum())
                                + int(yb[ry : ry + 4, rx - 1].sum()) + 4) >> 3
                        res = ref_idct(_deq(plan["y"][i * 4 + j], 0, Q["y1dc"], Q["y1ac"]))
                        yb[ry : ry + 4, rx : rx + 4] = np.clip(pred + res, 0, 255)
            else:  # dc16 with a Y2 block
                above = yb[y0 - 1, x0 : x0 + 16]
                left = yb[y0 : y0 + 16, x0 - 1]
                if my > 0 and mx > 0:
                    dc = (int(above.sum()) + int(left.sum()) + 16) >> 5
                elif my > 0:
                    dc = (int(above.sum()) + 8) >> 4
                elif mx > 0:
                    dc = (int(left.sum()) + 8) >> 4
                else:
                    dc = 128
                dcs = ref_iwht(_deq(plan["y2"], 0, Q["y2dc"], Q["y2ac"]))
                out = np.full((16, 16), dc, np.int64)
                for i in range(4):
                    for j in range(4):
                        c = _deq(plan["y"][i * 4 + j], 1, Q["y1dc"], Q["y1ac"])
                        c[0] = dcs[i * 4 + j]
                        out[i * 4 : i * 4 + 4, j * 4 : j * 4 + 4] += ref_idct(c)
                yb[y0 : y0 + 16, x0 : x0 + 16] = np.clip(out, 0, 255)
            # chroma: 8x8 DC prediction + per-4x4 AC residuals
            cy0, cx0 = my * 8 + 1, mx * 8 + 1
            for buf, key in ((ub, "u"), (vb, "v")):
                above = buf[cy0 - 1, cx0 : cx0 + 8]
                left = buf[cy0 : cy0 + 8, cx0 - 1]
                if my > 0 and mx > 0:
                    dc = (int(above.sum()) + int(left.sum()) + 8) >> 4
                elif my > 0:
                    dc = (int(above.sum()) + 4) >> 3
                elif mx > 0:
                    dc = (int(left.sum()) + 4) >> 3
                else:
                    dc = 128
                out = np.full((8, 8), dc, np.int64)
                for i in range(2):
                    for j in range(2):
                        c = _deq(plan[key][i * 2 + j], 0, Q["uvdc"], Q["uvac"])
                        out[i * 4 : i * 4 + 4, j * 4 : j * 4 + 4] += ref_idct(c)
                buf[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(out, 0, 255)
    return (
        yb[1 : mb_h * 16 + 1, 1 : mb_w * 16 + 1].astype(np.uint8),
        ub[1:, 1:].astype(np.uint8),
        vb[1:, 1:].astype(np.uint8),
    )


def _rand_vals(rng: random.Random, max_n: int, p_zero: float = 0.3,
               max_mag: int = 60) -> list:
    n = rng.randint(0, max_n)
    if n == 0:
        return []
    vals = [
        0 if rng.random() < p_zero else rng.randint(1, max_mag) * rng.choice((1, -1))
        for _ in range(n)
    ]
    if vals[-1] == 0:
        vals[-1] = rng.randint(1, 4)
    return vals


def _rand_plans(rng: random.Random, mb_w: int, mb_h: int, kinds=("b", "dc16")):
    plans = []
    for _ in range(mb_w * mb_h):
        kind = rng.choice(kinds)
        plan = {
            "ymode": kind,
            "y": [_rand_vals(rng, 15 if kind == "dc16" else 16) for _ in range(16)],
            "u": [_rand_vals(rng, 16) for _ in range(4)],
            "v": [_rand_vals(rng, 16) for _ in range(4)],
        }
        if kind == "dc16":
            plan["y2"] = _rand_vals(rng, 16, p_zero=0.2, max_mag=30)
        plans.append(plan)
    return plans


def _assert_frame_matches(mb_w, mb_h, plans, log2_parts=0):
    frame = build_frame(mb_w, mb_h, plans, log2_parts)
    got_y, got_u, got_v = vp8.decode_vp8_planes(frame)
    exp_y, exp_u, exp_v = ref_reconstruct(mb_w, mb_h, plans)
    np.testing.assert_array_equal(got_y, exp_y)
    np.testing.assert_array_equal(got_u, exp_u)
    np.testing.assert_array_equal(got_v, exp_v)


def test_bpred_frame_dense_ac():
    """Every luma/chroma block of a 3x3-MB B_PRED frame carries AC —
    full-band context propagation across blocks, MBs, and rows."""
    rng = random.Random(1)
    plans = _rand_plans(rng, 3, 3, kinds=("b",))
    _assert_frame_matches(3, 3, plans)


def test_dc16_frame_y2_multicoeff():
    """16x16-DC frame whose Y2 blocks carry multi-coefficient WHT data:
    the iwht path, the y2ac>=8 floor, and DC substitution into every
    luma block alongside AC from position 1."""
    rng = random.Random(2)
    plans = _rand_plans(rng, 3, 2, kinds=("dc16",))
    _assert_frame_matches(3, 2, plans)


def test_mixed_modes_and_sparse_blocks():
    """B_PRED and DC16 MBs interleaved; many empty (EOB-only) blocks so
    nonzero contexts toggle 0/1/2 across neighbors."""
    rng = random.Random(3)
    plans = _rand_plans(rng, 4, 3)
    for plan in plans[::3]:  # force sparse MBs into the mix
        plan["y"] = [[] for _ in range(16)]
        plan["u"] = [[] for _ in range(4)]
        plan["v"] = [[] for _ in range(4)]
        if plan["ymode"] == "dc16":
            plan["y2"] = [5]
    _assert_frame_matches(4, 3, plans)


def test_multi_partition_rows():
    """log2_parts=2: four token partitions, MB row r decoded from
    partition r mod 4 while contexts stay global."""
    rng = random.Random(4)
    plans = _rand_plans(rng, 2, 5)
    _assert_frame_matches(2, 5, plans, log2_parts=2)


def test_large_magnitudes_cat6():
    """Category-6 magnitudes (11 extra bits) inside a full frame."""
    rng = random.Random(5)
    plans = _rand_plans(rng, 2, 2, kinds=("b",))
    plans[0]["y"][0] = [2000, -1500, 900]
    plans[3]["v"][3] = [0, 0, -2114]
    _assert_frame_matches(2, 2, plans)
