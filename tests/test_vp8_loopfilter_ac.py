"""VP8 §15 in-loop (normal) deblocking under REAL AC residuals.

test_vp8_frame_ac proves entropy decode + reconstruction with
``filter_level`` 0 (filter off); the shipped vectorized loop filter
(operators/vp8.py ``_loop_filter``) had no independent functional check.
This file builds AC-bearing keyframes with the independent writer at
nonzero filter levels and compares the shipped decode against the frame
suite's independent reconstruction model followed by an INDEPENDENT
SCALAR transcription of RFC 6386 §15: per-line signed-arithmetic
filtering (filter_mask/hev, §15.4 subblock common adjustment, §15.3
MB-edge 27/18/9-tap filter), keyframe hev thresholds, interior/edge
limits from the filter level, inner-edge skip for coefficient-less
non-B_PRED macroblocks, and the §15.1 edge order (left MB edge, inner
verticals, top MB edge, inner horizontals, per MB in raster order) —
structurally disjoint from the shipped numpy-lane implementation.

Each test asserts the filter actually changed pixels, so a silently
disabled filter cannot pass.
"""

from __future__ import annotations

import random

import numpy as np

from odc_stac_spark.operators import vp8

from . import test_vp8_frame_ac as tvf


def _c(v):
    """signed-char clamp (§15.1 c())"""
    return -128 if v < -128 else (127 if v > 127 else v)


def _lf_limits(lvl, sharpness=0):
    interior = lvl
    if sharpness:
        interior >>= 1 if sharpness <= 4 else 2
        interior = min(interior, 9 - sharpness)
    interior = max(interior, 1)
    hev = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)  # keyframe row, §15.2
    return interior, hev


def _mask(s, E, I):
    p3, p2, p1, p0, q0, q1, q2, q3 = s
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E
        and abs(p3 - p2) <= I and abs(p2 - p1) <= I and abs(p1 - p0) <= I
        and abs(q1 - q0) <= I and abs(q2 - q1) <= I and abs(q3 - q2) <= I
    )


def _filter_line(s, E, I, H, mb_edge):
    """[p3..p0 q0..q3] → filtered list (§15.2-15.4, unsigned samples)."""
    if not _mask(s, E, I):
        return list(s)
    p3, p2, p1, p0, q0, q1, q2, q3 = (int(v) for v in s)
    hev = abs(p1 - p0) > H or abs(q1 - q0) > H
    # signed domain
    P2, P1, P0, Q0, Q1, Q2 = (v - 128 for v in (p2, p1, p0, q0, q1, q2))
    out = [p3, p2, p1, p0, q0, q1, q2, q3]
    if mb_edge:
        w = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
        if hev:
            F = _c(w + 4) >> 3
            Eadj = _c(w + 3) >> 3
            out[4] = _c(Q0 - F) + 128
            out[3] = _c(P0 + Eadj) + 128
        else:
            a = _c((27 * w + 63) >> 7)
            out[4] = _c(Q0 - a) + 128
            out[3] = _c(P0 + a) + 128
            a = _c((18 * w + 63) >> 7)
            out[5] = _c(Q1 - a) + 128
            out[2] = _c(P1 + a) + 128
            a = _c((9 * w + 63) >> 7)
            out[6] = _c(Q2 - a) + 128
            out[1] = _c(P2 + a) + 128
    else:
        a = _c((_c(P1 - Q1) if hev else 0) + 3 * (Q0 - P0))
        F = _c(a + 4) >> 3
        Eadj = _c(a + 3) >> 3
        out[4] = _c(Q0 - F) + 128
        out[3] = _c(P0 + Eadj) + 128
        if not hev:
            a = (F + 1) >> 1
            out[5] = _c(Q1 - a) + 128
            out[2] = _c(P1 + a) + 128
    return out


def _edge_v(plane, x, y0, n, E, I, H, mb_edge):
    for y in range(y0, y0 + n):
        plane[y, x - 4 : x + 4] = _filter_line(plane[y, x - 4 : x + 4], E, I, H, mb_edge)


def _edge_h(plane, y, x0, n, E, I, H, mb_edge):
    for x in range(x0, x0 + n):
        plane[y - 4 : y + 4, x] = _filter_line(plane[y - 4 : y + 4, x], E, I, H, mb_edge)


def _plan_has_coeffs(plan):
    vals = list(plan["y"]) + list(plan["u"]) + list(plan["v"])
    if plan["ymode"] == "dc16":
        vals.append(plan["y2"])
    return any(any(v) for v in vals)


def ref_loop_filter(Y, U, V, plans, mb_w, mb_h, lvl, sharpness=0):
    """§15.1: per MB in raster order — left MB edge, interior vertical
    edges, top MB edge, interior horizontal edges, on already-filtered
    samples. Interior edges are skipped for coefficient-less MBs whose
    mode is not B_PRED. Uniform level (segments/deltas off)."""
    if lvl == 0:
        return
    interior, hev_t = _lf_limits(lvl, sharpness)
    mbE = (lvl + 2) * 2 + interior
    sbE = lvl * 2 + interior
    for my in range(mb_h):
        for mx in range(mb_w):
            plan = plans[my * mb_w + mx]
            inner = _plan_has_coeffs(plan) or plan["ymode"] == "b"
            y0, x0, cy0, cx0 = my * 16, mx * 16, my * 8, mx * 8
            if mx > 0:
                _edge_v(Y, x0, y0, 16, mbE, interior, hev_t, True)
                _edge_v(U, cx0, cy0, 8, mbE, interior, hev_t, True)
                _edge_v(V, cx0, cy0, 8, mbE, interior, hev_t, True)
            if inner:
                for dx in (4, 8, 12):
                    _edge_v(Y, x0 + dx, y0, 16, sbE, interior, hev_t, False)
                _edge_v(U, cx0 + 4, cy0, 8, sbE, interior, hev_t, False)
                _edge_v(V, cx0 + 4, cy0, 8, sbE, interior, hev_t, False)
            if my > 0:
                _edge_h(Y, y0, x0, 16, mbE, interior, hev_t, True)
                _edge_h(U, cy0, cx0, 8, mbE, interior, hev_t, True)
                _edge_h(V, cy0, cx0, 8, mbE, interior, hev_t, True)
            if inner:
                for dy in (4, 8, 12):
                    _edge_h(Y, y0 + dy, x0, 16, sbE, interior, hev_t, False)
                _edge_h(U, cy0 + 4, cx0, 8, sbE, interior, hev_t, False)
                _edge_h(V, cy0 + 4, cx0, 8, sbE, interior, hev_t, False)


def _smooth_vals(rng, max_n, p_zero=0.75, max_mag=2):
    """Small sparse residuals: the §15 filter_mask needs |p0-q0|*2 +
    |p1-q1|/2 within the edge limit and all six interior gradients within
    I, so dense large-magnitude noise never passes the gates."""
    n = rng.randint(0, max_n)
    vals = [0 if rng.random() < p_zero else rng.randint(1, max_mag) * rng.choice((1, -1))
            for _ in range(n)]
    while vals and vals[-1] == 0:
        vals.pop()
    return vals


def _smooth_plans(rng, mb_w, mb_h, kinds=("b", "dc16")):
    plans = []
    for _ in range(mb_w * mb_h):
        kind = rng.choice(kinds)
        plan = {
            "ymode": kind,
            "y": [_smooth_vals(rng, 16 if kind == "b" else 15) for _ in range(16)],
            "u": [_smooth_vals(rng, 16) for _ in range(4)],
            "v": [_smooth_vals(rng, 16) for _ in range(4)],
        }
        if kind == "dc16":
            plan["y2"] = _smooth_vals(rng, 16, p_zero=0.5)
        plans.append(plan)
    return plans


def _assert_filtered_matches(mb_w, mb_h, plans, lvl):
    frame = tvf.build_frame(mb_w, mb_h, plans, filter_level=lvl)
    got_y, got_u, got_v = vp8.decode_vp8_planes(frame)
    pre_y, pre_u, pre_v = tvf.ref_reconstruct(mb_w, mb_h, plans)
    exp_y = pre_y.astype(np.int32)
    exp_u = pre_u.astype(np.int32)
    exp_v = pre_v.astype(np.int32)
    ref_loop_filter(exp_y, exp_u, exp_v, plans, mb_w, mb_h, lvl)
    np.testing.assert_array_equal(got_y, exp_y.astype(np.uint8))
    np.testing.assert_array_equal(got_u, exp_u.astype(np.uint8))
    np.testing.assert_array_equal(got_v, exp_v.astype(np.uint8))
    assert not np.array_equal(exp_y.astype(np.uint8), pre_y), "loop filter was a no-op"


def test_bpred_frame_filtered_level20():
    """B_PRED frame (inner edges always filtered) at a mid level: hev
    threshold 1, both the hev 2-tap and non-hev 4-tap paths fire."""
    rng = random.Random(31)
    plans = _smooth_plans(rng, 3, 2, kinds=("b",))
    _assert_filtered_matches(3, 2, plans, lvl=20)


def test_dc16_frame_filtered_level10():
    """DC16 frame below the hev-1 threshold (H=0): Y2-fed blocks, MB
    edges at bS-equivalent strength, low edge limits."""
    rng = random.Random(32)
    plans = _smooth_plans(rng, 2, 3, kinds=("dc16",))
    _assert_filtered_matches(2, 3, plans, lvl=10)


def test_mixed_modes_inner_edge_skip():
    """Coefficient-less DC16 MBs skip their interior edges while their MB
    edges still filter; B_PRED neighbors always filter interiors."""
    rng = random.Random(33)
    plans = _smooth_plans(rng, 4, 3)
    for plan in plans[::3]:
        plan["y"] = [[] for _ in range(16)]
        plan["u"] = [[] for _ in range(4)]
        plan["v"] = [[] for _ in range(4)]
        if plan["ymode"] == "dc16":
            plan["y2"] = []
    _assert_filtered_matches(4, 3, plans, lvl=25)


def test_high_level_strong_filter():
    """lvl 50: hev threshold 2, wide limits — the 27/18/9-tap MB-edge
    path dominates and p2/q2 move."""
    rng = random.Random(34)
    plans = _smooth_plans(rng, 2, 2)
    _assert_filtered_matches(2, 2, plans, lvl=50)


def test_fuzz_filtered_frames():
    rng = random.Random(35)
    for _ in range(4):
        mb_w, mb_h = rng.randint(2, 4), rng.randint(2, 3)
        plans = _smooth_plans(rng, mb_w, mb_h)
        _assert_filtered_matches(mb_w, mb_h, plans, lvl=rng.choice((5, 15, 30, 45)))
