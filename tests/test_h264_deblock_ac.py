"""H.264 §8.7 in-loop deblocking under REAL AC residuals (VERDICT r12
optional #7).

test_h264_slice_ac proves entropy decode + reconstruction with the
filter disabled (idc 1); the shipped filter itself was previously held
only by a provable no-op case (QP 0 thresholds, operators/h264.py
encode seam). This file closes the gap: AC-bearing IDR streams are
built by the slice suite's independent writer with
``disable_deblocking_filter_idc = 0``, and the expected pixels come
from the slice suite's independent reconstruction model followed by an
INDEPENDENT SCALAR transcription of §8.7 (per-line edge filtering,
Tables 8-16/8-17 re-typed, bS 4 on MB edges / 3 on internal transform
edges for intra pictures, vertical-then-horizontal per MB in raster
order) — structurally disjoint from the shipped vectorized
``deblock_intra_frame`` (numpy edge gathers + np.where lanes).

Each test also asserts the filter genuinely changed pixels (bS>0 edges
with nonzero residuals), so a silently-disabled filter cannot pass.
"""

from __future__ import annotations

import random

import numpy as np

from odc_stac_spark.operators import h264

from . import test_h264_slice_ac as ths

# Tables 8-16 (alpha/beta by index) and 8-17 (tC0 by bS, indexA) — §8.7.2.2
ALPHA = [0] * 16 + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
                    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127,
                    144, 162, 182, 203, 226, 255, 255]
BETA = [0] * 16 + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10,
                   10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17,
                   17, 18, 18]
TC0 = {
    1: [0] * 16 + [0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2,
                   2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13],
    2: [0] * 16 + [0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2,
                   3, 3, 3, 4, 4, 5, 6, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17],
    3: [0] * 16 + [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4,
                   4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23,
                   25],
}


def _clip3(lo, hi, v):
    return lo if v < lo else (hi if v > hi else v)


def _filter_line(s, bS, qp, chroma):
    """One 8-sample line [p3 p2 p1 p0 q0 q1 q2 q3] across an edge —
    §8.7.2.3 (bS<4) / §8.7.2.4 (bS==4), zero slice offsets."""
    idx = _clip3(0, 51, qp)
    alpha, beta = ALPHA[idx], BETA[idx]
    p3, p2, p1, p0, q0, q1, q2, q3 = (int(v) for v in s)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta and abs(q1 - q0) < beta):
        return list(s)
    out = [p3, p2, p1, p0, q0, q1, q2, q3]
    ap = abs(p2 - p0) < beta
    aq = abs(q2 - q0) < beta
    if bS == 4:
        deep = abs(p0 - q0) < ((alpha >> 2) + 2)
        if chroma:
            out[3] = (2 * p1 + p0 + q1 + 2) >> 2
            out[4] = (2 * q1 + q0 + p1 + 2) >> 2
        else:
            if ap and deep:
                out[3] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
                out[2] = (p2 + p1 + p0 + q0 + 2) >> 2
                out[1] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
            else:
                out[3] = (2 * p1 + p0 + q1 + 2) >> 2
            if aq and deep:
                out[4] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
                out[5] = (q2 + q1 + q0 + p0 + 2) >> 2
                out[6] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
            else:
                out[4] = (2 * q1 + q0 + p1 + 2) >> 2
    else:
        tc0 = TC0[bS][idx]
        tc = tc0 + 1 if chroma else tc0 + int(ap) + int(aq)
        delta = _clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
        out[3] = p0 + delta
        out[4] = q0 - delta
        if not chroma:
            if ap:
                out[2] = p1 + _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
            if aq:
                out[5] = q1 + _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    return [_clip3(0, 255, v) for v in out]


def _edge_v(plane, x, y0, n, bS, qp, chroma):
    for y in range(y0, y0 + n):
        plane[y, x - 4 : x + 4] = _filter_line(plane[y, x - 4 : x + 4], bS, qp, chroma)


def _edge_h(plane, y, x0, n, bS, qp, chroma):
    for x in range(x0, x0 + n):
        plane[y - 4 : y + 4, x] = _filter_line(plane[y - 4 : y + 4, x], bS, qp, chroma)


def ref_deblock(Y, U, V, mb_qps, mb_w, mb_h):
    """§8.7 for a fully-intra picture: per MB in raster order, all
    vertical edges left→right then all horizontal edges top→bottom, on
    already-filtered samples. MB-edge bS=4 uses the neighbor-average QP;
    internal bS=3 edges use the MB's own QP. Chroma QP via the §8.5.8
    mapping (offset 0)."""
    for my in range(mb_h):
        for mx in range(mb_w):
            i = my * mb_w + mx
            qp = mb_qps[i]
            qpc = ths._qpc(qp)
            y0, x0, cy0, cx0 = my * 16, mx * 16, my * 8, mx * 8
            if mx > 0:
                qp_av = (mb_qps[i - 1] + qp + 1) >> 1
                qpc_av = (ths._qpc(mb_qps[i - 1]) + qpc + 1) >> 1
                _edge_v(Y, x0, y0, 16, 4, qp_av, False)
                _edge_v(U, cx0, cy0, 8, 4, qpc_av, True)
                _edge_v(V, cx0, cy0, 8, 4, qpc_av, True)
            for dx in (4, 8, 12):
                _edge_v(Y, x0 + dx, y0, 16, 3, qp, False)
            _edge_v(U, cx0 + 4, cy0, 8, 3, qpc, True)
            _edge_v(V, cx0 + 4, cy0, 8, 3, qpc, True)
            if my > 0:
                qp_av = (mb_qps[i - mb_w] + qp + 1) >> 1
                qpc_av = (ths._qpc(mb_qps[i - mb_w]) + qpc + 1) >> 1
                _edge_h(Y, y0, x0, 16, 4, qp_av, False)
                _edge_h(U, cy0, cx0, 8, 4, qpc_av, True)
                _edge_h(V, cy0, cx0, 8, 4, qpc_av, True)
            for dy in (4, 8, 12):
                _edge_h(Y, y0 + dy, x0, 16, 3, qp, False)
            _edge_h(U, cy0 + 4, cx0, 8, 3, qpc, True)
            _edge_h(V, cy0 + 4, cx0, 8, 3, qpc, True)


def _smooth_plans(rng, mb_w, mb_h, kinds=("i16", "i4")):
    """AC-bearing plans whose residuals are SMALL: deblocking only fires
    where |p0-q0| < alpha and the cross-edge gradients are < beta, so
    dense large-magnitude noise (the slice suite's default) passes the
    gates almost nowhere. Sparse ±1/±2 levels over flat DC prediction
    create exactly the small blocking discontinuities §8.7 exists to
    smooth."""
    def lv(n, p_zero=0.8, max_mag=1):
        return [0 if rng.random() < p_zero else rng.randint(1, max_mag) * rng.choice((1, -1))
                for _ in range(n)]

    plans = []
    for _ in range(mb_w * mb_h):
        kind = rng.choice(kinds)
        plan = {
            "kind": kind,
            "cbp_chroma": 2,
            "cdc": {c: lv(4) for c in range(2)},
            "cac": {c: [lv(15) for _ in range(4)] for c in range(2)},
        }
        if kind == "i16":
            plan["cbp_luma"] = 15
            plan["dc"] = lv(16, p_zero=0.5, max_mag=2)
            plan["y"] = [lv(15) for _ in range(16)]
        else:
            plan["cbp_luma"] = rng.choice((5, 10, 15))
            plan["y"] = [lv(16) for _ in range(16)]
        plans.append(plan)
    return plans


def _mb_qps(plans, slice_qp):
    """Replay the running-QP bookkeeping: qp_delta is only present (and
    applied) for coded MBs; every MB's QPy is the running value."""
    qp, out = slice_qp, []
    for plan in plans:
        if plan.get("cbp_luma", 15) or plan.get("cbp_chroma", 0) or plan["kind"] == "i16":
            qp += plan.get("qp_delta", 0)
        out.append(qp)
    return out


def _edge_filter_pad(plane):
    """The p3..p0 gathers at x=0/y=0 MB edges only happen for mx>0/my>0
    edges, so a plain int32 copy is enough — no pad needed."""
    return plane.astype(np.int32)


def _assert_deblocked_matches(mb_w, mb_h, plans, slice_qp):
    data = ths.build_stream(mb_w, mb_h, plans, slice_qp, deblock_idc=0)
    got_y, got_u, got_v = h264.decode_h264_planes(data)
    pre_y, pre_u, pre_v = ths.ref_reconstruct(mb_w, mb_h, plans, slice_qp)
    exp_y = _edge_filter_pad(pre_y)
    exp_u = _edge_filter_pad(pre_u)
    exp_v = _edge_filter_pad(pre_v)
    ref_deblock(exp_y, exp_u, exp_v, _mb_qps(plans, slice_qp), mb_w, mb_h)
    np.testing.assert_array_equal(got_y, exp_y.astype(np.uint8))
    np.testing.assert_array_equal(got_u, exp_u.astype(np.uint8))
    np.testing.assert_array_equal(got_v, exp_v.astype(np.uint8))
    # the filter must have actually fired (bS>0 edges, nonzero residuals)
    assert not np.array_equal(exp_y.astype(np.uint8), pre_y), "deblocking was a no-op"


def test_i16_dense_ac_deblocked_qp28():
    """The slice suite's dense-AC I_16x16 case with the filter ENABLED:
    every MB edge is bS=4 and every internal transform edge bS=3, with
    real residual discontinuities to smooth."""
    rng = random.Random(20)
    plans = _smooth_plans(rng, 3, 2, kinds=("i16",))
    _assert_deblocked_matches(3, 2, plans, slice_qp=28)


def test_i4_partial_cbp_deblocked():
    """I_4x4 MBs with per-8x8 CBP gating under the filter: uncoded
    groups still get their internal edges filtered (intra ⇒ bS=3)."""
    rng = random.Random(22)
    plans = _smooth_plans(rng, 3, 2, kinds=("i4",))
    _assert_deblocked_matches(3, 2, plans, slice_qp=26)


def test_qp_deltas_change_edge_thresholds():
    """Nonzero mb_qp_delta: MB-edge bS=4 filtering must average the two
    neighbors' running QPs, internal edges use each MB's own QP."""
    rng = random.Random(23)
    plans = _smooth_plans(rng, 3, 3)
    deltas = [0, 2, -2, 1, 0, -1, 3, -3, 0]
    for p, d in zip(plans, deltas):
        p["qp_delta"] = d
    _assert_deblocked_matches(3, 3, plans, slice_qp=30)


def test_high_qp_strong_filter_branch():
    """qp 40 pushes alpha/beta high enough that the bS=4 'deep' strong
    path (3-tap p2..q1 smoothing) fires on MB edges."""
    rng = random.Random(24)
    plans = _smooth_plans(rng, 2, 2, kinds=("i16",))
    _assert_deblocked_matches(2, 2, plans, slice_qp=40)


def test_fuzz_deblocked_slices():
    rng = random.Random(25)
    for _ in range(4):
        mb_w, mb_h = rng.randint(2, 4), rng.randint(2, 3)
        plans = _smooth_plans(rng, mb_w, mb_h)
        _assert_deblocked_matches(mb_w, mb_h, plans, slice_qp=rng.choice((20, 28, 36)))
