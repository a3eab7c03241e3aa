"""From-scratch VP8 intra-frame (keyframe) codec — RFC 6386, pure
stdlib + numpy. This supplies the LOSSY half of WebP ("VP8 " chunks;
the VP8L lossless half lives in operators/webp.py).

Scope: keyframe (intra-only) decode — which is exactly what a WebP
still image is. All keyframe features are implemented: boolean
arithmetic decoder, segmentation, all four 16x16 / ten 4x4 / four
chroma intra prediction modes, token trees with per-band/context
probabilities and header probability updates, dequantization (incl.
the Y2 WHT plane), multiple token partitions, and both normal and
simple in-loop deblocking filters. Inter frames (golden/altref
prediction, motion compensation) raise NotImplementedError toward the
native-codec seam (``install_native_codecs`` binds libwebp when
present).

The reference (odc-stac) reads lossy WebP via GDAL's libwebp delegation
(reference loader/_rio.py); here the format is decoded from the public
spec so the engine has no native dependency on the 100 TB path.

Entropy tables (token trees, default coefficient probabilities, update
probabilities, keyframe B-mode probabilities, dequantization lookup
tables) are the normative constants published in RFC 6386 §11.3-§13.5
and §14.1.

A deliberately tiny encoder (``encode_vp8_gray``) emits spec-valid
keyframe streams for grayscale content that reconstruct EXACTLY
(DC-only residual lattice + exactly-predictable TM/V/H macroblocks),
which is what lets lossy-VP8 queries be hash-gated against a
first-principles pixel oracle; tests additionally cross-validate the
encoder's streams against a native WebP decoder (PIL built with libwebp)
when one is importable — gray lattice content must reconstruct to the
identical RGB there.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


def _max_decode_pixels() -> int:
    """Allocation/time sanity cap (pure-Python token decode is ~0.5-2
    Mpx/s; a corrupt header must not OOM or stall an executor). Raise
    via ``ODC_STAC_SPARK_VP8_MAX_PIXELS`` for legit giant stills."""
    return int(os.environ.get("ODC_STAC_SPARK_VP8_MAX_PIXELS", str(1 << 24)))


# ---------------------------------------------------------------------------
# Normative constants — RFC 6386 (VP8 Data Format and Decoding Guide).

# Intra prediction modes (16x16 / chroma): §11.2
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 subblock modes: §11.4
B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU = range(10)

# Mode trees (leaves stored negated; node probs indexed by node>>1): §8.2
KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
KF_YMODE_PROBS = [145, 156, 163, 128]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_PROBS = [142, 114, 183]
BMODE_TREE = [
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12,
    -B_HE, 10, -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
]
MB_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]

# DCT token tree: §13.2. Token ids: 0..4 literal, 5..10 cat1..6, 11 EOB.
DCT_EOB = 11
COEF_TREE = [
    -DCT_EOB, 2, -0, 4, -1, 6, 8, 12,
    -2, 10, -3, -4, 14, 16, -5, -6, 18, 20, -7, -8, -9, -10,
]
# category base values and extra-bit probabilities: §13.2
CAT_BASE = [5, 7, 11, 19, 35, 67]
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]

# coefficient position → probability band: §13.3
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
# zigzag scan order: §14.1
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# Dequantization lookup tables: RFC 6386 §14.1
DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
]

AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

# flat [4][8][3][11] — index ((t*8+b)*3+c)*11+p

DEFAULT_COEFF_PROBS = [
    253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128,
    189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128,
    106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128,
    1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128,
    181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128,
    78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128,
    1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128,
    184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128,
    77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128,
    1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128,
    170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128,
    37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128,
    1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128,
    207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128,
    102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128,
    1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128,
    177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128,
    80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128,
    1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62,
    131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1,
    68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128,
    1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128,
    184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128,
    81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128,
    1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128,
    99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128,
    23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128,
    1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128,
    109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128,
    44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128,
    1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128,
    94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128,
    22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128,
    1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128,
    124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128,
    35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128,
    1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128,
    121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128,
    45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128,
    1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128,
    203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128,
    175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128,
    73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128,
    1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128,
    239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128,
    155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128,
    1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128,
    201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128,
    69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128,
    1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128,
    223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128,
    141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128,
    149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128,
    213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128,
    55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255,
    126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128,
    61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128,
    1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128,
    166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128,
    39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128,
    1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128,
    124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128,
    24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128,
    1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128,
    149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128,
    28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128,
    1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128,
    123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128,
    20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128,
    1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128,
    168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128,
    47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128,
    1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128,
    141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128,
    42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128,
    1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
]


def _check_coeff_probs() -> None:
    """Structural self-check of the RFC 6386 §13.5 table: exact size, no
    invalid probabilities (0 never occurs — the bool coder's split needs
    p ≥ 1), and the known type-start anchor rows at 0/24/48/72 plus the
    all-{255,128…} type-0 band-7 rows at 21-23 (a historical transcription
    bug dropped exactly those three rows, shifting every later type)."""
    assert len(DEFAULT_COEFF_PROBS) == 4 * 8 * 3 * 11
    assert all(1 <= p <= 255 for p in DEFAULT_COEFF_PROBS)
    anchors = {0: 253, 24: 198, 48: 253, 72: 202}
    for row, first in anchors.items():
        assert DEFAULT_COEFF_PROBS[row * 11] == first, (row, first)
    for row in (21, 22, 23):
        assert DEFAULT_COEFF_PROBS[row * 11 : row * 11 + 11] == [255] + [128] * 10


_check_coeff_probs()


COEFF_UPDATE_PROBS = [
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255,
    250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255,
    234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255,
    234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255,
    251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
]

# flat [10][10][9] — index (above*10+left)*9+p

KF_BMODE_PROBS = [
    231, 120, 48, 89, 115, 113, 120, 152, 112,
    152, 179, 64, 126, 170, 118, 46, 70, 95,
    175, 69, 143, 80, 85, 82, 72, 155, 103,
    56, 58, 10, 171, 218, 189, 17, 13, 152,
    114, 26, 17, 163, 44, 195, 21, 10, 173,
    121, 24, 80, 195, 26, 62, 44, 64, 85,
    144, 71, 10, 38, 171, 213, 144, 34, 26,
    170, 46, 55, 19, 136, 160, 33, 206, 71,
    63, 20, 8, 114, 114, 208, 12, 9, 226,
    81, 40, 11, 96, 182, 84, 29, 16, 36,
    134, 183, 89, 137, 98, 101, 106, 165, 148,
    72, 187, 100, 130, 157, 111, 32, 75, 80,
    66, 102, 167, 99, 74, 62, 40, 234, 128,
    41, 53, 9, 178, 241, 141, 26, 8, 107,
    74, 43, 26, 146, 73, 166, 49, 23, 157,
    65, 38, 105, 160, 51, 52, 31, 115, 128,
    104, 79, 12, 27, 217, 255, 87, 17, 7,
    87, 68, 71, 44, 114, 51, 15, 186, 23,
    47, 41, 14, 110, 182, 183, 21, 17, 194,
    66, 45, 25, 102, 197, 189, 23, 18, 22,
    88, 88, 147, 150, 42, 46, 45, 196, 205,
    43, 97, 183, 117, 85, 38, 35, 179, 61,
    39, 53, 200, 87, 26, 21, 43, 232, 171,
    56, 34, 51, 104, 114, 102, 29, 93, 77,
    39, 28, 85, 171, 58, 165, 90, 98, 64,
    34, 22, 116, 206, 23, 34, 43, 166, 73,
    107, 54, 32, 26, 51, 1, 81, 43, 31,
    68, 25, 106, 22, 64, 171, 36, 225, 114,
    34, 19, 21, 102, 132, 188, 16, 76, 124,
    62, 18, 78, 95, 85, 57, 50, 48, 51,
    193, 101, 35, 159, 215, 111, 89, 46, 111,
    60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114,
    40, 42, 1, 196, 245, 209, 10, 25, 109,
    88, 43, 29, 140, 166, 213, 37, 43, 154,
    61, 63, 30, 155, 67, 45, 68, 1, 209,
    100, 80, 8, 43, 154, 1, 51, 26, 71,
    142, 78, 78, 16, 255, 128, 34, 197, 171,
    41, 40, 5, 102, 211, 183, 4, 1, 221,
    51, 50, 17, 168, 209, 192, 23, 25, 82,
    138, 31, 36, 171, 27, 166, 38, 44, 229,
    67, 87, 58, 169, 82, 115, 26, 59, 179,
    63, 59, 90, 180, 59, 166, 93, 73, 154,
    40, 40, 21, 116, 143, 209, 34, 39, 175,
    47, 15, 16, 183, 34, 223, 49, 45, 183,
    46, 17, 33, 183, 6, 98, 15, 32, 183,
    57, 46, 22, 24, 128, 1, 54, 17, 37,
    65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223,
    87, 37, 9, 115, 59, 77, 64, 21, 47,
    104, 55, 44, 218, 9, 54, 53, 130, 226,
    64, 90, 70, 205, 40, 41, 23, 26, 57,
    54, 57, 112, 184, 5, 41, 38, 166, 213,
    30, 34, 26, 133, 152, 116, 10, 32, 134,
    39, 19, 53, 221, 26, 114, 32, 73, 255,
    31, 9, 65, 234, 2, 15, 1, 118, 73,
    75, 32, 12, 51, 192, 255, 160, 43, 51,
    88, 31, 35, 67, 102, 85, 55, 186, 85,
    56, 21, 23, 111, 59, 205, 45, 37, 192,
    55, 38, 70, 124, 73, 102, 1, 34, 98,
    125, 98, 42, 88, 104, 85, 117, 175, 82,
    95, 84, 53, 89, 128, 100, 113, 101, 45,
    75, 79, 123, 47, 51, 128, 81, 171, 1,
    57, 17, 5, 71, 102, 57, 53, 41, 49,
    38, 33, 13, 121, 57, 73, 26, 1, 85,
    41, 10, 67, 138, 77, 110, 90, 47, 114,
    115, 21, 2, 10, 102, 255, 166, 23, 6,
    101, 29, 16, 10, 85, 128, 101, 196, 26,
    57, 18, 10, 102, 102, 213, 34, 20, 43,
    117, 20, 15, 36, 163, 128, 68, 1, 26,
    102, 61, 71, 37, 34, 53, 31, 243, 192,
    69, 60, 71, 38, 73, 119, 28, 222, 37,
    68, 45, 128, 34, 1, 47, 11, 245, 171,
    62, 17, 19, 70, 146, 85, 55, 62, 70,
    37, 43, 37, 154, 100, 163, 85, 160, 1,
    63, 9, 92, 136, 28, 64, 32, 201, 85,
    75, 15, 9, 9, 64, 255, 184, 119, 16,
    86, 6, 28, 5, 64, 255, 25, 248, 1,
    56, 8, 17, 132, 137, 255, 55, 116, 128,
    58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218,
    51, 103, 44, 131, 131, 123, 31, 6, 158,
    86, 40, 64, 135, 148, 224, 45, 183, 128,
    22, 26, 17, 131, 240, 154, 14, 1, 209,
    45, 16, 21, 91, 64, 222, 7, 1, 197,
    56, 21, 39, 155, 60, 138, 23, 102, 213,
    83, 12, 13, 54, 192, 255, 68, 47, 28,
    85, 26, 85, 85, 128, 128, 32, 146, 171,
    18, 11, 7, 63, 144, 171, 4, 4, 246,
    35, 27, 10, 146, 174, 171, 12, 26, 128,
    190, 80, 35, 99, 180, 80, 126, 54, 45,
    85, 126, 47, 87, 176, 51, 41, 20, 32,
    101, 75, 128, 139, 118, 146, 116, 128, 85,
    56, 41, 15, 176, 236, 85, 37, 9, 62,
    71, 30, 17, 119, 118, 255, 17, 18, 138,
    101, 38, 60, 138, 55, 70, 43, 26, 142,
    146, 36, 19, 30, 171, 255, 97, 27, 20,
    138, 45, 61, 62, 219, 1, 81, 188, 64,
    32, 41, 20, 117, 151, 142, 20, 21, 163,
    112, 19, 12, 61, 195, 128, 48, 4, 24,
]


def _coeff_probs_default() -> List[List[List[List[int]]]]:
    """default token probs as nested [4][8][3][11] (RFC 6386 §13.5)."""
    it = iter(DEFAULT_COEFF_PROBS)
    return [
        [[[next(it) for _ in range(11)] for _ in range(3)] for _ in range(8)]
        for _ in range(4)
    ]


def _update_prob(t: int, b: int, c: int, p: int) -> int:
    return COEFF_UPDATE_PROBS[((t * 8 + b) * 3 + c) * 11 + p]


def _kf_bmode_probs(above: int, left: int) -> List[int]:
    base = (above * 10 + left) * 9
    return KF_BMODE_PROBS[base : base + 9]

# ---------------------------------------------------------------------------
# Boolean arithmetic coder — RFC 6386 §7 (decoder) / Appendix A (encoder).


class BoolDec:
    """Byte-at-a-time boolean decoder, exactly the RFC 6386 §7.3 loop."""

    __slots__ = ("buf", "pos", "end", "range", "value", "bits")

    def __init__(self, buf: bytes, start: int = 0, end: Optional[int] = None):
        self.buf = buf
        self.end = len(buf) if end is None else end
        b0 = buf[start] if start < self.end else 0
        b1 = buf[start + 1] if start + 1 < self.end else 0
        self.value = (b0 << 8) | b1
        self.pos = start + 2
        self.range = 255
        self.bits = 0

    def get(self, prob: int) -> int:
        r = self.range
        split = 1 + (((r - 1) * prob) >> 8)
        big = split << 8
        v = self.value
        if v >= big:
            ret = 1
            r -= split
            v -= big
        else:
            ret = 0
            r = split
        bits = self.bits
        while r < 128:
            v <<= 1
            r <<= 1
            bits += 1
            if bits == 8:
                bits = 0
                if self.pos < self.end:
                    v |= self.buf[self.pos]
                self.pos += 1
        self.range = r
        self.value = v
        self.bits = bits
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        """magnitude-then-sign, the P(n)+sign form used by header deltas."""
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: List[int], probs, start: int = 0) -> int:
        i = tree[start + self.get(probs[start >> 1])]
        while i > 0:
            i = tree[i + self.get(probs[i >> 1])]
        return -i


class BoolEnc:
    """Boolean encoder. ``low`` is kept as an unbounded int so carry
    propagation is automatic; the emitted stream equals the RFC's
    bottom-register + carry-chain output bit for bit."""

    __slots__ = ("low", "range", "nbits")

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.nbits += 1

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def signed_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.put(1 if v < 0 else 0, 128)

    def tree(self, tree: List[int], probs, value: int, start: int = 0) -> None:
        # walk the tree to the leaf, recording the bit taken at each node
        path: List[Tuple[int, int]] = []
        i = start
        while True:
            left, right = tree[i], tree[i + 1]
            # which branch leads to `value`?
            bit = 0 if self._leads_to(tree, left, value) else 1
            path.append((i >> 1, bit))
            i = right if bit else left
            if i <= 0:
                break
        for node, bit in path:
            self.put(bit, probs[node])

    @staticmethod
    def _leads_to(tree: List[int], node: int, value: int) -> bool:
        if node <= 0:
            return -node == value
        return BoolEnc._leads_to(tree, tree[node], value) or BoolEnc._leads_to(
            tree, tree[node + 1], value
        )

    def flush(self) -> bytes:
        # The interval invariant gives low < 2^(nbits+8): the stream is
        # the fractional binary expansion of low at that width, zero-padded
        # to a byte boundary (decoders read past-the-end bytes as 0).
        width = self.nbits + 8
        nbytes = (width + 7) // 8
        return (self.low << (nbytes * 8 - width)).to_bytes(nbytes, "big")

# ---------------------------------------------------------------------------
# Inverse transforms — RFC 6386 §14.3 (4x4 DCT approximation) / §14.2 (WHT).

_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, 16-bit fixed point
_C2 = 35468  # sin(pi/8)*sqrt(2), 16-bit fixed point


def idct4x4(coeffs: List[int]) -> np.ndarray:
    """coeffs: 16 dequantized ints, raster order → (4,4) int residual."""
    ip = coeffs
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 8]
        b1 = ip[i] - ip[i + 8]
        t1 = (ip[i + 4] * _C2) >> 16
        t2 = ip[i + 12] + ((ip[i + 12] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[i + 4] + ((ip[i + 4] * _C1) >> 16)
        t2 = (ip[i + 12] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = np.empty((4, 4), np.int32)
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 2]
        b1 = tmp[base] - tmp[base + 2]
        t1 = (tmp[base + 1] * _C2) >> 16
        t2 = tmp[base + 3] + ((tmp[base + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[base + 1] + ((tmp[base + 1] * _C1) >> 16)
        t2 = (tmp[base + 3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(coeffs: List[int]) -> List[int]:
    """Inverse Walsh-Hadamard for the Y2 (DC) plane → 16 DC values."""
    ip = coeffs
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 12]
        b1 = ip[i + 4] + ip[i + 8]
        c1 = ip[i + 4] - ip[i + 8]
        d1 = ip[i] - ip[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        out[base] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


def _clamp_q(i: int, hi: int = 127) -> int:
    return 0 if i < 0 else (hi if i > hi else i)


def dequant_factors(qi: int, deltas: Dict[str, int]) -> Dict[str, int]:
    """Per-segment dequantization factors — RFC 6386 §9.6/§14.1. The
    chroma-DC index clamp to 117 implements the spec's 132 ceiling."""
    y2ac = (AC_QLOOKUP[_clamp_q(qi + deltas["y2ac"])] * 155) // 100
    return {
        "y1dc": DC_QLOOKUP[_clamp_q(qi + deltas["y1dc"])],
        "y1ac": AC_QLOOKUP[_clamp_q(qi)],
        "y2dc": DC_QLOOKUP[_clamp_q(qi + deltas["y2dc"])] * 2,
        "y2ac": y2ac if y2ac >= 8 else 8,
        "uvdc": DC_QLOOKUP[_clamp_q(qi + deltas["uvdc"], 117)],
        "uvac": AC_QLOOKUP[_clamp_q(qi + deltas["uvac"])],
    }

# ---------------------------------------------------------------------------
# Intra prediction — RFC 6386 §12.


def _avg2(x, y):
    return (x + y + 1) >> 1


def _avg3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def _pred16(mode: int, above, left, corner, have_above: bool, have_left: bool,
            size: int) -> np.ndarray:
    """Whole-block (16x16 luma / 8x8 chroma) prediction. ``above``/``left``
    are int arrays already edge-substituted (127/129); availability flags
    drive the DC averaging rule."""
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.repeat(above[None, :], size, axis=0).astype(np.int32)
    if mode == H_PRED:
        return np.repeat(left[:, None], size, axis=1).astype(np.int32)
    # TM_PRED
    p = above[None, :].astype(np.int32) + left[:, None].astype(np.int32) - corner
    return np.clip(p, 0, 255)


def _pred_sub(mode: int, A, AR, L, P) -> np.ndarray:
    """4x4 subblock prediction (B_PRED modes) — RFC 6386 §12.3. A/AR/L are
    4-int sequences (above, above-right, left), P the corner pixel."""
    d = np.empty((4, 4), np.int32)
    if mode == B_DC:
        d[:] = (sum(A) + sum(L) + 4) >> 3
    elif mode == B_TM:
        d[:] = np.clip(
            np.asarray(A, np.int32)[None, :] + np.asarray(L, np.int32)[:, None] - P,
            0, 255,
        )
    elif mode == B_VE:
        row = [
            _avg3(P, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], AR[0]),
        ]
        d[:] = np.asarray(row, np.int32)[None, :]
    elif mode == B_HE:
        col = [
            _avg3(P, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        d[:] = np.asarray(col, np.int32)[:, None]
    elif mode == B_LD:
        a = list(A) + list(AR)
        for i in range(4):
            for j in range(4):
                k = i + j
                d[i, j] = (
                    _avg3(a[6], a[7], a[7]) if k == 6 else _avg3(a[k], a[k + 1], a[k + 2])
                )
    elif mode == B_RD:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for i in range(4):
            for j in range(4):
                k = j - i + 3
                d[i, j] = _avg3(e[k - 1], e[k], e[k + 1])
    elif mode == B_VR:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        d[3, 0] = _avg3(e[1], e[2], e[3])
        d[2, 0] = _avg3(e[2], e[3], e[4])
        d[3, 1] = d[1, 0] = _avg3(e[3], e[4], e[5])
        d[2, 1] = d[0, 0] = _avg2(e[4], e[5])
        d[3, 2] = d[1, 1] = _avg3(e[4], e[5], e[6])
        d[2, 2] = d[0, 1] = _avg2(e[5], e[6])
        d[3, 3] = d[1, 2] = _avg3(e[5], e[6], e[7])
        d[2, 3] = d[0, 2] = _avg2(e[6], e[7])
        d[1, 3] = _avg3(e[6], e[7], e[8])
        d[0, 3] = _avg2(e[7], e[8])
    elif mode == B_VL:
        a = list(A) + list(AR)
        d[0, 0] = _avg2(a[0], a[1])
        d[1, 0] = _avg3(a[0], a[1], a[2])
        d[2, 0] = d[0, 1] = _avg2(a[1], a[2])
        d[1, 1] = d[3, 0] = _avg3(a[1], a[2], a[3])
        d[2, 1] = d[0, 2] = _avg2(a[2], a[3])
        d[3, 1] = d[1, 2] = _avg3(a[2], a[3], a[4])
        d[2, 2] = d[0, 3] = _avg2(a[3], a[4])
        d[3, 2] = d[1, 3] = _avg3(a[3], a[4], a[5])
        d[2, 3] = _avg3(a[4], a[5], a[6])
        d[3, 3] = _avg3(a[5], a[6], a[7])
    elif mode == B_HD:
        e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        d[3, 0] = _avg2(e[0], e[1])
        d[3, 1] = _avg3(e[0], e[1], e[2])
        d[2, 0] = d[3, 2] = _avg2(e[1], e[2])
        d[2, 1] = d[3, 3] = _avg3(e[1], e[2], e[3])
        d[2, 2] = d[1, 0] = _avg2(e[2], e[3])
        d[2, 3] = d[1, 1] = _avg3(e[2], e[3], e[4])
        d[1, 2] = d[0, 0] = _avg2(e[3], e[4])
        d[1, 3] = d[0, 1] = _avg3(e[3], e[4], e[5])
        d[0, 2] = _avg3(e[4], e[5], e[6])
        d[0, 3] = _avg3(e[5], e[6], e[7])
    elif mode == B_HU:
        lv = list(L)
        d[0, 0] = _avg2(lv[0], lv[1])
        d[0, 1] = _avg3(lv[0], lv[1], lv[2])
        d[0, 2] = d[1, 0] = _avg2(lv[1], lv[2])
        d[0, 3] = d[1, 1] = _avg3(lv[1], lv[2], lv[3])
        d[1, 2] = d[2, 0] = _avg2(lv[2], lv[3])
        d[1, 3] = d[2, 1] = _avg3(lv[2], lv[3], lv[3])
        d[2, 2] = d[2, 3] = d[3, 0] = d[3, 1] = d[3, 2] = d[3, 3] = lv[3]
    else:
        raise ValueError(f"vp8: bad subblock mode {mode}")
    return d

# ---------------------------------------------------------------------------
# Header parsing — RFC 6386 §9.


def _parse_uncompressed_header(data: bytes) -> Dict:
    if len(data) < 10:
        raise ValueError("vp8: truncated frame header")
    tmp = data[0] | (data[1] << 8) | (data[2] << 16)
    keyframe = (tmp & 1) == 0
    version = (tmp >> 1) & 7
    show = (tmp >> 4) & 1
    part0_len = tmp >> 5
    if not keyframe:
        raise NotImplementedError(
            "vp8: inter (non-key) frames need motion compensation — a WebP "
            "still is always a single keyframe; register a native decoder "
            "via install_native_codecs() for video streams"
        )
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad keyframe start code")
    w = struct.unpack_from("<H", data, 6)[0]
    h = struct.unpack_from("<H", data, 8)[0]
    width, xscale = w & 0x3FFF, w >> 14
    height, yscale = h & 0x3FFF, h >> 14
    if width == 0 or height == 0:
        raise ValueError("vp8: zero frame dimension")
    if width * height > _max_decode_pixels():
        raise ValueError(
            f"vp8: frame claims {width}x{height} — over the decode sanity "
            "cap (ODC_STAC_SPARK_VP8_MAX_PIXELS)"
        )
    if 10 + part0_len > len(data):
        raise ValueError("vp8: first partition overruns frame")
    return {
        "version": version, "show": show, "part0_len": part0_len,
        "width": width, "height": height, "xscale": xscale, "yscale": yscale,
    }


def _parse_frame_header(d: BoolDec) -> Dict:
    """Keyframe compressed header (first partition prologue) — §9.2-§9.11."""
    hdr: Dict = {}
    hdr["color_space"] = d.literal(1)
    hdr["clamping"] = d.literal(1)

    seg = {"enabled": d.literal(1), "update_map": 0, "abs_delta": 0,
           "quant": [0, 0, 0, 0], "lf": [0, 0, 0, 0],
           "tree_probs": [255, 255, 255]}
    if seg["enabled"]:
        seg["update_map"] = d.literal(1)
        update_data = d.literal(1)
        if update_data:
            seg["abs_delta"] = d.literal(1)
            seg["quant"] = [
                d.signed_literal(7) if d.get(128) else 0 for _ in range(4)
            ]
            seg["lf"] = [
                d.signed_literal(6) if d.get(128) else 0 for _ in range(4)
            ]
        if seg["update_map"]:
            seg["tree_probs"] = [
                d.literal(8) if d.get(128) else 255 for _ in range(3)
            ]
    hdr["seg"] = seg

    hdr["filter_simple"] = d.literal(1)
    hdr["filter_level"] = d.literal(6)
    hdr["sharpness"] = d.literal(3)
    ref_deltas = [0, 0, 0, 0]
    mode_deltas = [0, 0, 0, 0]
    hdr["lf_delta_enabled"] = d.literal(1)
    if hdr["lf_delta_enabled"]:
        if d.literal(1):  # mode_ref_lf_delta_update
            for i in range(4):
                if d.get(128):
                    ref_deltas[i] = d.signed_literal(6)
            for i in range(4):
                if d.get(128):
                    mode_deltas[i] = d.signed_literal(6)
    hdr["ref_lf_deltas"] = ref_deltas
    hdr["mode_lf_deltas"] = mode_deltas

    hdr["n_parts"] = 1 << d.literal(2)

    hdr["yac_qi"] = d.literal(7)
    deltas = {}
    for name in ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"):
        deltas[name] = d.signed_literal(4) if d.get(128) else 0
    hdr["q_deltas"] = deltas

    hdr["refresh_entropy"] = d.literal(1)

    probs = _coeff_probs_default()
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if d.get(_update_prob(t, b, c, p)):
                        probs[t][b][c][p] = d.literal(8)
    hdr["coeff_probs"] = probs

    hdr["mb_no_skip"] = d.literal(1)
    hdr["skip_prob"] = d.literal(8) if hdr["mb_no_skip"] else 0
    return hdr


_IMPLIED_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# ---------------------------------------------------------------------------
# Macroblock prediction records — RFC 6386 §10/§11 (keyframe syntax).


def _decode_modes(d: BoolDec, hdr: Dict, mb_w: int, mb_h: int) -> List[Dict]:
    """Per-MB (segment, skip, ymode, bmodes[16], uvmode), raster order.
    Keyframe B-mode contexts use the fixed KF_BMODE_PROBS table indexed
    by the above/left subblock modes (implied for whole-MB modes)."""
    seg = hdr["seg"]
    out: List[Dict] = []
    above_sub = [[B_DC] * 4 for _ in range(mb_w)]
    for _my in range(mb_h):
        left_sub = [B_DC] * 4
        for mx in range(mb_w):
            seg_id = 0
            if seg["enabled"] and seg["update_map"]:
                seg_id = d.tree(MB_SEGMENT_TREE, seg["tree_probs"])
            skip = d.get(hdr["skip_prob"]) if hdr["mb_no_skip"] else 0
            ymode = d.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                bmodes = [0] * 16
                for i in range(4):
                    for j in range(4):
                        a = above_sub[mx][j] if i == 0 else bmodes[(i - 1) * 4 + j]
                        lft = left_sub[i] if j == 0 else bmodes[i * 4 + j - 1]
                        bmodes[i * 4 + j] = d.tree(
                            BMODE_TREE, _kf_bmode_probs(a, lft)
                        )
            else:
                bmodes = [_IMPLIED_BMODE[ymode]] * 16
            above_sub[mx] = bmodes[12:16]
            left_sub = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            uvmode = d.tree(UV_MODE_TREE, KF_UV_PROBS)
            out.append(
                {"seg": seg_id, "skip": skip, "ymode": ymode,
                 "bmodes": bmodes, "uvmode": uvmode}
            )
    return out

# ---------------------------------------------------------------------------
# DCT coefficient (token) decoding — RFC 6386 §13.


def _decode_coeffs(d: BoolDec, probs_t, ctx: int, first: int,
                   qdc: int, qac: int) -> Tuple[List[int], int]:
    """One 4x4 block's tokens → (dequantized raster-order coeffs, nz).
    ``probs_t`` is the [8][3][11] table for the block's plane type; ``ctx``
    the above+left nonzero context; ``first`` 1 when Y2 supplies the DC.
    Tokens run in zigzag order; after a zero token the EOB branch is
    skipped (tree start 2) and the context collapses to 0 (§13.3)."""
    coeffs = [0] * 16
    i = first
    start = 0
    c = ctx
    nz = 0
    while i < 16:
        p = probs_t[COEFF_BANDS[i]][c]
        t = d.tree(COEF_TREE, p, start)
        if t == DCT_EOB:
            break
        if t == 0:
            c = 0
            start = 2
            i += 1
            continue
        start = 0
        if t <= 4:
            val = t
        else:
            cat = t - 5
            val = CAT_BASE[cat]
            extra = 0
            for pb in CAT_PROBS[cat]:
                extra = (extra << 1) | d.get(pb)
            val += extra
        if d.get(128):
            val = -val
        coeffs[ZIGZAG[i]] = val * (qdc if i == 0 else qac)
        nz = 1
        c = 1 if t == 1 else 2
        i += 1
    return coeffs, nz


def _residual4(coeffs: Optional[List[int]]) -> Optional[np.ndarray]:
    """Dequantized coeffs → 4x4 residual; None for an all-zero block.
    DC-only blocks take the exact constant shortcut ((dc+4)>>3, the
    value the full idct produces for a lone DC)."""
    if coeffs is None or not any(coeffs):
        return None
    if not any(coeffs[1:]):
        return np.full((4, 4), (coeffs[0] + 4) >> 3, np.int32)
    return idct4x4(coeffs)

# ---------------------------------------------------------------------------
# Reconstruction — RFC 6386 §12/§14.5.


def _reconstruct_mb(yb, ub, vb, my: int, mx: int, mb: Dict,
                    ycoef, ucoef, vcoef) -> None:
    """Intra-predict + add residual for one MB into the padded planes.
    Buffers carry a 1-px top/left border (127 above / 129 left, §12.2)
    and a 4-px above-right extension held at 127 beyond the frame."""
    y0, x0 = my * 16 + 1, mx * 16 + 1
    if mb["ymode"] == B_PRED:
        for i in range(4):
            for j in range(4):
                ry, rx = y0 + i * 4, x0 + j * 4
                A = yb[ry - 1, rx:rx + 4].astype(np.int32)
                if j == 3:
                    # above-right always comes from the above-MB row, even
                    # for lower sub-rows (§12.3)
                    AR = yb[y0 - 1, x0 + 16:x0 + 20].astype(np.int32)
                else:
                    AR = yb[ry - 1, rx + 4:rx + 8].astype(np.int32)
                L = yb[ry:ry + 4, rx - 1].astype(np.int32)
                P = int(yb[ry - 1, rx - 1])
                blk = _pred_sub(mb["bmodes"][i * 4 + j], A, AR, L, P)
                res = _residual4(ycoef[i * 4 + j])
                if res is not None:
                    blk = blk + res
                yb[ry:ry + 4, rx:rx + 4] = np.clip(blk, 0, 255)
    else:
        above = yb[y0 - 1, x0:x0 + 16].astype(np.int32)
        left = yb[y0:y0 + 16, x0 - 1].astype(np.int32)
        corner = int(yb[y0 - 1, x0 - 1])
        out = _pred16(mb["ymode"], above, left, corner, my > 0, mx > 0, 16).copy()
        for i in range(4):
            for j in range(4):
                res = _residual4(ycoef[i * 4 + j])
                if res is not None:
                    out[i * 4:i * 4 + 4, j * 4:j * 4 + 4] += res
        yb[y0:y0 + 16, x0:x0 + 16] = np.clip(out, 0, 255)
    cy0, cx0 = my * 8 + 1, mx * 8 + 1
    for buf, coefs in ((ub, ucoef), (vb, vcoef)):
        above = buf[cy0 - 1, cx0:cx0 + 8].astype(np.int32)
        left = buf[cy0:cy0 + 8, cx0 - 1].astype(np.int32)
        corner = int(buf[cy0 - 1, cx0 - 1])
        out = _pred16(mb["uvmode"], above, left, corner, my > 0, mx > 0, 8).copy()
        for i in range(2):
            for j in range(2):
                res = _residual4(coefs[i * 2 + j])
                if res is not None:
                    out[i * 4:i * 4 + 4, j * 4:j * 4 + 4] += res
        buf[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(out, 0, 255)

# ---------------------------------------------------------------------------
# In-loop deblocking — RFC 6386 §15. Vectorized along each edge.


def _lf_limits(lvl: int, sharpness: int) -> Tuple[int, int]:
    interior = lvl
    if sharpness:
        interior >>= 1 if sharpness <= 4 else 2
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)  # keyframe table §15.2
    return interior, hev


def _clamp_s(v):
    return np.clip(v, -128, 127)


def _filter_normal(block, E: int, I: int, H: int, mb_edge: bool):
    """block: (n, 8) int32 rows [p3..p0 q0..q3] across the edge; returns
    the filtered copy. §15.2 normal filter mask/hev; §15.3 mbfilter for
    MB edges (27/18/9 taps) vs the 4-tap subblock filter."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (block[:, k] for k in range(8))
    mask = (
        (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E)
        & (np.abs(p3 - p2) <= I) & (np.abs(p2 - p1) <= I)
        & (np.abs(p1 - p0) <= I) & (np.abs(q1 - q0) <= I)
        & (np.abs(q2 - q1) <= I) & (np.abs(q3 - q2) <= I)
    )
    hev = (np.abs(p1 - p0) > H) | (np.abs(q1 - q0) > H)
    P2, P1, P0 = p2 - 128, p1 - 128, p0 - 128
    Q0, Q1, Q2 = q0 - 128, q1 - 128, q2 - 128
    out = block.copy()
    if mb_edge:
        w = _clamp_s(_clamp_s(P1 - Q1) + 3 * (Q0 - P0))
        a27 = _clamp_s((27 * w + 63) >> 7)
        a18 = _clamp_s((18 * w + 63) >> 7)
        a9 = _clamp_s((9 * w + 63) >> 7)
        # high-edge-variance pixels get the common 4-tap instead
        a = w
        f1 = _clamp_s(a + 4) >> 3
        f2 = _clamp_s(a + 3) >> 3
        out[:, 4] = np.where(
            mask, np.where(hev, _clamp_s(Q0 - f1), _clamp_s(Q0 - a27)) + 128, q0
        )
        out[:, 3] = np.where(
            mask, np.where(hev, _clamp_s(P0 + f2), _clamp_s(P0 + a27)) + 128, p0
        )
        sel = mask & ~hev
        out[:, 5] = np.where(sel, _clamp_s(Q1 - a18) + 128, q1)
        out[:, 2] = np.where(sel, _clamp_s(P1 + a18) + 128, p1)
        out[:, 6] = np.where(sel, _clamp_s(Q2 - a9) + 128, q2)
        out[:, 1] = np.where(sel, _clamp_s(P2 + a9) + 128, p2)
    else:
        a = _clamp_s(np.where(hev, _clamp_s(P1 - Q1), 0) + 3 * (Q0 - P0))
        f1 = _clamp_s(a + 4) >> 3
        f2 = _clamp_s(a + 3) >> 3
        out[:, 4] = np.where(mask, _clamp_s(Q0 - f1) + 128, q0)
        out[:, 3] = np.where(mask, _clamp_s(P0 + f2) + 128, p0)
        f3 = (f1 + 1) >> 1
        sel = mask & ~hev
        out[:, 5] = np.where(sel, _clamp_s(Q1 - f3) + 128, q1)
        out[:, 2] = np.where(sel, _clamp_s(P1 + f3) + 128, p1)
    return out


def _filter_simple(block, E: int):
    """block: (n, 4) int32 [p1 p0 q0 q1]; §15.7 simple filter (luma only)."""
    p1, p0, q0, q1 = (block[:, k] for k in range(4))
    mask = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E
    P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _clamp_s(_clamp_s(P1 - Q1) + 3 * (Q0 - P0))
    f1 = _clamp_s(a + 4) >> 3
    f2 = _clamp_s(a + 3) >> 3
    out = block.copy()
    out[:, 2] = np.where(mask, _clamp_s(Q0 - f1) + 128, q0)
    out[:, 1] = np.where(mask, _clamp_s(P0 + f2) + 128, p0)
    return out


def _edge_v(plane, x, y0, n, E, I, H, mb_edge):
    blk = plane[y0:y0 + n, x - 4:x + 4].astype(np.int32)
    plane[y0:y0 + n, x - 4:x + 4] = _filter_normal(blk, E, I, H, mb_edge)


def _edge_h(plane, y, x0, n, E, I, H, mb_edge):
    blk = np.ascontiguousarray(plane[y - 4:y + 4, x0:x0 + n].T).astype(np.int32)
    plane[y - 4:y + 4, x0:x0 + n] = _filter_normal(blk, E, I, H, mb_edge).T


def _edge_v_simple(plane, x, y0, n, E):
    blk = plane[y0:y0 + n, x - 2:x + 2].astype(np.int32)
    plane[y0:y0 + n, x - 2:x + 2] = _filter_simple(blk, E)


def _edge_h_simple(plane, y, x0, n, E):
    blk = np.ascontiguousarray(plane[y - 2:y + 2, x0:x0 + n].T).astype(np.int32)
    plane[y - 2:y + 2, x0:x0 + n] = _filter_simple(blk, E).T


def _loop_filter(yb, ub, vb, hdr: Dict, lf_info, mb_w: int, mb_h: int) -> None:
    """Apply the in-loop filter MB by MB in raster order (§15.1: left MB
    edge, interior vertical edges, top MB edge, interior horizontal).
    Interior edges are skipped for MBs with no coefficients whose mode
    is not B_PRED."""
    base = hdr["filter_level"]
    seg = hdr["seg"]

    def mb_level(seg_id: int, bpred: bool) -> int:
        if seg["enabled"]:
            lvl = seg["lf"][seg_id] if seg["abs_delta"] else base + seg["lf"][seg_id]
        else:
            lvl = base
        lvl = max(0, min(63, lvl))
        if hdr["lf_delta_enabled"]:
            lvl += hdr["ref_lf_deltas"][0]  # keyframe MBs are intra-coded
            if bpred:
                lvl += hdr["mode_lf_deltas"][0]
            lvl = max(0, min(63, lvl))
        return lvl

    Y = yb[1:, 1:1 + mb_w * 16]
    U = ub[1:, 1:]
    V = vb[1:, 1:]
    simple = hdr["filter_simple"]
    for my in range(mb_h):
        for mx in range(mb_w):
            seg_id, bpred, has_c = lf_info[my * mb_w + mx]
            lvl = mb_level(seg_id, bpred)
            if lvl == 0:
                continue
            interior, hev_t = _lf_limits(lvl, hdr["sharpness"])
            mbE = (lvl + 2) * 2 + interior
            sbE = lvl * 2 + interior
            inner = has_c or bpred
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            if simple:
                if mx > 0:
                    _edge_v_simple(Y, x0, y0, 16, mbE)
                if inner:
                    for dx in (4, 8, 12):
                        _edge_v_simple(Y, x0 + dx, y0, 16, sbE)
                if my > 0:
                    _edge_h_simple(Y, y0, x0, 16, mbE)
                if inner:
                    for dy in (4, 8, 12):
                        _edge_h_simple(Y, y0 + dy, x0, 16, sbE)
                continue
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

# ---------------------------------------------------------------------------
# Per-MB residual decode — RFC 6386 §13.3/§13.4 block ordering and
# nonzero-context bookkeeping (Y2 first when present, then 16 Y, 4 U, 4 V).


def _mb_residuals(d: BoolDec, hdr: Dict, mb: Dict, dqf: Dict,
                  mx: int, ctx) -> Tuple[list, list, list, bool]:
    """Decode one macroblock's residuals from token bool-decoder ``d``.
    ``ctx`` is the mutable context state dict (above_* arrays sized by the
    MB row, left_* reset per row). Returns (ycoef, ucoef, vcoef, has_c):
    16/4/4 per-block dequantized coefficient lists (None = all-zero) and
    whether ANY coefficient (incl. the Y2 plane) is nonzero."""
    probs = hdr["coeff_probs"]
    if mb["skip"]:
        # RFC §13.1: a skipped MB contributes zero contexts for Y/U/V; the
        # Y2 context is zeroed only when the MB actually owns a Y2 block
        # (whole-MB ymode); a skipped B_PRED MB leaves it untouched.
        ctx["left_y"][:] = [0] * 4
        ctx["above_y"][mx * 4 : mx * 4 + 4] = [0] * 4
        ctx["left_u"][:] = [0] * 2
        ctx["above_u"][mx * 2 : mx * 2 + 2] = [0] * 2
        ctx["left_v"][:] = [0] * 2
        ctx["above_v"][mx * 2 : mx * 2 + 2] = [0] * 2
        if mb["ymode"] != B_PRED:
            ctx["left_y2"] = ctx["above_y2"][mx] = 0
        return [None] * 16, [None] * 4, [None] * 4, False

    has_c = False
    if mb["ymode"] != B_PRED:
        c = ctx["above_y2"][mx] + ctx["left_y2"]
        y2, nz2 = _decode_coeffs(d, probs[1], c, 0, dqf["y2dc"], dqf["y2ac"])
        ctx["above_y2"][mx] = ctx["left_y2"] = nz2
        dcs = iwht4x4(y2) if nz2 else None
        has_c = has_c or bool(nz2)
        first, ptype = 1, 0
    else:
        dcs, first, ptype = None, 0, 3

    ycoef: list = []
    for i in range(4):
        for j in range(4):
            c = ctx["above_y"][mx * 4 + j] + ctx["left_y"][i]
            coeffs, nz = _decode_coeffs(
                d, probs[ptype], c, first, dqf["y1dc"], dqf["y1ac"]
            )
            ctx["above_y"][mx * 4 + j] = ctx["left_y"][i] = nz
            if dcs is not None:
                coeffs[0] = dcs[i * 4 + j]
            if nz or (dcs is not None and dcs[i * 4 + j]):
                has_c = True
                ycoef.append(coeffs)
            else:
                ycoef.append(None)

    ucoef: list = []
    vcoef: list = []
    for plane, out in (("u", ucoef), ("v", vcoef)):
        above, left = ctx["above_" + plane], ctx["left_" + plane]
        for i in range(2):
            for j in range(2):
                c = above[mx * 2 + j] + left[i]
                coeffs, nz = _decode_coeffs(
                    d, probs[2], c, 0, dqf["uvdc"], dqf["uvac"]
                )
                above[mx * 2 + j] = left[i] = nz
                has_c = has_c or bool(nz)
                out.append(coeffs if nz else None)
    return ycoef, ucoef, vcoef, has_c


def _segment_dqf(hdr: Dict) -> List[Dict]:
    """Per-segment dequantization factor dicts (4 entries; index by the
    MB's segment id — all identical when segmentation is off)."""
    seg, base = hdr["seg"], hdr["yac_qi"]
    out = []
    for sid in range(4):
        if seg["enabled"]:
            qi = seg["quant"][sid] if seg["abs_delta"] else base + seg["quant"][sid]
        else:
            qi = base
        out.append(dequant_factors(_clamp_q(qi), hdr["q_deltas"]))
    return out


def decode_vp8_planes(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a VP8 keyframe (the payload of a WebP "VP8 " chunk) to its
    (Y, U, V) uint8 planes — Y is (h, w); U/V are the 4:2:0 chroma planes
    ((h+1)//2, (w+1)//2). Frame assembly per RFC 6386 §9: uncompressed
    header, first-partition prologue + per-MB mode records, then 1/2/4/8
    token partitions (MB row r reads partition r mod n)."""
    uh = _parse_uncompressed_header(data)
    w, h = uh["width"], uh["height"]
    part0_end = 10 + uh["part0_len"]
    d0 = BoolDec(data, 10, part0_end)
    hdr = _parse_frame_header(d0)

    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16

    # token partition table: (n-1) 3-byte LE sizes, then the partitions;
    # the last partition runs to the end of the frame (§9.5)
    n = hdr["n_parts"]
    off = part0_end + 3 * (n - 1)
    if off > len(data):
        raise ValueError("vp8: partition size table overruns frame")
    starts, pos = [], off
    for k in range(n - 1):
        size = int.from_bytes(data[part0_end + 3 * k : part0_end + 3 * k + 3], "little")
        starts.append((pos, pos + size))
        pos += size
        if pos > len(data):
            raise ValueError("vp8: token partition overruns frame")
    starts.append((pos, len(data)))
    if starts[-1][0] > len(data):
        raise ValueError("vp8: token partition overruns frame")
    token_decs = [BoolDec(data, s, e) for s, e in starts]

    modes = _decode_modes(d0, hdr, mb_w, mb_h)
    dqfs = _segment_dqf(hdr)

    # padded reconstruction planes — §12.2 borders: above row 127 (incl.
    # the corner and the 4-px above-right extension, which stays 127 past
    # the frame's right edge), left column 129
    yb = np.full((mb_h * 16 + 1, mb_w * 16 + 1 + 4), 127, np.uint8)
    ub = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, np.uint8)
    vb = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, np.uint8)
    yb[1:, 0] = 129
    ub[1:, 0] = 129
    vb[1:, 0] = 129

    lf_info = []
    ctx = {
        "above_y": [0] * (mb_w * 4), "above_u": [0] * (mb_w * 2),
        "above_v": [0] * (mb_w * 2), "above_y2": [0] * mb_w,
        "left_y": [0] * 4, "left_u": [0] * 2, "left_v": [0] * 2,
        "left_y2": 0,
    }
    for my in range(mb_h):
        ctx["left_y"][:] = [0] * 4
        ctx["left_u"][:] = [0] * 2
        ctx["left_v"][:] = [0] * 2
        ctx["left_y2"] = 0
        d = token_decs[my % n]
        for mx in range(mb_w):
            mb = modes[my * mb_w + mx]
            ycoef, ucoef, vcoef, has_c = _mb_residuals(
                d, hdr, mb, dqfs[mb["seg"]], mx, ctx
            )
            _reconstruct_mb(yb, ub, vb, my, mx, mb, ycoef, ucoef, vcoef)
            lf_info.append((mb["seg"], mb["ymode"] == B_PRED, has_c))

    if hdr["filter_level"] > 0:
        _loop_filter(yb, ub, vb, hdr, lf_info, mb_w, mb_h)

    cw, chh = (w + 1) // 2, (h + 1) // 2
    return (
        np.ascontiguousarray(yb[1 : h + 1, 1 : w + 1]),
        np.ascontiguousarray(ub[1 : chh + 1, 1 : cw + 1]),
        np.ascontiguousarray(vb[1 : chh + 1, 1 : cw + 1]),
    )


def decode_vp8(data: bytes) -> np.ndarray:
    """VP8 keyframe → (h, w, 3) uint8 RGB. Chroma is upsampled by
    2x2 replication (sample-and-hold) and converted with the full-range
    BT.601 integer approximation; grayscale content (U=V=128) is exact
    under any coefficient choice since the chroma terms vanish. A native
    decoder registered via install_native_codecs() replaces this path
    (with libwebp's fancy upsampler) without engine changes."""
    y, u, v = decode_vp8_planes(data)
    h, w = y.shape
    uu = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    vv = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    yy = y.astype(np.int32)
    # BT.601 full-range, 16-bit fixed point (91881/65536 = 1.402 etc.)
    r = yy + ((91881 * vv + 32768) >> 16)
    g = yy - ((22554 * uu + 46802 * vv + 32768) >> 16)
    b = yy + ((116130 * uu + 32768) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)

# ---------------------------------------------------------------------------
# Encoder — spec-valid keyframe streams for grayscale 4x4-lattice content.


def _emit_block_tokens(e: BoolEnc, probs_t, ctx: int, first: int,
                       value: int) -> int:
    """Emit one block's token run: a single coefficient ``value`` at zigzag
    position ``first`` (0 = none) followed by EOB. Mirrors _decode_coeffs'
    band/context walk bit for bit. Returns the block's nonzero flag."""
    p = probs_t[COEFF_BANDS[first]][ctx]
    if value == 0:
        e.tree(COEF_TREE, p, DCT_EOB)
        return 0
    mag = abs(value)
    if mag <= 4:
        tok = mag
    else:
        cat = 5
        for k in range(5, -1, -1):
            if mag >= CAT_BASE[k]:
                cat = k
                break
        tok = 5 + cat
    e.tree(COEF_TREE, p, tok)
    if tok >= 5:
        extra = mag - CAT_BASE[tok - 5]
        pbs = CAT_PROBS[tok - 5]
        for k, pb in enumerate(pbs):
            e.put((extra >> (len(pbs) - 1 - k)) & 1, pb)
    e.put(1 if value < 0 else 0, 128)
    # next position: nonzero token -> tree restarts at 0, ctx 1 or 2
    c2 = 1 if tok == 1 else 2
    if first + 1 < 16:
        e.tree(COEF_TREE, probs_t[COEFF_BANDS[first + 1]][c2], DCT_EOB)
    return 1


def _plan_mb(img: np.ndarray, my: int, mx: int, yb: np.ndarray) -> Dict:
    """Mode decision for one MB of exact-encodable grayscale content.
    Preference order exercises every keyframe path the decoder has:
    16x16 V/H/TM/DC with zero residual (skip=1), DC16 + a single Y2
    DC token (constant offset, the WHT path), else B_PRED with one
    DC token per 4x4 subblock (requires 4x4-constant content)."""
    y0, x0 = my * 16 + 1, mx * 16 + 1
    tgt = img[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].astype(np.int32)
    above = yb[y0 - 1, x0 : x0 + 16].astype(np.int32)
    left = yb[y0 : y0 + 16, x0 - 1].astype(np.int32)
    corner = int(yb[y0 - 1, x0 - 1])
    for mode in (V_PRED, H_PRED, TM_PRED, DC_PRED):
        pred = _pred16(mode, above, left, corner, my > 0, mx > 0, 16)
        if (pred == tgt).all():
            return {"ymode": mode, "skip": 1, "y2": 0, "btok": None}
    dc_pred = _pred16(DC_PRED, above, left, corner, my > 0, mx > 0, 16)
    diff = tgt - dc_pred
    c0 = int(diff[0, 0])
    if c0 != 0 and (diff == c0).all():
        # Y2-only: token t=8c -> WHT DCs all (8c+3)>>3 = c -> residual
        # (8c+4)>>3 = c exactly (y2dc is 8 at qi=0)
        return {"ymode": DC_PRED, "skip": 0, "y2": 8 * c0, "btok": None}
    # B_PRED / B_DC lattice: each 4x4 subblock must be constant
    btok = []
    for i in range(4):
        for j in range(4):
            blk = tgt[i * 4 : i * 4 + 4, j * 4 : j * 4 + 4]
            v0 = int(blk[0, 0])
            if not (blk == v0).all():
                raise ValueError(
                    "encode_vp8_gray: content must be constant per 4x4 "
                    "block (DC-only residuals are the exact-lattice "
                    "contract; see the module docstring)"
                )
            ry, rx = y0 + i * 4, x0 + j * 4
            A = yb[ry - 1, rx : rx + 4].astype(np.int32)
            L = yb[ry : ry + 4, rx - 1].astype(np.int32)
            pred = (int(A.sum()) + int(L.sum()) + 4) >> 3  # B_DC
            btok.append(2 * (v0 - pred))  # dcq=4: (4*2c+4)>>3 == c
    return {"ymode": B_PRED, "skip": 0, "y2": 0, "btok": btok}


def encode_vp8_gray(img: np.ndarray, log2_parts: int = 0,
                    filter_level: int = 0, sharpness: int = 0) -> bytes:
    """Encode a grayscale image whose 4x4 blocks are each constant into a
    spec-valid VP8 keyframe (raw "VP8 " chunk payload) that reconstructs
    EXACTLY (chroma is flat 128, filter_level=0 by default so the loop
    filter never perturbs pixels). qi is pinned to 0 (dcq=4, y2dc=8) so
    integer tokens can hit any residual constant. ``log2_parts`` selects
    1/2/4/8 token partitions to exercise the partition table."""
    if img.ndim == 3:
        if img.shape[2] != 1:
            raise ValueError("encode_vp8_gray: grayscale (h, w) input only")
        img = img[:, :, 0]
    h, w = img.shape
    if not (0 < w < 16384 and 0 < h < 16384):
        raise ValueError("encode_vp8_gray: bad dimensions")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    # pad to MB multiples by edge replication — keeps 4x4 blocks constant
    # because a partial lattice cell's visible pixels are all one value
    pad = np.pad(img.astype(np.uint8),
                 ((0, mb_h * 16 - h), (0, mb_w * 16 - w)), mode="edge")

    # exact reconstruction == source, so prediction context is just the
    # padded source behind the §12.2 border convention
    yb = np.full((mb_h * 16 + 1, mb_w * 16 + 1 + 4), 127, np.uint8)
    yb[1:, 0] = 129
    yb[1:, 1 : 1 + mb_w * 16] = pad

    plans = [
        _plan_mb(pad, my, mx, yb) for my in range(mb_h) for mx in range(mb_w)
    ]

    # ---- first partition: frame prologue + mode records
    e0 = BoolEnc()
    e0.literal(0, 1)  # color_space
    e0.literal(0, 1)  # clamping
    e0.literal(0, 1)  # segmentation disabled
    e0.literal(0, 1)  # filter_simple (normal filter)
    e0.literal(filter_level, 6)
    e0.literal(sharpness, 3)
    e0.literal(0, 1)  # lf deltas disabled
    e0.literal(log2_parts, 2)
    e0.literal(0, 7)  # yac_qi = 0
    for _ in range(5):
        e0.put(0, 128)  # no quantizer deltas
    e0.literal(1, 1)  # refresh_entropy
    for t in range(4):  # no coefficient probability updates
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    e0.put(0, _update_prob(t, b, c, p))
    e0.literal(1, 1)  # mb_no_skip_coeff: per-MB skip flags present
    e0.literal(128, 8)  # skip_prob

    above_sub = [[B_DC] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_sub = [B_DC] * 4
        for mx in range(mb_w):
            plan = plans[my * mb_w + mx]
            e0.put(plan["skip"], 128)
            e0.tree(KF_YMODE_TREE, KF_YMODE_PROBS, plan["ymode"])
            if plan["ymode"] == B_PRED:
                bmodes = [B_DC] * 16
                for i in range(4):
                    for j in range(4):
                        a = above_sub[mx][j] if i == 0 else bmodes[(i - 1) * 4 + j]
                        lft = left_sub[i] if j == 0 else bmodes[i * 4 + j - 1]
                        e0.tree(BMODE_TREE, _kf_bmode_probs(a, lft), B_DC)
            else:
                bmodes = [_IMPLIED_BMODE[plan["ymode"]]] * 16
            above_sub[mx] = bmodes[12:16]
            left_sub = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            e0.tree(UV_MODE_TREE, KF_UV_PROBS, DC_PRED)

    # ---- token partitions (MB row r -> partition r mod n); contexts are
    # global across partitions, mirroring the decoder's single ctx state
    n = 1 << log2_parts
    encs = [BoolEnc() for _ in range(n)]
    probs = _coeff_probs_default()
    ctx = {
        "above_y": [0] * (mb_w * 4), "above_u": [0] * (mb_w * 2),
        "above_v": [0] * (mb_w * 2), "above_y2": [0] * mb_w,
    }
    for my in range(mb_h):
        e = encs[my % n]
        left_y, left_u, left_v, left_y2 = [0] * 4, [0] * 2, [0] * 2, 0
        for mx in range(mb_w):
            plan = plans[my * mb_w + mx]
            if plan["skip"]:
                left_y[:] = [0] * 4
                ctx["above_y"][mx * 4 : mx * 4 + 4] = [0] * 4
                left_u[:] = [0] * 2
                ctx["above_u"][mx * 2 : mx * 2 + 2] = [0] * 2
                left_v[:] = [0] * 2
                ctx["above_v"][mx * 2 : mx * 2 + 2] = [0] * 2
                left_y2 = ctx["above_y2"][mx] = 0  # never B_PRED when skip
                continue
            if plan["ymode"] != B_PRED:
                c = ctx["above_y2"][mx] + left_y2
                nz2 = _emit_block_tokens(e, probs[1], c, 0, plan["y2"])
                ctx["above_y2"][mx] = left_y2 = nz2
                first, ptype = 1, 0
            else:
                first, ptype = 0, 3
            for i in range(4):
                for j in range(4):
                    c = ctx["above_y"][mx * 4 + j] + left_y[i]
                    val = plan["btok"][i * 4 + j] if plan["btok"] else 0
                    nz = _emit_block_tokens(e, probs[ptype], c, first, val)
                    ctx["above_y"][mx * 4 + j] = left_y[i] = nz
            for above, left in ((ctx["above_u"], left_u), (ctx["above_v"], left_v)):
                for i in range(2):
                    for j in range(2):
                        c = above[mx * 2 + j] + left[i]
                        nz = _emit_block_tokens(e, probs[2], c, 0, 0)
                        above[mx * 2 + j] = left[i] = nz

    part0 = e0.flush()
    parts = [e.flush() for e in encs]
    tag = (0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    # size table for all-but-last partition precedes the payloads (§9.5)
    return (
        tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
        + struct.pack("<HH", w, h) + part0
        + b"".join(len(p).to_bytes(3, "little") for p in parts[:-1])
        + b"".join(parts)
    )


def encode_webp_lossy_gray(img: np.ndarray, **kw) -> bytes:
    """encode_vp8_gray wrapped in a RIFF/WEBP container ("VP8 " chunk)."""
    frame = encode_vp8_gray(img, **kw)
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
