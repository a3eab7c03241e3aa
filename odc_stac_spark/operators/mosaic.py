"""First-valid mosaic kernel — the pixel-fusing aggregation (SURVEY A6).

Semantics match the reference's ``fill_2d_slice``
(loader/_builder.py:175-212): destination starts as fill value (dst
nodata; NaN for floats / 0 for ints when no nodata is declared,
:188-194), sources apply in group order, and each source only writes
pixels that are still missing — "first valid pixel takes precedence".

This runs inside the tile task (numpy over one tile), NOT as a Spark
aggregate: ordered, windowed array mutation is exactly the case where a
vectorized Python kernel beats any built-in expression (SURVEY §7.3
"Order-sensitive mosaic"). The *ordering* is carried relationally — the
tile task receives its sources already sequenced by (time, id) — so Spark
never needs an order-sensitive shuffle.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np

from ..model import nodata_mask
from ..sources.synth import ReadResult


def empty_fill(dst_dtype: np.dtype, dst_nodata: Optional[float]) -> float:
    """fill value: nodata, else NaN for floats / 0 for ints
    (loader/_builder.py:188-194)."""
    if dst_nodata is not None:
        return dst_nodata
    if np.dtype(dst_dtype).kind == "f":
        return float("nan")
    return 0


def fill_tile(
    shape: Tuple[int, int],
    dst_dtype: np.dtype,
    dst_nodata: Optional[float],
    reads: Iterable[Optional[ReadResult]],
) -> np.ndarray:
    """Mosaic ordered source reads into one destination tile.

    When ``dst_nodata`` is set, "missing" = sentinel-valued — identical to
    the reference. When it is None (int output with no nodata anywhere),
    the reference lets only the chunk's *first* source write, which makes
    output depend on chunk size; we instead track a per-pixel written mask
    (first write wins per pixel) — tile-size-independent, and equal to the
    reference wherever any nodata is declared."""
    fill = empty_fill(dst_dtype, dst_nodata)
    track = dst_nodata is None
    dst = None
    written = None
    for rr in reads:
        if rr is None:
            continue
        ys = slice(rr.roi_y[0], rr.roi_y[1])
        xs = slice(rr.roi_x[0], rr.roi_x[1])
        if dst is None:
            # first source: its window region of dst is untouched fill,
            # so "still missing" is all-True by construction — write
            # directly (no mask pass), and when the read covers the
            # whole tile in the destination dtype, adopt its buffer
            # outright (the read already applied dst nodata; ReadResult
            # requires a fresh task-private buffer). The paste path is
            # memory-bandwidth bound at 32 workers; this removes a full
            # fill + copy + compare of the tile's largest arrays.
            # Adoption gates (ADVICE r16): writeable — a reader returning
            # a cached/frombuffer-backed array must fall to the copy path
            # rather than be mutated by later sources; base is None — a
            # view would keep its (possibly much larger) parent window
            # alive in worker RSS until the tile serializes.
            if (
                tuple(rr.roi_y) == (0, shape[0])
                and tuple(rr.roi_x) == (0, shape[1])
                and rr.pix.dtype == np.dtype(dst_dtype)
                and rr.pix.flags.writeable
                and rr.pix.base is None
            ):
                dst = rr.pix
            else:
                dst = np.full(shape, fill, dtype=dst_dtype)
                dst[ys, xs] = rr.pix
            if track:
                written = np.zeros(shape, dtype=bool)
                written[ys, xs] = True
            continue
        window = dst[ys, xs]
        if written is None:
            still_missing = nodata_mask(window, dst_nodata)
        else:
            still_missing = ~written[ys, xs]
            written[ys, xs] = True
        np.copyto(window, rr.pix, where=still_missing)
    if dst is None:
        dst = np.full(shape, fill, dtype=dst_dtype)
    return dst
