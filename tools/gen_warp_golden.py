"""Generate the golden oracle table for ``r_load_warp_crosscrs``.

The Krüger-series cross-CRS transform is not SQL-expressible, so the
oracle is a golden table: expected per-tile stats computed by a
deliberately SLOW per-pixel LOOP reference — a different code path from
the engine's vectorized tap-pair warp (sources/synth.py:_warp) and tile
pipeline (plans/load.py) — sharing only ``functions/proj.py`` (itself
invariant-tested in tests/test_proj.py) and the synth pixel formula.

Semantics replicated from first principles (RFC: the module docstrings):
  - synth pixels  v(py,px) = (seed*7919 + py*8191 + px*127) % 10007,
    hole → nodata(-1) when (py + px + seed) % 5 == 0
  - bilinear, center-based (p = f - 0.5), 2x2 tent taps; a tap with
    nonzero weight that is out-of-extent or nodata poisons the pixel
  - ROI per (tile, item): densified src bbox → dst CRS → rounded rows
  - first-valid mosaic across items in (datetime, id) order = item index
  - float64 output, NaN fill; checksum = sum of valid pixels

Output: ``odc_stac_spark/queries/_warp_golden.py`` (committed; rerun on
any fixture change). The driver hashes floats at 9 significant digits
(%.9g), so last-ulp accumulation-order differences between the loop and
vectorized paths cannot flake the gate.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odc_stac_spark.functions import proj  # noqa: E402

SRC_CRS = "EPSG:32735"
DST_CRS = "EPSG:4326"
N_ITEMS = 4
SRC_H, SRC_W, SRC_RES = 100, 150, 100.0
SRC_X0 = 400000.0
DST_H, DST_W = 220, 160
DSX, DSY = 0.001, -0.001
DX0, DY0 = 26.06, -14.92
TILE = 64
NODATA_EVERY = 5


def src_origin_y(i: int) -> float:
    return 8350000.0 - i * 5000.0


def synth_value(seed: int, py: int, px: int) -> float:
    if (py + px + seed) % NODATA_EVERY == 0:
        return None  # nodata hole
    return float((seed * 7919 + py * 8191 + px * 127) % 10007)


def item_roi(tile_y0: float, tile_x0: float, th: int, tw: int, i: int):
    """Densified src bbox → dst CRS → rounded tile-row ROI (the engine's
    empty-ROI/clip arithmetic, reproduced expression for expression)."""
    sy0 = src_origin_y(i)
    sxmin, sxmax = SRC_X0, SRC_X0 + SRC_W * SRC_RES
    symax, symin = sy0, sy0 - SRC_H * SRC_RES
    t01 = np.linspace(0.0, 1.0, 25)
    ex = np.concatenate([
        sxmin + (sxmax - sxmin) * t01, np.full_like(t01, sxmax),
        sxmax + (sxmin - sxmax) * t01, np.full_like(t01, sxmin),
    ])
    ey = np.concatenate([
        np.full_like(t01, symin), symin + (symax - symin) * t01,
        np.full_like(t01, symax), symax + (symin - symax) * t01,
    ])
    tx, ty = proj.transform(ex, ey, SRC_CRS, DST_CRS)
    bxmin, bxmax = float(tx.min()), float(tx.max())
    bymin, bymax = float(ty.min()), float(ty.max())
    dxmin, dxmax = tile_x0, tile_x0 + tw * DSX
    dymax, dymin = tile_y0, tile_y0 + th * DSY
    xmin, xmax = max(bxmin, dxmin), min(bxmax, dxmax)
    ymin, ymax = max(bymin, dymin), min(bymax, dymax)
    if xmin >= xmax or ymin >= ymax:
        return None
    ry0 = max(0, int(round((ymax - tile_y0) / DSY)))
    ry1 = min(th, int(round((ymin - tile_y0) / DSY)))
    rx0 = max(0, int(round((xmin - tile_x0) / DSX)))
    rx1 = min(tw, int(round((xmax - tile_x0) / DSX)))
    if ry0 >= ry1 or rx0 >= rx1:
        return None
    return ry0, ry1, rx0, rx1


def bilinear(i: int, lon: float, lat: float):
    """One output pixel from item i, or None (out of extent / poisoned)."""
    sx, sy = proj.transform(np.array([lon]), np.array([lat]), DST_CRS, SRC_CRS)
    fy = (float(sy[0]) - src_origin_y(i)) / -SRC_RES
    fx = (float(sx[0]) - SRC_X0) / SRC_RES
    py, px = fy - 0.5, fx - 0.5
    jy, jx = math.floor(py), math.floor(px)
    ay, ax = py - jy, px - jx
    acc = 0.0
    for dy, wy in ((0, 1.0 - ay), (1, ay)):
        for dx, wx in ((0, 1.0 - ax), (1, ax)):
            w = wy * wx
            ty, tx = jy + dy, jx + dx
            inb = 0 <= ty < SRC_H and 0 <= tx < SRC_W
            v = synth_value(i, ty, tx) if inb else None
            if v is None:
                if abs(w) > 1e-12:
                    return None
                continue
            acc += v * w
    return acc


def main() -> None:
    n_ty = (DST_H + TILE - 1) // TILE
    n_tx = (DST_W + TILE - 1) // TILE
    rows = []
    for iy in range(n_ty):
        for ix in range(n_tx):
            th = min(TILE, DST_H - iy * TILE)
            tw = min(TILE, DST_W - ix * TILE)
            ty0 = DY0 + iy * TILE * DSY
            tx0 = DX0 + ix * TILE * DSX
            tile = np.full((th, tw), np.nan)
            for i in range(N_ITEMS):  # first-valid mosaic, item order
                roi = item_roi(ty0, tx0, th, tw, i)
                if roi is None:
                    continue
                ry0, ry1, rx0, rx1 = roi
                for r in range(ry0, ry1):
                    lat = ty0 + (r + 0.5) * DSY
                    for c in range(rx0, rx1):
                        if not np.isnan(tile[r, c]):
                            continue
                        lon = tx0 + (c + 0.5) * DSX
                        v = bilinear(i, lon, lat)
                        if v is not None:
                            tile[r, c] = v
            valid = ~np.isnan(tile)
            checksum = float(tile[valid].sum()) if valid.any() else 0.0
            rows.append(
                f"('red',0,{iy},{ix},{th},{tw},'float64',"
                f"{int(valid.sum())},{checksum!r})"
            )
            print(f"tile ({iy},{ix}): valid={int(valid.sum())} sum={checksum}")
    values = ",\n  ".join(rows)
    sql = (
        "SELECT band, CAST(t AS INTEGER) AS t, CAST(iy AS INTEGER) AS iy,\n"
        "       CAST(ix AS INTEGER) AS ix, CAST(height AS INTEGER) AS height,\n"
        "       CAST(width AS INTEGER) AS width, dtype,\n"
        "       CAST(valid_count AS BIGINT) AS valid_count,\n"
        "       CAST(checksum AS DOUBLE) AS checksum\n"
        "FROM (VALUES\n  " + values + "\n) AS g(band, t, iy, ix, height,"
        " width, dtype, valid_count, checksum)\n"
        "ORDER BY band, t, iy, ix"
    )
    out = os.path.join(
        os.path.dirname(__file__), "..", "odc_stac_spark", "queries",
        "_warp_golden.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_warp_golden.py — do not edit.\n\n'
            "Golden oracle for r_load_warp_crosscrs: per-tile stats computed\n"
            "by an independent per-pixel loop reference (bilinear cross-CRS\n"
            "warp + first-valid mosaic from first principles; only\n"
            "functions/proj.py and the synth pixel formula are shared with\n"
            'the engine).\n"""\n\n'
            f"WARP_GOLDEN_SQL = {sql!r}\n"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
