"""Zonal statistics over the tiles DataFrame — pixel-plane analytics
beyond load() (the odc ecosystem runs these downstream of the reference;
here they are first-class operators on the tile table).

Shape: one Arrow task per tile computes per-zone partial (sum, count)
for the zones it intersects — a map-side partial aggregation over pixels —
then a tiny groupBy merges partials. The shuffle carries one row per
(tile × intersected zone), never pixels: at 100 TB the network traffic is
proportional to zone-tile overlaps, not raster size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..model import nodata_mask

_PARTIAL_SCHEMA = StructType(
    [
        StructField("band", StringType()),
        StructField("t", IntegerType()),
        StructField("zy", IntegerType()),
        StructField("zx", IntegerType()),
        StructField("psum", DoubleType()),
        StructField("pcount", LongType()),
    ]
)


def zonal_stats(
    tiles_df: DataFrame,
    nodata: float | None,
    zone_h: int,
    zone_w: int,
) -> DataFrame:
    """Per-zone mean/count over a regular zone grid (zone (zy, zx) covers
    output pixels [zy*zone_h, ...) × [zx*zone_w, ...)). Returns
    (band, t, zy, zx, n_valid, mean)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                pix = np.frombuffer(r.data, dtype=r.dtype).reshape(r.height, r.width)
                valid = ~nodata_mask(pix, nodata)
                if not valid.any():
                    continue
                ys = r.y0 + np.arange(r.height)
                xs = r.x0 + np.arange(r.width)
                zy = (ys // zone_h)[:, None]
                zx = (xs // zone_w)[None, :]
                # bin pixels into zones: scatter-add over zone ids local
                # to this tile (a tile overlaps few zones)
                zy0, zx0 = int(zy.min()), int(zx.min())
                nzy = int(zy.max()) - zy0 + 1
                nzx = int(zx.max()) - zx0 + 1
                flat = ((zy - zy0) * nzx + (zx - zx0)).astype(np.int64)
                flat2 = np.broadcast_to(flat, pix.shape)
                sums = np.bincount(
                    # select first, widen after: same elements, without
                    # the full-tile float64 temporary
                    flat2[valid], weights=pix[valid].astype(np.float64), minlength=nzy * nzx
                )
                cnts = np.bincount(flat2[valid], minlength=nzy * nzx)
                for zi in np.nonzero(cnts)[0]:
                    rows.append(
                        {
                            "band": r.band,
                            "t": r.t,
                            "zy": zy0 + zi // nzx,
                            "zx": zx0 + zi % nzx,
                            "psum": float(sums[zi]),
                            "pcount": int(cnts[zi]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["band", "t", "zy", "zx", "psum", "pcount"]
            )

    part = tiles_df.mapInPandas(partials, _PARTIAL_SCHEMA)
    return part.groupBy("band", "t", "zy", "zx").agg(
        F.sum("pcount").alias("n_valid"),
        F.round(F.sum("psum") / F.sum("pcount"), 6).alias("mean"),
    )


_POLY_PARTIAL_SCHEMA = StructType(
    [
        StructField("band", StringType()),
        StructField("t", IntegerType()),
        StructField("zone", StringType()),
        StructField("psum", DoubleType()),
        StructField("pcount", LongType()),
    ]
)


def zonal_stats_polygons(
    tiles_df: DataFrame,
    nodata: float | None,
    zones: dict,
    gbox,
) -> DataFrame:
    """Zonal mean/count over named polygon zones (P4 geometry as an
    aggregation key — the classic "stats per field/catchment/admin area"
    op). ``zones`` maps zone name → :class:`functions.geom.Polygon` in
    ``gbox.crs``; ``gbox`` is the load plan's output grid.

    Same 100 TB shape as the regular-grid form: the (small) zone dict
    ships in the task closure; each tile rasterizes only the zones whose
    bbox it intersects (vectorized even-odd fill, no per-pixel Python) and
    emits one partial row per (tile × intersected zone); pixels never
    shuffle. Overlapping zones are each counted independently, exactly as
    running the op once per zone would."""
    zone_items = sorted(zones.items())

    def partials(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                pix = np.frombuffer(r.data, dtype=r.dtype).reshape(r.height, r.width)
                valid = ~nodata_mask(pix, nodata)
                if not valid.any():
                    continue
                tgb = gbox.crop((r.y0, r.y0 + r.height), (r.x0, r.x0 + r.width))
                tb = tgb.bbox()
                fpix = pix.astype(np.float64)
                for name, poly in zone_items:
                    if not poly.intersects_bbox(tb):
                        continue
                    hit = poly.rasterize(tgb) & valid
                    n = int(hit.sum())
                    if n == 0:
                        continue
                    rows.append(
                        {
                            "band": r.band,
                            "t": r.t,
                            "zone": name,
                            "psum": float(fpix[hit].sum()),
                            "pcount": n,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["band", "t", "zone", "psum", "pcount"]
            )

    part = tiles_df.mapInPandas(partials, _POLY_PARTIAL_SCHEMA)
    return part.groupBy("band", "t", "zone").agg(
        F.sum("pcount").alias("n_valid"),
        F.round(F.sum("psum") / F.sum("pcount"), 6).alias("mean"),
    )
