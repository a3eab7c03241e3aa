"""User-defined table function + grouped-aggregate surface (SURVEY §2.10).

The reference exposes no UDTF/UDAF extension points; the Spark-native
engine gets them from the platform, and these are the engine's worked
examples:

- :class:`TileRangeUDTF` — the P6 item→tile generator as a real Python
  UDTF (Spark 4 ``@udtf``): one footprint row in, the intersected
  ``(iy, ix)`` tile-index rows out, usable from SQL via
  ``LATERAL tile_range(...)``. The DataFrame pipeline uses the pure-
  column-expression form (plans/load.py) because it stays in codegen;
  the UDTF form is the user extension slot for generators Catalyst
  can't express.
- :func:`mad` (factory) — a pandas grouped-aggregate UDAF (Arrow-batched): median
  absolute deviation, the robust-statistics aggregate Spark lacks as a
  built-in. Plugs into ``groupBy(...).agg(mad(col))`` like any native
  aggregate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="iy int, ix int")
class TileRangeUDTF:
    """Expand a footprint bbox (output-CRS units) into the tile indices
    it intersects on a regular tile grid anchored at (x0, y0) with pixel
    size ``res`` (south-up: y decreases with row index) and
    ``tile_h × tile_w``-pixel tiles over an ``grid_h × grid_w``-pixel
    output. Mirrors model.GeoboxTiles.tiles (P6) exactly."""

    def eval(  # noqa: D102
        self,
        xmin: float,
        ymin: float,
        xmax: float,
        ymax: float,
        x0: float,
        y0: float,
        res: float,
        tile_h: int,
        tile_w: int,
        grid_h: int,
        grid_w: int,
    ):
        import math

        # footprint → pixel range (clamped), same arithmetic as
        # GeoboxTiles.tiles: row = (y0 - y) / res, col = (x - x0) / res
        r0 = max(0, int(math.floor((y0 - ymax) / res)))
        r1 = min(grid_h, int(math.ceil((y0 - ymin) / res)))
        c0 = max(0, int(math.floor((xmin - x0) / res)))
        c1 = min(grid_w, int(math.ceil((xmax - x0) / res)))
        if r0 >= r1 or c0 >= c1:
            return
        for iy in range(r0 // tile_h, (r1 - 1) // tile_h + 1):
            for ix in range(c0 // tile_w, (c1 - 1) // tile_w + 1):
                yield iy, ix


def register_udtfs(spark) -> None:
    """Make the table functions callable from SQL."""
    spark.udtf.register("tile_range", TileRangeUDTF)


def mad():
    """Median absolute deviation — grouped-agg pandas UDAF (Arrow).

    Factory (decorating at import time would require an active
    SparkSession for return-type resolution): ``agg(mad()(col))``."""

    @pandas_udf("double")
    def _mad(v: pd.Series) -> float:
        return float((v - v.median()).abs().median())

    return _mad
