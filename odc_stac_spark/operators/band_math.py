"""Band algebra over the tiles DataFrame — the most common post-load
operation for reference users (NDVI & friends; the reference delegates it
to xarray expressions, here it is a tile-table operator).

Shape: the two band tile-sets join on (t, iy, ix) — both sides carry the
same hash partitioning from the load shuffle, so the join is co-located;
the arithmetic runs in one Arrow batch per tile pair. Nodata is
mask-propagating: output is NaN where either input pixel is missing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..model import nodata_mask
from .composite import _COMPOSITE_SCHEMA


def normalized_difference(
    tiles_df: DataFrame,
    band_a: str,
    band_b: str,
    nodata: float | None,
    out_band: str = "nd",
) -> DataFrame:
    """(a - b) / (a + b) per pixel — float64 output tiles, NaN where
    either band is nodata (or the denominator is zero)."""
    a = tiles_df.where(F.col("band") == band_a).select(
        "t", "iy", "ix", "y0", "x0", "height", "width",
        F.col("dtype").alias("dtype_a"), F.col("data").alias("data_a"),
    )
    b = tiles_df.where(F.col("band") == band_b).select(
        "t", "iy", "ix",
        F.col("dtype").alias("dtype_b"), F.col("data").alias("data_b"),
    )
    joined = a.join(b, ["t", "iy", "ix"])

    def nd(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                pa = np.frombuffer(r.data_a, dtype=r.dtype_a).reshape(r.height, r.width)
                pb = np.frombuffer(r.data_b, dtype=r.dtype_b).reshape(r.height, r.width)
                miss = nodata_mask(pa, nodata) | nodata_mask(pb, nodata)
                fa = pa.astype(np.float64)
                fb = pb.astype(np.float64)
                denom = fa + fb
                miss |= denom == 0
                with np.errstate(divide="ignore", invalid="ignore"):
                    out = (fa - fb) / denom
                out[miss] = np.nan
                rows.append(
                    {
                        "band": out_band,
                        "t": int(r.t),
                        "iy": int(r.iy),
                        "ix": int(r.ix),
                        "y0": int(r.y0),
                        "x0": int(r.x0),
                        "height": int(r.height),
                        "width": int(r.width),
                        "dtype": "float64",
                        "data": out.tobytes(),
                        "valid_count": int(np.isfinite(out).sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in _COMPOSITE_SCHEMA.fields],
            )

    return joined.mapInPandas(nd, _COMPOSITE_SCHEMA)
