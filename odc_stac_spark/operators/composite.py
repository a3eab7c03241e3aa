"""Temporal compositing over the tiles DataFrame (pixel-plane analytics:
the odc ecosystem's cloud-free-mosaic step, run downstream of the
reference's load()).

``temporal_median``: per-pixel median across time slices, skipping
nodata — THE standard robust composite. Execution shape: tiles already
partition by (band, iy, ix) across t, so the composite is a single
``applyInPandas`` over that key — each task holds k time slices of ONE
tile (k = time depth, bounded), never a whole band. No pixel ever crosses
the network more than once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..model import nodata_mask

_COMPOSITE_SCHEMA = StructType(
    [
        StructField("band", StringType()),
        StructField("t", IntegerType()),
        StructField("iy", IntegerType()),
        StructField("ix", IntegerType()),
        StructField("y0", IntegerType()),
        StructField("x0", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("dtype", StringType()),
        StructField("data", BinaryType()),
        StructField("valid_count", LongType()),
    ]
)


def temporal_median(tiles_df: DataFrame, nodata: float | None) -> DataFrame:
    """Per-pixel median over the time axis; output tiles are float64 with
    NaN where no time slice had a valid value (t collapses to 0)."""

    def med(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        first = pdf.iloc[0]
        stack = np.full(
            (len(pdf), int(first.height), int(first.width)), np.nan, dtype=np.float64
        )
        for i, r in enumerate(pdf.itertuples()):
            pix = np.frombuffer(r.data, dtype=r.dtype).reshape(r.height, r.width)
            miss = nodata_mask(pix, nodata)
            lane = pix.astype(np.float64)
            lane[miss] = np.nan
            stack[i] = lane
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
            out = np.nanmedian(stack, axis=0)
        return pd.DataFrame(
            [
                {
                    "band": first.band,
                    "t": 0,
                    "iy": int(first.iy),
                    "ix": int(first.ix),
                    "y0": int(first.y0),
                    "x0": int(first.x0),
                    "height": int(first.height),
                    "width": int(first.width),
                    "dtype": "float64",
                    "data": out.tobytes(),
                    "valid_count": int(np.isfinite(out).sum()),
                }
            ]
        )

    return tiles_df.groupBy("band", "iy", "ix").applyInPandas(med, _COMPOSITE_SCHEMA)
