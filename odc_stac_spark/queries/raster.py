"""Pixel-plane queries: the load() pipeline surfaced through the driver
contract. Rows-only checks (binary tile payloads aren't SQL-expressible);
pixel-exact parity against a numpy whole-grid oracle is enforced in
tests/test_load_pipeline.py.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..model import GeoBox, RasterBandMetadata, RasterSource
from ..plans.load import Item, load
from . import register

_CRS = "EPSG:32735"


def _demo_items(n: int = 9):
    """A bench-site-like scene strip: n overlapping items along y, two
    bands, nodata holes (mirrors s2-ms-mosaic: 9 items, 1 day —
    reference bench/_prepare.py:10-19)."""
    t0 = datetime(2020, 6, 6, 8, 30)
    items = []
    for i in range(n):
        origin = (0.0, 4000.0 - i * 400.0)
        gbox = GeoBox((60, 120), (10.0, 0.0, origin[0], 0.0, -10.0, origin[1]), _CRS)
        bands = {
            "red": RasterSource(
                f"synth://r{i}?seed={i}&nodata_every=5",
                geobox=gbox,
                meta=RasterBandMetadata("int16", -1),
            ),
            "nir": RasterSource(
                f"synth://n{i}?seed={100 + i}&nodata_every=7",
                geobox=gbox,
                meta=RasterBandMetadata("uint16", 0),
            ),
        }
        items.append(Item(id=f"s2-{i:03d}", datetime=t0 + timedelta(minutes=i), bands=bands, lon=27.4))
    return items


@register(
    "r_load_mosaic_tiles",
    oracle=None,
    doc="S8+A6+J1 end-to-end: 9-item 2-band solar-day mosaic through the "
    "tile-explode → applyInPandas pipeline; returns per-tile stats "
    "(pixel parity vs numpy oracle in tests/test_load_pipeline.py).",
    tags=("raster",),
)
def r_load_mosaic_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = _demo_items()
    tiles_df, _ = load(spark, items, groupby="solar_day", chunks=(64, 64))
    return tiles_df.select(
        "band", "t", "iy", "ix", "height", "width", "dtype", "valid_count", "checksum", "crc32"
    ).orderBy("band", "t", "iy", "ix")
