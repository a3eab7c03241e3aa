"""Sinks (SURVEY §2.1 S13-S15).

- xarray assembly for API parity is ``plans.load.assemble_numpy`` (driver
  collect — small results only, exactly like the reference's mk_dataset).
- The scale sink is parquet tiles: partitioned by (band, t) so a later
  read of one band/timestep prunes directories, and sorted within
  partitions by (iy, ix) so spatially-adjacent tiles are co-located.
- COG writing (S14) goes through the in-house pure-Python tiled-GeoTIFF
  writer (sources/geotiff.py) — real COG layout without rasterio;
  compression codecs are the only part that would need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tiles_parquet(tiles_df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Tile rows → parquet, partitioned for band/time pruning."""
    (
        tiles_df.repartition("band", "t")
        .sortWithinPartitions("iy", "ix")
        .write.mode(mode)
        .partitionBy("band", "t")
        .parquet(path)
    )


def read_tiles_parquet(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_cog(tiles_df: DataFrame, plan, out_dir: str) -> list:
    """S14 sink: one cloud-optimized GeoTIFF per (band, time group),
    written by the in-house pure-Python writer (sources/geotiff.py —
    COG IFD-first layout, tiled, GeoTIFF keys, overview IFDs, GDAL_NODATA;
    uncompressed: compression codecs would need rasterio). The reference's
    equivalent is ``xx.odc.write_cog`` (docs/samples/save-cog-from-stac.py).

    Driver-side finalization over the assembled mosaic — the distributed
    artifact remains the parquet tile table; COG is the export format.
    Returns the written paths."""
    import os

    from ..plans.load import assemble_numpy
    from .geotiff import write_cog_file

    bands = assemble_numpy(tiles_df, plan)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for band, cube in bands.items():
        nodata = plan.cfg[band].fill_value if band in plan.cfg else None
        for t in range(cube.shape[0]):
            p = os.path.join(out_dir, f"{band}_t{t}.tif")
            write_cog_file(p, cube[t], plan.gbox, nodata=nodata)
            paths.append(p)
    return paths
