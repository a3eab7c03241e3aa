"""Sinks (SURVEY §2.1 S13-S15).

- xarray assembly for API parity is ``plans.load.assemble_numpy`` (driver
  collect — small results only, exactly like the reference's mk_dataset).
- The scale sink is parquet tiles: partitioned by (band, t) so a later
  read of one band/timestep prunes directories, and sorted within
  partitions by (iy, ix) so spatially-adjacent tiles are co-located.
- COG writing (S14) needs rasterio — stubbed with a clear error, same
  driver-slot pattern as sources/synth.RioReader.
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


def write_cog(tiles_df: DataFrame, path: str) -> None:  # pragma: no cover
    """S14 sink slot: cloud-optimized GeoTIFF via rasterio in
    foreachPartition. STUB: rasterio is not installed here."""
    raise NotImplementedError(
        "COG writing requires rasterio, which is not installed in this "
        "environment; use write_tiles_parquet"
    )
