"""Spark Python Data Source (Spark 4 API) exposing COG tiles as a table —
the §7.2 "custom Catalyst-level" slot made real: tile-level partition
planning happens in the source, so Spark schedules one task per tile and
each executor does a byte-range read of exactly its tile (read_cog_tile;
over object storage the same call is an HTTP range request).

Usage::

    spark.dataSource.register(CogTilesDataSource)
    df = spark.read.format("cogtiles").load("/path/to/x.tif")
    # columns: level, iy, ix, y0, x0, height, width, dtype, data (binary)

Contrast with the reference: its rasterio driver hides tile planning
inside GDAL per task (loader/_rio.py); here the plan is Spark's — column
pruning / limit / partition scheduling all see the per-tile structure.
Options: ``level`` (default 0 = full resolution; overview IFDs are levels
1..n).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _TilePartition(InputPartition):
    def __init__(self, path: str, level: int, tile_idx: int, ty: int, tx: int):
        self.path = path
        self.level = level
        self.tile_idx = tile_idx
        self.ty = ty
        self.tx = tx


class CogTilesReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cogtiles requires a path (load(path) or option('path', ...))")
        self.level = int(options.get("level", "0"))

    def partitions(self):
        # driver-side planning = ONE header read (IFDs only)
        from .geotiff import read_cog_header

        hdr = read_cog_header(self.path)
        lv = hdr["levels"][self.level]
        ntx = (lv["nx"] + lv["tile_w"] - 1) // lv["tile_w"]
        nty = (lv["ny"] + lv["tile_h"] - 1) // lv["tile_h"]
        return [
            _TilePartition(self.path, self.level, ty * ntx + tx, ty, tx)
            for ty in range(nty)
            for tx in range(ntx)
        ]

    def read(self, partition: _TilePartition) -> Iterator[tuple]:
        # executor-side: byte-range read of exactly this tile
        from .geotiff import read_cog_header, read_cog_tile

        hdr = read_cog_header(partition.path)
        lv = hdr["levels"][partition.level]
        tile = read_cog_tile(partition.path, hdr, partition.level, partition.tile_idx)
        y0 = partition.ty * lv["tile_h"]
        x0 = partition.tx * lv["tile_w"]
        h = min(lv["tile_h"], lv["ny"] - y0)
        w = min(lv["tile_w"], lv["nx"] - x0)
        yield (
            partition.level,
            partition.ty,
            partition.tx,
            y0,
            x0,
            h,
            w,
            lv["dtype"],
            tile[:h, :w].tobytes(),
        )


class CogTilesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cogtiles"

    def schema(self) -> str:
        return (
            "level int, iy int, ix int, y0 int, x0 int, "
            "height int, width int, dtype string, data binary"
        )

    def reader(self, schema) -> CogTilesReader:
        return CogTilesReader(self.options)
