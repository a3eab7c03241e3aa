"""Incremental datacube ingestion: STAC item stream → appended tile table.

The streaming image of the reference's lazy-iterator lifecycle
(`parse_items` → `load`, _mdtools.py:705-723 + _stac_load.py): a standing
query watches a catalog feed (newline-delimited STAC JSON), and every
micro-batch of newly-arrived scenes runs through the SAME catalog-path
planner and tile pipeline as the batch engine (`plans/catalog.py`), with
the resulting tiles appended to a partitioned parquet tile table.

Semantics: the output grid is FIXED up front (a datacube has one grid);
each batch contributes its own time groups, keyed by the group's absolute
representative timestamp rather than the batch-local ``t`` index, so the
appended table has a stable (band, time, iy, ix) key. A late scene for an
already-written time group lands in its own batch partition; run
:func:`compact_cube` to merge duplicate tile keys (first-write-wins), the
standard late-data upsert policy for an append-only store.

At 100 TB this is the live half of a catalog: `availableNow` drains the
backlog, a continuous trigger keeps up with new scenes, checkpointing
makes ingestion exactly-once per file, and the parquet sink's
(band)-partitioning means readers of one band prune everything else.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..model import GeoBox, RasterLoadParams

#: store-metadata file pinning the cube grid, written next to the tile
#: partitions on first run and asserted against on every restart.
GRID_META_FILE = "_grid.json"


def _grid_meta(geobox: GeoBox, chunks: Tuple[int, int], groupby: str) -> dict:
    return {
        "crs": geobox.crs,
        "shape": list(geobox.shape),
        "transform": list(geobox.transform),
        "chunks": list(chunks),
        "groupby": groupby,
    }


def _pin_grid(out_path: str, meta: dict) -> None:
    """Persist the grid on first run; on restart, refuse a mismatched one.

    A streaming restart with different geobox/chunks would silently append
    tiles on an incompatible grid — ``compact_cube`` would then reshape
    mismatched (height, width) buffers or merge tiles from different
    extents. The checkpoint pins the *source* progress but not the *sink*
    grid, so the sink pins it itself (round-4 advice, ingest.py:48)."""
    os.makedirs(out_path, exist_ok=True)
    path = os.path.join(out_path, GRID_META_FILE)
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        if existing != meta:
            raise ValueError(
                f"stream_load_tiles restart with a different grid for {out_path!r}: "
                f"stored {existing}, requested {meta}. Use a new out_path/checkpoint "
                "to change grids."
            )
        return
    with open(path, "w") as f:
        json.dump(meta, f)


def stream_load_tiles(
    spark: SparkSession,
    input_dir: str,
    out_path: str,
    checkpoint: str,
    *,
    geobox: GeoBox,
    chunks: Tuple[int, int] = (256, 256),
    bands: Optional[Sequence[str]] = None,
    cfg: Optional[Dict[str, RasterLoadParams]] = None,
    groupby: str = "time",
):
    """Start the ingestion query (availableNow trigger — drains what is
    in ``input_dir`` and stops; restart with the same ``checkpoint`` to
    pick up only new files). Returns the StreamingQuery."""
    from ..plans.catalog import load_from_catalog
    from ..sources.stac_items import parse_items
    from .events import stream_stac_items

    _pin_grid(out_path, _grid_meta(geobox, chunks, groupby))
    items_stream = stream_stac_items(spark, input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        parsed = parse_items(sess, batch_df)
        tiles, plan = load_from_catalog(
            sess,
            parsed,
            groupby=groupby,
            geobox=geobox,
            chunks=chunks,
            bands=bands,
            cfg=cfg,
        )
        # batch-local t index → absolute group timestamp (stable key)
        ts_map = F.create_map(
            *[x for t, ts in enumerate(plan.group_ts) for x in (F.lit(t), F.lit(ts))]
        )
        # one subdirectory per micro-batch, overwritten on retry: foreachBatch
        # gives at-least-once delivery, so a plain append could double-write a
        # batch that failed mid-commit — overwriting the batch's own partition
        # makes the sink idempotent (exactly-once end to end). Readers see
        # ingest_batch as an ordinary discovered partition column.
        (
            tiles.withColumn("time", ts_map[F.col("t")].cast("timestamp"))
            .drop("t")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(f"{out_path}/ingest_batch={batch_id}")
        )

    return (
        items_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


_COMPACT_SCHEMA = (
    "band string, time timestamp, iy int, ix int, y0 int, x0 int, "
    "height int, width int, dtype string, data binary, valid_count long"
)


def compact_cube(spark: SparkSession, cube_path: str, nodata: Optional[float]) -> DataFrame:
    """Late-data compaction for the streamed cube: when a scene for an
    already-written time group arrives in a later batch, the cube holds
    MULTIPLE tile rows per (band, time, iy, ix) key — one per ingest
    batch. Compaction merges them with **earliest-ingest-batch-first**
    first-valid precedence (first write wins — the standard append-store
    late-upsert policy; within a batch the load pipeline already applied
    the reference's (time, id) mosaic order).

    One ``applyInPandas`` per tile key, grouped by the cube's natural key
    — the shuffle moves each tile's few duplicate rows once, never
    pixels-by-time-series. Write the result back out (or to a new
    location) to supersede the raw ingest partitions."""
    import numpy as np
    import pandas as pd

    from ..model import nodata_mask

    df = spark.read.parquet(cube_path)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ingest_batch")
        first = pdf.iloc[0]
        # bracket access throughout: .dtype/.data on a pandas Series hit
        # Series attributes, not the row's columns
        h, w = int(first["height"]), int(first["width"])
        dst = (
            np.frombuffer(first["data"], dtype=np.dtype(first["dtype"]))
            .reshape(h, w)
            .copy()
        )
        miss = nodata_mask(dst, nodata)
        for r in pdf.iloc[1:].itertuples():
            if not miss.any():
                break
            pix = np.frombuffer(r.data, dtype=np.dtype(r.dtype)).reshape(h, w)
            ok = ~nodata_mask(pix, nodata)
            np.copyto(dst, pix, where=miss & ok)
            miss &= ~ok
        return pd.DataFrame(
            [
                {
                    "band": first["band"],
                    "time": first["time"],
                    "iy": int(first["iy"]),
                    "ix": int(first["ix"]),
                    "y0": int(first["y0"]),
                    "x0": int(first["x0"]),
                    "height": h,
                    "width": w,
                    "dtype": str(first["dtype"]),
                    "data": dst.tobytes(),
                    "valid_count": int((~nodata_mask(dst, nodata)).sum()),
                }
            ]
        )

    return df.groupBy("band", "time", "iy", "ix").applyInPandas(merge, _COMPACT_SCHEMA)


def cube_zonal_stats(
    spark: SparkSession,
    cube_path: str,
    nodata: Optional[float],
    zone_h: int,
    zone_w: int,
) -> DataFrame:
    """Zonal statistics over the LIVE cube: compact (late scenes merged
    first-write-wins) → per-tile map-side partials → zone merge. Returns
    (band, time, zy, zx, n_valid, mean) — the ask-the-cube-anything query
    a standing ingestion pipeline serves after every batch.

    The distinct-times collect is bounded by the number of time groups
    (same order as the plan elections the batch path already collects)."""
    from ..operators.zonal import zonal_stats

    tiles = compact_cube(spark, cube_path, nodata)
    times = [r.time for r in tiles.select("time").distinct().orderBy("time").collect()]
    to_idx = F.create_map(*[x for i, ts in enumerate(times) for x in (F.lit(ts), F.lit(i))])
    to_time = F.create_map(*[x for i, ts in enumerate(times) for x in (F.lit(i), F.lit(ts))])
    z = zonal_stats(
        tiles.withColumn("t", to_idx[F.col("time")].cast("int")),
        nodata=nodata,
        zone_h=zone_h,
        zone_w=zone_w,
    )
    return z.select(
        "band",
        to_time[F.col("t")].cast("timestamp").alias("time"),
        "zy",
        "zx",
        "n_valid",
        "mean",
    )
