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
appended table has a stable (band, time, iy, ix) key. Scenes of the same
time group must arrive in the same batch (the standing-ingestion
assumption — a late scene for an already-written group would need a
compaction pass over that group's tiles, exactly like any late-data
upsert into an append-only store).

At 100 TB this is the live half of a catalog: `availableNow` drains the
backlog, a continuous trigger keeps up with new scenes, checkpointing
makes ingestion exactly-once per file, and the parquet sink's
(band)-partitioning means readers of one band prune everything else.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..model import GeoBox, RasterLoadParams


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
