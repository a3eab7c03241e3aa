"""Structured Streaming surface (SURVEY §2.9, build plan M3).

The reference is stream-shaped but not streaming: ``parse_items`` /
``stac2ds`` are lazy iterator→iterator converters with per-collection
evolving state (_mdtools.py:705-723, :482-617). Here that becomes real
Structured Streaming:

- ``stream_events``: file-source stream over an events directory —
  at scale this is the same code over Kafka/Kinesis (swap ``format``).
- ``stream_tumbling_counts``: the SAME window expressions as the batch
  query ``t_tumbling_window`` (queries/temporal.py) under a watermark —
  batch/stream parity on one expression set.
- ``infer_collections_stateful``: the reference's ``_CMDAssembler``
  (bootstrap on first item, merge new assets on later items,
  _mdtools.py:527-617) as ``applyInPandasWithState``: keyed by
  collection, state = known asset set + per-asset metadata, emits the
  evolving schema row whenever it changes.

Late data: the watermark bounds state (reference has no late-item policy —
it buffers everything; a watermark is the scale-correct policy and is
asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", StringType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, input_dir: str, schema=EVENTS_SCHEMA) -> DataFrame:
    """File-source stream: picks up parquet files dropped into input_dir."""
    return spark.readStream.schema(schema).parquet(input_dir)


def stream_tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling 10-min counts under a watermark — the streaming image of
    queries/temporal.t_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


# ---- stateful incremental schema inference -------------------------------

ASSET_STREAM_SCHEMA = StructType(
    [
        StructField("collection", StringType()),
        StructField("asset_name", StringType()),
        StructField("data_type", StringType()),
        StructField("nodata", StringType()),
        StructField("seen_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("assets", StringType()),  # comma-joined sorted asset names
        StructField("n_updates", IntegerType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("collection", StringType()),
        StructField("assets", StringType()),
        StructField("n_assets", IntegerType()),
        StructField("n_updates", IntegerType()),
    ]
)


def _infer_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """_CMDAssembler semantics: first batch bootstraps, later batches merge
    only new assets (set difference — _mdtools.py:577)."""
    (collection,) = key
    if state.exists:
        known_csv, n_updates = state.get
        known = set(known_csv.split(",")) if known_csv else set()
    else:
        known, n_updates = set(), 0
    changed = False
    for pdf in pdfs:
        new = set(pdf["asset_name"]) - known
        if new:
            known |= new
            changed = True
    n_updates += 1
    state.update((",".join(sorted(known)), n_updates))
    if changed:
        yield pd.DataFrame(
            [
                {
                    "collection": collection,
                    "assets": ",".join(sorted(known)),
                    "n_assets": len(known),
                    "n_updates": n_updates,
                }
            ]
        )


def infer_collections_stateful(asset_stream: DataFrame) -> DataFrame:
    """Keyed evolving collection schema over a stream of asset observations."""
    return asset_stream.groupBy("collection").applyInPandasWithState(
        _infer_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
