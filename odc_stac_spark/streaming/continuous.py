"""Continuous aggregate: an incrementally-maintained time rollup with a
real-time serving view (the hypertable/continuous-aggregate pattern of
time-series stores, expressed as stock Structured Streaming).

State = a parquet table of per-(hour, event_type) partials, partitioned by
hour. Each micro-batch:

1. aggregates its rows to the same grain (map-side partials, tiny result),
2. determines the touched hour partitions,
3. re-aggregates ONLY those partitions (existing partials ∪ increment) and
   rewrites them via **dynamic partition overwrite** — untouched hours are
   never read or written, so maintenance cost follows the batch's time
   span, not table size. A replayed batch merges to the same partials
   (re-aggregation is idempotent w.r.t. the same input set because the
   increment REPLACES the partition rather than appending).

Partials are (count, sum) — mergeable — so the rollup composes upward
(hour → day) without rescanning raw events, and the serving view
(:func:`serve_with_tail`) unions the materialized rollup with an
aggregation of the un-materialized tail of raw events — TimescaleDB's
"real-time aggregate" semantics: queries see up-to-the-second results
while the heavy lifting stays incremental.
"""

from __future__ import annotations

import os
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

GRAIN = "hour"


def _rollup(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.date_trunc(GRAIN, "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("value_sum"),
    )


def _merge_partials(df: DataFrame) -> DataFrame:
    """Partials are mergeable: counts add, sums add."""
    return df.groupBy("bucket", "event_type").agg(
        F.sum("n").alias("n"), F.sum("value_sum").alias("value_sum")
    )


def continuous_aggregate(
    spark: SparkSession,
    events_stream: DataFrame,
    agg_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Maintain the hourly rollup incrementally from an event stream."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        inc = _rollup(batch_df).persist()
        touched = [r.bucket for r in inc.select("bucket").distinct().collect()]
        if not touched:
            inc.unpersist()
            return
        merged = inc
        if os.path.exists(agg_path):
            existing = (
                spark.read.parquet(agg_path)
                .where(F.col("bucket").isin(touched))
                .select("bucket", "event_type", "n", "value_sum")
            )
            merged = _merge_partials(existing.unionByName(inc))
        # dynamic partition overwrite: ONLY the touched hour dirs rewrite.
        # The conf flip is save-and-restored — safe here because the write
        # is EAGER (unlike the lazy-scan confs load_table documents).
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.withColumn(
                "bucket_p", F.date_format("bucket", "yyyyMMddHH")
            ).write.mode("overwrite").partitionBy("bucket_p").parquet(agg_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        inc.unpersist()

    writer = events_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_continuous(spark: SparkSession, agg_path: str) -> DataFrame:
    return spark.read.parquet(agg_path).select("bucket", "event_type", "n", "value_sum")


def serve_with_tail(
    spark: SparkSession,
    agg_path: str,
    raw_tail: Optional[DataFrame] = None,
) -> DataFrame:
    """Real-time view: materialized rollup ∪ rollup of the raw tail (rows
    not yet absorbed by the stream), merged at the partial level — the
    query-time cost is the tail's size, never the history's."""
    mat = read_continuous(spark, agg_path)
    if raw_tail is None:
        return mat
    return _merge_partials(mat.unionByName(_rollup(raw_tail)))


def rollup_to_day(aggregate: DataFrame) -> DataFrame:
    """Compose upward without touching raw events (partials are mergeable)."""
    return (
        aggregate.groupBy(F.date_trunc("day", "bucket").alias("day"), "event_type")
        .agg(F.sum("n").alias("n"), F.sum("value_sum").alias("value_sum"))
    )
