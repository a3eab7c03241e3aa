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
   span, not table size.

Replay safety: ``foreachBatch`` is at-least-once, so a crash between the
parquet commit and the checkpoint commit replays the batch. Every written
row carries ``last_batch_id`` (the id of the most recent batch merged into
its partition); on replay, partitions whose stored ``last_batch_id`` is
already ≥ the incoming batch id have absorbed this batch's contribution
and are excluded from both the merge and the rewrite — their dirs are left
untouched, so the replay is exactly-once per partition. (File-source /
Kafka batches are deterministic per batch_id, which this relies on.)

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


def make_batch_processor(spark: SparkSession, agg_path: str):
    """The foreachBatch body, exposed for direct (replay) testing."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        inc0 = _rollup(batch_df).persist()
        inc = inc0
        touched = [r.bucket for r in inc.select("bucket").distinct().collect()]
        if not touched:
            inc0.unpersist()
            return
        merged = inc
        if os.path.exists(agg_path):
            existing_all = spark.read.parquet(agg_path).where(F.col("bucket").isin(touched))
            if "last_batch_id" not in existing_all.columns:  # pre-upgrade table
                existing_all = existing_all.withColumn("last_batch_id", F.lit(-1).cast("long"))
            # Replay guard: partitions already stamped with this (or a later)
            # batch id have absorbed this batch — skip them entirely so their
            # dirs are neither re-merged nor rewritten. Driver-sized collect:
            # one row per touched hour.
            done = [
                r.bucket
                for r in existing_all.groupBy("bucket")
                .agg(F.max("last_batch_id").alias("mb"))
                .where(F.col("mb") >= batch_id)
                .collect()
            ]
            if done:
                todo = [b for b in touched if b not in set(done)]
                if not todo:
                    inc0.unpersist()
                    return
                inc = inc.where(F.col("bucket").isin(todo))
                existing_all = existing_all.where(F.col("bucket").isin(todo))
            existing = existing_all.select("bucket", "event_type", "n", "value_sum")
            merged = _merge_partials(existing.unionByName(inc))
        # dynamic partition overwrite: ONLY the touched hour dirs rewrite.
        # The conf flip is save-and-restored — safe here because the write
        # is EAGER (unlike the lazy-scan confs load_table documents).
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.withColumn("last_batch_id", F.lit(batch_id).cast("long"))
                .withColumn("bucket_p", F.date_format("bucket", "yyyyMMddHH"))
                # co-locate each hour in ONE task before the partitioned
                # write: without this, every shuffle partition holds rows
                # for most touched hours and writes its own file into
                # every hour dir (~tasks × hours tiny files per batch —
                # measured 48 s for a 720-hour batch at sf0.1; 23k files).
                # One file per hour dir is also the 100 TB shape: the
                # small-files explosion, not the data, was the cost.
                .repartition(F.col("bucket_p"))
                .write.mode("overwrite")
                .partitionBy("bucket_p")
                .parquet(agg_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        inc0.unpersist()

    return process


def continuous_aggregate(
    spark: SparkSession,
    events_stream: DataFrame,
    agg_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Maintain the hourly rollup incrementally from an event stream."""
    writer = events_stream.writeStream.foreachBatch(
        make_batch_processor(spark, agg_path)
    ).option("checkpointLocation", checkpoint)
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
