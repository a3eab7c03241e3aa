"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` (single JVM); the configs below are the
ones that matter identically on a 1000-executor cluster:

- AQE on (runtime re-plan: skew-join splitting, partition coalescing,
  dynamic broadcast conversion).
- Arrow on (Pandas UDF batches cross the Python boundary columnar).
- ``spark.sql.session.timeZone=UTC`` — parquet timestamps are naive UTC in
  the test data; this keeps Spark/DuckDB/pandas agreeing bit-for-bit.
- shuffle partitions sized by env (32 locally; on a real cluster this is
  left to AQE's coalescing from a high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "odc-stac-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the synthetic events table carries TIMESTAMP(NANOS) which the
        # vectorized parquet reader rejects; read as int64 nanos and convert
        # in sources.tables (same ns→µs truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
