"""Parquet table sources for the driver-generated synthetic tables.

Scale notes: ``spark.read.parquet`` is a v2 file scan — predicate pushdown
and column pruning reach the parquet reader for free as long as queries are
declarative (check ``PushedFilters`` / ``ReadSchema`` in ``.explain``).
At 100 TB the same code path works unchanged: the scan parallelizes by
row-group, `maxPartitionBytes` controls split size, and partition-directory
layouts (e.g. date-partitioned `events`) add partition pruning on top.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any realistic scale factor
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Fixture generations differ in how events.ts is written:
    #   (a) TIMESTAMP(NANOS) — a vanilla SparkSession refuses it with
    #       PARQUET_TYPE_ILLEGAL unless nanosAsLong is set (runtime-settable,
    #       so set it here: callers may hand us any session);
    #   (b) TIMESTAMP(MICROS, isAdjustedToUTC=false) — arrives as
    #       TIMESTAMP_NTZ, which epoch functions (unix_micros, window,
    #       to_utc_timestamp) reject.
    # Normalize both to a UTC-instant TIMESTAMP so every downstream query
    # sees one type. Session tz is pinned to UTC so the NTZ→TZ cast is an
    # epoch identity and results are deterministic across harness hosts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        kind = field.dataType.simpleString()
        if field.name == "ts" and kind == "bigint":
            # int64 nanos under nanosAsLong — truncate to µs (integer
            # `div`, not double division: ns epochs exceed 2^53) exactly
            # as DuckDB does when reading the same file.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif kind == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
