"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`odc_stac_spark.queries` — the registry is the single
source of truth for (spark callable, oracle SQL) pairs, consumed both here
and by tests/test_oracle.py so local tests check exactly what the driver
checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from odc_stac_spark.queries import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["q1_pricing_summary"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
