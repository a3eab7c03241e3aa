"""Two-stage per-key top-k (operators/topk.py) — bounded exchange with
provably identical results to the plain ranking window."""

import numpy as np
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from odc_stac_spark.operators.topk import partition_local_topk

rng = np.random.default_rng(7)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        (int(q), int(i), float(v))
        for q, i, v in zip(
            rng.integers(0, 5, 4000), np.arange(4000), rng.random(4000)
        )
    ]
    return spark.createDataFrame(
        rows, "query_id int, neighbor_id long, score double"
    ).repartition(8).persist()


def test_local_stage_bounds_exchange(spark, scored):
    k = 7
    local = partition_local_topk(
        scored, ["query_id"], [("score", False), ("neighbor_id", True)], k
    )
    nparts = scored.rdd.getNumPartitions()
    assert local.count() <= nparts * 5 * k < scored.count()


def test_two_stage_equals_plain_window(spark, scored):
    k = 7
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )

    def rank(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .orderBy("query_id", "rn")
            .collect()
        )

    local = partition_local_topk(
        scored, ["query_id"], [("score", False), ("neighbor_id", True)], k
    )
    assert rank(local) == rank(scored)


def test_ties_break_identically(spark):
    # heavy ties: local selection must use the full ordering incl.
    # tie-break columns, or the global subset property fails
    rows = [(0, i, float(i % 3)) for i in range(300)]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id long, score double"
    ).repartition(6)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    local = partition_local_topk(
        df, ["query_id"], [("score", False), ("neighbor_id", True)], 10
    )
    want = (
        df.withColumn("rn", F.row_number().over(w)).where("rn <= 10")
        .orderBy("rn").collect()
    )
    got = (
        local.withColumn("rn", F.row_number().over(w)).where("rn <= 10")
        .orderBy("rn").collect()
    )
    assert got == want
