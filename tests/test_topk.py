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


def test_null_group_keys_kept(spark):
    # pandas groupby default dropna=True would silently discard the null
    # key's candidates; Spark windows partition nulls as a real key.
    rows = [(None if i % 3 == 0 else i % 3, i, float(i)) for i in range(120)]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id long, score double"
    ).repartition(4)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    local = partition_local_topk(
        df, ["query_id"], [("score", False), ("neighbor_id", True)], 5
    )

    def rank(d):
        return (
            d.withColumn("rn", F.row_number().over(w))
            .where("rn <= 5")
            .orderBy(F.asc_nulls_first("query_id"), "rn")
            .collect()
        )

    assert rank(local) == rank(df)


@pytest.mark.parametrize("ascending", [True, False])
def test_null_order_values_match_spark_default(spark, ascending):
    # string order column keeps None distinct through Arrow; Spark default
    # is ASC NULLS FIRST / DESC NULLS LAST and stage 1 must agree.
    rows = [
        (i % 4, i, None if i % 7 == 0 else f"s{i:04d}") for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id long, label string"
    ).repartition(4)
    direction = F.asc("label") if ascending else F.desc("label")
    w = Window.partitionBy("query_id").orderBy(direction, F.asc("neighbor_id"))
    local = partition_local_topk(
        df, ["query_id"], [("label", ascending), ("neighbor_id", True)], 4
    )

    def rank(d):
        return (
            d.withColumn("rn", F.row_number().over(w))
            .where("rn <= 4")
            .orderBy("query_id", "rn")
            .collect()
        )

    assert rank(local) == rank(df)


def test_mixed_ordering_single_null_direction_works(spark):
    """Nulls confined to ONE direction's columns (here: asc label, the
    desc tie-break is null-free) are fine under a mixed ordering — the
    single pandas na_position reproduces Spark's placement."""
    rows = [(i % 2, i, None if i % 9 == 0 else f"x{i:03d}", float(i)) for i in range(40)]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id long, label string, score double"
    ).repartition(2)
    local = partition_local_topk(
        df, ["query_id"], [("label", True), ("score", False)], 3
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("label"), F.desc("score"))

    def rank(d):
        return (
            d.withColumn("rn", F.row_number().over(w))
            .where("rn <= 3")
            .orderBy("query_id", "rn")
            .collect()
        )

    assert rank(local) == rank(df)


def test_mixed_ordering_with_nulls_in_both_directions_raises(spark):
    rows = [
        (i % 2, i, None if i == 5 else f"x{i}", None if i == 7 else float(i))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id long, label string, score double"
    ).coalesce(1)
    local = partition_local_topk(
        df, ["query_id"], [("label", True), ("score", False)], 3
    )
    with pytest.raises(Exception, match="mixed asc/desc ordering"):
        local.collect()
