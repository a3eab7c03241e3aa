"""Run every registered query against its DuckDB oracle at sf0.001 —
the local image of the driver's CORRECTNESS gate (which runs at sf0.01;
use SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full-size run).
"""

from __future__ import annotations

import pytest

from odc_stac_spark.queries import load_all

from .oracle_compare import compare, duckdb_conn

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = REGISTRY[name]
    got = q.spark_fn(spark, sf_dir)
    want = con.sql(q.oracle).df()
    compare(got, want, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_q22_nonvacuous_at_sf01(spark):
    """q22's oracle returns 0 rows at sf0.001/sf0.01 (the idle-customer
    predicate is vacuous at tiny scale), which would make its hash gate
    trivially green — pin the NON-vacuous sf0.1 pass explicitly
    (VERDICT r7 'What's wrong' #3)."""
    sf_dir = "/root/testdata/sf0.1"
    q = REGISTRY["q22_idle_customer_balance"]
    c = duckdb_conn(sf_dir)
    try:
        want = c.sql(q.oracle).df()
        assert len(want) >= 1, "expected a non-vacuous result at sf0.1"
        got = q.spark_fn(spark, sf_dir)
        compare(got, want, name="q22@sf0.1")
    finally:
        c.close()


def test_compare_detects_value_perturbation(spark, sf_dir, con):
    """Guard the gate itself: a single perturbed value must fail the
    compare (if this ever passes silently, every green above is
    meaningless)."""
    import pyspark.sql.functions as F

    q = REGISTRY["q1_pricing_summary"]
    good = q.spark_fn(spark, sf_dir)
    bad = good.withColumn(
        "sum_qty", F.col("sum_qty") + F.when(F.col("l_returnflag") == "A", 1).otherwise(0)
    )
    want = con.sql(q.oracle).df()
    compare(good, want, name="sanity-good")
    with pytest.raises(AssertionError):
        compare(bad, want, name="must-fail")


def test_compare_detects_dropped_row(spark, sf_dir, con):
    """Row-count mismatches must fail too (truncation is not success)."""
    q = REGISTRY["q1_pricing_summary"]
    good = q.spark_fn(spark, sf_dir)
    want = con.sql(q.oracle).df()
    with pytest.raises(AssertionError):
        compare(good.limit(2), want, name="must-fail-rows")
