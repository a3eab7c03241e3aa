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
