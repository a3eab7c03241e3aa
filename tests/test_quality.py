"""Declarative data-quality checks — operators/quality.py."""

import pytest

from odc_stac_spark.operators.quality import assert_checks, run_checks


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, "ok", 10, "en"),
        (2, None, 5, "en"),        # null text
        (2, "dup", -3, "xx"),      # dup id, negative n, bad lang
        (4, "fine", 200, "de"),    # over range max
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n bigint, lang string")


def test_violation_counts(spark, dirty):
    report = {
        (r.check, r.column): r
        for r in run_checks(
            dirty,
            [
                {"check": "not_null", "column": "text"},
                {"check": "range", "column": "n", "min": 0, "max": 100},
                {"check": "in_set", "column": "lang", "values": ["en", "de"]},
                {"check": "regex", "column": "text", "pattern": "[a-z]+"},
                {"check": "unique", "column": "doc_id"},
            ],
        ).collect()
    }
    assert report[("not_null", "text")].violations == 1
    assert report[("range", "n")].violations == 2  # -3 and 200
    assert report[("in_set", "lang")].violations == 1
    assert report[("regex", "text")].violations == 0  # nulls don't violate regex
    assert report[("unique", "doc_id")].violations == 2  # both rows of id 2
    assert not report[("unique", "doc_id")].passed
    assert report[("regex", "text")].passed


def test_single_pass_plan(spark, dirty):
    """All scalar checks must compile into ONE aggregate over one scan."""
    df = run_checks(
        dirty,
        [
            {"check": "not_null", "column": "text"},
            {"check": "range", "column": "n", "min": 0},
            {"check": "in_set", "column": "lang", "values": ["en"]},
        ],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # one scan feeding one aggregate, re-projected per check row
    assert plan.count("LogicalRDD") <= 3  # union of projections over ONE agg


def test_assert_checks_raises_with_details(spark, dirty):
    with pytest.raises(AssertionError, match="not_null\\(text\\): 1/4"):
        assert_checks(dirty, [{"check": "not_null", "column": "text"}])
    # passing suite is silent
    assert_checks(dirty, [{"check": "range", "column": "n", "min": -10, "max": 1000}])


def test_empty_check_list_yields_empty_report(spark, dirty):
    report = run_checks(dirty, [])
    assert report.count() == 0
    assert report.columns == ["check", "column", "violations", "total", "passed"]
    assert_checks(dirty, [])  # vacuously passes, must not raise
