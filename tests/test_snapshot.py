"""Snapshot diff: planted add/remove/change detection, null-safety of the
row hash, default compare-column discovery, and unchanged suppression."""

import pytest

import rasgoql_spark as rql
from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.snapshot import diff_datasets


def _diff(spark, new_rows, old_rows, **kw):
    schema = "id long, a string, b long"
    new = spark.createDataFrame(new_rows, schema)
    old = spark.createDataFrame(old_rows, schema)
    out = diff_datasets(new, old, keys=["id"], **kw)
    return {r["id"]: r["STATUS"] for r in out.collect()}


def test_diff_statuses(spark):
    new = [(1, "x", 1), (2, "y", 2), (4, "new", 4)]
    old = [(1, "x", 1), (2, "OLD", 2), (3, "gone", 3)]
    d = _diff(spark, new, old)
    assert d == {2: "CHANGED", 3: "REMOVED", 4: "ADDED"}


def test_include_unchanged(spark):
    d = _diff(spark, [(1, "x", 1)], [(1, "x", 1)], include_unchanged=True)
    assert d == {1: "UNCHANGED"}
    assert _diff(spark, [(1, "x", 1)], [(1, "x", 1)]) == {}


def test_null_vs_empty_string_differ(spark):
    # (NULL) and ('') must hash differently — sentinel, not concat collapse
    d = _diff(spark, [(1, None, 1)], [(1, "", 1)])
    assert d == {1: "CHANGED"}


def test_null_value_unchanged_when_both_null(spark):
    d = _diff(spark, [(1, None, None)], [(1, None, None)])
    assert d == {}


def test_compare_cols_subset(spark):
    # only column a compared -> b edits invisible
    d = _diff(spark, [(1, "x", 99)], [(1, "x", 1)], compare_cols=["a"])
    assert d == {}


def test_requires_key(spark):
    df = spark.createDataFrame([(1, "x", 1)], "id long, a string, b long")
    with pytest.raises(ParameterException):
        diff_datasets(df, df, keys=[])
