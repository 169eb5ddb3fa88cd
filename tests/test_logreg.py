"""Logistic regression: learns a separable rule, is deterministic across
partitionings, and validates its cross-engine-rounding lr constraint."""

import pytest

import rasgoql_spark as rql
from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.logreg import logreg_score


def _sep(spark, n=200):
    # y = 1 iff x1 > 0; x2 is noise-ish but deterministic
    rows = [
        (i, (i % 20 - 9.5) / 10.0, ((i * 7) % 13 - 6) / 13.0, 1 if (i % 20 - 9.5) > 0 else 0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, x1 double, x2 double, y long")


def test_logreg_learns_separable_direction(spark):
    df = _sep(spark)
    out = logreg_score(df, ["x1", "x2"], "y", lr=2.0, iterations=10)
    rows = out.collect()
    pos = [r["SCORE"] for r in rows if r["y"] == 1]
    neg = [r["SCORE"] for r in rows if r["y"] == 0]
    assert min(pos) > max(neg), "separable classes must separate in score"
    assert sum(pos) / len(pos) > 0.55 and sum(neg) / len(neg) < 0.45


def test_logreg_zero_iterations_scores_half(spark):
    out = logreg_score(_sep(spark, 40), ["x1"], "y", iterations=0).collect()
    assert all(r["SCORE"] == 0.5 for r in out)


def test_logreg_deterministic_across_partitionings(spark):
    df = _sep(spark, 300)
    a = logreg_score(df.repartition(1), ["x1", "x2"], "y", iterations=3)
    b = logreg_score(df.repartition(8), ["x1", "x2"], "y", iterations=3)
    sa = {r["id"]: r["SCORE"] for r in a.collect()}
    sb = {r["id"]: r["SCORE"] for r in b.collect()}
    assert sa == sb


def test_logreg_validation(spark):
    df = _sep(spark, 10)
    with pytest.raises(ParameterException):
        logreg_score(df, [], "y")
    with pytest.raises(ParameterException):
        logreg_score(df, ["x1"], "y", lr=0.125)  # 3 decimals off the grid
    with pytest.raises(ParameterException):
        logreg_score(df, ["x1"], "y", iterations=-1)


def test_logreg_empty_input_keeps_zero_weights(spark):
    df = spark.createDataFrame([], "id long, x1 double, y long")
    out = logreg_score(df, ["x1"], "y", iterations=3)
    assert out.count() == 0  # no crash; schema intact
    assert "SCORE" in out.columns
