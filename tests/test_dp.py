"""dp_aggregate: seeded Laplace-mechanism group aggregates."""

import pytest
from pyspark.sql import functions as F

from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.curation import _r_dp_aggregate, dp_aggregate


@pytest.fixture(scope="module")
def people(spark):
    rows = [(i, f"g{i % 100}", float(i % 7)) for i in range(5000)]
    return spark.createDataFrame(rows, "id BIGINT, grp STRING, x DOUBLE")


def test_dp_count_is_deterministic_and_noised(people):
    a = {r["grp"]: r["DP_COUNT"] for r in
         dp_aggregate(people, ["grp"], epsilon=1.0).collect()}
    b = {r["grp"]: r["DP_COUNT"] for r in
         dp_aggregate(people, ["grp"], epsilon=1.0).collect()}
    assert a == b                      # same seed -> identical release
    exact = 50.0                       # 5000 rows / 100 groups
    assert any(v != exact for v in a.values())  # noise actually applied
    # Laplace(b=1): P(|noise| > 25) = e^-25 — bound every group comfortably
    assert all(abs(v - exact) < 25.0 for v in a.values())


def test_dp_seed_changes_noise_not_scale(people):
    a = {r["grp"]: r["DP_COUNT"] for r in
         dp_aggregate(people, ["grp"], seed=1).collect()}
    b = {r["grp"]: r["DP_COUNT"] for r in
         dp_aggregate(people, ["grp"], seed=2).collect()}
    assert a != b
    # mean |noise| estimates b=1 across 100 groups (loose 3x band)
    mean_abs = sum(abs(v - 50.0) for v in a.values()) / len(a)
    assert 0.3 < mean_abs < 3.0


def test_dp_epsilon_scales_noise(people):
    tight = dp_aggregate(people, ["grp"], epsilon=100.0).collect()
    loose = dp_aggregate(people, ["grp"], epsilon=0.01).collect()
    t = sum(abs(r["DP_COUNT"] - 50.0) for r in tight) / len(tight)
    l_ = sum(abs(r["DP_COUNT"] - 50.0) for r in loose) / len(loose)
    assert l_ > 100 * t                # noise ∝ 1/ε


def test_dp_sum_shape_and_exact_hidden(people):
    out = dp_aggregate(people, ["grp"], stat="sum", value_col="x",
                       epsilon=1.0, sensitivity=6.0)
    assert out.columns == ["grp", "DP_SUM_X"]
    assert out.count() == 100


def test_dp_validation(people):
    with pytest.raises(ParameterException):
        dp_aggregate(people, [], stat="count")
    with pytest.raises(ParameterException):
        dp_aggregate(people, ["grp"], stat="median")
    with pytest.raises(ParameterException):
        dp_aggregate(people, ["grp"], stat="sum")  # no value_col
    with pytest.raises(ParameterException):
        dp_aggregate(people, ["grp"], epsilon=0.0)


def test_dp_renderer_roundtrip(spark, people):
    people.createOrReplaceTempView("__dp_src")
    via_sql = spark.sql(
        _r_dp_aggregate("__dp_src", ["grp"], stat="sum", value_col="x",
                        epsilon=0.5, sensitivity=6.0, seed=7)
    )
    direct = dp_aggregate(people, ["grp"], stat="sum", value_col="x",
                          epsilon=0.5, sensitivity=6.0, seed=7)
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


def test_dp_secret_seed_mode(people):
    # seed=None draws a fresh secret seed: still Laplace-scaled noise,
    # different across calls with overwhelming probability
    a = {r["grp"]: r["DP_COUNT"] for r in
         dp_aggregate(people, ["grp"], epsilon=1.0, seed=None).collect()}
    b = {r["grp"]: r["DP_COUNT"] for r in
         dp_aggregate(people, ["grp"], epsilon=1.0, seed=None).collect()}
    assert a != b
    mean_abs = sum(abs(v - 50.0) for v in a.values()) / len(a)
    assert 0.3 < mean_abs < 3.0


def test_dp_secret_seed_not_renderable():
    with pytest.raises(ParameterException):
        _r_dp_aggregate("t", ["grp"], seed=None)
