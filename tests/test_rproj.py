"""Random projection: JL distance preservation on average, determinism,
malformed-row surfacing, and the literal-matrix ceiling."""

import math

import pytest

import rasgoql_spark as rql
from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.rproj import projection_signs, random_projection


def test_signs_deterministic_and_balanced():
    a = projection_signs(7, 8, 64)
    b = projection_signs(7, 8, 64)
    assert a == b
    flat = [s for row in a for s in row]
    assert set(flat) == {-1, 1}
    # md5 parity is near-balanced; 512 draws should not be >70/30 skewed
    pos = sum(1 for s in flat if s > 0)
    assert 0.3 < pos / len(flat) < 0.7
    assert projection_signs(8, 8, 64) != a  # seed matters


def test_projection_preserves_norms_on_average(spark):
    # E[||Px||^2] = ||x||^2 for Rademacher/sqrt(k); check the corpus mean
    import random

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = random_projection(df, "embedding", out_dim=16, seed=1).collect()
    ratios = []
    for r, (_, vec) in zip(sorted(out, key=lambda r: r["vec_id"]), rows):
        n_in = sum(x * x for x in vec)
        n_out = sum(x * x for x in r["PROJ"])
        ratios.append(n_out / n_in)
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, f"norm ratio mean {mean} outside JL expectation"


def test_projection_length_and_mismatch_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["PROJ"] for r in
           random_projection(df, "embedding", out_dim=3, in_dim=4).collect()}
    assert len(out[1]) == 3
    assert out[2] is None  # wrong-length vector surfaces as NULL


def test_projection_ceiling_and_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ParameterException):
        random_projection(df, "embedding", out_dim=0, in_dim=1)
    with pytest.raises(ParameterException):
        random_projection(df, "embedding", out_dim=1024, in_dim=1024)
