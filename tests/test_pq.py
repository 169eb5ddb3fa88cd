"""Product quantization: deterministic codebooks, encoding, ADC search."""

import pytest

import rasgoql_spark as rql

# two direction bundles in 8-d so m=2 subspaces of 4 dims separate them
ROWS = [
    (0, [1.0, 0.2, 0.0, 0.0, 1.0, 0.1, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.1, 1.0, 0.2, 0.0, 0.0]),
    (2, [1.0, 0.0, 0.1, 0.0, 0.9, 0.0, 0.1, 0.0]),
    (3, [0.0, 0.0, 1.0, 0.8, 0.0, 0.1, 1.0, 0.9]),
    (4, [0.1, 0.0, 0.9, 1.0, 0.0, 0.0, 1.0, 1.0]),
    (5, [0.0, 0.1, 1.0, 1.0, 0.1, 0.0, 0.9, 1.0]),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, vec array<float>")


def _enc(spark, **kw):
    out = rql.get_transform("pq_encode").apply(
        _df(spark), vec_col="vec", id_col="id", **kw
    )
    return {r["id"]: list(r["PQ_CODE"]) for r in out.collect()}


def test_pq_code_shape_and_range(spark):
    got = _enc(spark, m=2, codebook_size=4, iterations=1)
    assert all(len(c) == 2 for c in got.values())
    assert all(0 <= x < 4 for c in got.values() for x in c)


def test_pq_identical_vectors_share_codes(spark):
    rows = ROWS + [(6, ROWS[0][1])]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = rql.get_transform("pq_encode").apply(df, vec_col="vec", id_col="id",
                                               m=2, codebook_size=4)
    got = {r["id"]: list(r["PQ_CODE"]) for r in out.collect()}
    assert got[6] == got[0]


def test_pq_bundles_get_distinct_codes(spark):
    got = _enc(spark, m=2, codebook_size=4, iterations=2)
    assert got[0] != got[3], "opposite bundles must not share a full code"


def test_pq_deterministic(spark):
    assert _enc(spark, m=2, codebook_size=4) == _enc(spark, m=2, codebook_size=4)


def test_pq_search_prefers_same_bundle(spark):
    out = rql.get_transform("pq_search").apply(
        _df(spark), vec_col="vec", id_col="id", query_ids=[0, 3], k=2,
        m=2, codebook_size=4, iterations=2,
    )
    rows = {(r["QUERY_ID"], r["RANK"]): r["MATCH_ID"] for r in out.collect()}
    assert rows[(0, 1)] in (1, 2)
    assert rows[(3, 1)] in (4, 5)


def test_pq_search_excludes_self_and_ranks_contiguously(spark):
    out = rql.get_transform("pq_search").apply(
        _df(spark), vec_col="vec", id_col="id", query_ids=[0], k=5,
        m=2, codebook_size=4,
    ).collect()
    assert all(r["MATCH_ID"] != 0 for r in out)
    assert sorted(r["RANK"] for r in out) == [1, 2, 3, 4, 5]


def test_pq_param_validation(spark):
    with pytest.raises(rql.ParameterException):
        _enc(spark, m=3)  # 3 does not divide 8
    with pytest.raises(rql.ParameterException):
        rql.get_transform("pq_search").apply(
            _df(spark), vec_col="vec", id_col="id", query_ids=[], k=5
        )
