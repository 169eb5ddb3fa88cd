"""Training-prep additions: hard_negative_mine and curriculum_order."""

import pytest

from rasgoql_spark.errors import ParameterException


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_hard_negatives_exclude_positives_and_self(emb):
    from rasgoql_spark.functions.relevance import hard_negative_mine

    pos = [(0, 5), (0, 7), (1, 3)]
    out = hard_negative_mine(emb, "embedding", "vec_id", positives=pos,
                             query_ids=[0, 1], k=4).collect()
    assert len(out) == 8
    banned = set(pos)
    for r in out:
        assert (r["QUERY_ID"], r["NEG_ID"]) not in banned
        assert r["QUERY_ID"] != r["NEG_ID"]
        assert 1 <= r["RANK"] <= 4


def test_hard_negatives_are_hardest_remaining(emb):
    # with positives removed, the mined set equals brute top-k minus them
    from rasgoql_spark.functions.relevance import hard_negative_mine
    from rasgoql_spark.functions.similarity import similarity_search

    brute = similarity_search(emb, "embedding", "vec_id",
                              query_ids=[2], k=6).collect()
    top = [r["MATCH_ID"] for r in brute]
    pos = [(2, top[0]), (2, top[2])]
    mined = hard_negative_mine(emb, "embedding", "vec_id", positives=pos,
                               query_ids=[2], k=4).collect()
    expect = [m for m in top if (2, m) not in set(pos)][:4]
    assert [r["NEG_ID"] for r in sorted(mined, key=lambda r: r["RANK"])] == expect


def test_hard_negatives_positive_df_side(emb, spark):
    from rasgoql_spark.functions.relevance import hard_negative_mine

    pos_df = spark.createDataFrame([(0, 5)], "q BIGINT, d BIGINT")
    out = hard_negative_mine(emb, "embedding", "vec_id", positives=pos_df,
                             query_ids=[0], k=3).collect()
    assert all((r["QUERY_ID"], r["NEG_ID"]) != (0, 5) for r in out)


def test_hard_negatives_validation(emb):
    from rasgoql_spark.functions.relevance import hard_negative_mine

    with pytest.raises(ParameterException):
        hard_negative_mine(emb, "embedding", "vec_id", positives=[(0, 1)], k=0,
                           query_ids=[0])
    with pytest.raises(ParameterException):
        hard_negative_mine(emb, "embedding", "vec_id", positives=[(0, 1)])
    with pytest.raises(ParameterException):
        hard_negative_mine(emb, "embedding", "vec_id", positives=[],
                           query_ids=[0])


def test_curriculum_order_buckets_and_determinism(spark):
    from rasgoql_spark.functions.mix import curriculum_order

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(100, None)],
        "id BIGINT, score DOUBLE",
    )
    out = curriculum_order(df, "score", "id", n_buckets=4).collect()
    by_id = {r["id"]: r["CURRICULUM_BUCKET"] for r in out}
    assert by_id[0] == 0 and by_id[99] == 3
    assert by_id[100] == 3          # null difficulty -> last bucket
    # buckets are non-decreasing along the output order
    buckets = [r["CURRICULUM_BUCKET"] for r in out]
    assert buckets == sorted(buckets)
    again = curriculum_order(df, "score", "id", n_buckets=4).collect()
    assert [r["id"] for r in out] == [r["id"] for r in again]
    rev = curriculum_order(df, "score", "id", n_buckets=4,
                           descending=True).collect()
    rev_by_id = {r["id"]: r["CURRICULUM_BUCKET"] for r in rev}
    assert rev_by_id[0] == 3
    assert rev_by_id[100] == 3   # nulls stay LAST even when descending


def test_curriculum_order_constant_score_single_bucket(spark):
    from rasgoql_spark.functions.mix import curriculum_order

    df = spark.createDataFrame([(i, 1.0) for i in range(10)],
                               "id BIGINT, score DOUBLE")
    out = curriculum_order(df, "score", "id", n_buckets=5).collect()
    assert {r["CURRICULUM_BUCKET"] for r in out} == {0}
    with pytest.raises(ParameterException):
        curriculum_order(df, "score", "id", n_buckets=1)


def test_hard_negatives_renderer_roundtrip(emb, spark):
    from rasgoql_spark.errors import TransformRenderingException
    from rasgoql_spark.functions.relevance import (
        _r_hard_negative_mine,
        hard_negative_mine,
    )

    emb.createOrReplaceTempView("__hnm_src")
    pos = [(0, 17), (1, 3)]
    sql = _r_hard_negative_mine("__hnm_src", "embedding", "vec_id",
                                positives=pos, query_ids=[0, 1], k=5)
    via_sql = {tuple(r) for r in spark.sql(sql).collect()}
    direct = {tuple(r) for r in
              hard_negative_mine(emb, "embedding", "vec_id", positives=pos,
                                 query_ids=[0, 1], k=5).collect()}
    assert via_sql == direct
    # DataFrame sides are execution-only
    pos_df = spark.createDataFrame(pos, "q BIGINT, d BIGINT")
    with pytest.raises(TransformRenderingException):
        _r_hard_negative_mine("__hnm_src", "embedding", "vec_id",
                              positives=pos_df, query_ids=[0, 1])


def test_hnm_renderer_string_and_float_ids(spark):
    # string ids render quoted (no bare ValueError); float positives render
    # faithfully (no silent int truncation)
    from rasgoql_spark.functions.relevance import _r_hard_negative_mine

    sql = _r_hard_negative_mine("t", "v", "id", positives=[("q1", "d7")],
                                query_ids=["q1"], k=3)
    assert "'q1'" in sql and "'d7'" in sql
    sql2 = _r_hard_negative_mine("t", "v", "id", positives=[(0, 17.9)],
                                 query_ids=[0], k=3)
    assert "17.9" in sql2 and "(0, 17)" not in sql2


def test_curriculum_order_nan_trains_last_and_does_not_poison_edges(spark):
    """NaN scores are 'unknown difficulty' exactly like NULL: last bucket
    in both directions, and EXCLUDED from the min/max edge fit (Spark
    sorts NaN above every double — an unguarded max would make the span
    NaN and NULL every scored row's bucket)."""
    from rasgoql_spark.functions.mix import curriculum_order

    df = spark.createDataFrame(
        [(0, float("nan")), (1, None), (2, 0.0), (3, 5.0), (4, 10.0)],
        "id BIGINT, score DOUBLE")
    for desc in (False, True):
        rows = {r["id"]: r["CURRICULUM_BUCKET"]
                for r in curriculum_order(df, "score", "id", n_buckets=4,
                                          descending=desc).collect()}
        assert rows[0] == 3 and rows[1] == 3      # NaN and NULL: last bucket
        assert None not in rows.values()          # edges not poisoned
        scored = [rows[2], rows[3], rows[4]]
        assert scored == ([0, 2, 3] if not desc else [3, 1, 0])
    # position contract: NaN/NULL rows sort at the END of the curriculum
    ordered = curriculum_order(df, "score", "id", n_buckets=4).collect()
    tail_ids = {r["id"] for r in ordered[-2:]}
    assert tail_ids == {0, 1}


def test_curriculum_order_nan_renderer_parity(spark):
    """The SQL renderer applies the same NaN rules as the execution path."""
    from rasgoql_spark.functions.mix import _r_curriculum_order, curriculum_order

    df = spark.createDataFrame(
        [(0, float("nan")), (1, None), (2, 1.0), (3, 4.0), (4, 9.0)],
        "id BIGINT, score DOUBLE")
    df.createOrReplaceTempView("__curr_nan_src")
    sql = _r_curriculum_order("__curr_nan_src", "score", "id", n_buckets=3,
                              _input_columns=("id", "score"))
    via_sql = [(r["id"], r["CURRICULUM_BUCKET"]) for r in spark.sql(sql).collect()]
    direct = [(r["id"], r["CURRICULUM_BUCKET"])
              for r in curriculum_order(df, "score", "id", n_buckets=3).collect()]
    assert via_sql == direct
