"""Hybrid retrieval: vector_score (literal-query cosine) + rrf_fuse
(reciprocal-rank fusion)."""

import pytest

from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.relevance import (
    _r_rrf_fuse,
    _r_vector_score,
    rrf_fuse,
    vector_score,
)


@pytest.fixture(scope="module")
def scored(spark):
    # (id, lexical score, semantic score): designed so the two rankings
    # disagree and fusion rewards the doc strong on both
    rows = [
        (1, 10.0, 0.10),
        (2, 8.0, 0.90),
        (3, 6.0, 0.80),
        (4, 4.0, None),
        (5, 4.0, 0.20),
    ]
    return spark.createDataFrame(rows, "id BIGINT, lex DOUBLE, sem DOUBLE")


def test_rrf_known_values(scored):
    out = {r["id"]: r for r in rrf_fuse(scored, "id", ["lex", "sem"]).collect()}
    # lex ranks: 1->1, 2->2, 3->3, 4&5 tie at 4 (competition rank)
    assert [out[i]["RANK_LEX"] for i in (1, 2, 3, 4, 5)] == [1, 2, 3, 4, 4]
    # sem ranks: 2->1, 3->2, 5->3, 1->4; null score = absent -> NULL rank
    assert [out[i]["RANK_SEM"] for i in (1, 2, 3, 4, 5)] == [4, 1, 2, None, 3]
    assert out[2]["RRF_SCORE"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9
    )
    # absent ranking contributes 0 (standard RRF), not a last-place term
    assert out[4]["RRF_SCORE"] == pytest.approx(round(1 / 64, 6), abs=1e-9)
    # doc 2 (strong on both) outranks doc 1 (lexical-only winner)
    best = max(out.values(), key=lambda r: r["RRF_SCORE"])
    assert best["id"] == 2


def test_rrf_top_k_and_rank(scored):
    out = rrf_fuse(scored, "id", ["lex", "sem"], k=2).collect()
    assert len(out) == 2
    assert sorted(r["RRF_RANK"] for r in out) == [1, 2]
    assert out[0]["RRF_RANK"] <= 2


def test_rrf_partitioned_fusion(spark):
    rows = [
        ("q1", 1, 5.0, 0.1), ("q1", 2, 3.0, 0.9),
        ("q2", 1, 1.0, 0.4), ("q2", 2, 9.0, 0.9),
    ]
    df = spark.createDataFrame(rows, "q STRING, id BIGINT, lex DOUBLE, sem DOUBLE")
    out = rrf_fuse(df, "id", ["lex", "sem"], partition=["q"], k=1)
    top = {r["q"]: r["id"] for r in out.collect()}
    # q1: both docs split the two firsts -> RRF tie, id tie-break -> 1;
    # q2: doc 2 leads both rankings -> 2
    assert top["q1"] == 1 and top["q2"] == 2


def test_rrf_validation(scored):
    with pytest.raises(ParameterException):
        rrf_fuse(scored, "id", ["lex"])
    with pytest.raises(ParameterException):
        rrf_fuse(scored, "id", ["lex", "sem"], k0=0)
    with pytest.raises(ParameterException):
        rrf_fuse(scored, "id", ["lex", "sem"], k=0)


def test_rrf_renderer_roundtrip(spark, scored):
    scored.createOrReplaceTempView("__rrf_src")
    via_sql = spark.sql(_r_rrf_fuse("__rrf_src", "id", ["lex", "sem"], k=3))
    direct = rrf_fuse(scored, "id", ["lex", "sem"], k=3)
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


def test_vector_score_geometry(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id BIGINT, v ARRAY<FLOAT>")
    out = {r["id"]: r["QUERY_COSINE"] for r in
           vector_score(df, "v", [1.0, 0.0, 0.0, 0.0]).collect()}
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(0.0)
    assert out[3] == pytest.approx(-1.0)
    assert out[4] == 0.0  # zero-norm guard, not NaN


def test_vector_score_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "id BIGINT, v ARRAY<FLOAT>")
    with pytest.raises(ParameterException):
        vector_score(df, "v", [])


def test_vector_score_renderer_roundtrip(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("__vs_src")
    qv = [((i * 37) % 64 - 31.5) / 32.0 for i in range(64)]
    via_sql = spark.sql(
        _r_vector_score("__vs_src", "embedding", qv)
    ).select("vec_id", "QUERY_COSINE")
    direct = vector_score(emb, "embedding", qv).select("vec_id", "QUERY_COSINE")
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


# --------------------------------------------------------------------------
# bm25_join (round 10): batch retrieval
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_bm25_join_agrees_with_bm25_score(spark, docs):
    """A one-row query table must reproduce bm25_score exactly for every
    doc that shares a term (bm25_score also scores non-matching docs 0)."""
    from rasgoql_spark.functions.relevance import bm25_join, bm25_score

    q = "spark query window"
    qdf = spark.createDataFrame([(7, q)], "query_id BIGINT, query_text STRING")
    joined = {r["MATCH_ID"]: r["BM25_SCORE"] for r in
              bm25_join(docs, "text", "doc_id", qdf, k=1000).collect()}
    solo = {r["doc_id"]: r["BM25_SCORE"] for r in
            bm25_score(docs, "text", "doc_id", q).collect()}
    assert joined, "query must match some docs"
    for doc, score in joined.items():
        assert score == pytest.approx(solo[doc], abs=2e-6)
    # and every doc bm25_join skipped scored 0 in the dense form
    skipped = set(solo) - set(joined)
    assert all(solo[d] == 0.0 for d in skipped)


def test_bm25_join_topk_and_rank_shape(spark, docs):
    from rasgoql_spark.functions.relevance import bm25_join

    qdf = spark.createDataFrame(
        [(0, "spark window"), (1, "data quality")],
        "query_id BIGINT, query_text STRING",
    )
    out = bm25_join(docs, "text", "doc_id", qdf, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["QUERY_ID"], []).append(r["RANK"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_bm25_join_validation(spark, docs):
    from rasgoql_spark.functions.relevance import bm25_join

    qdf = spark.createDataFrame([(0, "x")], "query_id BIGINT, query_text STRING")
    with pytest.raises(ParameterException):
        bm25_join(docs, "text", "doc_id", qdf, k=0)


def test_bm25_join_renderer_roundtrip(spark, docs):
    from rasgoql_spark.functions.relevance import _r_bm25_join, bm25_join

    qdf = spark.createDataFrame(
        [(0, "spark window"), (1, "data quality")],
        "query_id BIGINT, query_text STRING",
    )
    docs.createOrReplaceTempView("__bj_docs")
    qdf.createOrReplaceTempView("__bj_queries")
    via_sql = spark.sql(_r_bm25_join(
        "__bj_docs", "text", "doc_id", "__bj_queries", k=5))
    direct = bm25_join(docs, "text", "doc_id", qdf, k=5)
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


# --------------------------------------------------------------------------
# ranking_eval (round 10)
# --------------------------------------------------------------------------

def test_ranking_eval_perfect_ranking(spark):
    from rasgoql_spark.functions.relevance import ranking_eval

    rows = [(1, r, 3 - r if r <= 2 else 0) for r in range(1, 6)]
    df = spark.createDataFrame(rows, "q BIGINT, rank INT, rel INT")
    out = ranking_eval(df, "q", "rank", "rel", k=5).collect()[0]
    # labels already sorted desc by rank -> system order == ideal order
    assert out["NDCG_5"] == pytest.approx(1.0)
    assert out["MRR"] == pytest.approx(1.0)
    assert out["PRECISION_5"] == pytest.approx(2 / 5)


def test_ranking_eval_known_values(spark):
    import math

    from rasgoql_spark.functions.relevance import ranking_eval

    # relevant doc (rel=1) at rank 3; a rel=2 doc at rank 4
    rows = [(1, 1, 0), (1, 2, 0), (1, 3, 1), (1, 4, 2)]
    df = spark.createDataFrame(rows, "q BIGINT, rank INT, rel INT")
    out = ranking_eval(df, "q", "rank", "rel", k=4).collect()[0]
    dcg = 1.0 / math.log2(4) + 3.0 / math.log2(5)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3)
    assert out["NDCG_4"] == pytest.approx(dcg / idcg, abs=1e-6)
    assert out["MRR"] == pytest.approx(1 / 3)
    assert out["PRECISION_4"] == pytest.approx(0.5)


def test_ranking_eval_no_relevant_is_zero(spark):
    from rasgoql_spark.functions.relevance import ranking_eval

    df = spark.createDataFrame([(1, 1, 0), (1, 2, 0)], "q BIGINT, rank INT, rel INT")
    out = ranking_eval(df, "q", "rank", "rel", k=2).collect()[0]
    assert out["NDCG_2"] == 0.0 and out["MRR"] == 0.0 and out["PRECISION_2"] == 0.0


def test_ranking_eval_label_ties_stable(spark):
    """Equal labels at different ideal positions contribute the same
    multiset — shuffling tied rows cannot change NDCG."""
    from rasgoql_spark.functions.relevance import ranking_eval

    rows_a = [(1, 1, 1), (1, 2, 1), (1, 3, 0)]
    rows_b = [(1, 2, 1), (1, 1, 1), (1, 3, 0)]  # same data, reordered input
    a = ranking_eval(spark.createDataFrame(rows_a, "q BIGINT, rank INT, rel INT"),
                     "q", "rank", "rel", k=3).collect()[0]
    b = ranking_eval(spark.createDataFrame(rows_b, "q BIGINT, rank INT, rel INT"),
                     "q", "rank", "rel", k=3).collect()[0]
    assert a["NDCG_3"] == b["NDCG_3"] == pytest.approx(1.0)


def test_ranking_eval_validation_and_renderer(spark):
    from rasgoql_spark.functions.relevance import _r_ranking_eval, ranking_eval

    df = spark.createDataFrame(
        [(q, r, (q + r) % 3) for q in range(3) for r in range(1, 8)],
        "q BIGINT, rank INT, rel INT",
    )
    with pytest.raises(ParameterException):
        ranking_eval(df, "q", "rank", "rel", k=0)
    df.createOrReplaceTempView("__re_src")
    via_sql = spark.sql(_r_ranking_eval("__re_src", "q", "rank", "rel", k=5))
    direct = ranking_eval(df, "q", "rank", "rel", k=5)
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


def test_ranking_eval_recall_and_ap_known_values(spark):
    """Hand-computed recall@k and TREC AP (round 12): rel docs at ranks
    1 and 4 of 5, one MORE relevant doc outside the ranking window."""
    from rasgoql_spark.functions.relevance import ranking_eval

    # ranks 1..5; relevant at rank 1 and 4; a third relevant doc sits at
    # rank 6 (beyond k) so recall/AP denominators use TOTAL relevant = 3
    rows = [(1, 1, 1), (1, 2, 0), (1, 3, 0), (1, 4, 2), (1, 5, 0), (1, 6, 1)]
    df = spark.createDataFrame(rows, "q BIGINT, rank INT, rel INT")
    out = ranking_eval(df, "q", "rank", "rel", k=5).collect()[0]
    # hits in top-5 = 2, total relevant = 3
    assert out["RECALL_5"] == pytest.approx(2 / 3, abs=1e-6)
    # AP = (P@1 + P@4) / R = (1/1 + 2/4) / 3
    assert out["AP"] == pytest.approx((1.0 + 0.5) / 3, abs=1e-6)


def test_ranking_eval_recall_ap_perfect_and_empty(spark):
    from rasgoql_spark.functions.relevance import ranking_eval

    # all relevant docs ranked first -> AP = recall = 1
    rows = [(1, 1, 1), (1, 2, 1), (1, 3, 0)]
    df = spark.createDataFrame(rows, "q BIGINT, rank INT, rel INT")
    out = ranking_eval(df, "q", "rank", "rel", k=3).collect()[0]
    assert out["AP"] == pytest.approx(1.0)
    assert out["RECALL_3"] == pytest.approx(1.0)
    # no relevant docs -> both 0 (not null), same contract as NDCG/MRR
    df0 = spark.createDataFrame([(1, 1, 0), (1, 2, 0)],
                                "q BIGINT, rank INT, rel INT")
    out0 = ranking_eval(df0, "q", "rank", "rel", k=2).collect()[0]
    assert out0["AP"] == 0.0 and out0["RECALL_2"] == 0.0


def test_ranking_eval_renderer_matches_dataframe(spark):
    from rasgoql_spark.functions.relevance import _r_ranking_eval, ranking_eval

    rows = [(q, r, (q * 3 + r) % 3) for q in (1, 2) for r in range(1, 8)]
    df = spark.createDataFrame(rows, "q BIGINT, rank INT, rel INT")
    df.createOrReplaceTempView("__rank_eval_src")
    sql = _r_ranking_eval("__rank_eval_src", "q", "rank", "rel", k=5)
    via_sql = {tuple(r) for r in spark.sql(sql).collect()}
    direct = {tuple(r) for r in
              ranking_eval(df, "q", "rank", "rel", k=5).collect()}
    assert via_sql == direct
