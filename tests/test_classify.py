"""Multinomial Naive Bayes classification (closed-form train + score)."""

import math

import pytest

import rasgoql_spark as rql


def _nb(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string, y string")
    out = rql.get_transform("nb_classify").apply(
        df, text="text", label_col="y", id_col="id", **kw
    )
    return {r["id"]: (r["NB_PRED"], r["NB_LOGPROB"]) for r in out.collect()}


TOY = [
    (1, "cat cat dog", "pets"),
    (2, "cat dog dog", "pets"),
    (3, "stock bond market", "fin"),
    (4, "bond market stock stock", "fin"),
]


def test_nb_separates_toy_corpus(spark):
    got = _nb(spark, TOY)
    assert [got[i][0] for i in (1, 2, 3, 4)] == ["pets", "pets", "fin", "fin"]


def test_nb_exact_score_matches_hand_computation(spark):
    got = _nb(spark, TOY)
    # vocab = {cat, dog, stock, bond, market} -> V=5; pets: cl=6, fin: cl=7
    # doc 1 = cat cat dog under pets: C(cat)=3, C(dog)=3, alpha=1
    expect = math.log(2 / 4) + 2 * math.log((3 + 1) / (6 + 5)) + math.log((3 + 1) / (6 + 5))
    assert got[1][0] == "pets"
    assert got[1][1] == pytest.approx(round(expect, 6), abs=1e-6)


def test_nb_empty_doc_prior_fallback_and_tiebreak(spark):
    rows = TOY + [(5, "", "pets")]
    got = _nb(spark, rows)
    # priors: pets 3/5, fin 2/5 -> empty doc predicts the majority label
    assert got[5] == ("pets", round(math.log(3 / 5), 6))
    # exact tie on priors -> lexicographically smallest label
    got2 = _nb(spark, TOY + [(5, "", "zzz"), (6, "", "aaa")])
    assert got2[5][0] == got2[6][0]


def test_nb_unseen_token_smoothing(spark):
    # 'ferret' never appears under fin; smoothing must keep the score finite
    rows = TOY + [(5, "ferret ferret ferret", "pets")]
    got = _nb(spark, rows)
    assert got[5][1] > float("-inf")


def test_nb_param_validation(spark):
    with pytest.raises(rql.ParameterException):
        _nb(spark, TOY, alpha=0.0)
    with pytest.raises(rql.ParameterException):
        _nb(spark, TOY, max_labels=1)


def test_nb_keeps_original_columns_and_rowcount(spark):
    df = spark.createDataFrame(TOY, "id long, text string, y string")
    out = rql.get_transform("nb_classify").apply(df, text="text", label_col="y", id_col="id")
    assert out.count() == 4
    assert set(out.columns) == {"id", "text", "y", "NB_PRED", "NB_LOGPROB"}


def test_nb_label_frame_broadcasts(spark):
    df = spark.createDataFrame(TOY, "id long, text string, y string")
    out = rql.get_transform("nb_classify").apply(df, text="text", label_col="y", id_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, "label expansion must broadcast, not shuffle"
