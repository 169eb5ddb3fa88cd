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


# ---------------------------------------------------------------- feature_hash

def test_feature_hash_histogram_and_normalization(spark):
    import math

    from rasgoql_spark.functions.classify import feature_hash

    df = spark.createDataFrame(
        [(0, "a a b"), (1, ""), (2, None), (3, "a a b")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["FEATURES"] for r in
           feature_hash(df, "text", "doc_id", dim=8).collect()}
    v = out[0]
    assert len(v) == 8
    assert out[0] == out[3]                       # same text -> same vector
    assert out[1] == [0.0] * 8 and out[2] == [0.0] * 8
    assert abs(sum(x * x for x in v) - 1.0) < 1e-4  # L2-normalized
    nz = sorted(x for x in v if x > 0)
    assert len(nz) == 2 and nz[1] / nz[0] == pytest.approx(2.0, abs=1e-4)


def test_feature_hash_plus_logreg_learns_token_presence(spark):
    """The composed in-engine classifier: hashed bag-of-words features into
    logistic regression separate docs by a planted vocabulary signal."""
    from pyspark.sql import functions as F

    from rasgoql_spark.functions.classify import feature_hash
    from rasgoql_spark.functions.logreg import logreg_score

    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append((i, f"spark shuffle partition executor task {i % 7}", 1))
        else:
            rows.append((i, f"recipe garden flower kitchen window {i % 7}", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    feat = feature_hash(df, "text", "doc_id", dim=16)
    wide = feat.select(
        "doc_id", "y",
        *[F.col("FEATURES")[j].alias(f"f{j}") for j in range(16)])
    scored = logreg_score(wide, [f"f{j}" for j in range(16)], "y",
                          lr=2.0, iterations=8)
    got = {r["doc_id"]: r["SCORE"] for r in scored.collect()}
    pos = [got[i] for i in range(0, 120, 2)]
    neg = [got[i] for i in range(1, 120, 2)]
    assert min(pos) > max(neg), "hashed-BoW logreg must separate the classes"
