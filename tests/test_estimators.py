"""minhash_similarity (Jaccard estimator diagnostic) and embedding_outliers
(centroid-distance anomaly flagging)."""

import pytest

import rasgoql_spark as rql


def _pairs(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = rql.get_transform("minhash_similarity").apply(
        df, text="text", id_col="doc_id", **kw
    )
    return {(r["ID_A"], r["ID_B"]): (r["EST_JACCARD"], r["JACCARD"]) for r in out.collect()}


def test_identical_docs_estimate_one(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    got = _pairs(spark, [t, t])
    assert got[(0, 1)] == (1.0, 1.0)


def test_estimate_tracks_exact_jaccard(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"          # high overlap
    got = _pairs(spark, [base, near])
    est, jac = got[(0, 1)]
    assert jac > 0.5
    # 16-hash estimate is coarse (k/16 steps) but must not be wildly off
    assert abs(est - jac) < 0.5
    assert est * 16 == int(est * 16)  # exact binary fraction k/16


def test_disjoint_docs_mostly_absent_or_zero(spark):
    got = _pairs(spark, [
        "aa bb cc dd ee ff gg hh",
        "zz yy xx ww vv uu tt ss",
    ])
    for est, jac in got.values():
        assert jac == 0.0


def test_min_est_filters(spark):
    t = "one two three four five six seven eight"
    got = _pairs(spark, [t, t, "unrelated words entirely different content"],
                 min_est=0.9)
    assert (0, 1) in got
    assert all(e >= 0.9 for e, _ in got.values())


def test_exact_dup_group_expansion(spark):
    # 4 identical docs -> all 6 member pairs appear with est=1.0
    t = "repeat me repeat me repeat me please thanks"
    got = _pairs(spark, [t, t, t, t])
    assert len(got) == 6
    assert all(v == (1.0, 1.0) for v in got.values())


def _outliers(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = rql.get_transform("embedding_outliers").apply(
        df, vec_col="vec", id_col="id", **kw
    )
    return {r["id"]: (r["CENTROID_SIM"], r["IS_OUTLIER"]) for r in out.collect()}


def test_outlier_flags_opposite_vector(spark):
    rows = [(i, [1.0, 0.1 * (i % 3), 0.0]) for i in range(9)]
    rows.append((9, [-1.0, 0.0, 0.0]))  # points away from the bundle
    got = _outliers(spark, rows, bottom=0.1)
    assert got[9][1] is True
    assert sum(1 for _, o in got.values() if o) <= 2
    assert got[9][0] < got[0][0]


def test_outlier_bottom_zero_flags_only_minimum(spark):
    rows = [(i, [1.0, float(i), 0.0]) for i in range(5)]
    got = _outliers(spark, rows, bottom=0.0)
    flagged = [i for i, (_, o) in got.items() if o]
    assert len(flagged) == 1  # percentile(0) = min -> only the argmin ties


def test_outlier_param_validation(spark):
    with pytest.raises(rql.ParameterException):
        _outliers(spark, [(0, [1.0, 0.0])], bottom=1.5)


def test_outlier_keeps_columns_and_count(spark):
    df = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])],
                               "id long, vec array<float>")
    out = rql.get_transform("embedding_outliers").apply(df, vec_col="vec", id_col="id")
    assert out.count() == 2
    assert set(out.columns) == {"id", "vec", "CENTROID_SIM", "IS_OUTLIER"}
