"""Round-10 governance/analysis additions: target_encode_oof (leakage-safe
k-fold mean encoding), psi_drift (population stability index), scd2 (type-2
slowly-changing dimension), pmi_collocations (Church & Hanks PMI), and
k_anonymize (Sweeney k-anonymity enforcement)."""

import math

import pytest
from pyspark.sql import functions as F

from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.curation import k_anonymize
from rasgoql_spark.functions.snapshot import psi_drift, scd2
from rasgoql_spark.functions.text import pmi_collocations
from rasgoql_spark.operators.ml import target_encode_oof


# ---------- target_encode_oof ----------


@pytest.fixture(scope="module")
def enc_df(spark):
    # category A: target = fold id (0,1,2) x2 rows each; category B: one fold
    rows = []
    rid = 0
    for fold in range(3):
        for _ in range(2):
            rows.append((rid * 3 + fold, "A", float(fold)))  # key % 3 == fold
            rid += 1
    rows.append((300, "B", 10.0))  # 300 % 3 == 0 -> fold 0, whole cat in one fold
    return spark.createDataFrame(rows, "k long, cat string, y double")


def test_oof_excludes_own_fold(spark, enc_df):
    out = target_encode_oof(enc_df, "cat", "y", fold_by="k", folds=3)
    got = {r["k"]: r["CAT_TARGET_ENC_OOF"] for r in out.collect()}
    # fold 0 rows of A (keys 0,3): mean of folds 1,2 = (1+1+2+2)/4 = 1.5
    assert got[0] == pytest.approx(1.5)
    # fold 1 rows of A (keys 7,10): mean of folds 0,2 = (0+0+2+2)/4 = 1.0
    assert got[7] == pytest.approx(1.0)
    # fold 2 rows of A (keys 14,17): mean of folds 0,1 = 0.5
    assert got[14] == pytest.approx(0.5)


def test_oof_single_fold_category_falls_back_to_prior(spark, enc_df):
    out = target_encode_oof(enc_df, "cat", "y", fold_by="k", folds=3)
    prior = enc_df.agg(F.avg("y")).collect()[0][0]
    got = {r["k"]: r["CAT_TARGET_ENC_OOF"] for r in out.collect()}
    assert got[300] == pytest.approx(prior)


def test_oof_smoothing_shrinks_toward_prior(spark, enc_df):
    prior = enc_df.agg(F.avg("y")).collect()[0][0]
    out = target_encode_oof(enc_df, "cat", "y", fold_by="k", folds=3, smoothing=4.0)
    got = {r["k"]: r["CAT_TARGET_ENC_OOF"] for r in out.collect()}
    # fold 0 of A: (sum_other + m*prior)/(cnt_other + m) = (6 + 4*prior)/8
    assert got[0] == pytest.approx((6.0 + 4.0 * prior) / 8.0)


def test_oof_validates(spark, enc_df):
    with pytest.raises(ParameterException):
        target_encode_oof(enc_df, "cat", "y", fold_by="k", folds=1)
    with pytest.raises(ParameterException):
        target_encode_oof(enc_df, "cat", "y", fold_by="k", smoothing=-1)


def test_oof_no_extra_or_dropped_rows(spark, enc_df):
    out = target_encode_oof(enc_df, "cat", "y", fold_by="k", folds=3)
    assert out.count() == enc_df.count()
    assert set(out.columns) == set(enc_df.columns) | {"CAT_TARGET_ENC_OOF"}


# ---------- psi_drift ----------


def test_psi_identical_distributions_zero(spark):
    df = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    out = psi_drift(df, df, "v", breakpoints=[3.0, 6.0])
    rows = out.collect()
    assert all(r["PSI_CONTRIB"] == 0.0 for r in rows)
    assert all(r["PSI_TOTAL"] == 0.0 for r in rows)


def test_psi_bins_and_null_bin(spark):
    a = spark.createDataFrame(
        [(None,), (1.0,), (5.0,), (9.0,)], "v double"
    )
    e = spark.createDataFrame([(1.0,), (5.0,), (5.0,), (9.0,)], "v double")
    out = {r["BIN"]: r for r in psi_drift(a, e, "v", breakpoints=[3.0, 6.0]).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["ACTUAL_N"] == 1 and out[0]["EXPECTED_N"] == 0
    assert out[1]["LO"] is None and out[1]["HI"] == 3.0
    assert out[2]["LO"] == 3.0 and out[2]["HI"] == 6.0
    assert out[3]["LO"] == 6.0 and out[3]["HI"] is None
    # shifted mass must register a positive total
    assert out[1]["PSI_TOTAL"] > 0


def test_psi_validates(spark):
    df = spark.range(5).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ParameterException):
        psi_drift(df, df, "v", breakpoints=[5.0, 1.0])
    with pytest.raises(ParameterException):
        psi_drift(df, df, "v", breakpoints=[])
    with pytest.raises(ParameterException):
        psi_drift(df, df, "v", breakpoints=[1.0], epsilon=0)


# ---------- scd2 ----------


@pytest.fixture(scope="module")
def snaps(spark):
    rows = [
        # key 1: changes at snap 2, stays
        (1, 1, "a"), (1, 2, "b"), (1, 3, "b"),
        # key 2: never changes
        (2, 1, "x"), (2, 2, "x"), (2, 3, "x"),
        # key 3: appears at snap 2, changes at snap 3
        (3, 2, "p"), (3, 3, "q"),
    ]
    return spark.createDataFrame(rows, "k int, snap int, val string")


def test_scd2_history(spark, snaps):
    out = scd2(snaps, keys=["k"], snapshot_col="snap")
    got = sorted(
        (r["k"], r["val"], r["VALID_FROM"], r["VALID_TO"], r["IS_CURRENT"])
        for r in out.collect()
    )
    assert got == [
        (1, "a", 1, 2, 0),
        (1, "b", 2, None, 1),
        (2, "x", 1, None, 1),
        (3, "p", 2, 3, 0),
        (3, "q", 3, None, 1),
    ]


def test_scd2_null_values_tracked(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, "v"), (1, 3, None)], "k int, snap int, val string"
    )
    out = scd2(df, keys=["k"], snapshot_col="snap")
    got = sorted(
        ((r["val"], r["VALID_FROM"], r["VALID_TO"]) for r in out.collect()),
        key=lambda t: t[1],
    )
    assert got == [(None, 1, 2), ("v", 2, 3), (None, 3, None)]


def test_scd2_validates(spark, snaps):
    with pytest.raises(ParameterException):
        scd2(snaps, keys=[], snapshot_col="snap")
    only_keys = snaps.select("k", "snap")
    with pytest.raises(ParameterException):
        scd2(only_keys, keys=["k"], snapshot_col="snap")


# ---------- pmi_collocations ----------


def test_pmi_known_value(spark):
    # corpus: "new york" x3, "old york" x1, filler tokens
    docs = [("new york",)] * 3 + [("old york",)] + [("a b",)] * 2
    df = spark.createDataFrame(docs, "text string")
    out = pmi_collocations(df, "text", min_count=1, top_k=None)
    got = {(r["WORD1"], r["WORD2"]): (r["N_PAIR"], r["PMI"]) for r in out.collect()}
    n_pair, pmi = got[("new", "york")]
    # N tokens = 12, c(new)=3, c(york)=4, c(new york)=3
    assert n_pair == 3
    assert pmi == pytest.approx(round(math.log(3 * 12 / (3 * 4)), 6))


def test_pmi_min_count_filters(spark):
    docs = [("new york",)] * 3 + [("old york",)]
    df = spark.createDataFrame(docs, "text string")
    out = pmi_collocations(df, "text", min_count=2, top_k=None)
    pairs = {(r["WORD1"], r["WORD2"]) for r in out.collect()}
    assert ("old", "york") not in pairs and ("new", "york") in pairs


def test_pmi_validates(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ParameterException):
        pmi_collocations(df, "text", min_count=0)


# ---------- k_anonymize ----------


@pytest.fixture(scope="module")
def quasi_df(spark):
    rows = [
        (1, "NY", 30, "a"), (2, "NY", 30, "b"), (3, "NY", 30, "c"),
        (4, "SF", 40, "d"), (5, "SF", 41, "e"),
    ]
    return spark.createDataFrame(rows, "id int, city string, age int, payload string")


def test_k_anonymize_filter(spark, quasi_df):
    out = k_anonymize(quasi_df, quasi_cols=["city", "age"], k=3, action="filter")
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    assert out.columns == quasi_df.columns


def test_k_anonymize_flag(spark, quasi_df):
    out = k_anonymize(quasi_df, quasi_cols=["city", "age"], k=3, action="flag")
    got = {r["id"]: (r["GROUP_SIZE"], r["IS_K_ANON"]) for r in out.collect()}
    assert got[1] == (3, 1) and got[4] == (1, 0)


def test_k_anonymize_suppress(spark, quasi_df):
    out = k_anonymize(quasi_df, quasi_cols=["city", "age"], k=3, action="suppress")
    got = {r["id"]: (r["city"], r["age"], r["payload"]) for r in out.collect()}
    assert got[1] == ("NY", 30, "a")           # anonymous: untouched
    assert got[4] == (None, None, "d")         # rare combo: quasi nulled, payload kept
    assert out.columns == quasi_df.columns


def test_k_anonymize_nulls_group_together(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id int, q string"
    )
    out = k_anonymize(df, quasi_cols=["q"], k=2, action="filter")
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_k_anonymize_validates(spark, quasi_df):
    with pytest.raises(ParameterException):
        k_anonymize(quasi_df, quasi_cols=[], k=3)
    with pytest.raises(ParameterException):
        k_anonymize(quasi_df, quasi_cols=["city"], k=1)
    with pytest.raises(ParameterException):
        k_anonymize(quasi_df, quasi_cols=["city"], k=3, action="drop")


# ---------- mutual_information ----------


def test_mi_independent_is_zero(spark):
    from rasgoql_spark.operators.aggregates import mutual_information

    # perfectly independent 2x2 grid, 4 rows each
    rows = [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(4)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_information(df, "a", "b").collect()[0][0]
    assert got == pytest.approx(0.0, abs=1e-9)


def test_mi_identical_equals_entropy(spark):
    from rasgoql_spark.operators.aggregates import mutual_information

    # X == Y -> I(X;Y) = H(X); p = (0.5, 0.25, 0.25)
    rows = [("a",)] * 2 + [("b",)] * 1 + [("c",)] * 1
    df = spark.createDataFrame(rows, "x string").withColumn("y", F.col("x"))
    got = mutual_information(df, "x", "y").collect()[0][0]
    h = -(0.5 * math.log(0.5) + 0.25 * math.log(0.25) + 0.25 * math.log(0.25))
    assert got == pytest.approx(round(h, 6))


def test_mi_nulls_are_a_category(spark):
    from rasgoql_spark.operators.aggregates import mutual_information

    # y = (x is null): fully dependent through the NULL category
    rows = [(None, 1)] * 3 + [("v", 0)] * 3
    df = spark.createDataFrame(rows, "x string, y int")
    got = mutual_information(df, "x", "y").collect()[0][0]
    assert got == pytest.approx(round(math.log(2), 6))


# ---------- review-fix regressions ----------


def test_psi_empty_actual_side_stays_finite(spark):
    """An empty ACTUAL frame must floor to epsilon, not poison every row
    with 0/0 NaN (greatest(NaN, eps) is NaN in Spark)."""
    base = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    empty = base.filter("v > 1000")
    rows = psi_drift(empty, base, "v", breakpoints=[3.0, 6.0]).collect()
    assert rows
    for r in rows:
        assert r["ACTUAL_PCT"] == 0.0
        assert not math.isnan(r["PSI_CONTRIB"])
        assert not math.isnan(r["PSI_TOTAL"])
        assert r["PSI_TOTAL"] > 0  # all mass missing = definite drift


def test_oof_rejects_non_integer_fold_key(spark, enc_df):
    strkey = enc_df.withColumn("sk", F.col("cat"))
    with pytest.raises(ParameterException):
        target_encode_oof(strkey, "cat", "y", fold_by="sk", folds=3)


def test_save_shards_curve_requires_zorder_by(session, tmp_path):
    with pytest.raises(ParameterException):
        session.dataset("orders").save_shards(
            str(tmp_path / "x1"), num_shards=2, curve="hilbert",
            mode="overwrite",
        )
    with pytest.raises(ParameterException):
        session.dataset("orders").save_shards(
            str(tmp_path / "x2"), num_shards=2, curve="peano",
            mode="overwrite",
        )


# ---------- psi_drift_categorical ----------


def test_psi_categorical_identical_zero_and_null_category(spark):
    from rasgoql_spark.functions.snapshot import psi_drift_categorical

    df = spark.createDataFrame(
        [("en",)] * 5 + [("fr",)] * 3 + [(None,)] * 2, "lang string"
    )
    out = {r["CATEGORY"]: r for r in
           psi_drift_categorical(df, df, "lang").collect()}
    assert set(out) == {"en", "fr", "<NULL>"}
    assert all(r["PSI_TOTAL"] == 0.0 for r in out.values())
    assert out["<NULL>"]["ACTUAL_N"] == 2


def test_psi_categorical_detects_missing_category(spark):
    from rasgoql_spark.functions.snapshot import psi_drift_categorical

    base = spark.createDataFrame([("en",)] * 5 + [("fr",)] * 5, "lang string")
    actual = base.filter("lang = 'en'")
    out = {r["CATEGORY"]: r for r in
           psi_drift_categorical(actual, base, "lang").collect()}
    assert out["fr"]["ACTUAL_N"] == 0
    assert out["fr"]["PSI_TOTAL"] > 0.25


# ---------- l_diversity ----------


@pytest.fixture(scope="module")
def ldiv_df(spark):
    rows = [
        # group NY: 3 rows, 3 distinct diagnoses -> 3-diverse
        (1, "NY", "flu"), (2, "NY", "cold"), (3, "NY", "ok"),
        # group SF: 3 rows, 1 distinct -> big but NOT diverse
        (4, "SF", "flu"), (5, "SF", "flu"), (6, "SF", "flu"),
        # group LA: 2 rows, one NULL diagnosis -> 2 "values" incl. NULL
        (7, "LA", "flu"), (8, "LA", None),
    ]
    return spark.createDataFrame(rows, "id int, city string, diag string")


def test_l_diversity_filter(spark, ldiv_df):
    from rasgoql_spark.functions.curation import l_diversity

    out = l_diversity(ldiv_df, quasi_cols=["city"], sensitive="diag", l=2)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 7, 8]
    assert out.columns == ldiv_df.columns


def test_l_diversity_flag_counts_null_as_value(spark, ldiv_df):
    from rasgoql_spark.functions.curation import l_diversity

    out = l_diversity(ldiv_df, quasi_cols=["city"], sensitive="diag", l=3,
                      action="flag")
    got = {r["id"]: (r["DISTINCT_SENSITIVE"], r["IS_L_DIVERSE"])
           for r in out.collect()}
    assert got[1] == (3, 1)   # NY: 3 distinct
    assert got[4] == (1, 0)   # SF: homogeneous despite size
    assert got[7] == (2, 0)   # LA: flu + NULL = 2 values


def test_l_diversity_validates(spark, ldiv_df):
    from rasgoql_spark.functions.curation import l_diversity

    with pytest.raises(ParameterException):
        l_diversity(ldiv_df, quasi_cols=[], sensitive="diag", l=2)
    with pytest.raises(ParameterException):
        l_diversity(ldiv_df, quasi_cols=["city"], sensitive="city", l=2)
    with pytest.raises(ParameterException):
        l_diversity(ldiv_df, quasi_cols=["city"], sensitive="diag", l=1)
    with pytest.raises(ParameterException):
        l_diversity(ldiv_df, quasi_cols=["city"], sensitive="diag", l=2,
                    action="suppress")


# ---------- t_closeness ----------


def test_t_closeness_known_distance(spark):
    from rasgoql_spark.functions.curation import t_closeness

    # global sensitive dist: flu 0.5, ok 0.5. Group A = all flu ->
    # distance = 0.5*(|1-0.5| + |0-0.5|) = 0.5; group B mirrors it.
    rows = [(1, "A", "flu"), (2, "A", "flu"), (3, "B", "ok"), (4, "B", "ok")]
    df = spark.createDataFrame(rows, "id int, g string, diag string")
    out = t_closeness(df, quasi_cols=["g"], sensitive="diag", t=0.4,
                      action="flag")
    got = {r["id"]: (r["T_DISTANCE"], r["IS_T_CLOSE"]) for r in out.collect()}
    assert got[1] == (0.5, 0) and got[3] == (0.5, 0)
    # a perfectly representative group has distance 0
    rows2 = rows + [(5, "C", "flu"), (6, "C", "ok")]
    df2 = spark.createDataFrame(rows2, "id int, g string, diag string")
    out2 = t_closeness(df2, quasi_cols=["g"], sensitive="diag", t=0.4,
                       action="flag")
    got2 = {r["id"]: r["T_DISTANCE"] for r in out2.collect()}
    assert got2[5] == 0.0


def test_t_closeness_filter_and_validates(spark):
    from rasgoql_spark.functions.curation import t_closeness

    rows = [(1, "A", "flu"), (2, "A", "flu"), (3, "B", "flu"), (4, "B", "ok")]
    df = spark.createDataFrame(rows, "id int, g string, diag string")
    # global: flu 0.75, ok 0.25. A: |1-.75|+|0-.25| = .5 -> d=.25;
    # B: |.5-.75|+|.5-.25| = .5 -> d=.25. t=0.3 keeps both; t=0.2 drops both.
    keep = t_closeness(df, quasi_cols=["g"], sensitive="diag", t=0.3)
    assert keep.count() == 4
    drop = t_closeness(df, quasi_cols=["g"], sensitive="diag", t=0.2)
    assert drop.count() == 0
    with pytest.raises(ParameterException):
        t_closeness(df, quasi_cols=["g"], sensitive="diag", t=0.0)
    with pytest.raises(ParameterException):
        t_closeness(df, quasi_cols=["g"], sensitive="g", t=0.3)
    with pytest.raises(ParameterException):
        t_closeness(df, quasi_cols=[], sensitive="diag", t=0.3)


# ---------- scd2_merge ----------


def test_scd2_merge_equals_full_recompute(spark):
    """THE invariant: folding snapshot N+1 into scd2(s1..sN) reproduces
    scd2(s1..sN+1) exactly — also the shape of the driver oracle."""
    from rasgoql_spark.functions.snapshot import scd2_merge

    def snap(n, vals):
        return spark.createDataFrame(
            [(k, n, v) for k, v in vals.items()], "k int, snap int, val string"
        )

    s1 = snap(1, {1: "a", 2: "x"})
    s2 = snap(2, {1: "b", 2: "x", 3: "p"})         # 1 changes, 3 appears
    s3 = snap(3, {1: "b", 2: "y", 3: "q", 4: "n"})  # 2,3 change, 4 appears
    hist12 = scd2(s1.unionByName(s2), keys=["k"], snapshot_col="snap")
    merged = scd2_merge(
        hist12, s3.drop("snap"), keys=["k"], snapshot_value=3
    )
    full = scd2(
        s1.unionByName(s2).unionByName(s3), keys=["k"], snapshot_col="snap"
    )
    key = lambda r: (r["k"], r["VALID_FROM"])  # noqa: E731
    a = sorted(map(tuple, merged.select(*full.columns).collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b


def test_scd2_merge_untouched_and_unchanged_pass_through(spark):
    from rasgoql_spark.functions.snapshot import scd2_merge

    hist = spark.createDataFrame(
        [(1, "a", 1, None, 1), (2, "x", 1, 2, 0), (2, "y", 2, None, 1)],
        "k int, val string, VALID_FROM int, VALID_TO int, IS_CURRENT int",
    )
    snap = spark.createDataFrame([(2, "y")], "k int, val string")  # unchanged
    out = scd2_merge(hist, snap, keys=["k"], snapshot_value=3)
    got = sorted(map(tuple, out.collect()))
    assert got == sorted(map(tuple, hist.collect()))  # bit-identical history


def test_scd2_merge_validates(spark):
    from rasgoql_spark.functions.snapshot import scd2_merge

    bad = spark.createDataFrame([(1, "a")], "k int, val string")
    snap = spark.createDataFrame([(1, "b")], "k int, val string")
    with pytest.raises(ParameterException):
        scd2_merge(bad, snap, keys=["k"], snapshot_value=2)
    hist = spark.createDataFrame(
        [(1, "a", 1, None, 1)],
        "k int, val string, VALID_FROM int, VALID_TO int, IS_CURRENT int",
    )
    with pytest.raises(ParameterException):
        scd2_merge(hist, snap, keys=[], snapshot_value=2)
