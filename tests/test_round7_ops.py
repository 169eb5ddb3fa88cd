"""Round-7 operator tests: posting document-frequency cap (max_doc_freq)
for the exact inverted-index dedup family, its recall contract, and the
empty-group intra-pair fix (plain path and collapse path must agree)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

import rasgoql_spark as rql


@pytest.fixture()
def boilerplate_docs(spark):
    """10 DISTINCT docs whose only shared shingle is hot boilerplate
    ('terms of service', df=10) + one genuine near-dup pair sharing a rare
    shingle (df=2)."""
    rows = [(i, f"u{i}a u{i}b terms of service") for i in range(10)]
    rows += [(11, "v11 rare shingle here"), (12, "v12 rare shingle here")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairs(df, transform, **kw):
    out = rql.get_transform(transform).apply(
        df, text="text", id_col="doc_id", **kw)
    return {(r["ID_A"], r["ID_B"]) for r in out.collect()}


def test_max_doc_freq_drops_boilerplate_only_pairs(boilerplate_docs):
    # uncapped: every pair of the 10 boilerplate docs is a candidate and
    # passes a tiny threshold via the shared hot shingle
    unc = _pairs(boilerplate_docs, "dedup_ngram_jaccard",
                 threshold=0.01, max_doc_freq=None)
    assert (0, 1) in unc and (11, 12) in unc
    # capped at 3: the df=10 posting drops; pairs with ONLY boilerplate
    # evidence disappear, the rare-shingle pair (df=2) survives
    cap = _pairs(boilerplate_docs, "dedup_ngram_jaccard",
                 threshold=0.01, max_doc_freq=3)
    assert (11, 12) in cap
    assert all(a >= 10 for a, _ in cap), cap


def test_max_doc_freq_containment_same_contract(boilerplate_docs):
    unc = _pairs(boilerplate_docs, "ngram_containment",
                 threshold=0.1, max_doc_freq=None)
    assert (0, 1) in unc
    cap = _pairs(boilerplate_docs, "ngram_containment",
                 threshold=0.1, max_doc_freq=3)
    assert (11, 12) in cap
    assert all(a >= 10 for a, _ in cap), cap


def test_df_counts_distinct_sets_not_rows(spark, monkeypatch):
    """20 exact copies contribute ONE distinct shingle set, so their
    shingles have df=1 — even max_doc_freq=1 must keep the copies pairing
    (jaccard 1.0 intra pairs), on both the plain and collapse paths."""
    import rasgoql_spark.functions.dedup as dd

    rows = [(i, "xx yy zz ww") for i in range(100, 120)]
    rows += [(1, "totally different content entirely")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    expect = {(a, b) for a in range(100, 120) for b in range(a + 1, 120)}

    got_plain = _pairs(df, "dedup_ngram_jaccard", threshold=0.5, max_doc_freq=1)
    # 20 copies > COLLAPSE_MIN_GROUP(16) -> this already took the collapse
    # path; force the plain path too and compare
    monkeypatch.setattr(dd, "COLLAPSE_MIN_GROUP", 1000)
    got_forced_plain = _pairs(df, "dedup_ngram_jaccard", threshold=0.5, max_doc_freq=1)
    assert got_plain == expect
    assert got_forced_plain == expect


def test_capped_collapse_path_matches_plain_path(spark, monkeypatch):
    """With a biting cap, forcing the collapse must not change results —
    the liveness rule (intra pairs only for groups with >=1 surviving
    posting) is the collapse-side mirror of 'a pair needs a live posting'."""
    import rasgoql_spark.functions.dedup as dd

    # 6 distinct docs ending in boilerplate + 2 exact copies of the PURE
    # boilerplate doc: 'terms of service' has df=7 distinct sets > cap=3,
    # so the copies' group owns no live posting and must emit NO pairs —
    # not even its intra pair (plain path: only shared shingle is dropped)
    rows = [(i, f"w{i}x w{i}y terms of service") for i in range(6)]
    rows += [(10, "terms of service"), (11, "terms of service")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def run():
        return _pairs(df, "dedup_ngram_jaccard", threshold=0.01, max_doc_freq=3)

    plain = run()
    monkeypatch.setattr(dd, "COLLAPSE_MIN_GROUP", 1)
    collapsed = run()
    assert plain == collapsed == set()

    def run_cont():
        return _pairs(df, "ngram_containment", threshold=0.01, max_doc_freq=3)

    monkeypatch.setattr(dd, "COLLAPSE_MIN_GROUP", 1000)
    plain_c = run_cont()
    monkeypatch.setattr(dd, "COLLAPSE_MIN_GROUP", 1)
    collapsed_c = run_cont()
    assert plain_c == collapsed_c == set()


def test_live_group_keeps_intra_pairs_under_cap(spark, monkeypatch):
    """A duplicate group that still owns a live posting keeps its intra
    pairs under the cap (collapse path)."""
    import rasgoql_spark.functions.dedup as dd

    # copies share rare shingles (df=1) -> live under any cap
    rows = [(1, "unique alpha beta gamma"), (2, "unique alpha beta gamma")]
    rows += [(9, "other content about engines")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(dd, "COLLAPSE_MIN_GROUP", 1)
    assert (1, 2) in _pairs(df, "dedup_ngram_jaccard", threshold=0.5, max_doc_freq=1)
    assert (1, 2) in _pairs(df, "ngram_containment", threshold=0.5, max_doc_freq=1)


def test_empty_docs_never_pair_even_at_zero_threshold(spark, monkeypatch):
    """ADVICE r6: empty shingle sets own no posting, so the plain path can
    never pair two empty docs — the collapse path must not either, even at
    threshold 0.0 (where the 0.0 intra score would pass the filter)."""
    import rasgoql_spark.functions.dedup as dd

    rows = [(1, "!!!"), (2, "???"), (3, "real content words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(dd, "COLLAPSE_MIN_GROUP", 1)
    for transform in ("dedup_ngram_jaccard", "ngram_containment"):
        got = _pairs(df, transform, threshold=0.0)
        assert (1, 2) not in got, (transform, got)
