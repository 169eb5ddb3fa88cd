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


def test_resolve_k_and_nprobe_auto():
    from rasgoql_spark.functions.similarity import _resolve_k, _resolve_nprobe

    assert _resolve_k("auto", 500) == 23          # ceil(sqrt(500))
    assert _resolve_k("auto", 10) == 8            # floor at 8
    assert _resolve_k("auto", 100_000) == 317     # > 256 -> broadcast path
    assert _resolve_k(16, 10**9) == 16            # explicit wins
    assert _resolve_nprobe("auto", 23) == 5       # ceil(sqrt(23))
    assert _resolve_nprobe("auto", 8) == 4        # floor at 4
    assert _resolve_nprobe("auto", 2) == 2        # never exceeds k
    assert _resolve_nprobe(4, 1000) == 4
    import pytest as _pt

    from rasgoql_spark.errors import ParameterException
    with _pt.raises(ParameterException):
        _resolve_k("australia", 10)
    with _pt.raises(ParameterException):
        _resolve_nprobe(0, 10)


def test_ivf_auto_k_above_256_plan_bounded(spark):
    """num_centroids='auto' on a 70k corpus resolves to 265 (> 256), which
    must ride the one-row-broadcast centroid attachment: analyzed plan O(1)
    in k, job completes, assignments span well past 256 lists."""
    from pyspark.sql import functions as F

    emb = spark.range(70_000).select(
        F.col("id").alias("vec_id"),
        F.array((F.col("id") % 97).cast("double"),
                (F.col("id") % 89).cast("double"),
                (F.col("id") % 83).cast("double"),
                F.lit(1.0)).alias("embedding"))
    out = rql.get_transform("build_ivf_index").apply(
        emb, vec_col="embedding", id_col="vec_id", iterations=0)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    # literal path would embed one struct(c, v) per centroid -> ~265 hits
    assert analyzed.count("named_struct") < 50, analyzed.count("named_struct")
    dist = out.select("CENTROID_ID").distinct().count()
    assert dist > 150, dist


def test_ivf_candidate_join_aqe_skew_splittable(spark):
    """Hot inverted lists (dense embedding regions) are IVF's natural skew.
    The CENTROID_ID candidate join ships unhinted, so when sizes force a
    shuffle join AQE's OptimizeSkewedJoin must be able to split the hot
    list's partition — asserted via skew=true in the FINAL adaptive plan
    over a corpus with ~95% of vectors in one dense region."""
    from pyspark.sql import functions as F

    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.shuffle.partitions",
    )}
    try:
        # enough map partitions that the hot list's reducer stands out from
        # the median (at 4, AQE prefers coalescing over splitting)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # simulate "probe side too big to broadcast" + scale down AQE's
        # size thresholds to this fixture's bytes
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1k")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        corpus = spark.range(20_000).select(
            F.col("id").alias("vec_id"),
            F.when(F.col("id") % 20 != 0,
                   F.array(F.lit(1.0),
                           F.lit(0.01) * (F.col("id") % 7).cast("double"),
                           F.lit(0.0), F.lit(0.0)))
             .otherwise(F.array(F.lit(0.0), F.lit(0.0), F.lit(1.0),
                                (F.col("id") % 5).cast("double") * F.lit(0.01)))
             .alias("embedding"))
        queries = spark.range(100_000, 100_040).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(0.005), F.lit(0.0), F.lit(0.0))
             .alias("embedding"))
        out = rql.get_transform("embedding_join_ivf").apply(
            queries, vec_col="embedding", id_col="vec_id", other=corpus,
            k=1, num_centroids=8, nprobe=2)
        rows = out.collect()  # collect (not count) finalizes THIS df's plan
        assert len(rows) == 40
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_filter_mode_filters_rows_not_edges(spark):
    """r7 regression fix: dedup_ngram_jaccard / dedup_simhash mode='filter'
    used to fall through _expand_collapsed and return the EDGE LIST; it must
    return the input rows minus near-dups of smaller ids (dedup_minhash's
    long-standing contract)."""
    rows = [(1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "completely different text about engines")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for transform, kw in (("dedup_ngram_jaccard", {"threshold": 0.5}),
                          ("dedup_simhash", {"hamming_threshold": 0})):
        out = rql.get_transform(transform).apply(
            df, text="text", id_col="doc_id", mode="filter", **kw)
        assert set(out.columns) == {"doc_id", "text"}, transform
        assert {r["doc_id"] for r in out.collect()} == {1, 3}, transform


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


def test_shared_cache_entry_survives_first_release(spark):
    """r7 fix: Spark's CacheManager matches cached plans by CANONICALIZED
    form, so two invocations of the same operator on the same input share
    one cache entry — and an un-refcounted unpersist from the first
    result's GC finalizer would evict the entry mid-flight for the second
    (measured 22 s -> 165 s on the boilerplate stress). scoped_persist /
    release_now refcount by semanticHash: the entry must survive until the
    LAST user releases."""
    import gc
    import time

    sc = spark.sparkContext

    def settle(target, timeout=15.0):
        deadline = time.time() + timeout
        while True:
            gc.collect()
            cur = len(sc._jsc.getPersistentRDDs())
            if cur == target or time.time() > deadline:
                return cur
            time.sleep(0.1)

    before = settle(len(sc._jsc.getPersistentRDDs()))
    rows = [(i, f"token{i} alpha beta gamma delta epsilon zeta") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    jac = rql.get_transform("dedup_ngram_jaccard").apply
    out1 = jac(df, text="text", id_col="doc_id", threshold=0.5)
    out1.count()
    out2 = jac(df, text="text", id_col="doc_id", threshold=0.5)
    out2.count()
    with_caches = len(sc._jsc.getPersistentRDDs())
    assert with_caches > before
    del out1
    # first release must NOT evict the entry the second result still uses
    # (short settle: the count is EXPECTED to stay put, so don't wait long)
    assert settle(before, timeout=2.0) == with_caches
    assert out2.count() >= 0  # still collectable off the live cache
    del out2
    assert settle(before) == before  # last release frees it


def test_dedup_embedding_filter_mode_filters_rows(spark):
    """r7: dedup_embedding mode='filter' had the same fell-through-to-edges
    bug as dedup_ngram_jaccard — it must return input rows minus embedding
    near-dups of smaller ids."""
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.001, 0.0]),
            (3, [0.0, 1.0, 0.0]), (4, [1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = rql.get_transform("dedup_embedding").apply(
        df, vec_col="embedding", id_col="vec_id", threshold=0.95,
        method="brute", mode="filter")
    assert set(out.columns) == {"vec_id", "embedding"}
    assert {r["vec_id"] for r in out.collect()} == {1, 3}


def test_minhash_tune_s_curve():
    """Banding chosen by weighted FP/FN area under the public S-curve
    1-(1-s^r)^b; spot values against hand computation."""
    got = rql.minhash_tune(0.5, 16)
    assert (got["bands"], got["rows_per_band"]) == (4, 4)
    assert abs(got["knee"] - 0.707107) < 1e-6
    # a high threshold wants more rows per band (sharper curve, knee higher)
    high = rql.minhash_tune(0.9, 16)
    assert high["rows_per_band"] > got["rows_per_band"]
    # penalizing false negatives pushes toward more bands (higher recall)
    recall = rql.minhash_tune(0.5, 16, false_negative_weight=10.0)
    assert recall["bands"] >= got["bands"]
    import pytest as _pt
    from rasgoql_spark.errors import ParameterException
    with _pt.raises(ParameterException):
        rql.minhash_tune(1.5)
