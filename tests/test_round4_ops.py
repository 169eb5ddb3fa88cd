"""Round-4 operator tests: winnowing fingerprints, winnow overlap dedup,
interpolated-bigram LM scoring, temperature mixture weights, keep-best
cluster dedup, embedding join."""

import math

import pytest
from pyspark.sql import functions as F

import rasgoql_spark as rql

SF_DIR = "/root/testdata/sf0.001"


def _fp(spark, texts, k=3, window=4):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = rql.get_transform("winnow_fingerprint").apply(df, text="text", k=k, window=window)
    return {r["doc_id"]: set(r["WINNOW_FP"]) for r in out.collect()}


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: documents sharing a token run of length >=
    k + window - 1 share at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens >= 3+4-1
    fps = _fp(spark, [
        f"one two {shared} three four",
        f"nine eight seven {shared} six five",
        "totally different words without any overlap here",
    ])
    assert fps[0] & fps[1], "shared 6-token run must share a fingerprint"
    assert not (fps[0] & fps[2] & fps[1]) or True  # doc 2 unrelated


def test_winnow_edge_cases(spark):
    fps = _fp(spark, ["", "one", "one two", "one two three"])
    assert fps[0] == set()
    # short docs (fewer than k tokens) fingerprint the whole token list
    assert len(fps[1]) == 1 and len(fps[2]) == 1
    assert len(fps[3]) == 1  # exactly one 3-gram -> one hash -> one window


def test_winnow_deterministic_and_scale_free(spark):
    """Same text => same fingerprint set regardless of surrounding rows."""
    a = _fp(spark, ["the quick brown fox jumps over the lazy dog"])
    b = _fp(spark, ["unrelated", "the quick brown fox jumps over the lazy dog"])
    assert a[0] == b[1]


def test_dedup_winnow_finds_planted_overlap(spark):
    passage = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (0, passage + " unique tail zero"),
        (1, "different head one " + passage),
        (2, "completely unrelated content " + " ".join(f"x{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = rql.get_transform("dedup_winnow").apply(
        df, text="text", id_col="doc_id", threshold=0.5
    ).collect()
    got = {(r["ID_A"], r["ID_B"]) for r in pairs}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_dedup_winnow_filter_mode(spark):
    passage = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, passage), (1, passage + " tail"), (2, "unrelated words entirely")],
        "doc_id long, text string")
    kept = rql.get_transform("dedup_winnow").apply(
        df, text="text", id_col="doc_id", threshold=0.5, mode="filter"
    ).select("doc_id").collect()
    ids = {r["doc_id"] for r in kept}
    assert 0 in ids and 2 in ids and 1 not in ids


def test_bigram_logprob_prefers_natural_order(spark):
    """A document whose bigrams match the corpus scores higher than the same
    tokens in a scrambled order the corpus never produces."""
    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    probe = [(100, "the quick brown fox jumps over the lazy dog"),
             (101, "dog the over fox quick lazy jumps brown the")]
    df = spark.createDataFrame(base + probe, "doc_id long, text string")
    out = rql.get_transform("bigram_logprob").apply(df, text="text", id_col="doc_id")
    scores = {r["doc_id"]: r["AVG_BIGRAM_LOGPROB"] for r in out.collect()}
    assert scores[100] > scores[101]


def test_bigram_logprob_short_docs_zero(spark):
    df = spark.createDataFrame(
        [(0, "hello"), (1, ""), (2, "hello world hello world")],
        "doc_id long, text string")
    out = rql.get_transform("bigram_logprob").apply(df, text="text", id_col="doc_id")
    scores = {r["doc_id"]: r["AVG_BIGRAM_LOGPROB"] for r in out.collect()}
    assert scores[0] == 0.0 and scores[1] == 0.0 and scores[2] != 0.0


def test_mixture_weights_properties(session):
    out = session.dataset("documents").mixture_weights(domain="lang", temperature=0.7).df
    rows = out.collect()
    assert abs(sum(r["WEIGHT"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["P"] for r in rows) - 1.0) < 1e-4
    # temperature < 1 boosts rare domains, shrinks dominant ones
    rare = min(rows, key=lambda r: r["P"])
    common = max(rows, key=lambda r: r["P"])
    assert rare["BOOST"] > 1.0 > common["BOOST"]


def test_mixture_weights_size_col(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("b", 80)], "dom string, n long")
    out = rql.get_transform("mixture_weights").apply(
        df, domain="dom", temperature=1.0, size_col="n").collect()
    w = {r["dom"]: r["WEIGHT"] for r in out}
    # T=1 is proportional to token mass, not row count
    assert abs(w["a"] - 0.2) < 1e-6 and abs(w["b"] - 0.8) < 1e-6


def test_dedup_keep_best_keeps_longest(spark):
    near = "the amazing spark engine processes huge data with ease and grace"
    rows = [
        (0, near + " ok"),
        (1, near + " okay"),
        (2, near),
        (3, "entirely different text about something else altogether unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("SCORE", F.length("text").cast("bigint"))
    kept = rql.get_transform("dedup_keep_best").apply(
        df, text="text", id_col="doc_id", score_col="SCORE", threshold=0.3
    ).select("doc_id").collect()
    ids = {r["doc_id"] for r in kept}
    assert 1 in ids and 3 in ids
    assert 0 not in ids and 2 not in ids


def test_embedding_join_matches_similarity_search(session):
    emb = session.dataset("embeddings")
    left = emb.filter(filter_statements=["vec_id >= 450"])
    right = emb.filter(filter_statements=["vec_id < 450"])
    joined = left.embedding_join(
        other=right, vec_col="embedding", id_col="vec_id", k=1).df
    got = {(r["vec_id"], r["MATCH_ID"]) for r in joined.collect()}
    brute = right.similarity_search(
        vec_col="embedding", id_col="vec_id",
        queries=left.df.select("vec_id", "embedding"), k=1).df
    want = {(r["QUERY_ID"], r["MATCH_ID"]) for r in brute.collect()}
    assert got == want
    assert len(got) == left.df.count()


def test_skew_report_values(spark):
    rows = [("a",)] * 8 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    out = rql.get_transform("skew_report").apply(df, keys=["k"], top_k=2).collect()[0]
    assert out["N_ROWS"] == 12 and out["N_KEYS"] == 3
    assert out["MAX_COUNT"] == 8
    assert out["SKEW_RATIO"] == 2.0  # 8 / 4
    assert out["TOP_KEYS"] == "a:8,b:2"  # count desc, key asc tie-break


# ---- property check: Spark winnow vs an independent pure-Python reference --

def _ref_winnow(text, k=3, window=4):
    """Independent reference implementation of robust winnowing over the
    engine's tokenization (lowercase, strip non-alnum, ws-split) and
    md5-derived gram hash — used to property-check the Spark array-expression
    pipeline."""
    import hashlib
    import re

    cleaned = re.sub(r"[^a-z0-9\s]", " ", text.lower()).strip()
    toks = cleaned.split() if cleaned else []
    if not toks:
        return set()
    if len(toks) >= k:
        grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)]
    hashes = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    if len(hashes) > window:
        mins = [min(hashes[p:p + window]) for p in range(len(hashes) - window + 1)]
    else:
        mins = [min(hashes)]
    return set(mins)


def test_winnow_matches_reference_random_docs(spark):
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(60)
    ] + ["", "  ", "!!!", "a b", "x " * 100]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = rql.get_transform("winnow_fingerprint").apply(df, text="text")
    got = {r["doc_id"]: set(r["WINNOW_FP"]) for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_winnow(t), f"doc {i}: {t!r}"


def test_ivf_prebuilt_index_matches_inline(session):
    """The amortized path: searches against a prebuilt ivf_index() must be
    identical to the inline-build search with the same parameters."""
    from rasgoql_spark.functions.similarity import ivf_index, similarity_search_ivf

    emb = session.dataset("embeddings").df
    inline = similarity_search_ivf(
        emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=5).collect()
    idx = ivf_index(emb, "embedding", "vec_id")
    try:
        pre1 = similarity_search_ivf(
            emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=5, index=idx).collect()
        pre2 = similarity_search_ivf(
            emb, "embedding", "vec_id", [5, 6], k=5, index=idx).collect()
    finally:
        idx.release()
    key = lambda r: (r["QUERY_ID"], r["RANK"])
    assert sorted(map(tuple, pre1)) == sorted(map(tuple, inline))
    assert {r["QUERY_ID"] for r in pre2} == {5, 6}


def test_decontaminate_embedding_filter_drops_eval_members(session):
    """Eval members themselves have cosine 1.0 to an eval vector, so filter
    mode must drop at least every eval row (plus true near-dups)."""
    emb = session.dataset("embeddings")
    ev = emb.filter(filter_statements=["vec_id % 50 = 0"])
    kept = emb.decontaminate_embedding(
        vec_col="embedding", id_col="vec_id", eval_table=ev,
        threshold=0.99, mode="filter").df
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    eval_ids = {r["vec_id"] for r in ev.df.select("vec_id").collect()}
    assert not (kept_ids & eval_ids)
    assert len(kept_ids) > 0


def test_decontaminate_embedding_plan_broadcasts_eval(session):
    emb = session.dataset("embeddings")
    ev = emb.filter(filter_statements=["vec_id % 50 = 0"])
    chain = emb.decontaminate_embedding(
        vec_col="embedding", id_col="vec_id", eval_table=ev)
    plan = chain.explain("formatted")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_winnow_rejects_bad_params(spark):
    from rasgoql_spark.errors import ParameterException

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ParameterException):
        rql.get_transform("winnow_fingerprint").apply(df, text="text", k=0)
    with pytest.raises(ParameterException):
        rql.get_transform("dedup_winnow").apply(
            df, text="text", id_col="doc_id", window=0)


def test_skew_report_empty_input(spark):
    df = spark.createDataFrame([], "k string")
    out = rql.get_transform("skew_report").apply(df, keys=["k"]).collect()[0]
    assert out["N_ROWS"] == 0 and out["N_KEYS"] == 0
    assert out["MAX_COUNT"] == 0 and out["SKEW_RATIO"] == 0.0
    assert out["TOP_KEYS"] == ""


def test_bigram_logprob_matches_reference(spark):
    """Cross-check the distributed bigram LM against an independent
    pure-Python implementation on a small corpus."""
    import math
    import re
    from collections import Counter

    texts = {
        0: "the cat sat on the mat",
        1: "the dog sat on the log",
        2: "cat and dog and cat",
        3: "completely novel words here",
        4: "the",
        5: "",
    }

    def toks(t):
        c = re.sub(r"[^a-z0-9\s]", " ", t.lower()).strip()
        return c.split() if c else []

    uni = Counter()
    bi = Counter()
    for t in texts.values():
        w = toks(t)
        uni.update(w)
        bi.update(zip(w, w[1:]))
    N, V = sum(uni.values()), len(uni)
    lam, alpha = 0.7, 1.0

    def score(t):
        w = toks(t)
        if len(w) < 2:
            return 0.0
        lps = []
        for a, b in zip(w, w[1:]):
            p_bi = (bi.get((a, b), 0) + alpha) / (uni.get(a, 0) + alpha * (V + 1))
            p_un = (uni.get(b, 0) + alpha) / (N + alpha * (V + 1))
            lps.append(math.log(lam * p_bi + (1 - lam) * p_un))
        return round(sum(lps) / len(lps), 6)

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = rql.get_transform("bigram_logprob").apply(df, text="text", id_col="doc_id")
    got = {r["doc_id"]: r["AVG_BIGRAM_LOGPROB"] for r in out.collect()}
    for i, t in texts.items():
        assert abs(got[i] - score(t)) < 1e-6, (i, got[i], score(t))


def test_quantiles_approx_close_to_exact(session):
    exact = session.dataset("lineitem").quantiles(
        column="l_extendedprice", probs=(0.5,), group_by=["l_returnflag"]).df
    approx = session.dataset("lineitem").quantiles(
        column="l_extendedprice", probs=(0.5,), group_by=["l_returnflag"],
        approx=True).df
    e = {r["l_returnflag"]: r["L_EXTENDEDPRICE_Q50"] for r in exact.collect()}
    a = {r["l_returnflag"]: r["L_EXTENDEDPRICE_Q50"] for r in approx.collect()}
    for k in e:
        assert abs(a[k] - e[k]) / max(abs(e[k]), 1) < 0.05


def test_round4_ops_tolerate_null_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "real text here")], "doc_id long, text string")
    fp = rql.get_transform("winnow_fingerprint").apply(df, text="text").collect()
    by_id = {r["doc_id"]: r for r in fp}
    assert by_id[0]["WINNOW_FP"] == [] and by_id[0]["N_FP"] == 0
    assert by_id[1]["N_FP"] >= 1

    lp = rql.get_transform("bigram_logprob").apply(
        df, text="text", id_col="doc_id").collect()
    scores = {r["doc_id"]: r["AVG_BIGRAM_LOGPROB"] for r in lp}
    assert scores[0] == 0.0 and scores[1] != 0.0

    tn = rql.get_transform("text_normalize").apply(df, text="text").collect()
    vals = {r["doc_id"]: r["TEXT_NORM"] for r in tn}
    assert vals[0] is None and vals[1] == "real text here"

    pairs = rql.get_transform("dedup_winnow").apply(
        df, text="text", id_col="doc_id").collect()
    assert pairs == []


def test_round4_late_ops_tolerate_null_text(spark):
    """NULL text/keys must not crash or corrupt the late round-4 ops."""
    docs = spark.createDataFrame(
        [(0, None, "A"), (1, "real text here", "A"), (2, "other words", "B")],
        "doc_id long, text string, source string")

    # bloom dedup: NULL-text rows have NULL fingerprints -> never matched,
    # always survive
    ref = docs.filter("doc_id = 1")
    out = rql.get_transform("dedup_against_bloom").apply(
        docs, text="text", id_col="doc_id", reference=ref, bits_log2=12)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 2]

    # source_overlap: NULL fingerprints never count as shared content
    ov = rql.get_transform("source_overlap").apply(
        docs, text="text", group_col="source")
    assert ov.count() == 0

    # fuzzy_join: NULL names drop out of the block join
    other = spark.createDataFrame(
        [(10, "real text hero")], "rid long, text string")
    fj = rql.get_transform("fuzzy_join").apply(
        docs, join_table=other, column="text", max_distance=2)
    assert sorted(r["doc_id"] for r in fj.collect()) == [1]

    # json_flatten: NULL payloads yield NULL columns
    ev = spark.createDataFrame(
        [(0, None), (1, '{"k": 7}')], "event_id long, props string")
    fl = rql.get_transform("json_flatten").apply(
        ev, column="props", keys=["k"], types={"k": "int"})
    vals = {r["event_id"]: r["K"] for r in fl.collect()}
    assert vals[0] is None and vals[1] == 7


def test_dedup_soft_weights_inverse_cluster_size(spark):
    """SoftDeDup reweighting (round 13): every row survives; members of
    an n-way near-dup cluster carry SAMPLE_WEIGHT 1/n, unique docs 1.0;
    power sharpens the penalty."""
    near = "the amazing spark engine processes huge data with ease and grace"
    rows = [
        (0, near + " ok"),
        (1, near + " okay"),
        (2, near),
        (3, "entirely different text about something else altogether unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rql.get_transform("dedup_soft").apply(
        df, text="text", id_col="doc_id", threshold=0.3).collect()
    assert len(out) == 4                          # nothing deleted
    got = {r["doc_id"]: (r["CLUSTER_ID"], r["DUP_COUNT"], r["SAMPLE_WEIGHT"])
           for r in out}
    assert got[0] == (0, 3, round(1 / 3, 6))
    assert got[1] == (0, 3, round(1 / 3, 6))
    assert got[2] == (0, 3, round(1 / 3, 6))
    assert got[3] == (3, 1, 1.0)
    out2 = rql.get_transform("dedup_soft").apply(
        df, text="text", id_col="doc_id", threshold=0.3, power=2.0).collect()
    got2 = {r["doc_id"]: r["SAMPLE_WEIGHT"] for r in out2}
    assert got2[0] == round(1 / 9, 6) and got2[3] == 1.0
    with pytest.raises(rql.ParameterException):
        rql.get_transform("dedup_soft").apply(
            df, text="text", id_col="doc_id", power=0)
