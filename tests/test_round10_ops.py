"""Round-10 additions: embedding_join_ivfpq (the ANN join at PQ memory
footprint — judge task r9→r10 #1) and the _cid_barrier constraint-
propagation fix that keeps expression-keyed candidate joins plan-valid
under scoped-cache eviction."""

import gc

import pytest
from pyspark.sql import functions as F

from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.pq import (
    embedding_join_ivfpq,
    ivfpq_index,
)
from rasgoql_spark.functions.similarity import (
    dedup_against_embedding,
    embedding_join,
    ivf_index,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_join_ivfpq_degenerate_pq_equals_brute(emb):
    """With codebook_size >= |right| and iterations=0, PQ reconstruction is
    exact, and at full probe the ADC join equals the brute embedding_join
    bit-for-bit (same ids, same scores, same ranks) — pins the whole
    probe+ADC+top-k pipeline to the exact baseline."""
    left = emb.filter("vec_id >= 480")
    right = emb.filter("vec_id < 40")
    approx = embedding_join_ivfpq(
        left, "embedding", "vec_id", other=right, k=3,
        num_centroids=4, nprobe=4, m=4, codebook_size=40, iterations=0,
    )
    brute = embedding_join(
        left, other=right, vec_col="embedding", id_col="vec_id", k=3,
    )
    cols = ["vec_id", "MATCH_ID", "COSINE", "RANK"]
    a = sorted(map(tuple, approx.select(*cols).collect()))
    b = sorted(map(tuple, brute.select(*cols).collect()))
    assert a and a == b


def test_join_ivfpq_prebuilt_matches_inline(emb):
    left = emb.filter("vec_id >= 450")
    right = emb.filter("vec_id < 450")
    inline = embedding_join_ivfpq(
        left, "embedding", "vec_id", other=right, k=2, num_centroids=8,
        nprobe=3, m=8, codebook_size=16, iterations=0,
    )
    idx = ivfpq_index(
        right, "embedding", "vec_id", num_centroids=8, coarse_iterations=1,
        m=8, codebook_size=16, iterations=0,
    )
    pre = embedding_join_ivfpq(
        left, "embedding", "vec_id", k=2, nprobe=3, index=idx,
    )
    cols = ["vec_id", "MATCH_ID", "COSINE", "RANK"]
    a = sorted(map(tuple, inline.select(*cols).collect()))
    b = sorted(map(tuple, pre.select(*cols).collect()))
    assert a and a == b
    idx.release()


def test_join_ivfpq_residual_inline_matches_prebuilt(emb):
    left = emb.filter("vec_id >= 450")
    right = emb.filter("vec_id < 450")
    kw = dict(num_centroids=8, coarse_iterations=1, m=8,
              codebook_size=16, iterations=0)
    inline = embedding_join_ivfpq(
        left, "embedding", "vec_id", other=right, k=2, nprobe=3,
        residual=True, num_centroids=8, m=8, codebook_size=16, iterations=0,
    )
    idx = ivfpq_index(right, "embedding", "vec_id", residual=True, **kw)
    pre = embedding_join_ivfpq(
        left, "embedding", "vec_id", k=2, nprobe=3, index=idx,
    )
    cols = ["vec_id", "MATCH_ID", "COSINE", "RANK"]
    a = sorted(map(tuple, inline.select(*cols).collect()))
    b = sorted(map(tuple, pre.select(*cols).collect()))
    assert a and a == b
    idx.release()


def test_join_ivfpq_appends_left_columns_and_excludes_self(emb):
    """embedding_join contract: left columns pass through, appended columns
    are {prefix}ID/COSINE/RANK, self-id matches never appear (single-
    namespace rule) — here left and right OVERLAP so the rule bites."""
    left = emb.filter("vec_id < 100")
    out = embedding_join_ivfpq(
        left, "embedding", "vec_id", other=emb, k=2, num_centroids=8,
        nprobe=8, m=8, codebook_size=16, iterations=0, right_prefix="NBR_",
    )
    assert out.columns == left.columns + ["NBR_ID", "COSINE", "RANK"]
    assert out.filter(F.col("vec_id") == F.col("NBR_ID")).count() == 0
    per = out.groupBy("vec_id").count().agg(F.max("count")).first()[0]
    assert per <= 2


def test_join_ivfpq_guards(emb):
    left = emb.filter("vec_id >= 450")
    right = emb.filter("vec_id < 450")
    with pytest.raises(ParameterException, match="k must be"):
        embedding_join_ivfpq(left, "embedding", "vec_id", other=right, k=0)
    with pytest.raises(ParameterException, match="needs a right-side"):
        embedding_join_ivfpq(left, "embedding", "vec_id")
    with pytest.raises(ParameterException, match="takes an IVFPQIndex"):
        embedding_join_ivfpq(
            left, "embedding", "vec_id",
            index=ivf_index(right.limit(50), "embedding", "vec_id",
                            num_centroids=4))
    idx = ivfpq_index(right, "embedding", "vec_id", num_centroids=4,
                      m=8, codebook_size=8, iterations=0)
    # staleness fingerprint when both other and index are passed
    with pytest.raises(ParameterException, match="fold the new vectors"):
        embedding_join_ivfpq(
            left, "embedding", "vec_id", other=right.limit(10), index=idx)
    # dim guard: a 48-dim left side must be rejected, not silently joinless
    short = left.withColumn("embedding", F.slice("embedding", 1, 48))
    with pytest.raises(ParameterException, match="dim 48"):
        embedding_join_ivfpq(short, "embedding", "vec_id", index=idx)
    idx.release()


def test_join_ivfpq_renderer_parity(emb, spark):
    """The rendered SQL reproduces the executed rows exactly, plain AND
    residual — the inline fit keeps the full rounded replay contract."""
    from rasgoql_spark.functions.pq import _r_embedding_join_ivfpq

    emb.createOrReplaceTempView("__r10_ejq")
    left = emb.filter("vec_id >= 250")
    right = emb.filter("vec_id < 250")
    cols = ["vec_id", "label", "MATCH_ID", "COSINE", "RANK"]
    for res in (False, True):
        df = embedding_join_ivfpq(
            left, "embedding", "vec_id", other=right, k=2, num_centroids=8,
            nprobe=3, m=8, codebook_size=16, iterations=0, residual=res,
        ).select(*cols)
        sql = _r_embedding_join_ivfpq(
            "(SELECT * FROM __r10_ejq WHERE vec_id >= 250)", "embedding",
            "vec_id", other="(SELECT * FROM __r10_ejq WHERE vec_id < 250)",
            k=2, num_centroids=8, nprobe=3, m=8, codebook_size=16,
            iterations=0, residual=res)
        got = sorted(map(tuple, spark.sql(sql).select(*cols).collect()))
        assert got == sorted(map(tuple, df.collect()))
    from rasgoql_spark.errors import TransformRenderingException

    with pytest.raises(TransformRenderingException, match="right-side"):
        _r_embedding_join_ivfpq("t", "embedding", "vec_id")
    with pytest.raises(TransformRenderingException, match="auto sizing"):
        _r_embedding_join_ivfpq("t", "embedding", "vec_id", other="r",
                                num_centroids="auto")


def test_rotation_matrix_is_orthogonal_and_deterministic():
    """The closed-form Givens composition is orthogonal to within the
    9-dp entry rounding and regenerates identically from its spec."""
    import numpy as np

    from rasgoql_spark.functions.pq import rotation_matrix

    r = np.array(rotation_matrix(7, 64, 4))
    assert float(np.abs(r @ r.T - np.eye(64)).max()) < 1e-7
    assert rotation_matrix(7, 64, 4) == rotation_matrix(7, 64, 4)
    assert rotation_matrix(8, 64, 4) != rotation_matrix(7, 64, 4)
    with pytest.raises(ParameterException, match="sweeps"):
        rotation_matrix(7, 64, 0)


def test_rotated_ivfpq_inline_prebuilt_loaded_update(emb, spark, tmp_path):
    """rotate=True composes with the whole index lifecycle: inline ==
    prebuilt == save/load roundtrip; update_ivfpq_index re-encodes a
    duplicate vector identically (the batch side replays the build-time
    rotation); rotation_dim validates against the data."""
    from rasgoql_spark.functions.pq import (
        load_ivfpq_index,
        save_ivfpq_index,
        similarity_search_ivfpq,
        update_ivfpq_index,
    )

    kw = dict(num_centroids=8, coarse_iterations=1, m=8, codebook_size=16,
              iterations=0)
    inline = similarity_search_ivfpq(
        emb, "embedding", "vec_id", [0, 1, 2], k=10, nprobe=3,
        rotate=True, rotation_seed=7, **kw)
    rows = sorted(map(tuple, inline.collect()))
    idx = ivfpq_index(emb, "embedding", "vec_id", rotate=True,
                      rotation_seed=7, **kw)
    pre = similarity_search_ivfpq(
        emb, "embedding", "vec_id", [0, 1, 2], k=10, nprobe=3, index=idx)
    assert sorted(map(tuple, pre.collect())) == rows
    save_ivfpq_index(idx, str(tmp_path / "ridx"))
    loaded = load_ivfpq_index(spark, str(tmp_path / "ridx"))
    assert loaded.rotation == idx.rotation
    post = similarity_search_ivfpq(
        emb, "embedding", "vec_id", [0, 1, 2], k=10, nprobe=3, index=loaded)
    assert sorted(map(tuple, post.collect())) == rows
    # update: a duplicate vector under a new id must get the same
    # (cid, codes) as its original — proves the batch rotation replays
    dup = emb.filter("vec_id < 3").withColumn(
        "vec_id", F.col("vec_id") + 10000)
    upd = update_ivfpq_index(idx, dup, "embedding", "vec_id")
    got = {int(r["__id"]): (int(r["__cid"]), tuple(r["__codes"]))
           for r in upd.frame.filter("__id < 3 OR __id >= 10000").collect()}
    for q in range(3):
        assert got[q] == got[q + 10000]
    with pytest.raises(ParameterException, match="rotation_dim=5"):
        ivfpq_index(emb, "embedding", "vec_id", rotate=True,
                    rotation_dim=5, **kw)
    upd.release()
    idx.release()
    loaded.release()


def test_rotated_renderers_and_dim_guard(emb, spark):
    """rotate=True keeps the full replay contract: rendered SQL ==
    executed rows for the rotated search (plain + residual) and the
    rotated join; renderers require explicit rotation_dim."""
    from rasgoql_spark.errors import TransformRenderingException
    from rasgoql_spark.functions.pq import (
        _r_embedding_join_ivfpq,
        _r_similarity_search_ivfpq,
        similarity_search_ivfpq,
    )

    emb.createOrReplaceTempView("__r10_rot")
    kw = dict(num_centroids=8, nprobe=3, m=8, codebook_size=16, iterations=0)
    for res in (False, True):
        df = similarity_search_ivfpq(
            emb, "embedding", "vec_id", [0, 1, 2], k=10, rotate=True,
            rotation_seed=7, residual=res, **kw)
        sql = _r_similarity_search_ivfpq(
            "__r10_rot", "embedding", "vec_id", [0, 1, 2], k=10,
            rotate=True, rotation_seed=7, rotation_dim=64, residual=res,
            **kw)
        assert sorted(map(tuple, spark.sql(sql).collect())) == sorted(
            map(tuple, df.collect()))
    jdf = embedding_join_ivfpq(
        emb.filter("vec_id >= 250"), "embedding", "vec_id",
        other=emb.filter("vec_id < 250"), k=2, rotate=True,
        rotation_seed=7, **kw)
    jsql = _r_embedding_join_ivfpq(
        "(SELECT * FROM __r10_rot WHERE vec_id >= 250)", "embedding",
        "vec_id", other="(SELECT * FROM __r10_rot WHERE vec_id < 250)",
        k=2, rotate=True, rotation_seed=7, rotation_dim=64, **kw)
    cols = ["vec_id", "label", "MATCH_ID", "COSINE", "RANK"]
    assert sorted(map(tuple, spark.sql(jsql).select(*cols).collect())) == \
        sorted(map(tuple, jdf.select(*cols).collect()))
    with pytest.raises(TransformRenderingException, match="rotation_dim"):
        _r_similarity_search_ivfpq(
            "__r10_rot", "embedding", "vec_id", [0], rotate=True)
    with pytest.raises(TransformRenderingException, match="rotation_dim"):
        _r_embedding_join_ivfpq(
            "t", "embedding", "vec_id", other="r", rotate=True)


def test_similarity_search_binary_prebuilt_matches_inline(emb, spark):
    """Round 10 (judge task #6 prerequisite): similarity_search_binary
    gains the prebuilt-index regime — the Hamming scan reads the stored
    8-byte signatures instead of re-packing full vectors per call.
    Results must equal the inline path exactly, with and without the
    exact-cosine rerank stage; guards mirror the family's contracts."""
    from rasgoql_spark.functions.similarity import (
        binary_index,
        similarity_search_binary,
    )

    idx = binary_index(emb, "embedding", "vec_id")
    for kw in (dict(), dict(rerank=True, rerank_factor=4)):
        inline = similarity_search_binary(
            emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=10, **kw)
        pre = similarity_search_binary(
            emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=10, index=idx,
            **kw)
        assert sorted(map(tuple, inline.collect())) == sorted(
            map(tuple, pre.collect()))
    with pytest.raises(ParameterException, match="takes a BinaryIndex"):
        similarity_search_binary(
            emb, "embedding", "vec_id", [0], index=object())
    with pytest.raises(ParameterException, match="built with 2"):
        similarity_search_binary(
            emb, "embedding", "vec_id", [0], index=idx, n_words=5)
    short = emb.withColumn("embedding", F.slice("embedding", 1, 48))
    with pytest.raises(ParameterException, match="dim 48"):
        similarity_search_binary(
            short, "embedding", "vec_id", [0], index=idx)
    from rasgoql_spark.errors import TransformRenderingException
    from rasgoql_spark.functions.similarity import (
        _r_similarity_search_binary,
    )

    with pytest.raises(TransformRenderingException, match="inline packing"):
        _r_similarity_search_binary(
            "t", "embedding", "vec_id", [0], n_words=2, index=idx)
    idx.release()


def test_embedding_join_binary_banded_equals_all_pairs(emb, spark):
    """The pigeonhole exactness pin: the nibble-band candidate join must
    reproduce the all-pairs Hamming join bit-for-bit at the threshold
    (recall is EXACT, not probabilistic) — verified against a brute
    crossJoin reference built from binary_quantize signatures."""
    from rasgoql_spark.functions.similarity import (
        binary_quantize,
        embedding_join_binary,
    )

    left = emb.filter("vec_id >= 250")
    right = emb.filter("vec_id < 250")
    out = embedding_join_binary(
        left, "embedding", "vec_id", other=right, k=3, max_hamming=15)
    got = sorted((r["vec_id"], r["MATCH_ID"], r["HAMMING"], r["RANK"])
                 for r in out.collect())
    packed = {r["vec_id"]: list(r["SIGN_BITS"]) for r in binary_quantize(
        emb, "embedding", "vec_id").select("vec_id", "SIGN_BITS").collect()}
    byq: dict = {}
    for q in packed:
        if q < 250:
            continue
        cands = sorted(
            (sum(bin(a ^ b).count("1")
                 for a, b in zip(packed[q], packed[c])), c)
            for c in packed if c < 250 and c != q
        )
        byq[q] = [(q, c, h, rk + 1) for rk, (h, c) in enumerate(cands)
                  if h <= 15][:3]
    expect = sorted(t for rows in byq.values() for t in rows)
    assert got == expect and got  # non-empty by the planted near-dups


def test_embedding_join_binary_prebuilt_rerank_and_guards(emb, spark):
    from rasgoql_spark.functions.similarity import (
        binary_index,
        embedding_join_binary,
    )

    left = emb.filter("vec_id >= 250")
    right = emb.filter("vec_id < 250")
    cols = ["vec_id", "label", "MATCH_ID", "HAMMING", "RANK"]
    inline = embedding_join_binary(
        left, "embedding", "vec_id", other=right, k=3, max_hamming=15)
    idx = binary_index(right, "embedding", "vec_id")
    pre = embedding_join_binary(
        left, "embedding", "vec_id", k=3, max_hamming=15, index=idx)
    assert sorted(map(tuple, inline.select(*cols).collect())) == \
        sorted(map(tuple, pre.select(*cols).collect()))
    assert inline.columns == left.columns + ["MATCH_ID", "HAMMING", "RANK"]
    # rerank returns COSINE and never exceeds k rows per left id
    rr = embedding_join_binary(
        left, "embedding", "vec_id", other=right, k=3, max_hamming=15,
        rerank=True, rerank_factor=2)
    assert rr.columns == left.columns + ["MATCH_ID", "COSINE", "RANK"]
    assert rr.filter(F.col("RANK") > 3).count() == 0
    with pytest.raises(ParameterException, match="needs a right-side"):
        embedding_join_binary(left, "embedding", "vec_id")
    with pytest.raises(ParameterException, match="signatures only"):
        embedding_join_binary(
            left, "embedding", "vec_id", index=idx, rerank=True)
    with pytest.raises(ParameterException, match="bands"):
        embedding_join_binary(
            left, "embedding", "vec_id", other=right, max_hamming=16)
    with pytest.raises(ParameterException, match="pack to 2 words"):
        embedding_join_binary(
            left, "embedding", "vec_id", other=right, n_words=5)
    with pytest.raises(ParameterException, match="fold the new"):
        embedding_join_binary(
            left, "embedding", "vec_id", other=right.limit(10), index=idx)
    idx.release()


def test_embedding_join_binary_renderer_parity(emb, spark):
    from rasgoql_spark.errors import TransformRenderingException
    from rasgoql_spark.functions.similarity import (
        _r_embedding_join_binary,
        embedding_join_binary,
    )

    emb.createOrReplaceTempView("__r10_ejb")
    left = emb.filter("vec_id >= 250")
    right = emb.filter("vec_id < 250")
    for rerank, cols in (
        (False, ["vec_id", "label", "MATCH_ID", "HAMMING", "RANK"]),
        (True, ["vec_id", "label", "MATCH_ID", "COSINE", "RANK"]),
    ):
        df = embedding_join_binary(
            left, "embedding", "vec_id", other=right, k=3, max_hamming=15,
            rerank=rerank, rerank_factor=2)
        sql = _r_embedding_join_binary(
            "(SELECT * FROM __r10_ejb WHERE vec_id >= 250)", "embedding",
            "vec_id", other="(SELECT * FROM __r10_ejb WHERE vec_id < 250)",
            k=3, max_hamming=15, rerank=rerank, rerank_factor=2, n_words=2)
        assert sorted(map(tuple, spark.sql(sql).select(*cols).collect())) \
            == sorted(map(tuple, df.select(*cols).collect()))
    with pytest.raises(TransformRenderingException, match="n_words"):
        _r_embedding_join_binary("t", "embedding", "vec_id", other="r")
    with pytest.raises(TransformRenderingException, match="right-side"):
        _r_embedding_join_binary("t", "embedding", "vec_id", n_words=2)


@pytest.mark.parametrize("op", ["join", "dedup"])
def test_ivfpq_expression_key_join_survives_cache_eviction(emb, op):
    """Regression (round 10): the candidate equi-join's key is an
    argmax-over-HOF-lambdas expression on both sides. Without
    _cid_barrier, Catalyst's InferFiltersFromConstraints substitutes one
    side's defining expression across the join; the lambda-bound
    attributes inside it cannot be rewritten, and execution dies with
    INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND whenever the scoped index cache is
    NOT substituted first. Reproduces the trigger exactly: derive a new
    frame from the result (dropping the release_with anchor), force the
    GC finalizer (cache evicted), then collect — the uncached recompute
    must still be plan-valid (the scoped-cache module's own
    correctness-safety invariant)."""
    left = emb.filter("vec_id >= 450")
    right = emb.filter("vec_id < 450")
    if op == "join":
        out = embedding_join_ivfpq(
            left, "embedding", "vec_id", other=right, k=2, num_centroids=8,
            nprobe=3, m=8, codebook_size=16, iterations=0,
        ).select("vec_id", "label", "MATCH_ID", "COSINE", "RANK")
    else:
        out = dedup_against_embedding(
            left, "embedding", "vec_id", reference=right, threshold=0.3,
            method="ivfpq", num_centroids=8, nprobe=3, mode="pairs",
            pq_m=8, pq_codebook_size=16, pq_iterations=0,
        ).select("ID", "REF_ID", "COSINE")
    gc.collect()  # fires the release_with finalizer -> cache evicted
    assert len(out.toPandas()) > 0

def test_search_ivfpq_rerank_factor1_membership_and_guards(emb):
    """rerank=True with rerank_factor=1: the survivor set IS the plain ADC
    top-k, so the (query, match) pairs agree exactly while the score
    column switches to the exact rounded cosine over the stored unit
    vectors (IVFADC+R, Jégou 2011 §V); the exact score is re-derived here
    from the index frame itself. rerank_factor < 1 raises in both modes."""
    from rasgoql_spark.functions.pq import similarity_search_ivfpq

    kw = dict(num_centroids=8, nprobe=3, m=8, codebook_size=16, iterations=0)
    qids = [0, 1, 2]
    plain = similarity_search_ivfpq(emb, "embedding", "vec_id", qids, k=5, **kw)
    rr = similarity_search_ivfpq(
        emb, "embedding", "vec_id", qids, k=5, rerank=True,
        rerank_factor=1, **kw)
    assert rr.columns == ["QUERY_ID", "MATCH_ID", "COSINE", "RANK"]
    pairs = lambda df: sorted(  # noqa: E731
        (int(r["QUERY_ID"]), int(r["MATCH_ID"])) for r in df.collect())
    assert pairs(plain) == pairs(rr)
    # exact-score cross-check against the staged unit vectors
    idx = ivfpq_index(emb, "embedding", "vec_id", num_centroids=8,
                      coarse_iterations=1, m=8, codebook_size=16,
                      iterations=0)
    want_ids = {int(r["QUERY_ID"]) for r in rr.collect()} | {
        int(r["MATCH_ID"]) for r in rr.collect()}
    u = {int(r["__id"]): list(r["__u"])
         for r in idx.frame.filter(F.col("__id").isin(list(want_ids))).collect()}
    for r in rr.collect():
        dot = 0.0
        for a, b in zip(u[int(r["QUERY_ID"])], u[int(r["MATCH_ID"])]):
            dot += a * b
        assert abs(round(dot, 6) - float(r["COSINE"])) < 1e-12
    idx.release()
    with pytest.raises(ParameterException, match="rerank_factor"):
        similarity_search_ivfpq(emb, "embedding", "vec_id", qids, k=5,
                                rerank=True, rerank_factor=0, **kw)
    with pytest.raises(ParameterException, match="rerank_factor"):
        embedding_join_ivfpq(
            emb.filter("vec_id >= 450"), "embedding", "vec_id",
            other=emb.filter("vec_id < 450"), k=2, rerank=True,
            rerank_factor=0, **kw)


def test_search_ivfpq_rerank_full_probe_recovers_exact_topk(emb):
    """At full probe with rerank_factor covering the whole corpus, the
    refine stage ranks every candidate by exact cosine — membership must
    equal the brute similarity_search top-k (scores live on slightly
    different rounding paths; membership is the recall contract)."""
    from rasgoql_spark.functions.pq import similarity_search_ivfpq
    from rasgoql_spark.functions.similarity import similarity_search

    sub = emb.filter("vec_id < 120")
    qids = [0, 1, 2]
    rr = similarity_search_ivfpq(
        sub, "embedding", "vec_id", qids, k=5, num_centroids=4, nprobe=4,
        m=8, codebook_size=16, iterations=0, rerank=True, rerank_factor=40)
    brute = similarity_search(sub, "embedding", "vec_id", query_ids=qids, k=5)
    pairs = lambda df: sorted(  # noqa: E731
        (int(r["QUERY_ID"]), int(r["MATCH_ID"])) for r in df.collect())
    assert pairs(rr) == pairs(brute)


def test_ivfpq_rerank_prebuilt_rotate_matches_inline(emb):
    """rerank composes with the index lifecycle and the rotation: inline
    rotate+rerank == prebuilt rotated-index rerank, search AND join."""
    from rasgoql_spark.functions.pq import similarity_search_ivfpq

    kw = dict(num_centroids=8, coarse_iterations=1, m=8, codebook_size=16,
              iterations=0)
    inline = similarity_search_ivfpq(
        emb, "embedding", "vec_id", [0, 1, 2], k=5, nprobe=3, rotate=True,
        rotation_seed=7, rerank=True, rerank_factor=4, **kw)
    idx = ivfpq_index(emb, "embedding", "vec_id", rotate=True,
                      rotation_seed=7, **kw)
    pre = similarity_search_ivfpq(
        emb, "embedding", "vec_id", [0, 1, 2], k=5, nprobe=3, index=idx,
        rerank=True, rerank_factor=4)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, pre.collect()))
    left = emb.filter("vec_id >= 450")
    right = emb.filter("vec_id < 450")
    jin = embedding_join_ivfpq(
        left, "embedding", "vec_id", other=right, k=2, nprobe=3,
        rerank=True, rerank_factor=3, num_centroids=8, m=8,
        codebook_size=16, iterations=0)
    jidx = ivfpq_index(right, "embedding", "vec_id", **kw)
    jpre = embedding_join_ivfpq(
        left, "embedding", "vec_id", k=2, nprobe=3, index=jidx,
        rerank=True, rerank_factor=3)
    cols = ["vec_id", "MATCH_ID", "COSINE", "RANK"]
    assert sorted(map(tuple, jin.select(*cols).collect())) == sorted(
        map(tuple, jpre.select(*cols).collect()))
    idx.release()
    jidx.release()


def test_ivfpq_rerank_renderer_parity(emb, spark):
    """The rendered SQL reproduces the executed rerank rows exactly —
    search (plain + rotated) and join shapes; the survivor set is
    determined by the rounded ADC ordering, so the replay carries through
    the refine stage."""
    from rasgoql_spark.functions.pq import (
        _r_embedding_join_ivfpq,
        _r_similarity_search_ivfpq,
        similarity_search_ivfpq,
    )

    emb.createOrReplaceTempView("__r10_rr")
    kw = dict(num_centroids=8, nprobe=3, m=8, codebook_size=16, iterations=0)
    for rot in (False, True):
        df = similarity_search_ivfpq(
            emb, "embedding", "vec_id", [0, 1, 2], k=5, rerank=True,
            rerank_factor=4, rotate=rot, rotation_seed=7, **kw)
        sql = _r_similarity_search_ivfpq(
            "__r10_rr", "embedding", "vec_id", [0, 1, 2], k=5, rerank=True,
            rerank_factor=4, rotate=rot, rotation_seed=7,
            rotation_dim=64 if rot else None, **kw)
        assert sorted(map(tuple, spark.sql(sql).collect())) == sorted(
            map(tuple, df.collect()))
    jdf = embedding_join_ivfpq(
        emb.filter("vec_id >= 250"), "embedding", "vec_id",
        other=emb.filter("vec_id < 250"), k=2, rerank=True, rerank_factor=3,
        **kw)
    cols = ["vec_id", "label", "MATCH_ID", "COSINE", "RANK"]
    jsql = _r_embedding_join_ivfpq(
        "(SELECT * FROM __r10_rr WHERE vec_id >= 250)", "embedding",
        "vec_id", other="(SELECT * FROM __r10_rr WHERE vec_id < 250)",
        k=2, rerank=True, rerank_factor=3, **kw)
    assert sorted(map(tuple, spark.sql(jsql).select(*cols).collect())) == \
        sorted(map(tuple, jdf.select(*cols).collect()))
