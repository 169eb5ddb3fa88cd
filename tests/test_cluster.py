"""Deterministic spherical k-means clustering."""

import pytest

import rasgoql_spark as rql


def _km(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, vec array<float>, tag string")
    out = rql.get_transform("kmeans_cluster").apply(df, vec_col="vec", id_col="id", **kw)
    return {r["id"]: r["CLUSTER_ID"] for r in out.collect()}


# two tight direction-bundles in 4-d (spherical k-means clusters by angle)
BUNDLES = [
    (0, [1.0, 0.1, 0.0, 0.0], "a"),
    (1, [0.9, 0.2, 0.0, 0.1], "a"),
    (2, [1.0, 0.0, 0.1, 0.0], "a"),
    (3, [0.0, 0.1, 1.0, 0.9], "b"),
    (4, [0.1, 0.0, 0.9, 1.0], "b"),
    (5, [0.0, 0.0, 1.0, 1.0], "b"),
]


def test_kmeans_separates_direction_bundles(spark):
    got = _km(spark, BUNDLES, k=2, iterations=2)
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1
    assert got[0] != got[3]


def test_kmeans_deterministic_across_runs(spark):
    a = _km(spark, BUNDLES, k=2, iterations=1)
    b = _km(spark, BUNDLES, k=2, iterations=1)
    assert a == b


def test_kmeans_iterations_zero_is_seed_assignment(spark):
    # with iterations=0 the centroids ARE the two lowest-id vectors
    got = _km(spark, BUNDLES, k=2, iterations=0)
    assert got[0] == 0  # seed 0 is its own nearest centroid
    assert got[3] in (0, 1) and got[4] == got[3] and got[5] == got[3]


def test_kmeans_k_exceeding_rows_keeps_empty_clusters_harmless(spark):
    rows = BUNDLES[:3]
    got = _km(spark, rows, k=8, iterations=1)
    assert set(got) == {0, 1, 2}
    assert all(0 <= c < 8 for c in got.values())


def test_kmeans_zero_vector_is_assigned(spark):
    rows = BUNDLES + [(6, [0.0, 0.0, 0.0, 0.0], "z")]
    got = _km(spark, rows, k=2, iterations=1)
    assert got[6] in (0, 1)  # all sims 0 -> tie -> lowest cid, never crashes


def test_kmeans_param_validation(spark):
    with pytest.raises(rql.ParameterException):
        _km(spark, BUNDLES, k=0)
    with pytest.raises(rql.ParameterException):
        _km(spark, BUNDLES, k=2, iterations=-1)


def test_kmeans_keeps_original_columns(spark):
    df = spark.createDataFrame(BUNDLES, "id long, vec array<float>, tag string")
    out = rql.get_transform("kmeans_cluster").apply(df, vec_col="vec", id_col="id", k=2)
    assert set(out.columns) == {"id", "vec", "tag", "CLUSTER_ID"}
    assert out.count() == 6


# ---------------------------------------------------------------- semantic_dedup

def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_drops_near_identical(spark):
    from rasgoql_spark.functions.cluster import semantic_dedup

    # seeds are the two lowest ids (0 and 1) — far apart, so the
    # near-duplicate of 0 (id 2) lands in 0's cluster and is dropped
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # ~identical to 0 -> dropped
        (3, [0.0, 0.8, 0.6, 0.0]),      # cos to 1 = 0.8, below threshold
    ]
    out = semantic_dedup(_vecs(spark, rows), "embedding", "vec_id", k=2,
                         iterations=1, threshold=0.95)
    kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == [0, 1, 3]
    assert "CLUSTER_ID" in out.columns


def test_semantic_dedup_cross_cluster_pairs_not_compared(spark):
    """Two identical vectors forced into different clusters survive — the
    pair pass is cluster-scoped by design (the SemDeDup contract)."""
    from rasgoql_spark.functions.cluster import kmeans_cluster, semantic_dedup

    # k = n: with one Lloyd pass from lowest-id seeds every vector stays
    # its own centroid only if vectors are distinct; craft two clusters
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),  # identical to 0 -> same cluster -> dropped
    ]
    out = semantic_dedup(_vecs(spark, rows), "embedding", "vec_id", k=2,
                         iterations=0, threshold=0.99)
    kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == [0, 1]


def test_semantic_dedup_threshold_one_keeps_distinct(spark):
    from rasgoql_spark.functions.cluster import semantic_dedup

    rows = [(i, [float(i + 1), float(2 * i + 1), 0.5]) for i in range(6)]
    out = semantic_dedup(_vecs(spark, rows), "embedding", "vec_id", k=2,
                         iterations=1, threshold=1.0)
    # no two distinct directions reach rounded cosine 1.0 here
    assert out.count() == 6


def test_semantic_dedup_identical_embedding_collapse(spark):
    """Exact-duplicate embeddings must collapse to one rep before the
    per-cluster pair join (the dedup_minhash skew-guard pattern): a
    3000-copy group contributes ONE row to the O(cluster^2) stage, so the
    candidate pair count tracks distinct vectors, not corpus size."""
    import numpy as np

    from rasgoql_spark.functions.cluster import (
        _semantic_candidates, _unit_rounded, semantic_dedup)

    rng = np.random.default_rng(11)
    dup = [float(x) for x in rng.normal(size=8)]
    n = 3000
    rows = [(j, dup) for j in range(n)] + [
        (10_000 + j, [float(x) for x in rng.normal(size=8)]) for j in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, "embedding", "vec_id", k=4, threshold=0.9)
    kept = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert 0 in kept and not any(1 <= x < n for x in kept)  # one dup survivor
    # measure the actual candidate set through the internal seam
    from pyspark.sql import functions as F
    withu = _unit_rounded(
        df.selectExpr("vec_id AS __id", "CAST(0 AS INT) AS CLUSTER_ID",
                      "embedding AS __vec"),
        "__vec")
    reps, pairs, member_drops, _g = _semantic_candidates(withu, 0.9, 6, None)
    assert reps.count() == 51           # 3000 copies -> 1 rep
    assert pairs.count() == 51 * 50 // 2  # quadratic only in DISTINCT vectors
    assert member_drops.count() == n - 1


def test_semantic_dedup_max_cluster_size_bounds_pairs(spark):
    """max_cluster_size must cap the per-cluster pair join even when every
    vector is distinct: 400 distinct reps in ONE cluster produce C(400,2)
    pairs unchunked but at most n_chunks * C(cap,2) with the guard."""
    import numpy as np

    from rasgoql_spark.functions.cluster import (
        _semantic_candidates, _unit_rounded, semantic_dedup)

    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    rows = [
        (j, [float(x) for x in base + 1e-3 * rng.normal(size=8)])
        for j in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    withu = _unit_rounded(
        df.selectExpr("vec_id AS __id", "CAST(0 AS INT) AS CLUSTER_ID",
                      "embedding AS __vec"),
        "__vec")
    _, pairs_full, _, _g1 = _semantic_candidates(withu, 0.999, 6, None)
    _, pairs_capped, _, _g2 = _semantic_candidates(withu, 0.999, 6, 50)
    assert pairs_full.count() == 400 * 399 // 2
    assert pairs_capped.count() == 8 * (50 * 49 // 2)  # 8 chunks of 50
    # the capped variant still runs end-to-end and keeps at least chunk heads
    out = semantic_dedup(df, "embedding", "vec_id", k=2, threshold=0.9999,
                         max_cluster_size=50)
    assert out.count() >= 1


def test_semantic_dedup_k_auto_and_validation(spark):
    import pytest as _pytest

    from rasgoql_spark.errors import ParameterException
    from rasgoql_spark.functions.cluster import semantic_dedup

    rows = [(j, [float(j % 7), 1.0, 0.5]) for j in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, "embedding", "vec_id", k="auto", threshold=0.999)
    assert out.count() >= 7  # one survivor per distinct direction at least
    with _pytest.raises(ParameterException):
        semantic_dedup(df, "embedding", "vec_id", k="bogus")
    with _pytest.raises(ParameterException):
        semantic_dedup(df, "embedding", "vec_id", max_cluster_size=1)


def test_semantic_dedup_null_elements_never_collapse(spark):
    """Regression (round-5 review): concat_ws silently skips NULL array
    elements, so [0.6, NULL, 0.8] used to share a collapse key with
    [0.6, 0.8] and get over-dropped. NULL-element vectors have NULL
    cosines — the pair join keeps them, and so must the collapse."""
    from rasgoql_spark.functions.cluster import semantic_dedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.6, None, 0.8]), (2, [0.6, 0.0, 0.8]),
         # 20 copies of a clean vector to force the collapse path
         *[(10 + j, [0.0, 1.0, 0.0]) for j in range(20)]],
        "vec_id long, embedding array<double>")
    kept = {r["vec_id"] for r in semantic_dedup(
        df, "embedding", "vec_id", k=1, threshold=0.9)
        .select("vec_id").collect()}
    assert {0, 1, 2, 10} <= kept          # null-element row survives
    assert not any(11 <= x < 30 for x in kept)  # real dups still collapse
    # NULL vector vs empty vector must not collide either
    df2 = spark.createDataFrame(
        [(0, [1.0]), (1, None), (2, [])]
        + [(10 + j, [1.0]) for j in range(20)],
        "vec_id long, embedding array<double>")
    kept2 = {r["vec_id"] for r in semantic_dedup(
        df2, "embedding", "vec_id", k=1, threshold=0.9)
        .select("vec_id").collect()}
    assert {1, 2} <= kept2


def test_semantic_dedup_collapses_on_dup_mass_not_just_max_group(spark):
    """Many SMALL duplicate groups must still engage the collapse: unlike a
    band join, semantic pairs form within whole clusters, so 90% duplicate
    mass explodes the pair join even when every group is tiny."""
    import numpy as np

    from rasgoql_spark.functions.cluster import (
        _semantic_candidates, _unit_rounded)

    rng = np.random.default_rng(5)
    rows = []
    vid = 0
    for g in range(200):          # 200 groups of 10 copies: max group 10
        v = [float(x) for x in rng.normal(size=8)]
        for _ in range(10):
            rows.append((vid, v)); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    withu = _unit_rounded(
        df.selectExpr("vec_id AS __id", "CAST(0 AS INT) AS CLUSTER_ID",
                      "embedding AS __vec"), "__vec")
    reps, pairs, member_drops, _c = _semantic_candidates(withu, 0.9, 6, None)
    assert reps.count() == 200            # collapse engaged
    assert pairs.count() == 200 * 199 // 2  # reps only, not 2000 rows
    assert member_drops.count() == 200 * 9
