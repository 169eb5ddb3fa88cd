"""Round-10 graph additions: triangle_count (oriented-wedge) and
label_propagation (deterministic synchronous LPA)."""

import pytest

from rasgoql_spark.errors import ParameterException, TransformRenderingException
from rasgoql_spark.functions.graph import (
    _r_label_propagation,
    _r_triangle_count,
    label_propagation,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")


def test_triangle_count_k4(spark):
    """K4: 4 triangles total, every node in exactly 3."""
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {r["NODE"]: r["TRIANGLES"] for r in
           triangle_count(_edges(spark, pairs), "src", "dst").collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_star_is_zero(spark):
    pairs = [(0, i) for i in range(1, 6)]
    out = triangle_count(_edges(spark, pairs), "src", "dst").collect()
    assert len(out) == 6 and all(r["TRIANGLES"] == 0 for r in out)


def test_triangle_count_collapses_duplicates_reverses_and_self_loops(spark):
    pairs = [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2), (2, 2), (None, 1)]
    out = {r["NODE"]: r["TRIANGLES"] for r in
           triangle_count(_edges(spark, pairs), "src", "dst").collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_count_circulant(spark):
    """C(6;1,2): 6 consecutive-triple triangles + the two even/odd triangles
    {0,2,4} and {1,3,5} -> every node touches 4."""
    n = 6
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 2) % n) for i in range(n)]
    out = {r["NODE"]: r["TRIANGLES"] for r in
           triangle_count(_edges(spark, pairs), "src", "dst").collect()}
    assert out == {i: 4 for i in range(n)}


def test_triangle_renderer_roundtrip(spark):
    n = 9
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 3) % n) for i in range(n)]
    df = _edges(spark, pairs)
    df.createOrReplaceTempView("__tri_edges")
    via_sql = spark.sql(_r_triangle_count("__tri_edges", "src", "dst"))
    direct = triangle_count(df, "src", "dst")
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


def test_label_propagation_triangle_converges_to_min(spark):
    out = {r["NODE"]: r["LABEL"] for r in label_propagation(
        _edges(spark, [(0, 1), (1, 2), (0, 2)]), "src", "dst",
        iterations=2).collect()}
    assert out == {0: 0, 1: 0, 2: 0}


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two triangles joined by one bridge edge keep distinct labels: the
    bridge minority vote never outnumbers the in-clique majority."""
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    out = {r["NODE"]: r["LABEL"] for r in label_propagation(
        _edges(spark, pairs), "src", "dst", iterations=3).collect()}
    assert len({out[0], out[1], out[2]}) == 1
    assert len({out[10], out[11], out[12]}) == 1
    assert out[0] != out[10]


def test_label_propagation_validation_and_render_cap(spark):
    df = _edges(spark, [(0, 1)])
    with pytest.raises(ParameterException):
        label_propagation(df, "src", "dst", iterations=0)
    with pytest.raises(TransformRenderingException):
        _r_label_propagation("t", "src", "dst", iterations=99)


def test_label_propagation_renderer_roundtrip(spark):
    pairs = [(i, (i + 1) % 8) for i in range(8)] + [(i, 100 + i % 2) for i in range(8)]
    df = _edges(spark, pairs)
    df.createOrReplaceTempView("__lpa_edges")
    via_sql = spark.sql(_r_label_propagation("__lpa_edges", "src", "dst", 2))
    direct = label_propagation(df, "src", "dst", iterations=2)
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


# --------------------------------------------------------------------------
# kcore (round 10)
# --------------------------------------------------------------------------

def test_kcore_peels_pendants_keeps_clique(spark):
    from rasgoql_spark.functions.graph import kcore

    # K4 clique (degree 3) with a pendant chain 4-5-6
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    pairs += [(0, 4), (4, 5), (5, 6)]
    out = {r["NODE"]: r["DEGREE"] for r in
           kcore(_edges(spark, pairs), "src", "dst", k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_cascading_peel(spark):
    """Removing a low-degree node can drop a neighbor below k — the peel
    must cascade: a path graph has NO 2-core."""
    from rasgoql_spark.functions.graph import kcore

    pairs = [(i, i + 1) for i in range(10)]
    out = kcore(_edges(spark, pairs), "src", "dst", k=2).collect()
    assert out == []
    # ...but a cycle IS its own 2-core
    cyc = pairs + [(10, 0)]
    out2 = kcore(_edges(spark, cyc), "src", "dst", k=2).collect()
    assert len(out2) == 11 and all(r["DEGREE"] == 2 for r in out2)


def test_kcore_validation_and_render_cap(spark):
    from rasgoql_spark.functions.graph import _r_kcore, kcore

    df = _edges(spark, [(0, 1)])
    with pytest.raises(ParameterException):
        kcore(df, "src", "dst", k=0)
    with pytest.raises(TransformRenderingException):
        _r_kcore("t", "src", "dst", 2, max_iterations=99)


def test_kcore_renderer_roundtrip(spark):
    from rasgoql_spark.functions.graph import _r_kcore, kcore

    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 2) % n) for i in range(n)]
    pairs += [(i, 100 + i) for i in range(6)]  # pendants
    df = _edges(spark, pairs)
    df.createOrReplaceTempView("__kc_edges")
    via_sql = spark.sql(_r_kcore("__kc_edges", "src", "dst", 3, 4))
    direct = kcore(df, "src", "dst", k=3, max_iterations=4)
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


def test_kcore_warns_on_unconverged_peel(spark):
    """A chain graph peels one layer per round: max_iterations below the
    peel depth returns a partial result and fires RuntimeWarning."""
    import warnings

    from rasgoql_spark.functions.graph import kcore

    pairs = [(i, i + 1) for i in range(12)]           # path graph
    df = spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        kcore(df, "src", "dst", k=2, max_iterations=2).collect()
        assert any("did not stabilize" in str(x.message) for x in w)
    # converged run stays silent and empty (a path has no 2-core)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = kcore(df, "src", "dst", k=2, max_iterations=12).collect()
        assert out == []
        assert not any("did not stabilize" in str(x.message) for x in w)
