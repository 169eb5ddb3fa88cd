"""PageRank: hand-checked tiny graphs, mass conservation with dangling
nodes, determinism across partitionings, and parameter validation."""

import pytest

import rasgoql_spark as rql
from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.graph import pagerank


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, "src", "dst", **kw)
    return {r["NODE"]: r["PAGERANK"] for r in out.collect()}


def test_symmetric_cycle_is_uniform(spark):
    # 3-cycle: every node keeps exactly 1/3 at every iteration
    ranks = _pr(spark, [(1, 2), (2, 3), (3, 1)], iterations=5)
    for v in ranks.values():
        assert v == pytest.approx(1 / 3, abs=1e-8)


def test_sink_accumulates_rank(spark):
    # star into node 9: 9 is dangling, its mass redistributes uniformly
    ranks = _pr(spark, [(1, 9), (2, 9), (3, 9)], iterations=10)
    assert ranks[9] > ranks[1] == ranks[2] == ranks[3]
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_mass_conserved_with_dangling(spark):
    edges = [(i, (i * 7) % 11) for i in range(11)] + [(3, 99)]  # 99 dangling
    ranks = _pr(spark, edges, iterations=7)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_duplicate_edges_collapse(spark):
    a = _pr(spark, [(1, 2), (1, 2), (2, 1)], iterations=4)
    b = _pr(spark, [(1, 2), (2, 1)], iterations=4)
    assert a == b


def test_zero_iterations_is_uniform_seed(spark):
    ranks = _pr(spark, [(1, 2), (3, 4)], iterations=0)
    for v in ranks.values():
        assert v == pytest.approx(0.25, abs=1e-9)


def test_deterministic_across_partitionings(spark):
    edges = [((i * 13) % 50, (i * 29) % 50) for i in range(300)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = {r["NODE"]: r["PAGERANK"] for r in pagerank(df1, "src", "dst", iterations=4).collect()}
    r8 = {r["NODE"]: r["PAGERANK"] for r in pagerank(df8, "src", "dst", iterations=4).collect()}
    assert r1 == r8


def test_pagerank_param_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ParameterException):
        pagerank(df, "src", "dst", damping=1.5)
    with pytest.raises(ParameterException):
        pagerank(df, "src", "dst", iterations=-1)


# ------------------------------------------------------- connected_components

def _cc(spark, edges, **kw):
    from rasgoql_spark.functions.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst", **kw)
    return {r["NODE"]: r["COMPONENT"] for r in out.collect()}


def test_cc_two_components(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_cc_long_chain_converges(spark):
    # a 12-node path needs several doubling/propagation rounds
    comp = _cc(spark, [(i, i + 1) for i in range(12)])
    assert set(comp.values()) == {0}
    assert len(comp) == 13


def test_cc_direction_irrelevant(spark):
    a = _cc(spark, [(5, 1), (1, 9)])
    b = _cc(spark, [(1, 5), (9, 1)])
    assert a == b == {1: 1, 5: 1, 9: 1}
