"""Round-10 layout operator: zorder (Morton key) + save_shards(zorder_by)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rasgoql_spark.errors import ParameterException, TransformRenderingException
from rasgoql_spark.functions.layout import (
    _r_zorder,
    zorder,
    zorder_ranges,
    zvalue_expr,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def test_zorder_key_properties(orders):
    """The Morton key is a bigint in [0, 2^(cols*bits)); single-column
    z-order is monotone in that column (it IS a range bucketing); and the
    interleave responds to BOTH columns (distinct keys exceed what either
    column alone produces)."""
    out = zorder(orders, ["o_custkey", "o_totalprice"], bits=8)
    assert dict(out.dtypes)["ZVALUE"] == "bigint"
    mn, mx = out.agg(F.min("ZVALUE"), F.max("ZVALUE")).first()
    assert 0 <= mn <= mx < (1 << 16)
    # monotonicity of the 1-D case: sorting by key == sorting by column
    one = zorder(orders, ["o_custkey"], bits=8, name="Z1")
    rows = one.select("o_custkey", "Z1").distinct().collect()
    by_key = sorted(rows, key=lambda r: (r["Z1"], r["o_custkey"]))
    assert [r["o_custkey"] for r in by_key] == sorted(r["o_custkey"] for r in rows)
    # 2-D key has more resolution than either 1-D bucketing
    n2 = out.select("ZVALUE").distinct().count()
    n1 = one.select("Z1").distinct().count()
    assert n2 > n1


def test_zorder_explicit_ranges_match_discovered(orders):
    rng = zorder_ranges(orders, ["o_custkey", "o_totalprice"])
    a = zorder(orders, ["o_custkey", "o_totalprice"], bits=8)
    b = zorder(orders, ["o_custkey", "o_totalprice"], bits=8, ranges=rng)
    cols = ["o_orderkey", "ZVALUE"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect()))
    # out-of-range values clamp to the edge buckets instead of overflowing
    tight = {"o_custkey": (10.0, 20.0), "o_totalprice": rng["o_totalprice"]}
    c = zorder(orders, ["o_custkey", "o_totalprice"], bits=8, ranges=tight)
    mn, mx = c.agg(F.min("ZVALUE"), F.max("ZVALUE")).first()
    assert 0 <= mn <= mx < (1 << 16)


def test_zorder_renderer_parity_and_guards(orders, spark):
    orders.createOrReplaceTempView("__zorders")
    rng = zorder_ranges(orders, ["o_custkey", "o_totalprice"])
    df = zorder(orders, ["o_custkey", "o_totalprice"], bits=6, ranges=rng)
    sql = _r_zorder("__zorders", ["o_custkey", "o_totalprice"], bits=6,
                    ranges=rng)
    cols = ["o_orderkey", "ZVALUE"]
    assert sorted(map(tuple, spark.sql(sql).select(cols).collect())) == \
        sorted(map(tuple, df.select(cols).collect()))
    with pytest.raises(TransformRenderingException, match="ranges"):
        _r_zorder("__zorders", ["o_custkey"])
    with pytest.raises(ParameterException, match="bits"):
        zorder(orders, ["o_custkey"], bits=0)
    with pytest.raises(ParameterException, match="62"):
        zorder(orders, ["o_custkey", "o_totalprice", "o_orderkey",
                        "o_orderdate"], bits=16)
    with pytest.raises(ParameterException, match="at least one"):
        zorder(orders, [])
    with pytest.raises(ParameterException, match="numeric, date"):
        zvalue_expr(orders, ["o_orderstatus"])
    with pytest.raises(ParameterException, match="missing column"):
        zorder(orders, ["o_custkey"], ranges={"o_totalprice": (0, 1)})


def test_zorder_date_and_null_handling(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01", 5.0), (2, "2024-06-01", None), (3, None, 9.0)],
        "id int, d string, v double",
    ).withColumn("d", F.to_date("d"))
    out = zorder(df, ["d", "v"], bits=4)
    rows = {int(r["id"]): int(r["ZVALUE"]) for r in out.collect()}
    assert len(rows) == 3 and all(v >= 0 for v in rows.values())
    # NULL buckets to 0 in its dimension: row 3's date contributes nothing
    assert rows[3] == int(
        zorder(df.filter("id = 3").withColumn("d", F.lit(None).cast("date")),
               ["d", "v"], bits=4,
               ranges=zorder_ranges(df, ["d", "v"])).first()["ZVALUE"])


def test_save_shards_zorder_layout(session, spark, tmp_path):
    """The zordered write range-partitions + sorts by the Morton key and
    drops it; every parquet footer then carries tight min/max on BOTH
    clustering columns — at least one shard must be fully prunable for a
    selective 2-D predicate (the natural layout prunes nothing)."""
    path = str(tmp_path / "zli")
    session.dataset("lineitem").save_shards(
        path, num_shards=8, zorder_by=["l_partkey", "l_suppkey"])
    out = spark.read.parquet(path)
    assert "__z" not in out.columns
    assert out.count() == session.dataset("lineitem").df.count()
    hits, total = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            s1 = md.row_group(rg).column(names["l_partkey"]).statistics
            s2 = md.row_group(rg).column(names["l_suppkey"]).statistics
            if not (s1.max < 1 or s1.min > 40) or not (s2.max < 1 or s2.min > 3):
                if not (s1.max < 1 or s1.min > 40) and not (s2.max < 1 or s2.min > 3):
                    hits += 1
    assert total >= 8 and hits < total
    with pytest.raises(ParameterException, match="placement"):
        session.dataset("lineitem").save_shards(
            str(tmp_path / "zli2"), zorder_by=["l_partkey"], by=["l_orderkey"])


# --- hilbert ---------------------------------------------------------------

from rasgoql_spark.functions.layout import hilbert, hilbert_sql  # noqa: E402


def _xy2d(n: int, x: int, y: int) -> int:
    """Reference implementation of the classic Hilbert xy2d walk."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_walk(spark):
    """Every cell of the full 16x16 grid maps exactly to the classic xy2d
    value, and the key is a bijection onto [0, n^2)."""
    n = 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    out = hilbert(df, ["x", "y"], bits=4, ranges={"x": (0, n), "y": (0, n)})
    got = {(r["x"], r["y"]): r["HVALUE"] for r in out.collect()}
    assert all(got[(x, y)] == _xy2d(n, x, y) for x in range(n) for y in range(n))
    assert sorted(got.values()) == list(range(n * n))


def test_hilbert_locality_beats_morton(spark):
    """The Hilbert curve never jumps: consecutive keys are always grid
    neighbors (Chebyshev distance 1), which Morton violates at every
    quadrant boundary. This is the property that tightens parquet min/max
    pruning."""
    n = 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    rng = {"x": (0, n), "y": (0, n)}
    h = hilbert(df, ["x", "y"], bits=4, ranges=rng)
    cells = {r["HVALUE"]: (r["x"], r["y"]) for r in h.collect()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # Manhattan-adjacent steps
    z = zorder(df, ["x", "y"], bits=4, ranges=rng)
    zcells = {r["ZVALUE"]: (r["x"], r["y"]) for r in z.collect()}
    jumps = sum(
        1
        for d in range(n * n - 1)
        if abs(zcells[d][0] - zcells[d + 1][0])
        + abs(zcells[d][1] - zcells[d + 1][1])
        > 1
    )
    assert jumps > 0  # Morton does jump; Hilbert (above) never does


def test_hilbert_renderer_parity(orders, spark):
    from rasgoql_spark.functions.layout import _r_hilbert, zorder_ranges

    rng = zorder_ranges(orders, ["o_custkey", "o_totalprice"])
    out = hilbert(orders, ["o_custkey", "o_totalprice"], bits=6, ranges=rng)
    orders.createOrReplaceTempView("h_orders")
    sql = _r_hilbert(
        "h_orders", ["o_custkey", "o_totalprice"], bits=6, ranges=rng,
        _input_columns=tuple(orders.columns),
    )
    via_sql = spark.sql(sql)
    key = ["o_orderkey", "HVALUE"]
    assert sorted(map(tuple, out.select(key).collect())) == sorted(
        map(tuple, via_sql.select(key).collect())
    )


def test_hilbert_guards(orders):
    with pytest.raises(ParameterException):
        hilbert(orders, ["o_custkey"], bits=8)          # 1-D has no curve
    with pytest.raises(ParameterException):
        hilbert(orders, ["o_custkey", "o_totalprice"], bits=0)
    with pytest.raises(ParameterException):             # 8 dims x 8 bits > 62
        hilbert(orders, ["o_custkey"] * 8, bits=8)
    with pytest.raises(TransformRenderingException):
        from rasgoql_spark.functions.layout import _r_hilbert

        _r_hilbert("t", ["a", "b"], ranges=None)


# --- n-D Hilbert (round 12, Skilling transpose) ---------------------------

def _skilling_ref(coords, bits):
    """Pure-Python Skilling AxestoTranspose reference (public algorithm)."""
    n = len(coords)
    X = list(coords)
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t, Q = 0, 1 << (bits - 1)
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    d = 0
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            d = (d << 1) | ((X[i] >> j) & 1)
    return d


def test_hilbert_3d_matches_skilling_reference(spark):
    """Every cell of the full 8x8x8 grid maps exactly to the Skilling
    reference value, and the key is a bijection onto [0, 8^3)."""
    import itertools

    n = 8
    cells = list(itertools.product(range(n), repeat=3))
    df = spark.createDataFrame(cells, "x long, y long, z long")
    rng = {c: (0, n) for c in ("x", "y", "z")}
    out = hilbert(df, ["x", "y", "z"], bits=3, ranges=rng)
    got = {(r["x"], r["y"], r["z"]): r["HVALUE"] for r in out.collect()}
    assert all(got[c] == _skilling_ref(c, 3) for c in cells)
    assert sorted(got.values()) == list(range(n ** 3))


def test_hilbert_3d_unit_step_adjacency(spark):
    """Consecutive 3-D keys are always Manhattan-distance-1 neighbors —
    the defining Hilbert property (and the one Morton violates), so the
    construction is a true space-filling curve in every dimension count."""
    import itertools

    n = 4
    cells = list(itertools.product(range(n), repeat=3))
    df = spark.createDataFrame(cells, "x long, y long, z long")
    rng = {c: (0, n) for c in ("x", "y", "z")}
    out = hilbert(df, ["x", "y", "z"], bits=2, ranges=rng)
    by_key = {r["HVALUE"]: (r["x"], r["y"], r["z"]) for r in out.collect()}
    for d in range(n ** 3 - 1):
        a, b = by_key[d], by_key[d + 1]
        assert sum(abs(i - j) for i, j in zip(a, b)) == 1


def test_hilbert_nd_renderer_parity_and_duckdb(orders, spark):
    """The n>=3 renderer matches the DataFrame path on Spark AND evaluates
    identically in DuckDB (dialect-neutral program)."""
    import duckdb

    from rasgoql_spark.functions.layout import _r_hilbert, zorder_ranges

    cols = ["o_custkey", "o_totalprice", "o_orderkey"]
    rng = zorder_ranges(orders, cols)
    out = hilbert(orders, cols, bits=4, ranges=rng)
    orders.createOrReplaceTempView("h3_orders")
    sql = _r_hilbert("h3_orders", cols, bits=4, ranges=rng,
                     _input_columns=tuple(orders.columns))
    direct = sorted(map(tuple, out.select("o_orderkey", "HVALUE").collect()))
    via_sql = sorted(map(tuple,
                         spark.sql(sql).select("o_orderkey", "HVALUE").collect()))
    assert direct == via_sql
    con = duckdb.connect()
    con.register("h3_orders", out.select(*orders.columns).toPandas())
    duck = sorted(map(tuple, con.sql(
        f"SELECT o_orderkey, HVALUE FROM ({sql}) t").df().itertuples(index=False)))
    con.close()
    assert direct == duck


def test_save_shards_hilbert_curve(session, tmp_path):
    path = str(tmp_path / "hshards")
    session.dataset("orders").save_shards(
        path, num_shards=4, zorder_by=["o_custkey", "o_totalprice"],
        curve="hilbert", mode="overwrite",
    )
    files = glob.glob(f"{path}/*.parquet")
    assert files
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == session.dataset("orders").df.count()
    with pytest.raises(ParameterException):
        session.dataset("orders").save_shards(
            str(tmp_path / "bad"), zorder_by=["o_custkey", "o_totalprice"],
            curve="peano", mode="overwrite",
        )
