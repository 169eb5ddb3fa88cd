"""Semantic unit tests for representative operators on small constructed data."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import rasgoql_spark as rql
from rasgoql_spark.naming import cleanse_name


def test_cleanse_name():
    assert cleanse_name("l_extendedprice * (1 - l_discount)") == "L_EXTENDEDPRICE_1_L_DISCOUNT"
    assert cleanse_name("9col") == "_9COL"
    assert cleanse_name("  a  b ") == "A_B"


def test_aggregate_naming(session):
    out = session.dataset("lineitem").aggregate(
        group_by=["l_returnflag"],
        aggregations={"l_quantity": ["SUM", "COUNT DISTINCT"]})
    assert out.df.columns == ["l_returnflag", "L_QUANTITY_SUM", "L_QUANTITY_COUNT_DISTINCT"]


def test_lag_negative_is_lead(spark, session):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"])
    out = rql.get_transform("lag").apply(df, columns=["v"], amounts=[1, -1], order_by=["k"])
    rows = {r["k"]: r for r in out.collect()}
    assert rows[2]["LAG_V_1"] == 10.0 and rows[2]["LEAD_V_1"] == 30.0
    assert rows[1]["LAG_V_1"] is None and rows[3]["LEAD_V_1"] is None


def test_moving_avg_frame(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 6)], ["k", "v"])
    out = rql.get_transform("moving_avg").apply(
        df, input_columns=["v"], window_sizes=[3], order_by=["k"])
    rows = {r["k"]: r["MEAN_V_3"] for r in out.collect()}
    assert rows[1] == 1.0 and rows[3] == 2.0 and rows[5] == 4.0


def test_join_prefix_collision_detection(session):
    li = session.dataset("lineitem")
    with pytest.raises(rql.ParameterException):
        # self-join without prefix must flag overlapping columns
        li.join(join_table=session.dataset("lineitem"),
                join_columns={"l_orderkey": "l_orderkey"})


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("b", 15, "L3")], ["k", "t", "tag"])
    right = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 20, 2.0), ("b", 30, 3.0)], ["k", "t", "val"])
    out = rql.get_transform("asof_join").apply(
        left, join_table=right, on="t", by=["k"], value_columns=["val"])
    rows = {r["tag"]: r["ASOF_VAL"] for r in out.collect()}
    assert rows["L1"] == 1.0      # backward match at t=5
    assert rows["L2"] == 2.0      # inclusive match at equal t
    assert rows["L3"] is None     # right event is in the future


def test_interval_join(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 25.0), (3, 99.0)], ["id", "x"])
    iv = spark.createDataFrame([(100, 0.0, 10.0), (200, 20.0, 30.0)], ["iid", "lo", "hi"])
    out = rql.get_transform("interval_join").apply(
        pts, join_table=iv, point="x", lower="lo", upper="hi", bucket_width=10.0)
    got = {(r["id"], r["R_IID"]) for r in out.collect()}
    assert got == {(1, 100), (2, 200)}


def test_pivot_discovery_matches_explicit(session):
    ds = session.dataset("lineitem")
    auto = ds.pivot(dimensions=["l_linestatus"], pivot_column="l_returnflag",
                    value_column="l_quantity", agg_method="SUM")
    explicit = ds.pivot(dimensions=["l_linestatus"], pivot_column="l_returnflag",
                        value_column="l_quantity", agg_method="SUM",
                        list_of_vals=["A", "N", "R"])
    assert sorted(auto.df.columns) == sorted(explicit.df.columns)
    assert auto.df.count() == explicit.df.count()


def test_one_hot_discovery_cap(spark):
    df = spark.range(200).withColumn("c", F.col("id").cast("string"))
    with pytest.raises(rql.ParameterException):
        rql.get_transform("one_hot_encode").apply(df, column="c", cap=100)


def test_train_test_split_ratio(session):
    out = session.dataset("orders").train_test_split(
        order_by=["o_orderdate", "o_orderkey"], train_percent=0.8)
    counts = dict(out.df.groupBy("TT_SPLIT").count().collect())
    total = sum(counts.values())
    assert abs(counts["TRAIN"] / total - 0.8) < 0.01


def test_impute_constant_and_mean(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 2.0), (3, 4.0)], ["k", "v"])
    out = rql.get_transform("impute").apply(df, imputations={"v": "mean"})
    assert {r["v"] for r in out.collect()} == {2.0, 3.0, 4.0}
    out2 = rql.get_transform("impute").apply(df, imputations={"v": -1.0})
    assert {r["v"] for r in out2.collect()} == {-1.0, 2.0, 4.0}


def test_datespine_fills_gaps(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), 1), (datetime.datetime(2024, 1, 4), 2)],
        ["d", "v"])
    out = rql.get_transform("datespine").apply(df, date_col="d", interval="day")
    assert out.count() == 4  # Jan 1-4 dense
    assert out.filter("v IS NULL").count() == 2


def test_rollup_grouping(session):
    out = session.dataset("lineitem").rollup_agg(
        group_by=["l_returnflag"], aggregations={"l_quantity": ["SUM"]})
    rows = out.df.collect()
    totals = [r for r in rows if r["GROUPING_ID"] == 1]
    assert len(totals) == 1  # one grand-total row
    assert abs(sum(r["L_QUANTITY_SUM"] for r in rows if r["GROUPING_ID"] == 0)
               - totals[0]["L_QUANTITY_SUM"]) < 1e-6


def test_warehouse_type_normalization(spark):
    from rasgoql_spark.types import normalize_type

    assert normalize_type("NUMBER(10,2)") == "decimal(10,2)"
    assert normalize_type("NUMBER(12)") == "bigint"
    assert normalize_type("NUMBER(38,0)") == "decimal(38,0)"
    assert normalize_type("TEXT") == "string"
    assert normalize_type("VARCHAR(255)") == "string"
    assert normalize_type("VARIANT") == "string"
    assert normalize_type("TIMESTAMP_NTZ") == "timestamp_ntz"
    assert normalize_type("array<int>") == "array<int>"  # Spark-native passthrough
    df = spark.createDataFrame([(1.5,)], ["v"])
    import rasgoql_spark as rql
    out = rql.get_transform("cast").apply(df, casts={"v": "NUMBER(10,2)"})
    assert dict(out.dtypes)["v"] == "decimal(10,2)"


def test_outer_join_keeps_right_keys(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "lv"])
    right = spark.createDataFrame([(2, 20.0), (3, 30.0)], ["rk", "rv"])
    out = rql.get_transform("join").apply(
        left, join_table=right, join_columns={"k": "rk"}, join_type="FULL")
    rows = {r["rv"]: r["k"] for r in out.collect()}
    assert rows[30.0] == 3  # unmatched right row keeps its key via coalesce
    assert rows[20.0] == 2
    assert out.columns == ["k", "lv", "rv"]
    # RIGHT join same guarantee
    out2 = rql.get_transform("join").apply(
        left, join_table=right, join_columns={"k": "rk"}, join_type="RIGHT")
    assert {r["k"] for r in out2.collect()} == {2, 3}


def test_impute_all_null_and_mode(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y"), (3, None, "x"), (4, None, None)],
        "k int, dead double, cat string")
    # all-NULL mean column is skipped instead of raising
    out = rql.get_transform("impute").apply(df, imputations={"dead": "mean", "cat": "mode"})
    rows = {r["k"]: (r["dead"], r["cat"]) for r in out.collect()}
    assert all(v[0] is None for v in rows.values())
    assert rows[4][1] == "x"  # mode fill, most frequent
    # deterministic tie → lowest value
    df2 = spark.createDataFrame([(1, "b"), (2, "a"), (3, None)], "k int, c string")
    out2 = rql.get_transform("impute").apply(df2, imputations={"c": "mode"})
    assert {r["c"] for r in out2.collect()} == {"a", "b"}
    assert [r["c"] for r in out2.orderBy("k").collect()][2] == "a"


def test_train_test_split_matches_window_and_scales(spark):
    from pyspark.sql import Window
    # duplicate keys (ties) + a tiebreak column, numeric leading key;
    # >4 partitions so the bucketed scale path engages
    df = spark.createDataFrame(
        [(i % 37, i) for i in range(500)], ["key", "tb"]).repartition(8)
    out = rql.get_transform("train_test_split").apply(
        df, order_by=["key", "tb"], train_percent=0.7)
    w = Window.orderBy(F.col("key").asc(), F.col("tb").asc())
    expect = df.withColumn(
        "EXP",
        F.when(F.percent_rank().over(w) < 0.7, "TRAIN").otherwise("TEST"))
    joined = out.join(expect, ["key", "tb"])
    assert joined.filter("TT_SPLIT <> EXP").count() == 0
    # the scale path must not funnel through a single-partition exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_train_test_split_timestamp_key(session):
    # timestamp_ntz leading key exercises the wall-clock proxy path
    df = session.dataset("orders").df.repartition(8)
    out = rql.get_transform("train_test_split").apply(
        df, order_by=["o_orderdate", "o_orderkey"], train_percent=0.8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # small inputs (≤4 partitions) take the single-window path by design
    small = session.dataset("orders").train_test_split(
        order_by=["o_orderdate", "o_orderkey"], train_percent=0.8)
    counts = dict(small.df.groupBy("TT_SPLIT").count().collect())
    assert abs(counts["TRAIN"] / sum(counts.values()) - 0.8) < 0.01


def test_global_ranks_bucketed_match_windowed(spark):
    """rank/dense_rank/row_number/percent_rank/ntile via the bucketed scale
    path must agree exactly with the single-window formulation — ties,
    boundaries, and all."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i % 23, i) for i in range(400)], ["key", "tb"]).repartition(8)
    w = Window.orderBy(F.col("key").asc(), F.col("tb").asc())
    expected = {
        "rank": F.rank(), "dense_rank": F.dense_rank(),
        "row_number": F.row_number(), "percent_rank": F.percent_rank(),
        "ntile_7": F.ntile(7),
    }
    tr = rql.get_transform("rank")
    for m, fn in expected.items():
        got = tr.apply(df, order_by=["key", "tb"], method=m, name="R")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, m
        exp = df.withColumn("E", fn.over(w))
        bad = got.join(exp, ["key", "tb"]).filter("R <> E").count()
        assert bad == 0, m


def test_bin_ntile_bucketed(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(float(i % 50), i) for i in range(300)], ["v", "tb"]).repartition(8)
    out = rql.get_transform("bin").apply(
        df, column="v", bins=5, method="ntile", tiebreak="tb")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    w = Window.orderBy(F.col("v").asc(), F.col("tb").asc())
    exp = df.withColumn("E", F.ntile(5).over(w))
    assert out.join(exp, ["v", "tb"]).filter("V_BIN <> E").count() == 0


def test_bucketed_rank_edge_cases(spark):
    # empty input falls back to the (trivially correct) windowed path
    empty = spark.range(0).withColumn("v", F.col("id").cast("double")).repartition(8)
    out = rql.get_transform("train_test_split").apply(empty, order_by=["v", "id"])
    assert out.count() == 0
    # constant key: one bucket, ranks all tie at 1
    ones = spark.createDataFrame([(1.0, i) for i in range(50)], ["v", "tb"]).repartition(8)
    r = rql.get_transform("rank").apply(ones, order_by=["v"], method="rank", name="R")
    assert r.select("R").distinct().collect()[0][0] == 1


# ------------------------------------------------------------------ fuzzy_join

def test_fuzzy_join_blocked_and_exact(spark):
    import pytest as _pytest

    import rasgoql_spark as rql
    from rasgoql_spark.errors import ParameterException

    fuzzy = rql.get_transform("fuzzy_join").apply
    left = spark.createDataFrame(
        [(1, "Johnson"), (2, "smith"), (3, "Zhu")], "id long, name string")
    right = spark.createDataFrame(
        [(10, "jonson"), (20, "Smyth"), (30, "Xu")], "rid long, name string")

    out = fuzzy(left, join_table=right, column="name", max_distance=2)
    pairs = {(r["id"], r["R_RID"], r["EDIT_DISTANCE"]) for r in out.collect()}
    # johnson~jonson d=1 (shares 'jo'); smith~smyth d=1 (shares 'sm');
    # zhu~xu d=2 but blocked apart (prefix 'zh' vs 'xu')
    assert (1, 10, 1) in pairs and (2, 20, 1) in pairs
    assert not any(l == 3 for l, _, _ in pairs)

    # block='none' recovers the cross-block match
    out2 = fuzzy(left, join_table=right, column="name",
                 max_distance=2, block="none")
    pairs2 = {(r["id"], r["R_RID"]) for r in out2.collect()}
    assert (3, 30) in pairs2

    with _pytest.raises(ParameterException):
        fuzzy(left, join_table=right, column="name", block="soundex")


# ----------------------------------------------------------------- kfold / expect

def test_kfold_grouped_and_balanced(spark):
    import rasgoql_spark as rql

    df = spark.createDataFrame(
        [(i, i % 40) for i in range(400)], "row_id long, entity long")
    out = rql.get_transform("kfold").apply(df, key=["entity"], k=5, seed=1)
    rows = out.collect()
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r["entity"], set()).add(r["FOLD"])
    assert all(len(folds) == 1 for folds in by_entity.values()), \
        "all rows of an entity must share a fold"
    assert len({r["FOLD"] for r in rows}) == 5  # every fold populated
    # balance check needs enough keys for the binomial spread to tighten
    wide = spark.createDataFrame([(i,) for i in range(1000)], "entity long")
    wout = rql.get_transform("kfold").apply(wide, key=["entity"], k=5, seed=1)
    sizes = {}
    for r in wout.collect():
        sizes[r["FOLD"]] = sizes.get(r["FOLD"], 0) + 1
    assert all(100 < n < 300 for n in sizes.values()), sizes
    # seed changes the assignment
    out2 = rql.get_transform("kfold").apply(df, key=["entity"], k=5, seed=2)
    m1 = {r["row_id"]: r["FOLD"] for r in rows}
    m2 = {r["row_id"]: r["FOLD"] for r in out2.collect()}
    assert m1 != m2


def test_expect_modes(spark):
    import pytest as _pytest

    import rasgoql_spark as rql
    from rasgoql_spark.errors import ParameterException

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, v double")
    ex = rql.get_transform("expect").apply

    # fail: 2 violations (negative + NULL) over allowance
    with _pytest.raises(ParameterException, match="2 violations"):
        ex(df, expectations=["v > 0"], max_violations=1)
    # pass-through when within allowance — returns the input unchanged
    out = ex(df, expectations=["v > 0"], max_violations=2)
    assert out.count() == 3
    # filter drops violators (NULL counts as violating)
    assert ex(df, expectations=["v > 0"], mode="filter").count() == 1
    # flag appends one boolean per rule
    flagged = ex(df, expectations=["v > 0", "id < 3"], mode="flag")
    vals = {r["id"]: (r["EXPECT_0"], r["EXPECT_1"]) for r in flagged.collect()}
    assert vals[1] == (True, True) and vals[2] == (False, True)
    assert vals[3] == (False, False)


def test_fuzzy_join_prefix_length_matches_prefix_output(spark):
    """prefix_length blocking must produce EXACTLY the prefix-block output
    (the length predicate is implied by the edit-distance verify) while
    splitting hot prefix blocks by length."""
    import rasgoql_spark as rql

    fuzzy = rql.get_transform("fuzzy_join").apply
    names = ["the grand hotel", "the grand hotell", "the little cafe",
             "theatre royal", "thorn & co", "baker street books",
             "baker st books", "zanzibar"]
    left = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string")
    right = spark.createDataFrame(
        [(100 + i, n + ("x" if i % 2 else "")) for i, n in enumerate(names)],
        "rid long, name string")
    key = lambda r: (r["id"], r["R_RID"], r["EDIT_DISTANCE"])  # noqa: E731
    via_pl = sorted(map(key, fuzzy(
        left, join_table=right, column="name", max_distance=2,
        block="prefix_length").collect()))
    via_p = sorted(map(key, fuzzy(
        left, join_table=right, column="name", max_distance=2,
        block="prefix").collect()))
    assert via_pl == via_p and via_pl


def test_fuzzy_join_prefix_length_bounds_hot_block(spark):
    """Skewed fixture: 900 of 1000 names share the prefix 'th' but spread
    over many lengths. Prefix-only blocking puts 90% of the corpus in one
    block; the prefix_length key must cap the max block share."""
    from pyspark.sql import functions as F

    rows = [(i, "the " + "x" * (i % 30) + " shop") for i in range(900)]
    rows += [(900 + i, f"unique name {i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, name string")
    w = 3  # max_distance=2 -> bucket width 3 (same formula as the operator)
    blocks = (
        df.select(
            F.substring(F.trim(F.lower("name")), 1, 2).alias("pb"),
            F.floor(F.length(F.trim(F.lower("name"))) / w).alias("lb"),
        )
        .groupBy("pb", "lb").count()
    )
    mx = blocks.agg(F.max("count")).first()[0]
    assert mx <= 0.15 * 1000  # prefix-only would put 900 in one block


def test_fuzzy_join_suffix_blocking_for_constant_prefix_keys(spark):
    """Serial-number-style keys share one prefix (and one length), so prefix
    blocking degenerates to a single block; suffix blocking must recover
    the matches while keeping selectivity."""
    import rasgoql_spark as rql

    fuzzy = rql.get_transform("fuzzy_join").apply
    left = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in (1, 2, 77)], "id long, name string")
    right = spark.createDataFrame(
        [(100 + i, f"Customer#{i:09d}") for i in (1, 3, 77)],
        "rid long, name string")
    for scheme in ("suffix", "suffix_length"):
        out = fuzzy(left, join_table=right, column="name", max_distance=1,
                    block=scheme, block_len=3)
        pairs = {(r["id"], r["R_RID"]) for r in out.collect()}
        # last-3 blocks: 001, 002 vs 001, 003 -> exact ids 1 and 77 match;
        # 2~1 and 2~3 are 1 edit apart but land in different suffix blocks
        assert (1, 101) in pairs and (77, 177) in pairs
        assert not any(l == 2 for l, _ in pairs)
