"""Domain-blocklist URL filtering (suffix-chain matching)."""

import pytest

import rasgoql_spark as rql

ROWS = [
    (0, "https://spam.example.com/page"),
    (1, "http://WWW.Example.COM:80/x"),
    (2, "https://good.org/a"),
    (3, "https://notexample.com/y"),      # must NOT match example.com
    (4, "ftp://example.com/z"),
    (5, "https://deep.a.b.example.com/"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, url string")


def _run(spark, **kw):
    return rql.get_transform("filter_urls").apply(_df(spark), url="url", **kw)


def test_remove_matches_subdomains_not_lookalikes(spark):
    kept = {r["id"] for r in _run(spark, blocklist=["example.com"]).collect()}
    assert kept == {2, 3}


def test_keep_mode_is_allowlist(spark):
    kept = {r["id"] for r in _run(spark, blocklist=["example.com"], mode="keep").collect()}
    assert kept == {0, 1, 4, 5}


def test_flag_mode_appends_boolean(spark):
    got = {r["id"]: r["URL_BLOCKED"] for r in _run(
        spark, blocklist=["example.com"], mode="flag").collect()}
    assert got == {0: True, 1: True, 2: False, 3: False, 4: True, 5: True}


def test_blocklist_df_path_broadcast_anti_join(spark):
    bl = spark.createDataFrame([("example.com",), ("good.org",)], "domain string")
    out = _run(spark, blocklist_df=bl)
    assert {r["id"] for r in out.collect()} == {3}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan


def test_literal_path_shuffle_free(spark):
    out = _run(spark, blocklist=["example.com"], mode="flag")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_param_validation(spark):
    with pytest.raises(rql.ParameterException):
        _run(spark)  # neither list nor df
    with pytest.raises(rql.ParameterException):
        _run(spark, blocklist=["a.com"], mode="bogus")
    with pytest.raises(rql.ParameterException):
        _run(spark, blocklist=["a.com", "b.com"], max_literal=1)
    bl = spark.createDataFrame([("a.com",)], "domain string")
    with pytest.raises(rql.ParameterException):
        _run(spark, blocklist_df=bl, mode="flag")


def test_sql_renderer_matches_execution(spark):
    df = _df(spark)
    sess = rql.RasgoSession(spark, data_dir="/root/testdata/sf0.001")
    ds = sess.dataset_from_df(df.toPandas(), "urls_tbl", method="replace")
    chained = ds.filter_urls(url="url", blocklist=["example.com"], mode="flag")
    via_sql = spark.sql(chained.sql()).orderBy("id").collect()
    direct = chained.df.orderBy("id").collect()
    assert [r.asDict() for r in via_sql] == [r.asDict() for r in direct]
