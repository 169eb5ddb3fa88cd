"""cap_per_group: the at-most-K-rows-per-group crawl-curation cap."""

import pytest

from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.curation import _r_cap_per_group, cap_per_group


@pytest.fixture(scope="module")
def pages(spark):
    rows = [(i, f"host{i % 3}", float(i % 11)) for i in range(120)]
    return spark.createDataFrame(rows, "id BIGINT, host STRING, score DOUBLE")


def test_cap_keeps_top_k_by_score(pages):
    out = cap_per_group(pages, ["host"], k=5, order_by=["score"],
                        key="id").collect()
    assert len(out) == 15
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["score"])
    # 120 rows, 3 hosts, scores cycle 0..10 — top-5 per host are all 10s/9s
    for host, scores in by_host.items():
        assert len(scores) == 5
        assert min(scores) >= 9.0


def test_cap_without_order_is_seeded_uniform(pages):
    a = {r["id"] for r in cap_per_group(pages, ["host"], k=7, key="id").collect()}
    b = {r["id"] for r in cap_per_group(pages, ["host"], k=7, key="id").collect()}
    assert a == b and len(a) == 21
    c = {r["id"] for r in
         cap_per_group(pages, ["host"], k=7, key="id", seed=9).collect()}
    assert a != c          # different seed, different survivors


def test_cap_small_groups_pass_through(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               "id BIGINT, g STRING")
    out = cap_per_group(df, ["g"], k=10, key="id").collect()
    assert len(out) == 3


def test_cap_renderer_roundtrip(spark, pages):
    pages.createOrReplaceTempView("__cap_src")
    sql = _r_cap_per_group("__cap_src", ["host"], 4, order_by=["score"],
                           key="id", _input_columns=("id", "host", "score"))
    via_sql = {tuple(r) for r in spark.sql(sql).collect()}
    direct = {tuple(r) for r in
              cap_per_group(pages, ["host"], k=4, order_by=["score"],
                            key="id").collect()}
    assert via_sql == direct


def test_cap_validation(pages):
    with pytest.raises(ParameterException):
        cap_per_group(pages, [], k=3, key="id")
    with pytest.raises(ParameterException):
        cap_per_group(pages, ["host"], k=0, key="id")
    with pytest.raises(ParameterException):
        cap_per_group(pages, ["host"], k=3, key="")   # key is required


def test_stream_quota_cross_batch_budget(spark, tmp_path_factory):
    """Total admissions per group never exceed the quota across batches:
    batch 1 part-fills each group, batch 2 gets only the remainder."""
    from rasgoql_spark.streaming.ops import stream_quota

    tmp = tmp_path_factory.mktemp("squota")
    # batch 1: 3 rows per host; batch 2: 6 more per host; quota 5
    b1 = [(i, f"h{i % 2}", float(i)) for i in range(6)]
    b2 = [(i, f"h{i % 2}", float(i)) for i in range(100, 112)]
    src = str(tmp / "in")
    spark.createDataFrame(b1, "id BIGINT, host STRING, score DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, "id BIGINT, host STRING, score DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema("id BIGINT, host STRING, score DOUBLE")
           .option("maxFilesPerTrigger", 1).parquet(src))
    sink = str(tmp / "out")
    q = stream_quota(sdf, ["host"], quota=5, key="id",
                     checkpoint=str(tmp / "ckpt"), sink_path=sink,
                     order_by=["score"])
    q.awaitTermination(120)
    landed = spark.read.parquet(sink).collect()
    per_host: dict = {}
    for r in landed:
        per_host.setdefault(r["host"], []).append((r["batch"], r["id"]))
    for host, rows in per_host.items():
        assert len(rows) == 5                       # budget exactly filled
        assert len([1 for b, _ in rows if b == 0]) == 3   # all of batch 1
        assert len([1 for b, _ in rows if b == 1]) == 2   # remainder only
    # batch-2 survivors are its top scorers (score desc)
    b2_ids = sorted(i for rows in per_host.values() for b, i in rows if b == 1)
    assert b2_ids == [108, 109, 110, 111]


def test_stream_quota_validation(spark, tmp_path_factory):
    from rasgoql_spark.streaming.ops import stream_quota

    tmp = tmp_path_factory.mktemp("squotav")
    batch = spark.createDataFrame([(1, "a")], "id BIGINT, host STRING")
    src = str(tmp / "in")
    batch.write.parquet(src)
    sdf = spark.readStream.schema("id BIGINT, host STRING").parquet(src)
    with pytest.raises(ParameterException):
        stream_quota(batch, ["host"], 5, "id", str(tmp / "c"), str(tmp / "o"))
    with pytest.raises(ParameterException):
        stream_quota(sdf, ["host"], 0, "id", str(tmp / "c"), str(tmp / "o"))
    with pytest.raises(ParameterException):
        stream_quota(sdf, [], 5, "id", str(tmp / "c"), str(tmp / "o"))
    with pytest.raises(ParameterException):
        stream_quota(sdf, ["host"], 5, "id", str(tmp / "c"), "")


def test_stream_quota_rejects_reserved_batch_column(spark, tmp_path_factory):
    from rasgoql_spark.streaming.ops import stream_quota

    tmp = tmp_path_factory.mktemp("squotab")
    b = spark.createDataFrame([(1, "a", 0)], "id BIGINT, host STRING, batch INT")
    src = str(tmp / "in")
    b.write.parquet(src)
    sdf = spark.readStream.schema(
        "id BIGINT, host STRING, batch INT").parquet(src)
    with pytest.raises(ParameterException):
        stream_quota(sdf, ["host"], 5, "id", str(tmp / "c"), str(tmp / "o"))


def test_cap_per_group_ties_with_unique_key_are_deterministic(spark):
    # every score identical: survivors are picked purely by the seeded
    # hash of the unique key — stable across runs
    from rasgoql_spark.functions.curation import cap_per_group

    df = spark.createDataFrame(
        [(i, "h", 1.0) for i in range(50)], "id BIGINT, host STRING, s DOUBLE"
    )
    runs = [
        {r["id"] for r in cap_per_group(df, ["host"], k=5,
                                        order_by=["s"], key="id").collect()}
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2] and len(runs[0]) == 5


def test_stream_quota_tolerates_precreated_empty_sink(spark, tmp_path_factory):
    # mkdir'ing the sink before the first batch is the legitimate
    # no-prior-admissions state, not an error
    import os

    from rasgoql_spark.streaming.ops import stream_quota

    tmp = tmp_path_factory.mktemp("squotae")
    b1 = [(i, "h", float(i)) for i in range(4)]
    src = str(tmp / "in")
    spark.createDataFrame(b1, "id BIGINT, host STRING, score DOUBLE")\
        .write.parquet(src)
    sdf = (spark.readStream.schema("id BIGINT, host STRING, score DOUBLE")
           .parquet(src))
    sink = str(tmp / "out")
    os.makedirs(sink, exist_ok=True)
    q = stream_quota(sdf, ["host"], quota=2, key="id",
                     checkpoint=str(tmp / "ckpt"), sink_path=sink,
                     order_by=["score"])
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 2
