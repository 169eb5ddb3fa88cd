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


def test_stream_quota_null_group_key_budget(spark, tmp_path_factory):
    """A NULL group key is one real group with one cross-batch budget —
    the null-safe spent join must deplete it like any other (a plain
    equi-join would re-grant NULL the full quota every micro-batch)."""
    from rasgoql_spark.streaming.ops import stream_quota

    tmp = tmp_path_factory.mktemp("squotanull")
    b1 = [(i, None if i % 2 == 0 else "h", float(i)) for i in range(8)]
    b2 = [(i, None if i % 2 == 0 else "h", float(i)) for i in range(100, 116)]
    src = str(tmp / "in")
    spark.createDataFrame(b1, "id BIGINT, host STRING, score DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, "id BIGINT, host STRING, score DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema("id BIGINT, host STRING, score DOUBLE")
           .option("maxFilesPerTrigger", 1).parquet(src))
    sink = str(tmp / "out")
    q = stream_quota(sdf, ["host"], quota=6, key="id",
                     checkpoint=str(tmp / "ckpt"), sink_path=sink,
                     order_by=["score"])
    q.awaitTermination(120)
    landed = spark.read.parquet(sink).collect()
    null_rows = [r for r in landed if r["host"] is None]
    h_rows = [r for r in landed if r["host"] == "h"]
    # batch 1 had 4 rows per group, batch 2 had 8 per group; quota 6 =>
    # all 4 from batch 1 + exactly 2 from batch 2, for BOTH groups
    for rows in (null_rows, h_rows):
        assert len(rows) == 6
        assert len([1 for r in rows if r["batch"] == 0]) == 4
        assert len([1 for r in rows if r["batch"] == 1]) == 2


def test_stream_quota_replay_is_idempotent(spark, tmp_path_factory):
    """Replaying a batch (same batch_id, same data) recomputes the
    identical admissions and overwrites its own partitions — the
    exactly-once contract, pinned against the sink function directly."""
    from rasgoql_spark.functions.curation import cap_order_exprs
    from rasgoql_spark.streaming.ops import _quota_batch_sink

    tmp = tmp_path_factory.mktemp("squotareplay")
    sink = str(tmp / "out")
    df0 = spark.createDataFrame(
        [(i, f"h{i % 2}", float(i)) for i in range(6)],
        "id BIGINT, host STRING, score DOUBLE")
    df1 = spark.createDataFrame(
        [(i, f"h{i % 2}", float(i)) for i in range(100, 112)],
        "id BIGINT, host STRING, score DOUBLE")
    order = cap_order_exprs(df0, ["score"], "id", 42, True)
    sink_fn = _quota_batch_sink(
        ["host"], 5, order, ["id", "host", "score"], sink,
        [df0.schema["host"]])
    sink_fn(df0, 0)
    sink_fn(df1, 1)
    first = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    # crash-replay batch 1: decisions must be identical (pure function of
    # the batch and EARLIER counts partitions only — its own are replaced)
    sink_fn(df1, 1)
    second = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert first == second
    # and replaying batch 0 does not see batch 1's counts (batch < b)
    sink_fn(df0, 0)
    third = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert first == third


def test_stream_quota_counts_table_is_invisible_to_readers(spark, tmp_path_factory):
    """The _counts side table lives under the sink path but underscore-
    prefixed paths are hidden from Spark's file index — plain readers of
    sink_path must see ONLY admitted rows."""
    import os

    from rasgoql_spark.streaming.ops import stream_quota

    tmp = tmp_path_factory.mktemp("squotainvis")
    src = str(tmp / "in")
    spark.createDataFrame([(i, "h", float(i)) for i in range(9)],
                          "id BIGINT, host STRING, score DOUBLE")\
        .write.parquet(src)
    sdf = (spark.readStream.schema("id BIGINT, host STRING, score DOUBLE")
           .parquet(src))
    sink = str(tmp / "out")
    q = stream_quota(sdf, ["host"], quota=4, key="id",
                     checkpoint=str(tmp / "ckpt"), sink_path=sink,
                     order_by=["score"])
    q.awaitTermination(120)
    assert os.path.isdir(os.path.join(sink, "_counts"))   # side table exists
    read = spark.read.parquet(sink)
    assert read.count() == 4                              # rows only
    assert "__admitted" not in read.columns               # schema untouched


def test_stream_quota_rejects_legacy_sink_without_counts(spark, tmp_path_factory):
    """Upgrade guard (r12 advice): a sink with batch=* data dirs but no
    _counts side table is the pre-upgrade layout — restarting against it
    must fail fast, NOT resolve spent to 0 and re-grant every group its
    full quota."""
    import shutil

    from rasgoql_spark.streaming.ops import stream_quota

    tmp = tmp_path_factory.mktemp("squotalegacy")
    src = str(tmp / "in")
    # two source files -> two micro-batches, the representative legacy
    # sink shape (a single-batch sink at batch 0 is indistinguishable
    # from the tolerated crash-replay-of-own-dir case)
    spark.createDataFrame([(i, "h", float(i)) for i in range(4)],
                          "id BIGINT, host STRING, score DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(i, "h", float(i)) for i in range(10, 14)],
                          "id BIGINT, host STRING, score DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema("id BIGINT, host STRING, score DOUBLE")
           .option("maxFilesPerTrigger", 1).parquet(src))
    sink = str(tmp / "out")
    q = stream_quota(sdf, ["host"], quota=6, key="id",
                     checkpoint=str(tmp / "ckpt"), sink_path=sink,
                     order_by=["score"])
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 6
    # simulate the pre-_counts layout: data partitions present, side
    # table gone; a fresh stream over new data must refuse to start over
    shutil.rmtree(f"{sink}/_counts")
    src2 = str(tmp / "in2")
    spark.createDataFrame([(i, "h", float(i)) for i in range(100, 106)],
                          "id BIGINT, host STRING, score DOUBLE")\
        .write.parquet(src2)
    sdf2 = (spark.readStream.schema("id BIGINT, host STRING, score DOUBLE")
            .parquet(src2))
    q2 = stream_quota(sdf2, ["host"], quota=3, key="id",
                      checkpoint=str(tmp / "ckpt2"), sink_path=sink,
                      order_by=["score"])
    import pyspark.errors

    with pytest.raises(pyspark.errors.StreamingQueryException,
                       match="pre-upgrade layout"):
        q2.awaitTermination(120)


def test_stream_quota_crash_replay_of_own_batch_dir_is_tolerated(spark, tmp_path_factory):
    """The legacy-sink guard must NOT trip on the crash-replay case: this
    batch's own data dir exists (written before a lost _counts write) —
    the replayed decision overwrites it. Only OTHER batch dirs without a
    counts table are the pre-upgrade layout."""
    import os
    import shutil

    from rasgoql_spark.functions.curation import cap_order_exprs
    from rasgoql_spark.streaming.ops import _quota_batch_sink

    tmp = tmp_path_factory.mktemp("squotareplay")
    sink = str(tmp / "out")
    df = spark.createDataFrame([(i, "h", float(i)) for i in range(5)],
                               "id BIGINT, host STRING, score DOUBLE")
    order = cap_order_exprs(df, ["score"], "id", 42, True)
    key_fields = [f for f in df.schema.fields if f.name == "host"]
    sink_fn = _quota_batch_sink(["host"], 3, order, df.columns, sink,
                                key_fields)
    # simulate: batch 0 data landed, counts write lost, then replay
    os.makedirs(f"{sink}/batch=0", exist_ok=True)
    df.limit(3).write.mode("overwrite").parquet(f"{sink}/batch=0")
    shutil.rmtree(f"{sink}/_counts", ignore_errors=True)
    sink_fn(df, 0)                       # replay of batch 0: must succeed
    assert spark.read.parquet(sink).count() == 3
    assert os.path.isdir(f"{sink}/_counts")
    # but a LATER batch over a counts-less sink with EARLIER dirs fails
    shutil.rmtree(f"{sink}/_counts")
    with pytest.raises(ParameterException, match="pre-upgrade layout"):
        sink_fn(df, 1)
