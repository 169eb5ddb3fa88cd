"""Event-time dtype regression tests.

Tz-less parquet reads as TIMESTAMP_NTZ under Spark 4's
``spark.sql.parquet.inferTimestampNTZ.enabled`` default, and both
``withWatermark`` and ``unix_micros`` reject NTZ. Every streaming /
sessionize op must accept BOTH ``timestamp`` and ``timestamp_ntz``
event-time columns — this environment drift silently invalidated a
previously-green sessionize result once; it must never reach the driver
again.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

import rasgoql_spark as rql
from rasgoql_spark.streaming.ops import read_events_stream

ROWS = [
    ("u1", datetime.datetime(2024, 1, 1, 0, 0, 0), 1),
    ("u1", datetime.datetime(2024, 1, 1, 0, 10, 0), 2),
    ("u1", datetime.datetime(2024, 1, 1, 2, 0, 0), 3),
    ("u2", datetime.datetime(2024, 1, 1, 1, 0, 0), 4),
]


def _events(spark, ts_type):
    schema = StructType(
        [
            StructField("user_id", StringType()),
            StructField("ts", ts_type),
            StructField("event_id", LongType()),
        ]
    )
    return spark.createDataFrame(ROWS, schema)


@pytest.fixture(params=[TimestampType(), TimestampNTZType()], ids=["tz", "ntz"])
def events_both(request, spark):
    return _events(spark, request.param)


def test_sessionize_batch_both_dtypes(spark, events_both):
    out = rql.get_transform("sessionize").apply(
        events_both, entity="user_id", ts="ts", gap_minutes=30.0
    )
    sids = {r["event_id"]: r["SESSION_ID"] for r in out.collect()}
    assert sids == {1: "u1#1", 2: "u1#1", 3: "u1#2", 4: "u2#1"}


def test_stream_sessionize_batch_both_dtypes(spark, events_both):
    out = rql.get_transform("stream_sessionize").apply(
        events_both, entity="user_id", ts="ts", gap_minutes=30.0
    )
    rows = {(r["user_id"], r["N_EVENTS"]) for r in out.collect()}
    assert rows == {("u1", 2), ("u1", 1), ("u2", 1)}


def test_sessionize_sql_render_both_dtypes(spark, events_both):
    events_both.createOrReplaceTempView("__ntz_events")
    sql = rql.get_transform("sessionize").render(
        "__ntz_events", entity="user_id", ts="ts", gap_minutes=30.0
    )
    got = {r["event_id"]: r["SESSION_ID"] for r in spark.sql(sql).collect()}
    assert got == {1: "u1#1", 2: "u1#1", 3: "u1#2", 4: "u2#1"}


@pytest.fixture(params=[TimestampType(), TimestampNTZType()], ids=["tz", "ntz"])
def stream_dir_both(request, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"ev_{request.param.typeName()}"))
    _events(spark, request.param).coalesce(1).write.mode("overwrite").parquet(out)
    return out


def _run_stream(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return df.sparkSession.table(name)


def test_watermark_ops_accept_both_dtypes(spark, stream_dir_both):
    """tumbling_window / session_window_agg / stream_dedup /
    stream_sessionize must all build and run a watermarked streaming query
    regardless of the parquet event-time dtype."""
    sdf = read_events_stream(spark, stream_dir_both)

    tumble = rql.get_transform("tumbling_window").apply(
        sdf,
        ts="ts",
        duration="1 hour",
        aggregations={"event_id": ["COUNT"]},
        group_by=["user_id"],
        watermark="2 hours",
    )
    got = _run_stream(tumble, "ntz_tumble", mode="complete")
    assert got.count() > 0

    dedup = rql.get_transform("stream_dedup").apply(
        sdf, keys=["user_id"], ts="ts", watermark="2 hours"
    )
    got = _run_stream(dedup, "ntz_dedup")
    assert got.count() == 2

    sess = rql.get_transform("session_window_agg").apply(
        sdf,
        ts="ts",
        gap="30 minutes",
        aggregations={"event_id": ["COUNT"]},
        group_by=["user_id"],
        watermark="2 hours",
    )
    got = _run_stream(sess, "ntz_sess", mode="complete")
    assert got.count() == 3

    ssess = rql.get_transform("stream_sessionize").apply(
        sdf, entity="user_id", ts="ts", gap_minutes=30.0, watermark="30 minutes"
    )
    # append-mode stateful query: sessions close via watermark advance
    got = _run_stream(ssess, "ntz_ssess")
    assert set(got.columns) == {"user_id", "SESSION_START", "SESSION_END", "N_EVENTS"}
