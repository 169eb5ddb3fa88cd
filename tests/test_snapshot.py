"""Snapshot diff: planted add/remove/change detection, null-safety of the
row hash, default compare-column discovery, and unchanged suppression."""

import pytest

import rasgoql_spark as rql
from rasgoql_spark.errors import ParameterException
from rasgoql_spark.functions.snapshot import diff_datasets


def _diff(spark, new_rows, old_rows, **kw):
    schema = "id long, a string, b long"
    new = spark.createDataFrame(new_rows, schema)
    old = spark.createDataFrame(old_rows, schema)
    out = diff_datasets(new, old, keys=["id"], **kw)
    return {r["id"]: r["STATUS"] for r in out.collect()}


def test_diff_statuses(spark):
    new = [(1, "x", 1), (2, "y", 2), (4, "new", 4)]
    old = [(1, "x", 1), (2, "OLD", 2), (3, "gone", 3)]
    d = _diff(spark, new, old)
    assert d == {2: "CHANGED", 3: "REMOVED", 4: "ADDED"}


def test_include_unchanged(spark):
    d = _diff(spark, [(1, "x", 1)], [(1, "x", 1)], include_unchanged=True)
    assert d == {1: "UNCHANGED"}
    assert _diff(spark, [(1, "x", 1)], [(1, "x", 1)]) == {}


def test_null_vs_empty_string_differ(spark):
    # (NULL) and ('') must hash differently — sentinel, not concat collapse
    d = _diff(spark, [(1, None, 1)], [(1, "", 1)])
    assert d == {1: "CHANGED"}


def test_null_value_unchanged_when_both_null(spark):
    d = _diff(spark, [(1, None, None)], [(1, None, None)])
    assert d == {}


def test_compare_cols_subset(spark):
    # only column a compared -> b edits invisible
    d = _diff(spark, [(1, "x", 99)], [(1, "x", 1)], compare_cols=["a"])
    assert d == {}


def test_requires_key(spark):
    df = spark.createDataFrame([(1, "x", 1)], "id long, a string, b long")
    with pytest.raises(ParameterException):
        diff_datasets(df, df, keys=[])


def test_separator_bytes_in_values_cannot_collide(spark):
    # ('a\x1fb', 'c') vs ('a', 'b\x1fc') concatenate identically under a
    # naive separator join; per-column hashing must report CHANGED
    schema = "id long, x string, y string"
    new = spark.createDataFrame([(1, "a\x1fb", "c")], schema)
    old = spark.createDataFrame([(1, "a", "b\x1fc")], schema)
    out = diff_datasets(new, old, keys=["id"])
    assert {r["id"]: r["STATUS"] for r in out.collect()} == {1: "CHANGED"}


def test_null_sentinel_literal_cannot_collide(spark):
    # a real value equal to the old NULL sentinel string must differ from NULL
    schema = "id long, x string, y string"
    new = spark.createDataFrame([(1, "\x00NULL", "x")], schema)
    old = spark.createDataFrame([(1, None, "x")], schema)
    out = diff_datasets(new, old, keys=["id"])
    assert {r["id"]: r["STATUS"] for r in out.collect()} == {1: "CHANGED"}


# --------------------------------------------------------------------------
# merge_upsert (round 10)
# --------------------------------------------------------------------------

def test_merge_upsert_update_insert_passthrough(spark):
    from rasgoql_spark.functions.snapshot import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k BIGINT, v STRING"
    )
    snap = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k BIGINT, v STRING"
    )
    out = {r["k"]: r["v"] for r in merge_upsert(base, snap, ["k"]).collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_merge_upsert_delete_missing_is_full_sync(spark):
    from rasgoql_spark.functions.snapshot import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING")
    snap = spark.createDataFrame([(2, "B2")], "k BIGINT, v STRING")
    out = merge_upsert(base, snap, ["k"], delete_missing=True).collect()
    assert [(r["k"], r["v"]) for r in out] == [(2, "B2")]


def test_merge_upsert_validation(spark):
    import pytest as _pytest

    from rasgoql_spark.errors import ParameterException
    from rasgoql_spark.functions.snapshot import merge_upsert

    base = spark.createDataFrame([(1, "a")], "k BIGINT, v STRING")
    with _pytest.raises(ParameterException):
        merge_upsert(base, base, [])
    snap_missing = spark.createDataFrame([(1,)], "k BIGINT")
    with _pytest.raises(ParameterException):
        merge_upsert(base, snap_missing, ["k"])


def test_merge_upsert_renderer_roundtrip(spark):
    from rasgoql_spark.functions.snapshot import _r_merge_upsert, merge_upsert

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k BIGINT, v STRING"
    )
    snap = spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 70, 2)], "k BIGINT, v STRING"
    )
    base.createOrReplaceTempView("__mu_base")
    snap.createOrReplaceTempView("__mu_snap")
    via_sql = spark.sql(_r_merge_upsert(
        "__mu_base", "__mu_snap", ["k"], _input_columns=("k", "v")))
    direct = merge_upsert(base, snap, ["k"])
    assert via_sql.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_sql).count() == 0


def test_merge_upsert_duplicate_keys_deterministic(spark):
    # duplicate keys within a side: the survivor is the (pri, md5-of-row)
    # minimum — stable across runs and engines, never arbitrary
    from rasgoql_spark.functions.snapshot import merge_upsert

    base = spark.createDataFrame(
        [(1, "a1"), (1, "a2"), (2, "b")], "k BIGINT, v STRING"
    )
    snap = spark.createDataFrame(
        [(2, "B1"), (2, "B2")], "k BIGINT, v STRING"
    )
    runs = [
        {(r["k"], r["v"]) for r in merge_upsert(base, snap, ["k"]).collect()}
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    assert len(runs[0]) == 2  # exactly one row per key
    # snapshot still wins for the colliding key
    assert any(k == 2 and v.startswith("B") for k, v in runs[0])
