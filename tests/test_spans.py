"""Span-level substring dedup (Lee et al. 2021 at fixed-span granularity):
intra-document repeated-span removal and corpus-wide keep-first span dedup."""

import pytest
from pyspark.sql import functions as F

import rasgoql_spark as rql


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rrs(spark, rows, span=4):
    out = rql.get_transform("remove_repeated_spans").apply(
        _df(spark, rows), text="text", span=span
    )
    return {r["doc_id"]: (r["TEXT_DEDUPED"], r["SPANS_REMOVED"]) for r in out.collect()}


def test_remove_repeated_spans_drops_later_copies(spark):
    blk = "a b c d"
    got = _rrs(spark, [(0, f"{blk} {blk} {blk} e f g h")], span=4)
    assert got[0] == ("a b c d e f g h", 2)


def test_remove_repeated_spans_alignment_sensitive(spark):
    # the repeat exists but is shifted by one token -> spans differ -> kept
    got = _rrs(spark, [(0, "x a b c d a b c")], span=4)
    assert got[0][1] == 0


def test_remove_repeated_spans_empty_and_short(spark):
    got = _rrs(spark, [(0, ""), (1, "only three words")], span=4)
    assert got[0] == ("", 0)
    assert got[1] == ("only three words", 0)


def test_remove_repeated_spans_keeps_other_columns(spark):
    df = spark.createDataFrame([(1, "w w w w w w w w", "en")],
                               "doc_id long, text string, lang string")
    out = rql.get_transform("remove_repeated_spans").apply(df, text="text", span=4)
    row = out.collect()[0]
    assert row["lang"] == "en" and row["text"].startswith("w")
    assert row["TEXT_DEDUPED"] == "w w w w" and row["SPANS_REMOVED"] == 1


def test_dedup_spans_global_keep_first(spark):
    rows = [
        (0, "p q r s t u v w"),          # both spans first occurrences
        (1, "p q r s x y z z"),          # first span duplicates doc 0
        (2, "t u v w p q r s"),          # both spans duplicate doc 0
    ]
    out = rql.get_transform("dedup_spans").apply(
        _df(spark, rows), text="text", id_col="doc_id", span=4
    )
    got = {r["doc_id"]: (r["TEXT_DEDUPED"], r["SPANS_REMOVED"]) for r in out.collect()}
    assert got[0] == ("p q r s t u v w", 0)
    assert got[1] == ("x y z z", 1)
    assert got[2] == ("", 2)


def test_dedup_spans_drop_empty(spark):
    rows = [(0, "m n o p"), (1, "m n o p")]
    out = rql.get_transform("dedup_spans").apply(
        _df(spark, rows), text="text", id_col="doc_id", span=4, drop_empty=True
    )
    assert [r["doc_id"] for r in out.collect()] == [0]


def test_dedup_spans_within_doc_also_deduped(spark):
    # corpus-level pass subsumes intra-doc repeats at matching alignment
    out = rql.get_transform("dedup_spans").apply(
        _df(spark, [(7, "k l m n k l m n")]), text="text", id_col="doc_id", span=4
    )
    row = out.collect()[0]
    assert row["TEXT_DEDUPED"] == "k l m n" and row["SPANS_REMOVED"] == 1


def test_span_param_validation(spark):
    with pytest.raises(rql.ParameterException):
        rql.get_transform("remove_repeated_spans").apply(
            _df(spark, [(0, "a")]), text="text", span=0
        )
    with pytest.raises(rql.ParameterException):
        rql.get_transform("dedup_spans").apply(
            _df(spark, [(0, "a")]), text="text", id_col="doc_id", span=0
        )


def test_remove_repeated_spans_zero_shuffle_plan(spark):
    df = _df(spark, [(0, "a b c d a b c d")])
    out = rql.get_transform("remove_repeated_spans").apply(df, text="text", span=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "intra-doc span removal must stay shuffle-free"
