"""TF-IDF / BM25 relevance-scoring tests."""

import math

import pytest
from pyspark.sql import functions as F

import rasgoql_spark as rql


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    rows = [
        (1, "common common zebra zebra zebra"),
        (2, "common common common quark"),
        (3, "common words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rql.get_transform("tfidf_keywords").apply(
        df, text="text", id_col="doc_id", top_k=2)
    got = {(r["doc_id"], r["RANK"]): (r["TERM"], r["TF"]) for r in out.collect()}
    # 'zebra' (tf=3, df=1) beats 'common' (tf=2, df=3) in doc 1
    assert got[(1, 1)][0] == "zebra" and got[(1, 1)][1] == 3
    # common: tf=3 · (ln(4/4)+1) = 3.0 beats quark: 1 · (ln(4/2)+1) ≈ 1.69
    assert got[(2, 1)][0] == "common" and got[(2, 2)][0] == "quark"
    # scores reproduce the smooth-IDF formula
    scored = {(r["doc_id"], r["TERM"]): r["SCORE"] for r in out.collect()}
    expected = round(3 * (math.log((3 + 1) / (1 + 1)) + 1), 6)
    assert scored[(1, "zebra")] == pytest.approx(expected, abs=1e-9)


def test_tfidf_top_k_bound_and_order(session):
    out = rql.get_transform("tfidf_keywords").apply(
        session.dataset("documents").df, text="text", id_col="doc_id", top_k=5)
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 5
    rows = out.filter("doc_id = 0").orderBy("RANK").collect()
    assert all(rows[i]["SCORE"] >= rows[i + 1]["SCORE"] for i in range(len(rows) - 1))


def test_bm25_orders_matches_first(spark):
    rows = [
        (1, "spark engine spark pipeline spark"),   # heavy match
        (2, "spark appears once in this longer document about other things"),
        (3, "no relevant terms at all whatsoever"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rql.get_transform("bm25_score").apply(
        df, text="text", id_col="doc_id", query="Spark!")
    got = {r["doc_id"]: r["BM25_SCORE"] for r in out.collect()}
    assert got[1] > got[2] > 0.0
    assert got[3] == 0.0 and got[4] == 0.0
    assert set(out.columns) == {"doc_id", "text", "BM25_SCORE"}


def test_bm25_is_projection_after_stats(spark):
    """Scoring must be a broadcast of ONE stats row + projection — no
    shuffle of the corpus (exchanges only round-robin spread / broadcast)."""
    import re
    df = spark.range(1000).selectExpr(
        "id AS doc_id", "concat('term', CAST(id % 7 AS STRING), ' filler words') AS text")
    out = rql.get_transform("bm25_score").apply(
        df, text="text", id_col="doc_id", query=["term1", "term2"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # shuffle exchanges only (BroadcastExchange is the intended stats ship);
    # SinglePartition is the one-row stats aggregation, not a corpus shuffle
    exchanges = re.findall(r"(?<!Broadcast)Exchange (\w+)", plan)
    assert all(e in ("RoundRobinPartitioning", "SinglePartition") for e in exchanges), exchanges
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_sentence_split_with_punctuation(spark):
    rows = [(1, "First sentence. Second one! Third?? Done"),
            (2, "no terminal punctuation here"),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rql.get_transform("sentence_split").apply(df, text="text", id_col="doc_id")
    got = {(r["doc_id"], r["SENTENCE_INDEX"]): r["SENTENCE"] for r in out.collect()}
    assert got[(1, 0)] == "First sentence" and got[(1, 1)] == "Second one"
    assert got[(1, 2)] == "Third" and got[(1, 3)] == "Done"  # '?? ' splits
    assert got[(2, 0)] == "no terminal punctuation here"
    assert not any(k[0] == 3 for k in got)  # empty doc yields no rows


def test_heavy_hitters_exact(spark):
    rows = [(i, "a" if i % 2 == 0 else ("b" if i % 4 == 1 else f"rare{i}"))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v string")
    out = rql.get_transform("heavy_hitters").apply(df, column="v", min_share=0.1)
    got = [(r["v"], r["N"], r["SHARE"]) for r in out.collect()]
    assert got == [("a", 50, 0.5), ("b", 25, 0.25)]  # rare* filtered, ordered


def test_quantize_embeddings_roundtrip(session, spark):
    out = rql.get_transform("quantize_embeddings").apply(
        session.dataset("embeddings").df, vec_col="embedding")
    rows = out.select("vec_id", "embedding", "Q_SCALE", "Q_VEC").limit(50).collect()
    import math
    for r in rows:
        assert all(-127 <= q <= 127 for q in r["Q_VEC"])
        deq = [q * r["Q_SCALE"] for q in r["Q_VEC"]]
        dot = sum(a * b for a, b in zip(deq, r["embedding"]))
        na = math.sqrt(sum(a * a for a in deq))
        nb = math.sqrt(sum(b * b for b in r["embedding"]))
        if na > 0 and nb > 0:
            assert dot / (na * nb) > 0.999  # int8 SQ preserves direction


def test_dedup_binary_planted_dups(spark):
    rows = [(1, b"payload-A"), (2, b"payload-B"), (3, b"payload-A"), (4, b"payload-A")]
    df = spark.createDataFrame(rows, "doc_id long, CONTENT binary")
    kept = rql.get_transform("dedup_binary").apply(
        df, binary_col="CONTENT", id_col="doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}
    groups = rql.get_transform("dedup_binary").apply(
        df, binary_col="CONTENT", id_col="doc_id", mode="groups")
    got = {r["doc_id"]: r["CONTENT_GROUP"] for r in groups.collect()}
    assert got == {1: 1, 2: 2, 3: 1, 4: 1}
