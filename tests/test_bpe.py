"""Real-BPE tests: training determinism, apply parity against an independent
classic (min-rank-first) reference implementation, renderer parity, and the
text_chunk/pack_sequences integration."""

import re

import pytest
from pyspark.sql import functions as F

import rasgoql_spark as rql
from rasgoql_spark.functions.bpe import (
    DEFAULT_BPE_MERGES,
    bpe_count_expr,
    bpe_tokens_expr,
    train_bpe,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_encode(word, ranks):
    """Independent reference: classic min-rank-first merging (the
    priority-queue BPE algorithm, not the rank-order replace fold)."""
    syms = list(word)
    while len(syms) > 1:
        best, bi = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


def _ref_count(text, ranks):
    cleaned = re.sub(r"[^a-z0-9\s]", " ", (text or "").lower()).strip()
    toks = re.split(r"\s+", cleaned) if cleaned else []
    return sum(len(_ref_encode(w, ranks)) for w in toks)


def test_train_bpe_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m1 = train_bpe(docs, "text", num_merges=24)
    m2 = train_bpe(docs, "text", num_merges=24)
    assert m1 == m2 and len(m1) == 24
    # every rule's symbols exist before the rule (chars or earlier merges)
    known = set()
    for a, b in m1:
        assert (len(a) == 1 or a in known) and (len(b) == 1 or b in known)
        known.add(a + b)


def test_bpe_matches_reference_on_corpus(spark):
    """The rank-order replace fold must equal classic min-rank-first BPE on
    every document (the equivalence the implementation relies on)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ranks = {m: r for r, m in enumerate(DEFAULT_BPE_MERGES)}
    got = docs.select(
        "doc_id", "text", bpe_count_expr(F.col("text"), DEFAULT_BPE_MERGES).alias("N")
    ).collect()
    assert len(got) > 0
    assert all(r["N"] == _ref_count(r["text"], ranks) for r in got)


def test_bpe_pathological_runs(spark):
    """Repeated-symbol runs exercise the non-overlapping scan semantics."""
    merges = [("a", "a"), ("aa", "aa"), ("b", "a"), ("t", "h"), ("th", "e")]
    ranks = {m: r for r, m in enumerate(merges)}
    rows = [(1, "aaaa aaa aaaaa a"), (2, "ba baa aab"), (3, ""), (4, "the theth"),
            (5, "aaaaaaaa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["N"] for r in df.select(
        "doc_id", bpe_count_expr(F.col("text"), merges).alias("N")).collect()}
    exp = {i: _ref_count(t, ranks) for i, t in rows}
    assert got == exp


def test_bpe_tokens_expr_roundtrip(spark):
    df = spark.createDataFrame([(1, "The QUERY engine!")], "doc_id long, text string")
    toks = df.select(bpe_tokens_expr(F.col("text"), DEFAULT_BPE_MERGES).alias("T")) \
        .collect()[0]["T"]
    assert "".join(toks) == "thequeryengine"  # subwords reassemble the words
    assert "query" in toks  # ('q','u')+('qu','ery') merges fire


def test_token_count_bpe_chain_and_renderer_parity(session, spark):
    ds = session.dataset("documents").token_count(
        text="text", method="bpe", name="BPE_TOKEN_COUNT")
    spark_counts = {r["doc_id"]: r["BPE_TOKEN_COUNT"] for r in
                    ds.df.select("doc_id", "BPE_TOKEN_COUNT").collect()}
    session.dataset("documents").df.createOrReplaceTempView("documents")
    via_sql = {r["doc_id"]: r["BPE_TOKEN_COUNT"] for r in
               spark.sql(ds.sql()).select("doc_id", "BPE_TOKEN_COUNT").collect()}
    assert spark_counts == via_sql
    ranks = {m: r for r, m in enumerate(DEFAULT_BPE_MERGES)}
    texts = {r["doc_id"]: r["text"] for r in
             session.dataset("documents").df.collect()}
    assert all(spark_counts[i] == _ref_count(t, ranks) for i, t in texts.items())


def test_text_chunk_bpe_tokenizer(session, spark):
    out = session.dataset("documents").text_chunk(
        text="text", id_col="doc_id", chunk_size=20, overlap=0, tokenizer="bpe")
    df = out.df
    assert "CHUNK_BPE_TOKENS" in df.columns
    rows = df.limit(50).collect()
    ranks = {m: r for r, m in enumerate(DEFAULT_BPE_MERGES)}
    for r in rows:
        assert r["CHUNK_BPE_TOKENS"] == _ref_count(r["CHUNK_TEXT"], ranks)
        assert r["CHUNK_BPE_TOKENS"] >= r["CHUNK_TOKENS"]  # subwords ≥ words
    # renderer parity
    session.dataset("documents").df.createOrReplaceTempView("documents")
    via_sql = spark.sql(out.sql())
    assert via_sql.columns == df.columns
    a = {(r["doc_id"], r["CHUNK_INDEX"]): r["CHUNK_BPE_TOKENS"] for r in via_sql.collect()}
    b = {(r["doc_id"], r["CHUNK_INDEX"]): r["CHUNK_BPE_TOKENS"] for r in df.collect()}
    assert a == b


def test_bpe_counts_feed_pack_sequences(session):
    packed = (
        session.dataset("documents")
        .token_count(text="text", method="bpe", name="BPE_TOKEN_COUNT")
        .pack_sequences(token_count_col="BPE_TOKEN_COUNT", order_by="doc_id",
                        budget=2048)
    )
    df = packed.df
    assert "PACK_ID" in df.columns
    # pack ids are monotone in doc order and start at 0
    rows = df.select("doc_id", "PACK_ID").orderBy("doc_id").collect()
    assert rows[0]["PACK_ID"] == 0
    assert all(rows[i]["PACK_ID"] <= rows[i + 1]["PACK_ID"] for i in range(len(rows) - 1))


def test_bpe_encode_chain_and_renderer(session, spark):
    ds = session.dataset("documents").bpe_encode(text="text")
    df = ds.df
    assert "BPE_TOKENS" in df.columns
    session.dataset("documents").df.createOrReplaceTempView("documents")
    via = spark.sql(ds.sql())
    a = {r["doc_id"]: list(r["BPE_TOKENS"]) for r in df.collect()}
    b = {r["doc_id"]: list(r["BPE_TOKENS"]) for r in via.collect()}
    assert a == b


def _fake_merges(n):
    """n syntactically valid merge rules over 2-char symbols that can never
    fire on the corpus (symbols contain digits not adjacent in any word) —
    structure-only load for plan-size tests."""
    out = []
    i = 0
    while len(out) < n:
        a, b = f"z{i % 10}x", f"q{(i // 10) % 10}y"
        out.append((a, b))
        i += 1
    return out


def test_bpe_expression_path_compiles_at_ceiling(spark):
    """BPE_EXPR_MERGE_MAX boundary: a ceiling-sized table must stay on the
    JVM expression path and analyze+execute in bounded time (the chain hits
    a plan-conversion StackOverflowError near ~300 replaces — the constant
    must stay under that wall)."""
    import time

    from rasgoql_spark.functions.bpe import BPE_EXPR_MERGE_MAX, bpe_count_expr

    merges = DEFAULT_BPE_MERGES + _fake_merges(BPE_EXPR_MERGE_MAX - len(DEFAULT_BPE_MERGES))
    assert len(merges) == BPE_EXPR_MERGE_MAX
    df = spark.createDataFrame([("the merge stream query",)], "text string")
    t0 = time.time()
    out = df.withColumn("N", bpe_count_expr(F.col("text"), merges))
    rows = out.collect()
    elapsed = time.time() - t0
    # no-op extra rules cannot change the count vs the default table
    base = df.withColumn("N", bpe_count_expr(F.col("text"), DEFAULT_BPE_MERGES)).collect()
    assert rows[0]["N"] == base[0]["N"]
    assert elapsed < 120, f"ceiling-sized plan took {elapsed:.0f}s — ceiling too high"


def test_bpe_pandas_fallback_matches_jvm_path(spark, session):
    """Above BPE_EXPR_MERGE_MAX the apply switches to the Arrow-batched
    Python path; padding the table past the ceiling with rules that cannot
    fire must reproduce the JVM fold's output bit-for-bit."""
    from rasgoql_spark.functions.bpe import (
        BPE_EXPR_MERGE_MAX,
        bpe_apply_expr,
        bpe_count_expr,
    )

    docs = session.dataset("documents").df.select("doc_id", "text").limit(50)
    big = DEFAULT_BPE_MERGES + _fake_merges(BPE_EXPR_MERGE_MAX + 1 - len(DEFAULT_BPE_MERGES))
    assert len(big) > BPE_EXPR_MERGE_MAX

    jvm = docs.withColumn("S", bpe_apply_expr(F.col("text"), DEFAULT_BPE_MERGES)) \
              .withColumn("N", bpe_count_expr(F.col("text"), DEFAULT_BPE_MERGES))
    py = docs.withColumn("S", bpe_apply_expr(F.col("text"), big)) \
             .withColumn("N", bpe_count_expr(F.col("text"), big))
    a = {r["doc_id"]: (r["S"], r["N"]) for r in jvm.collect()}
    b = {r["doc_id"]: (r["S"], r["N"]) for r in py.collect()}
    assert a == b
