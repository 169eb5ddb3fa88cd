"""Term-relevance scoring: TF-IDF keyword extraction and BM25 ranking.

Classic public formulas (sklearn-style smooth IDF; Robertson/Spärck Jones
BM25 as used by Lucene) over the engine's slim-shuffle text plumbing:

- ``tfidf_keywords``: (id, token) pairs shuffle once for TF, the token-level
  document-frequency table is slim (one row per distinct token), and the
  per-document top-k is a bounded window. Nothing wide ever shuffles.
- ``bm25_score``: the query is a LITERAL term list, so term frequencies are
  row-local array expressions; corpus statistics (N, avg doc length, per-term
  document frequencies) reduce to ONE broadcast single-row frame. Scoring is
  a shuffle-free projection — the 100 TB shape for "score every doc against
  this query".

Both round scores (default 6 dp) so results reproduce bit-for-bit across
engines; ranking ties break on the term for determinism.

Execution-only (multi-stage plans) — no SQL renderer, like the dedup ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import resolve_col, spread
from ..registry import spark_transform
from ._hash import tokens_expr


@spark_transform("tfidf_keywords", category="text", streaming_ok=False)
def tfidf_keywords(
    df: DataFrame,
    text: str,
    id_col: str,
    top_k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_k`` keywords per document by TF-IDF.

    TF = in-document term count; IDF = ln((N+1)/(df+1)) + 1 (smooth IDF —
    never zero, never divides by zero). Output ``(id, TERM, TF, SCORE,
    RANK)`` ordered by (score desc, term asc) within each document.
    """
    t, i = resolve_col(df, text), resolve_col(df, id_col)
    toks = spread(df).select(
        F.col(i).alias("__id"), F.explode(tokens_expr(F.col(t))).alias("__tok")
    )
    tf = toks.groupBy("__id", "__tok").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.select(F.countDistinct(F.col(i)).alias("__n"))
    idf = F.log((F.col("__n") + 1) / (F.col("__df") + 1)) + 1
    scored = (
        tf.join(dfreq, on="__tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("SCORE", F.round(F.col("__tf") * idf, round_to))
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("SCORE").desc(), F.col("__tok").asc()
    )
    return (
        scored.withColumn("RANK", F.row_number().over(w))
        .filter(F.col("RANK") <= top_k)
        .select(
            F.col("__id").alias(i),
            F.col("__tok").alias("TERM"),
            F.col("__tf").cast("bigint").alias("TF"),
            "SCORE",
            F.col("RANK").cast("int").alias("RANK"),
        )
    )


@spark_transform("bm25_score", category="text", streaming_ok=False)
def bm25_score(
    df: DataFrame,
    text: str,
    id_col: str,
    query,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """BM25 relevance of every document against a fixed query.

    Standard Robertson formula (the Lucene default): per query term,
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf saturates with k1 and is
    length-normalized with b against the corpus mean length. Appends
    ``BM25_SCORE`` (0.0 when no term matches or the doc is empty).

    ``query`` is a list of terms or a string (tokenized with the engine's
    normalizer). Terms are embedded as literals: per-doc term frequencies
    are row-local array expressions and every corpus statistic (N, avg doc
    length, per-term document frequencies) collapses into ONE broadcast
    single-row frame — scoring is a shuffle-free projection over the corpus.
    """
    import re as _re

    if isinstance(query, str):
        cleaned = _re.sub(r"[^a-z0-9\s]", " ", query.lower()).strip()
        terms = _re.split(r"\s+", cleaned) if cleaned else []
    else:
        terms = [str(q).lower() for q in query]
    terms = sorted(set(terms))
    if not terms:
        raise ParameterException("query must contain at least one term")
    t, i = resolve_col(df, text), resolve_col(df, id_col)
    staged = spread(df).withColumn("__toks", tokens_expr(F.col(t)))
    dlen = F.size("__toks").cast("double")
    # one single-row stats frame: N, avg length, df per term
    stat_aggs = [
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(dlen).alias("__avglen"),
    ] + [
        F.sum(F.array_contains("__toks", term).cast("int"))
        .cast("double")
        .alias(f"__df_{j}")
        for j, term in enumerate(terms)
    ]
    stats = staged.agg(*stat_aggs)
    scored = staged.crossJoin(F.broadcast(stats))

    def _eq(term):  # default-arg lambdas read as extra HOF params — factory
        return lambda x: x == F.lit(term)

    score = F.lit(0.0)
    for j, term in enumerate(terms):
        tf = F.size(F.filter("__toks", _eq(term))).cast("double")
        dfj = F.col(f"__df_{j}")
        idf = F.log(1.0 + (F.col("__n") - dfj + 0.5) / (dfj + 0.5))
        denom = tf + F.lit(k1) * (
            1.0 - F.lit(b) + F.lit(b) * dlen / F.col("__avglen")
        )
        score = score + F.when(
            tf > 0, idf * tf * (k1 + 1) / denom
        ).otherwise(F.lit(0.0))
    drop = ["__toks", "__n", "__avglen"] + [f"__df_{j}" for j in range(len(terms))]
    return scored.withColumn(
        "BM25_SCORE", F.round(score, round_to)
    ).drop(*drop)
