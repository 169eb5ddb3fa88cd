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

tfidf_keywords and bm25_score carry CTE-style SQL renderers (round 8);
the heavier multi-stage ops remain execution-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..naming import cleanse_name
from ..operators._util import resolve_col, spread
from ..registry import renderer, spark_transform
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


@renderer("tfidf_keywords")
def _r_tfidf_keywords(source, text, id_col, top_k=10, round_to=6) -> str:
    from .text import _tokens_sql

    toks = (
        f"(SELECT {id_col} AS __id, explode({_tokens_sql(text)}) AS __tok "
        f"FROM {source})"
    )
    tf = f"(SELECT __id, __tok, COUNT(1) AS __tf FROM {toks} GROUP BY __id, __tok)"
    dfreq = f"(SELECT __tok, COUNT(1) AS __df FROM {tf} GROUP BY __tok)"
    n = f"(SELECT COUNT(DISTINCT {id_col}) AS __n FROM {source})"
    scored = (
        f"(SELECT t.__id, t.__tok, t.__tf, "
        f"round(t.__tf * (ln((n.__n + 1) / (d.__df + 1)) + 1), {int(round_to)}) "
        f"AS SCORE FROM {tf} t JOIN {dfreq} d ON t.__tok = d.__tok "
        f"CROSS JOIN {n} n)"
    )
    return (
        f"SELECT __id AS {id_col}, __tok AS TERM, CAST(__tf AS BIGINT) AS TF, "
        f"SCORE, CAST(RANK AS INT) AS RANK FROM "
        f"(SELECT *, ROW_NUMBER() OVER (PARTITION BY __id "
        f"ORDER BY SCORE DESC, __tok ASC) AS RANK FROM {scored}) "
        f"WHERE RANK <= {int(top_k)}"
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


@renderer("bm25_score")
def _r_bm25_score(source, text, id_col, query, k1=1.2, b=0.75, round_to=6) -> str:
    import re as _re

    from .text import _tokens_sql

    if isinstance(query, str):
        cleaned = _re.sub(r"[^a-z0-9\s]", " ", query.lower()).strip()
        terms = _re.split(r"\s+", cleaned) if cleaned else []
    else:
        terms = [str(q).lower() for q in query]
    terms = sorted(set(terms))
    if not terms:
        raise ParameterException("query must contain at least one term")
    lits = [t.replace("'", "''") for t in terms]
    staged = f"(SELECT *, {_tokens_sql(text)} AS __toks FROM {source})"
    dlen = "CAST(size(__toks) AS DOUBLE)"
    stat_cols = ", ".join(
        [f"CAST(COUNT(1) AS DOUBLE) AS __n, AVG({dlen}) AS __avglen"]
        + [
            f"CAST(SUM(CAST(array_contains(__toks, '{t}') AS INT)) AS DOUBLE) "
            f"AS __df_{j}"
            for j, t in enumerate(lits)
        ]
    )
    stats = f"(SELECT {stat_cols} FROM {staged})"
    score = "CAST(0.0 AS DOUBLE)"
    for j, t in enumerate(lits):
        tf = f"CAST(size(filter(__toks, x -> x = '{t}')) AS DOUBLE)"
        idf = f"ln(1.0 + (__n - __df_{j} + 0.5) / (__df_{j} + 0.5))"
        denom = f"({tf} + {k1} * (1.0 - {b} + {b} * {dlen} / __avglen))"
        score += (
            f" + CASE WHEN {tf} > 0 THEN {idf} * {tf} * ({k1} + 1) / {denom} "
            f"ELSE CAST(0.0 AS DOUBLE) END"
        )
    drop = ", ".join(
        ["__toks", "__n", "__avglen"] + [f"__df_{j}" for j in range(len(lits))]
    )
    return (
        f"SELECT * EXCEPT ({drop}) FROM (SELECT *, "
        f"round({score}, {int(round_to)}) AS BM25_SCORE "
        f"FROM {staged} CROSS JOIN {stats})"
    )


# --------------------------------------------------------------------------
# round 10: hybrid retrieval — literal-query vector scoring + RRF fusion
# --------------------------------------------------------------------------

@spark_transform("vector_score", category="similarity", streaming_ok=False)
def vector_score(
    df: DataFrame,
    vec_col: str,
    query_vec,
    name: str = "QUERY_COSINE",
    round_to: int = 6,
) -> DataFrame:
    """Cosine of every row's embedding against ONE literal query vector.

    The dense-retrieval dual of ``bm25_score``: the query embeds as a
    literal array, so scoring is a shuffle-free row-local projection over
    the corpus (the 100 TB shape for "score every doc against this query").
    Zero-norm rows (and rows of mismatched dimension, which zip_with
    truncates/null-pads) score 0.0 by the shared cosine_expr guard. Scores
    round to ``round_to`` for cross-engine replay; compose with
    :func:`rrf_fuse` for hybrid lexical+semantic ranking.
    """
    from ._litfast import double_array_lit
    from .dedup import cosine_expr

    qv = [float(x) for x in query_vec]
    if not qv:
        raise ParameterException("query_vec must be non-empty")
    v = resolve_col(df, vec_col)
    qlit = double_array_lit(qv)
    return df.withColumn(
        name, F.round(cosine_expr(F.col(v), qlit), round_to)
    )


@renderer("vector_score")
def _r_vector_score(source, vec_col, query_vec, name="QUERY_COSINE",
                    round_to=6) -> str:
    from .dedup import _cosine_sql

    qv = [float(x) for x in query_vec]
    if not qv:
        raise ParameterException("query_vec must be non-empty")
    qlit = "array(%s)" % ", ".join(f"CAST({x!r} AS DOUBLE)" for x in qv)
    return (
        f"SELECT *, round({_cosine_sql(vec_col, qlit)}, {int(round_to)}) "
        f"AS {name} FROM {source}"
    )


@spark_transform("rrf_fuse", category="similarity", streaming_ok=False)
def rrf_fuse(
    df: DataFrame,
    id_col: str,
    score_cols,
    k0: int = 60,
    k: int | None = None,
    partition=None,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of multiple score columns (Cormack, Clarke &
    Büttcher 2009): ``RRF_SCORE = Σ_s 1 / (k0 + rank_s)`` where each
    ``rank_s`` is competition rank (RANK, descending, ties → same rank)
    with ``id_col`` as the final tie-break. A NULL score means the row is
    ABSENT from that ranking: its ``RANK_{COL}`` is NULL and the ranking
    contributes 0 to ``RRF_SCORE`` (the standard RRF convention — summing
    only over rankings that returned the document). Appends one
    ``RANK_{COL}`` per input plus ``RRF_SCORE``; with ``k`` set, keeps the
    fused top-k and appends ``RRF_RANK``. The standard way to combine a
    lexical (BM25) and a semantic (cosine) ranking without score
    calibration.

    Scale: ranks over an unpartitioned frame funnel one task — correct for
    a per-query candidate set (the normal shape: fuse the top few thousand
    candidates each retriever already produced); pass ``partition`` (e.g. a
    query id) to fuse many result sets in one pass, which shuffles once on
    that key.
    """
    from ..operators._util import as_list

    cols = [resolve_col(df, c) for c in as_list(score_cols)]
    if len(cols) < 2:
        raise ParameterException("rrf_fuse needs at least two score columns")
    if k0 < 1:
        raise ParameterException("k0 must be >= 1")
    i = resolve_col(df, id_col)
    keys = [resolve_col(df, c) for c in as_list(partition)]
    base = Window.partitionBy(*keys) if keys else Window.partitionBy()
    out = df
    rrf = F.lit(0.0)
    for c in cols:
        # rank over the score ALONE: equal scores share a competition rank
        # (deterministic without any tie-break); id breaks ties only in the
        # final fused top-k row_number
        w = base.orderBy(F.col(c).desc_nulls_last())
        # NULL score ⇒ absent from this ranking ⇒ NULL rank, 0 RRF term
        rank_c = F.when(
            F.col(c).isNotNull(), F.rank().over(w).cast("int")
        )
        out = out.withColumn(f"RANK_{cleanse_name(c)}", rank_c)
        rrf = rrf + F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"RANK_{cleanse_name(c)}")),
            F.lit(0.0),
        )
    out = out.withColumn("RRF_SCORE", F.round(rrf, round_to))
    if k is not None:
        if k < 1:
            raise ParameterException("k must be >= 1")
        wtop = base.orderBy(F.col("RRF_SCORE").desc(), F.col(i).asc())
        out = (
            out.withColumn("RRF_RANK", F.row_number().over(wtop).cast("int"))
            .filter(F.col("RRF_RANK") <= k)
        )
    return out


@renderer("rrf_fuse")
def _r_rrf_fuse(source, id_col, score_cols, k0=60, k=None, partition=None,
                round_to=6) -> str:
    from ..operators._util import as_list

    cols = as_list(score_cols)
    if len(cols) < 2:
        raise ParameterException("rrf_fuse needs at least two score columns")
    keys = as_list(partition)
    part = f"PARTITION BY {', '.join(keys)} " if keys else ""
    ranks = ", ".join(
        f"CASE WHEN {c} IS NOT NULL THEN "
        f"CAST(RANK() OVER ({part}ORDER BY {c} DESC NULLS LAST) AS INT) "
        f"END AS RANK_{cleanse_name(c)}"
        for c in cols
    )
    rrf = " + ".join(
        f"COALESCE(1.0 / ({float(k0)!r} + RANK_{cleanse_name(c)}), 0.0)"
        for c in cols
    )
    ranked = (
        f"SELECT *, ROUND({rrf}, {int(round_to)}) AS RRF_SCORE FROM "
        f"(SELECT *, {ranks} FROM {source})"
    )
    if k is None:
        return ranked
    if k < 1:
        raise ParameterException("k must be >= 1")
    return (
        f"SELECT * FROM (SELECT *, CAST(ROW_NUMBER() OVER ({part}"
        f"ORDER BY RRF_SCORE DESC, {id_col} ASC) AS INT) AS RRF_RANK "
        f"FROM ({ranked})) WHERE RRF_RANK <= {int(k)}"
    )


@spark_transform("bm25_join", category="relevance", streaming_ok=False)
def bm25_join(
    df: DataFrame,
    text: str,
    id_col: str,
    queries: DataFrame,
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-k BM25 matches for EVERY row of a query table — the batch
    retrieval join (``bm25_score`` handles one literal query; a training-
    data pipeline dedups/links against thousands). Returns
    ``(QUERY_ID, MATCH_ID, BM25_SCORE, RANK)``; documents sharing no term
    with a query don't appear (standard inverted-index semantics).

    The per-(query, doc) score sums per-term contributions; contributions
    are quantized to 9 dp and summed as exact BIGINTs (same order-free
    contract as ``timeseries.zscore_stats``) so the result replays
    bit-for-bit however the terms shuffle.

    Scale: the corpus side becomes a (doc, term, tf) postings table — ONE
    explode + count; queries explode to slim (qid, term) and BROADCAST to
    the postings (the query table is small by construction); doc lengths
    and term document-frequencies are slim side tables joined on their own
    keys. The only wide shuffle is the (qid, doc) score aggregate. Stop-
    word-heavy queries fan out on hot terms — AQE skew handles the join,
    and the per-query top-k bounds the output.
    """
    if k < 1:
        raise ParameterException("k must be >= 1")
    from ._cache import release_with, scoped_persist

    t, i = resolve_col(df, text), resolve_col(df, id_col)
    qi, qt = resolve_col(queries, query_id), resolve_col(queries, query_text)
    # tokenization feeds THREE consumers (lengths, corpus stats, postings)
    # and the postings feed two (df table + the query join) — cache both or
    # the regex tokenizer / explode+count re-execute per consumer
    staged = scoped_persist(spread(df).select(
        F.col(i).alias("__doc"), tokens_expr(F.col(t)).alias("__toks")
    ))
    lens = staged.select("__doc", F.size("__toks").cast("double").alias("__dlen"))
    stats = staged.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(F.size("__toks").cast("double")).alias("__avglen"),
    )
    postings = scoped_persist(
        staged.select("__doc", F.explode("__toks").alias("__term"))
        .groupBy("__doc", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    dft = postings.groupBy("__term").agg(
        F.count(F.lit(1)).cast("double").alias("__dft")
    )
    qterms = queries.select(
        F.col(qi).alias("QUERY_ID"),
        F.explode(F.array_distinct(tokens_expr(F.col(qt)))).alias("__term"),
    )
    joined = (
        postings.join(F.broadcast(qterms), on="__term")
        .join(dft, on="__term")
        .join(lens, on="__doc")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(1.0 + (F.col("__n") - F.col("__dft") + 0.5) / (F.col("__dft") + 0.5))
    denom = F.col("__tf") + k1 * (1.0 - b + b * F.col("__dlen") / F.col("__avglen"))
    contrib = idf * F.col("__tf") * (k1 + 1.0) / denom
    ci = F.round(contrib * 1e9, 0).cast("bigint")
    scores = (
        joined.select("QUERY_ID", F.col("__doc").alias("MATCH_ID"), ci.alias("__ci"))
        .groupBy("QUERY_ID", "MATCH_ID")
        .agg(F.round(F.sum("__ci") / 1e9, round_to).alias("BM25_SCORE"))
    )
    w = Window.partitionBy("QUERY_ID").orderBy(
        F.col("BM25_SCORE").desc(), F.col("MATCH_ID").asc()
    )
    out = (
        scores.withColumn("RANK", F.row_number().over(w).cast("int"))
        .filter(F.col("RANK") <= k)
    )
    return release_with(out, staged, postings)


@renderer("bm25_join")
def _r_bm25_join(source, text, id_col, queries, query_id="query_id",
                 query_text="query_text", k=10, k1=1.2, b=0.75,
                 round_to=6) -> str:
    from .text import _tokens_sql

    if k < 1:
        raise ParameterException("k must be >= 1")
    toks = _tokens_sql(text)
    qtoks = _tokens_sql(query_text)
    idf = "ln(1.0 + (__n - __dft + 0.5) / (__dft + 0.5))"
    denom = f"(__tf + {k1} * (1.0 - {b} + {b} * __dlen / __avglen))"
    contrib = f"{idf} * __tf * {k1 + 1.0} / {denom}"
    parts = [
        f"__bj_d AS (SELECT {id_col} AS __doc, {toks} AS __toks FROM {source})",
        "__bj_len AS (SELECT __doc, CAST(size(__toks) AS DOUBLE) AS __dlen FROM __bj_d)",
        "__bj_stats AS (SELECT CAST(COUNT(1) AS DOUBLE) AS __n, "
        "AVG(CAST(size(__toks) AS DOUBLE)) AS __avglen FROM __bj_d)",
        "__bj_t AS (SELECT __doc, __term, CAST(COUNT(1) AS DOUBLE) AS __tf "
        "FROM __bj_d LATERAL VIEW explode(__toks) AS __term GROUP BY __doc, __term)",
        "__bj_df AS (SELECT __term, CAST(COUNT(1) AS DOUBLE) AS __dft "
        "FROM __bj_t GROUP BY __term)",
        f"__bj_q AS (SELECT {query_id} AS QUERY_ID, __term FROM {queries} q "
        f"LATERAL VIEW explode(array_distinct({qtoks})) AS __term)",
        "__bj_s AS (SELECT QUERY_ID, t.__doc AS MATCH_ID, "
        f"ROUND(SUM(CAST(ROUND(({contrib}) * 1000000000.0, 0) AS BIGINT)) / 1000000000.0, {int(round_to)}) AS BM25_SCORE "
        "FROM __bj_t t JOIN __bj_q USING (__term) JOIN __bj_df USING (__term) "
        "JOIN __bj_len USING (__doc) CROSS JOIN __bj_stats "
        "GROUP BY QUERY_ID, t.__doc)",
    ]
    return (
        "SELECT * FROM (WITH " + ", ".join(parts)
        + " SELECT QUERY_ID, MATCH_ID, BM25_SCORE, CAST(ROW_NUMBER() OVER ("
        "PARTITION BY QUERY_ID ORDER BY BM25_SCORE DESC, MATCH_ID ASC) AS INT) AS RANK "
        f"FROM __bj_s) __bj_out WHERE RANK <= {int(k)}"
    )


@spark_transform("ranking_eval", category="relevance", streaming_ok=False)
def ranking_eval(
    df: DataFrame,
    query_col: str,
    rank_col: str,
    label_col: str,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-query ranking metrics: ``NDCG_K`` (exponential gains,
    Järvelin & Kekäläinen 2002), ``MRR`` (reciprocal rank of the first
    relevant hit), ``PRECISION_K``, ``RECALL_K`` (relevant hits in the
    top-k over ALL relevant documents for the query), and ``AP``
    (TREC-style average precision truncated at k: sum of precision@i over
    relevant ranked positions i <= k, divided by the query's TOTAL
    relevant count — the macro mean of ``AP`` across queries is MAP) —
    the evaluation companion of ``bm25_join`` / ``rrf_fuse`` (feed their
    output plus a relevance-label column straight in). ``rank_col`` is
    the system's 1-based rank; ``label_col`` is a non-negative integer
    graded relevance (0 = not relevant; AP/recall treat any label > 0 as
    relevant, the standard binarization of graded judgments).

    Determinism: the 1/log2(rank+1) discount weights are PYTHON-computed
    literals (both engines receive identical doubles — no cross-engine
    log2), per-query sums accumulate as 9-dp-quantized exact BIGINTs
    (AP's precision@i terms included), and ideal gains depend only on the
    (label, position) multiset, so label ties cannot flip the result. The
    AP cumulative-relevant count uses a RANGE frame on the rank value, so
    duplicate ranks (a malformed but possible input) still aggregate
    deterministically.

    Scale: two window passes (ideal positions; cumulative relevant by
    rank) + one hash aggregate on the query key. Queries with no relevant
    document score 0 on every metric (not null — they count against a
    macro average).
    """
    if k < 1:
        raise ParameterException("k must be >= 1")
    q = resolve_col(df, query_col)
    r = resolve_col(df, rank_col)
    lab = resolve_col(df, label_col)
    from ._litfast import double_array_lit

    import math as _math

    weights = [1.0 / _math.log2(i + 1) for i in range(1, k + 1)]
    wlit = double_array_lit(weights)
    gain = F.pow(F.lit(2.0), F.col(lab).cast("double")) - 1.0
    w_sys = F.when(
        (F.col(r) >= 1) & (F.col(r) <= k),
        F.element_at(wlit, F.col(r).cast("int")),
    ).otherwise(F.lit(0.0))
    ideal_pos = F.row_number().over(
        Window.partitionBy(q).orderBy(F.col(lab).desc())
    )
    rel = F.col(lab).cast("double") > 0
    valid = F.col(r) >= 1
    # cumulative relevant count through each rank value (RANGE frame:
    # duplicate ranks both see the full tied count — deterministic)
    wcum = (
        Window.partitionBy(q)
        .orderBy(F.col(r).cast("bigint").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumrel = F.sum(F.when(rel & valid, 1).otherwise(0)).over(wcum)
    staged = df.withColumn("__ipos", ideal_pos).withColumn("__cumrel", cumrel)
    w_ideal = F.when(
        F.col("__ipos") <= k, F.element_at(wlit, F.col("__ipos"))
    ).otherwise(F.lit(0.0))
    qi = lambda c: F.round(c * 1e9, 0).cast("bigint")  # noqa: E731
    ap_term = F.when(
        rel & valid & (F.col(r) <= k),
        F.col("__cumrel").cast("double") / F.col(r).cast("double"),
    ).otherwise(F.lit(0.0))
    agg = staged.groupBy(q).agg(
        F.sum(qi(gain * w_sys)).alias("__dcg"),
        F.sum(qi(gain * w_ideal)).alias("__idcg"),
        F.min(F.when(rel & (F.col(r) >= 1), F.col(r).cast("bigint"))).alias("__fr"),
        F.sum(F.when(rel & (F.col(r) >= 1) & (F.col(r) <= k), 1).otherwise(0))
        .alias("__hits"),
        F.sum(qi(ap_term)).alias("__apn"),
        F.sum(F.when(rel, 1).otherwise(0)).cast("bigint").alias("__nrel"),
    )
    return agg.select(
        q,
        F.when(F.col("__idcg") > 0,
               F.round(F.col("__dcg").cast("double") / F.col("__idcg"), round_to)
               ).otherwise(F.lit(0.0)).alias(f"NDCG_{k}"),
        F.coalesce(F.round(1.0 / F.col("__fr"), round_to), F.lit(0.0)).alias("MRR"),
        F.round(F.col("__hits") / F.lit(float(k)), round_to).alias(f"PRECISION_{k}"),
        F.when(F.col("__nrel") > 0,
               F.round(F.col("__hits") / F.col("__nrel").cast("double"), round_to)
               ).otherwise(F.lit(0.0)).alias(f"RECALL_{k}"),
        F.when(F.col("__nrel") > 0,
               F.round(F.col("__apn").cast("double") / 1e9 / F.col("__nrel"),
                       round_to)
               ).otherwise(F.lit(0.0)).alias("AP"),
    )


@renderer("ranking_eval")
def _r_ranking_eval(source, query_col, rank_col, label_col, k=10,
                    round_to=6) -> str:
    import math as _math

    if k < 1:
        raise ParameterException("k must be >= 1")
    weights = [1.0 / _math.log2(i + 1) for i in range(1, k + 1)]
    wlit = "array(%s)" % ", ".join(f"CAST({w!r} AS DOUBLE)" for w in weights)
    gain = f"(POW(2.0, CAST({label_col} AS DOUBLE)) - 1.0)"
    w_sys = (
        f"CASE WHEN {rank_col} >= 1 AND {rank_col} <= {k} "
        f"THEN element_at({wlit}, CAST({rank_col} AS INT)) ELSE 0.0 END"
    )
    w_ideal = (
        f"CASE WHEN __ipos <= {k} THEN element_at({wlit}, __ipos) ELSE 0.0 END"
    )
    rel = f"CAST({label_col} AS DOUBLE) > 0"
    qi = "CAST(ROUND(({x}) * 1000000000.0, 0) AS BIGINT)"
    cumrel = (
        f"SUM(CASE WHEN {rel} AND {rank_col} >= 1 THEN 1 ELSE 0 END) "
        f"OVER (PARTITION BY {query_col} ORDER BY CAST({rank_col} AS BIGINT) "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    staged = (
        f"(SELECT *, ROW_NUMBER() OVER (PARTITION BY {query_col} "
        f"ORDER BY {label_col} DESC) AS __ipos, {cumrel} AS __cumrel "
        f"FROM {source})"
    )
    ap_term = (
        f"CASE WHEN {rel} AND {rank_col} >= 1 AND {rank_col} <= {k} "
        f"THEN CAST(__cumrel AS DOUBLE) / CAST({rank_col} AS DOUBLE) "
        "ELSE 0.0 END"
    )
    inner = (
        f"SELECT {query_col}, "
        f"SUM({qi.format(x=f'{gain} * ({w_sys})')}) AS __dcg, "
        f"SUM({qi.format(x=f'{gain} * ({w_ideal})')}) AS __idcg, "
        f"MIN(CASE WHEN {rel} AND {rank_col} >= 1 THEN CAST({rank_col} AS BIGINT) END) AS __fr, "
        f"SUM(CASE WHEN {rel} AND {rank_col} >= 1 AND {rank_col} <= {k} "
        f"THEN 1 ELSE 0 END) AS __hits, "
        f"SUM({qi.format(x=ap_term)}) AS __apn, "
        f"CAST(SUM(CASE WHEN {rel} THEN 1 ELSE 0 END) AS BIGINT) AS __nrel "
        f"FROM {staged} GROUP BY {query_col}"
    )
    return (
        f"SELECT {query_col}, "
        f"CASE WHEN __idcg > 0 THEN ROUND(CAST(__dcg AS DOUBLE) / __idcg, {round_to}) "
        f"ELSE 0.0 END AS NDCG_{k}, "
        f"COALESCE(ROUND(1.0 / __fr, {round_to}), 0.0) AS MRR, "
        f"ROUND(__hits / CAST({float(k)!r} AS DOUBLE), {round_to}) AS PRECISION_{k}, "
        f"CASE WHEN __nrel > 0 THEN ROUND(__hits / CAST(__nrel AS DOUBLE), {round_to}) "
        f"ELSE 0.0 END AS RECALL_{k}, "
        f"CASE WHEN __nrel > 0 THEN ROUND(CAST(__apn AS DOUBLE) / 1000000000.0 / __nrel, "
        f"{round_to}) ELSE 0.0 END AS AP "
        f"FROM ({inner})"
    )


@spark_transform("hard_negative_mine", category="relevance", streaming_ok=False)
def hard_negative_mine(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    positives,
    query_ids=None,
    queries: DataFrame | None = None,
    k: int = 5,
    round_scores: int = 6,
) -> DataFrame:
    """Mine hard negatives for contrastive retrieval training: for each
    query, the top-``k`` most-similar corpus rows that are NOT labeled
    positives (and not the query itself) — the highest-value negatives for
    a bi-encoder loss (the "in-corpus hard negative" recipe of DPR,
    Karpukhin et al. 2020). ``positives`` is a list of ``(query_id,
    doc_id)`` pairs or a 2-column DataFrame. Output ``(QUERY_ID, NEG_ID,
    COSINE, RANK)``.

    Scale: queries broadcast against the corpus (exact scan — the recall
    baseline); the positives side broadcasts into a left-anti join BEFORE
    the top-k window, so excluded pairs never rank. At 100 TB swap the scan
    stage for an ANN candidate join (``embedding_join_ivf*``) and anti-join
    the same positives — identical downstream shape. Scores use the
    engine's standard ``cosine_expr`` (dot / norm product), the form every
    cross-engine oracle replays bit-for-bit.
    """
    from .dedup import cosine_expr

    if k < 1:
        raise ParameterException("k must be >= 1")
    v, i = resolve_col(df, vec_col), resolve_col(df, id_col)
    if queries is None:
        if not query_ids:
            raise ParameterException("pass queries or query_ids")
        qdf = df.filter(F.col(i).isin(list(query_ids)))
    else:
        qdf = queries
    spark = df.sparkSession
    if isinstance(positives, DataFrame):
        pos = positives.toDF("QUERY_ID", "NEG_ID")
    else:
        pairs = [(a, b) for a, b in positives]
        if not pairs:
            raise ParameterException("positives must be non-empty")
        pos = spark.createDataFrame(pairs, ["QUERY_ID", "NEG_ID"])
    corpus = spread(df).select(
        F.col(i).alias("NEG_ID"), F.col(v).alias("__cv")
    )
    q = qdf.select(
        F.col(resolve_col(qdf, i)).alias("QUERY_ID"),
        F.col(resolve_col(qdf, v)).alias("__qv"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("QUERY_ID") != F.col("NEG_ID"))
        .join(F.broadcast(pos), on=["QUERY_ID", "NEG_ID"], how="left_anti")
        .withColumn(
            "COSINE",
            F.round(cosine_expr(F.col("__qv"), F.col("__cv")), round_scores),
        )
    )
    w = Window.partitionBy("QUERY_ID").orderBy(
        F.col("COSINE").desc(), F.col("NEG_ID").asc()
    )
    return (
        scored.withColumn("RANK", F.row_number().over(w).cast("int"))
        .filter(F.col("RANK") <= k)
        .select("QUERY_ID", "NEG_ID", "COSINE", "RANK")
    )


@renderer("hard_negative_mine")
def _r_hard_negative_mine(source, vec_col, id_col, positives, query_ids=None,
                          queries=None, k=5, round_scores=6) -> str:
    """Renderable only for the literal-parameter form (query_ids +
    positives as a pair list) — a DataFrame positives/queries side is
    execution-state the SQL artifact cannot reference."""
    from ..errors import TransformRenderingException
    from .dedup import _cosine_sql

    if k < 1:
        raise ParameterException("k must be >= 1")
    if queries is not None or isinstance(positives, DataFrame):
        raise TransformRenderingException(
            "hard_negative_mine renders only with query_ids and a literal "
            "positives pair list — DataFrame sides are execution-only"
        )
    if not query_ids:
        raise ParameterException("pass queries or query_ids")

    def _lit(v):  # render ids faithfully — no int() coercion (a string id
        # must not raise, a float id must not silently truncate)
        if isinstance(v, bool) or not isinstance(v, (int, float, str)):
            raise ParameterException(
                f"id values must be int/float/str, got {type(v).__name__}"
            )
        if isinstance(v, str):
            return "'%s'" % v.replace("'", "''")
        return repr(v)

    pairs = [(a, b) for a, b in positives]
    if not pairs:
        raise ParameterException("positives must be non-empty")
    ids = ", ".join(_lit(q) for q in query_ids)
    pos = ", ".join(f"({_lit(a)}, {_lit(b)})" for a, b in pairs)
    cos = _cosine_sql("c.__cv", "q.__qv")
    return (
        f"WITH q AS (SELECT {id_col} AS QUERY_ID, {vec_col} AS __qv "
        f"FROM {source} WHERE {id_col} IN ({ids})), "
        f"pos AS (SELECT * FROM (VALUES {pos}) AS t(QUERY_ID, NEG_ID)), "
        f"c AS (SELECT {id_col} AS NEG_ID, {vec_col} AS __cv FROM {source}), "
        f"scored AS (SELECT q.QUERY_ID, c.NEG_ID, "
        f"round({cos}, {int(round_scores)}) AS COSINE "
        f"FROM c CROSS JOIN q WHERE c.NEG_ID <> q.QUERY_ID), "
        f"filt AS (SELECT s.* FROM scored s LEFT ANTI JOIN pos p "
        f"ON s.QUERY_ID = p.QUERY_ID AND s.NEG_ID = p.NEG_ID) "
        f"SELECT QUERY_ID, NEG_ID, COSINE, RANK FROM "
        f"(SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY QUERY_ID "
        f"ORDER BY COSINE DESC, NEG_ID ASC) AS INT) AS RANK FROM filt) "
        f"WHERE RANK <= {int(k)}"
    )
