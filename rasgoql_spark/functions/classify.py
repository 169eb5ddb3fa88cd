"""Multinomial Naive Bayes text classification — the closed-form cousin of
the fastText-style linear classifiers used for corpus quality and language
filtering (public technique: add-alpha-smoothed multinomial NB, e.g.
Manning/Raghavan/Schütze IR book ch. 13). Training is a single counting
aggregation (no iterative optimization), which is what makes the operator
both 100 TB-friendly and exactly replayable in ANSI SQL for the oracle.

Model, fit on the input corpus itself:
    P(label)      = docs(label) / docs            (MLE prior)
    P(token|label)= (C(token,label) + alpha) / (C(label) + alpha * V)
score(doc, label) = ln P(label) + sum_tokens ln P(token|label); the
prediction is the argmax over labels (ties -> lexicographically smallest
label) with scores rounded to ``round_to`` decimals so both engines rank
identically.

100 TB design: the (token, label) count table and label statistics are
vocabulary-bounded aggregations with map-side partial combine; the corpus
ships once as slim (id, token) pairs; the labels frame (distinct labels,
bounded by ``max_labels``) broadcasts, so the per-label expansion is a
BroadcastNestedLoopJoin of L small rows — the corpus never shuffles more
than its own token count, and nothing iterates. Zero Python on data.

No counterpart in the reference (rasgoql has no ML scoring); public
technique only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import resolve_col, spread
from ..registry import renderer, spark_transform
from ._hash import md5_int, tokens_expr


@spark_transform("nb_classify", category="ml", streaming_ok=False)
def nb_classify(
    df: DataFrame,
    text: str,
    label_col: str,
    id_col: str,
    alpha: float = 1.0,
    round_to: int = 6,
    max_labels: int = 1000,
) -> DataFrame:
    """Append ``NB_PRED`` (predicted label) and ``NB_LOGPROB`` (the rounded
    joint log-probability of the winning label) from a multinomial NB model
    fit on this corpus's (text, label) pairs. Self-fit is the corpus-
    diagnostic mode (how separable are my labels? which docs look mislabeled
    at low margin?); to score a different corpus, fit here and join the
    produced columns, or run the same transform on a union.

    Docs with zero tokens fall back to the prior-only argmax. Raises if the
    label column has more than ``max_labels`` distinct values (the per-label
    broadcast expansion is designed for label cardinality, not key
    cardinality).
    """
    if alpha <= 0:
        raise ParameterException("alpha must be > 0")
    t = resolve_col(df, text)
    lab = resolve_col(df, label_col)
    i = resolve_col(df, id_col)

    base = spread(df).select(
        F.col(i).alias("__id"),
        F.col(lab).cast("string").alias("__lab"),
        tokens_expr(F.col(t)).alias("__t"),
    )
    labels = base.select("__lab").distinct()
    n_labels = labels.count()  # bounded action: distinct labels
    if n_labels > max_labels:
        raise ParameterException(
            f"{lab!r} has {n_labels} distinct values (max_labels={max_labels})"
        )

    pairs = base.select("__id", F.explode("__t").alias("__tok"))
    # vocabulary-bounded count tables (partial-combine aggregations)
    tl = (
        base.select("__lab", F.explode("__t").alias("__tok"))
        .groupBy("__tok", "__lab")
        .agg(F.count(F.lit(1)).alias("__ctl"))
    )
    lstats = base.groupBy("__lab").agg(
        F.sum(F.size("__t")).cast("double").alias("__cl"),
        F.count(F.lit(1)).cast("double").alias("__dl"),
    )
    gstats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    vocab = pairs.select("__tok").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__v")
    )

    # per-(doc, label) token log-likelihood sums: corpus pairs fan out only
    # by the broadcast label frame; the (token, label) join is AQE-sized
    scored = (
        pairs.crossJoin(F.broadcast(labels))
        .join(tl, on=["__tok", "__lab"], how="left")
        .join(F.broadcast(lstats), on="__lab")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__id",
            "__lab",
            F.log(
                (F.coalesce(F.col("__ctl"), F.lit(0)) + F.lit(alpha))
                / (F.col("__cl") + F.lit(alpha) * F.col("__v"))
            ).alias("__ll"),
        )
        .groupBy("__id", "__lab")
        .agg(F.sum("__ll").alias("__sll"))
    )
    with_prior = (
        scored.join(F.broadcast(lstats.select("__lab", "__dl")), on="__lab")
        .crossJoin(F.broadcast(gstats))
        .select(
            "__id",
            "__lab",
            F.round(F.col("__sll") + F.log(F.col("__dl") / F.col("__n")), round_to)
            .alias("__score"),
        )
    )
    # argmax via min(struct(-score, label)): highest score, ties -> smallest
    # label — a skew-free hash aggregation, no window
    best = (
        with_prior.groupBy("__id")
        .agg(F.min(F.struct(F.negate(F.col("__score")).alias("__ns"), F.col("__lab"))).alias("__b"))
        .select(
            "__id",
            F.col("__b.__lab").alias("NB_PRED"),
            F.negate(F.col("__b.__ns")).alias("NB_LOGPROB"),
        )
    )
    # prior-only fallback for zero-token docs (one-row broadcast)
    prior_best = (
        lstats.crossJoin(gstats)
        .select(
            F.round(F.log(F.col("__dl") / F.col("__n")), round_to).alias("__score"),
            "__lab",
        )
        .agg(F.min(F.struct(F.negate(F.col("__score")).alias("__ns"), F.col("__lab"))).alias("__b"))
        .select(
            F.col("__b.__lab").alias("__fallback_pred"),
            F.negate(F.col("__b.__ns")).alias("__fallback_lp"),
        )
    )
    out = (
        df.join(best.withColumnRenamed("__id", i), on=i, how="left")
        .crossJoin(F.broadcast(prior_best))
        .withColumn("NB_PRED", F.coalesce("NB_PRED", "__fallback_pred"))
        .withColumn("NB_LOGPROB", F.coalesce("NB_LOGPROB", "__fallback_lp"))
        .drop("__fallback_pred", "__fallback_lp")
    )
    return out


@renderer("nb_classify")
def _r_nb_classify(
    source, text, label_col, id_col, alpha=1.0, round_to=6, max_labels=1000
) -> str:
    """Exact replay of the NB counting fit + argmax in Spark SQL: the count
    tables, smoothed log-likelihood sum, prior, rounded score, and the
    min(struct(-score, label)) argmax are all single-pass aggregations, so
    the rendered text reproduces the executed result bit-for-bit (scores
    compare ROUNDED, the same cross-engine contract the DuckDB oracle
    uses). ``max_labels`` is an execution-time guard (it needs a count);
    the render replays the model regardless of label cardinality. Named
    CTEs inside a subquery wrapper keep the multi-referenced count tables
    single-definition at any chain position."""
    if alpha <= 0:
        raise ParameterException("alpha must be > 0")
    from .text import _tokens_sql

    a = f"CAST({float(alpha)!r} AS DOUBLE)"
    base = (
        f"__nb_base AS (SELECT {id_col} AS __id, "
        f"CAST({label_col} AS STRING) AS __lab, {_tokens_sql(text)} AS __t "
        f"FROM {source})"
    )
    labels = "__nb_labels AS (SELECT DISTINCT __lab FROM __nb_base)"
    pairs = (
        "__nb_pairs AS (SELECT __id, explode(__t) AS __tok FROM __nb_base)"
    )
    tl = (
        "__nb_tl AS (SELECT __tok, __lab, COUNT(*) AS __ctl FROM "
        "(SELECT __lab, explode(__t) AS __tok FROM __nb_base) "
        "GROUP BY __tok, __lab)"
    )
    lstats = (
        "__nb_lstats AS (SELECT __lab, CAST(SUM(size(__t)) AS DOUBLE) AS __cl, "
        "CAST(COUNT(*) AS DOUBLE) AS __dl FROM __nb_base GROUP BY __lab)"
    )
    gstats = "__nb_g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS __n FROM __nb_base)"
    vocab = (
        "__nb_v AS (SELECT CAST(COUNT(DISTINCT __tok) AS DOUBLE) AS __v "
        "FROM __nb_pairs)"
    )
    scored = (
        "__nb_scored AS (SELECT __id, __lab, SUM(__ll) AS __sll FROM ("
        "SELECT p.__id, l.__lab, "
        f"ln((COALESCE(t.__ctl, 0) + {a}) / (s.__cl + {a} * v.__v)) AS __ll "
        "FROM __nb_pairs p CROSS JOIN __nb_labels l "
        "LEFT JOIN __nb_tl t ON p.__tok = t.__tok AND l.__lab = t.__lab "
        "JOIN __nb_lstats s ON l.__lab = s.__lab CROSS JOIN __nb_v v"
        ") GROUP BY __id, __lab)"
    )
    best = (
        "__nb_best AS (SELECT __id, __b.__lab AS NB_PRED, -__b.__ns AS NB_LOGPROB "
        "FROM (SELECT __id, MIN(STRUCT(-__score AS __ns, __lab)) AS __b FROM ("
        "SELECT sc.__id, sc.__lab, "
        f"ROUND(sc.__sll + ln(s.__dl / g.__n), {int(round_to)}) AS __score "
        "FROM __nb_scored sc JOIN __nb_lstats s ON sc.__lab = s.__lab "
        "CROSS JOIN __nb_g g) GROUP BY __id))"
    )
    prior = (
        "__nb_prior AS (SELECT __b.__lab AS __fp, -__b.__ns AS __fl FROM ("
        "SELECT MIN(STRUCT(-__score AS __ns, __lab)) AS __b FROM ("
        f"SELECT ROUND(ln(s.__dl / g.__n), {int(round_to)}) AS __score, s.__lab "
        "FROM __nb_lstats s CROSS JOIN __nb_g g)))"
    )
    return (
        f"SELECT * FROM (WITH {base}, {labels}, {pairs}, {tl}, {lstats}, "
        f"{gstats}, {vocab}, {scored}, {best}, {prior} "
        "SELECT s.*, COALESCE(b.NB_PRED, p.__fp) AS NB_PRED, "
        "COALESCE(b.NB_LOGPROB, p.__fl) AS NB_LOGPROB "
        f"FROM {source} s LEFT JOIN __nb_best b ON s.{id_col} = b.__id "
        "CROSS JOIN __nb_prior p) __nb_out"
    )


@spark_transform("feature_hash", category="ml", streaming_ok=False)
def feature_hash(
    df: DataFrame,
    text: str,
    id_col: str,
    dim: int = 32,
    normalize: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Hashing-trick bag-of-words vectorization (public technique:
    Weinberger et al. 2009 feature hashing — the fastText input layer):
    each token lands in bucket ``md5_int(token) % dim``; the document
    vector is the bucket-count histogram, L2-normalized by default.
    Appends ``FEATURES`` (array<double>, length ``dim``). Feed the buckets
    to ``logreg_score`` for a fully in-engine trainable text classifier.

    Scale: tokens explode to slim ``(id, bucket)`` rows; ONE partial+final
    count aggregation per (id, bucket); vectors assemble per id with a
    second slim aggregation. Nothing is collected; md5 bucketing is
    JVM-side and replayed bit-for-bit by the DuckDB oracle. Empty/NULL
    text yields the zero vector.
    """
    if dim < 1 or dim > 4096:
        raise ParameterException("dim must be in [1, 4096]")
    t, i = resolve_col(df, text), resolve_col(df, id_col)
    toks = spread(df).select(
        F.col(i).alias("__id"), tokens_expr(F.col(t)).alias("__t")
    )
    pairs = toks.select(
        "__id", F.explode("__t").alias("__tok")
    ).select("__id", (md5_int(F.col("__tok")) % dim).alias("__b"))
    counts = pairs.groupBy("__id", "__b").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    vecs = counts.groupBy("__id").agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__c"))).alias("__m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at(F.col("__m"), j.cast("bigint")), F.lit(0.0)),
    )
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                F.transform(arr, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        )
        vec = F.when(
            norm > 0, F.transform(arr, lambda x: F.round(x / norm, round_to))
        ).otherwise(arr)
    else:
        vec = arr
    out = vecs.select("__id", vec.alias("FEATURES"))
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    return (
        df.join(out.withColumnRenamed("__id", i), on=i, how="left")
        .withColumn("FEATURES", F.coalesce("FEATURES", zero))
    )


@renderer("feature_hash")
def _r_feature_hash(source, text, id_col, dim=32, normalize=True, round_to=6) -> str:
    from .text import _tokens_sql

    bucket = (
        f"CAST(conv(substring(md5(__tok), 1, 8), 16, 10) AS BIGINT) % {dim}"
    )
    counts = (
        f"SELECT {id_col} AS __id, {bucket} AS __b, "
        f"CAST(COUNT(*) AS DOUBLE) AS __c FROM "
        f"(SELECT {id_col}, explode({_tokens_sql(text)}) AS __tok FROM {source}) "
        f"GROUP BY {id_col}, {bucket}"
    )
    # MAX(CASE) assembly: deterministic per-position extraction (collect_list
    # has no order guarantee in SQL)
    arr = "array(" + ", ".join(
        f"COALESCE(MAX(CASE WHEN __b = {j} THEN __c END), 0.0)" for j in range(dim)
    ) + ")"
    vecs = f"SELECT __id, {arr} AS __arr FROM ({counts}) GROUP BY __id"
    if normalize:
        feat = (
            "CASE WHEN aggregate(transform(v.__arr, x -> x * x), CAST(0.0 AS DOUBLE), "
            "(a, x) -> a + x) > 0 THEN transform(v.__arr, x -> round(x / "
            "sqrt(aggregate(transform(v.__arr, y -> y * y), CAST(0.0 AS DOUBLE), "
            f"(a, y) -> a + y)), {round_to})) ELSE v.__arr END"
        )
    else:
        feat = "v.__arr"
    zero = "array(" + ", ".join("CAST(0.0 AS DOUBLE)" for _ in range(dim)) + ")"
    return (
        f"SELECT l.*, COALESCE({feat}, {zero}) AS FEATURES FROM {source} l "
        f"LEFT JOIN ({vecs}) v ON l.{id_col} = v.__id"
    )


@spark_transform("classifier_eval", category="ml", streaming_ok=False)
def classifier_eval(
    df: DataFrame,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Binary-classifier evaluation in one row: confusion counts at
    ``score >= threshold`` (truth = ``label_col`` nonzero), ACCURACY /
    PRECISION / RECALL / F1 (NULL on empty denominators), and the
    tie-corrected Mann-Whitney AUC of the score — the eval half of the
    in-engine classifier loop (feature_hash/logreg_score, nb_classify,
    knn_classify, quality_filter train a filter; this measures it against
    a labeled sample before it gates a 100 TB corpus).

    AUC = sum over score levels of pos_l * (neg_below + neg_l / 2),
    normalized by P*N_neg — the average-rank Mann-Whitney statistic,
    computed on the LEVEL table (scores rounded to ``round_to`` first), so
    the only ordered pass is a window over at most |distinct rounded
    scores| rows. 100 TB design: one map-side-combined aggregation for the
    confusion counts, one for the levels; the unpartitioned cumulative
    window runs on the bounded level table, never the corpus; the two
    one-row aggregates crossJoin at the end. Zero Python on data; exactly
    replayable in SQL (all metric arithmetic rounds to ``round_to``).
    No counterpart in the reference (rasgoql has no ML surface); public
    technique (Mann-Whitney U / ROC-AUC equivalence)."""
    if round_to < 0:
        raise ParameterException("round_to must be >= 0")
    lbl, sc = resolve_col(df, label_col), resolve_col(df, score_col)
    base = spread(df).select(
        F.when(F.col(lbl).cast("double") != 0, 1).otherwise(0).alias("__pos"),
        F.col(sc).cast("double").alias("__score"),
        F.round(F.col(sc).cast("double"), round_to).alias("__lvl"),
    )
    conf = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("N"),
        F.sum("__pos").cast("bigint").alias("N_POS"),
        F.sum(F.when(F.col("__score") >= threshold, 1).otherwise(0))
        .cast("bigint")
        .alias("__pp"),
        F.sum(
            F.when((F.col("__score") >= threshold) & (F.col("__pos") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("TP"),
    )
    # NULL scores count as pred-negative in the confusion pass but are
    # EXCLUDED from the AUC level table — ranking an unscored row is
    # undefined, and Spark (NULLS FIRST) and portable SQL engines (often
    # NULLS LAST) would otherwise disagree on where the null level sorts
    lv = base.filter(F.col("__score").isNotNull()).groupBy("__lvl").agg(
        F.sum("__pos").cast("double").alias("__pl"),
        F.sum(1 - F.col("__pos")).cast("double").alias("__nl"),
    )
    wcum = (
        Window.orderBy("__lvl")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    auc_num = (
        lv.withColumn("__cnb", F.coalesce(F.sum("__nl").over(wcum), F.lit(0.0)))
        .agg(
            F.sum(
                F.col("__pl") * (F.col("__cnb") + F.col("__nl") / 2)
            ).alias("__aucnum"),
            # AUC normalizes over SCORED rows only (consistent with the
            # numerator's null-score exclusion)
            F.sum("__pl").alias("__sp"),
            F.sum("__nl").alias("__sn"),
        )
    )
    r = lambda c: F.round(c, round_to)  # noqa: E731
    out = conf.crossJoin(auc_num).select(
        "N",
        "N_POS",
        (F.col("N") - F.col("N_POS")).cast("bigint").alias("N_NEG"),
        "TP",
        (F.col("__pp") - F.col("TP")).cast("bigint").alias("FP"),
        (F.col("N_POS") - F.col("TP")).cast("bigint").alias("FN"),
        (F.col("N") - F.col("N_POS") - F.col("__pp") + F.col("TP"))
        .cast("bigint")
        .alias("TN"),
        r(
            (F.col("TP") + F.col("N") - F.col("N_POS") - F.col("__pp") + F.col("TP"))
            / F.col("N")
        ).alias("ACCURACY"),
        r(
            F.when(F.col("__pp") > 0, F.col("TP") / F.col("__pp"))
        ).alias("PRECISION"),
        r(
            F.when(F.col("N_POS") > 0, F.col("TP") / F.col("N_POS"))
        ).alias("RECALL"),
        r(
            F.when(
                (F.col("__pp") > 0)
                & (F.col("N_POS") > 0)
                & (F.col("TP") / F.col("__pp") + F.col("TP") / F.col("N_POS") > 0),
                2
                * (F.col("TP") / F.col("__pp"))
                * (F.col("TP") / F.col("N_POS"))
                / (F.col("TP") / F.col("__pp") + F.col("TP") / F.col("N_POS")),
            )
        ).alias("F1"),
        r(
            F.when(
                (F.col("__sp") > 0) & (F.col("__sn") > 0),
                F.col("__aucnum") / (F.col("__sp") * F.col("__sn")),
            )
        ).alias("AUC"),
    )
    return out


@renderer("classifier_eval")
def _r_classifier_eval(source, label_col, score_col, threshold=0.5,
                       round_to=6) -> str:
    """SQL replay of classifier_eval: one confusion aggregate, one
    level-table cumulative window (ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING over rounded score levels), same rounded metric arithmetic
    and NULL-denominator guards."""
    if round_to < 0:
        raise ParameterException("round_to must be >= 0")
    rt = int(round_to)
    base = (
        f"(SELECT CASE WHEN CAST({label_col} AS DOUBLE) != 0 THEN 1 ELSE 0 END "
        f"AS __pos, CAST({score_col} AS DOUBLE) AS __score, "
        f"round(CAST({score_col} AS DOUBLE), {rt}) AS __lvl FROM {source})"
    )
    conf = (
        f"(SELECT CAST(COUNT(1) AS BIGINT) AS N, "
        f"CAST(SUM(__pos) AS BIGINT) AS N_POS, "
        f"CAST(SUM(CASE WHEN __score >= {threshold} THEN 1 ELSE 0 END) AS BIGINT) AS __pp, "
        f"CAST(SUM(CASE WHEN __score >= {threshold} AND __pos = 1 THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS TP FROM {base})"
    )
    lv = (
        f"(SELECT __lvl, CAST(SUM(__pos) AS DOUBLE) AS __pl, "
        f"CAST(SUM(1 - __pos) AS DOUBLE) AS __nl FROM {base} "
        f"WHERE __score IS NOT NULL GROUP BY __lvl)"
    )
    aucnum = (
        f"(SELECT SUM(__pl * (__cnb + __nl / 2)) AS __aucnum, "
        f"SUM(__pl) AS __sp, SUM(__nl) AS __sn FROM "
        f"(SELECT __pl, __nl, COALESCE(SUM(__nl) OVER (ORDER BY __lvl "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0.0 AS DOUBLE)) "
        f"AS __cnb FROM {lv}))"
    )
    prec = "CAST(TP AS DOUBLE) / __pp"
    rec = "CAST(TP AS DOUBLE) / N_POS"
    return (
        f"SELECT N, N_POS, CAST(N - N_POS AS BIGINT) AS N_NEG, TP, "
        f"CAST(__pp - TP AS BIGINT) AS FP, "
        f"CAST(N_POS - TP AS BIGINT) AS FN, "
        f"CAST(N - N_POS - __pp + TP AS BIGINT) AS TN, "
        f"round(CAST(TP + N - N_POS - __pp + TP AS DOUBLE) / N, {rt}) AS ACCURACY, "
        f"round(CASE WHEN __pp > 0 THEN {prec} END, {rt}) AS PRECISION, "
        f"round(CASE WHEN N_POS > 0 THEN {rec} END, {rt}) AS RECALL, "
        f"round(CASE WHEN __pp > 0 AND N_POS > 0 AND {prec} + {rec} > 0 THEN "
        f"2 * ({prec}) * ({rec}) / ({prec} + {rec}) END, {rt}) AS F1, "
        f"round(CASE WHEN __sp > 0 AND __sn > 0 THEN "
        f"__aucnum / (__sp * __sn) END, {rt}) AS AUC "
        f"FROM {conf} CROSS JOIN {aucnum}"
    )
