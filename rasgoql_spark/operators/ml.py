"""ML / feature-engineering transforms.

Reference inventory (SURVEY §2.2 "ML / feature-engineering ops"):
one_hot_encode (reference tutorial_extended.ipynb:9284 — distinct values
discovered via run_query), label_encode (ibid:9287), target_encode
(tutorial.ipynb:5167), impute (tutorial.ipynb:5649), train_test_split
(tutorial.ipynb:6057 — ordered split, TT_SPLIT ∈ {TRAIN,TEST}), scalers,
bin, levenshtein.

Scale notes: encoders keep SQL-visible columns (CASE WHEN) rather than ML-lib
vector types, exactly like the reference. Value discovery is a bounded
action (cap mirrors RUN_QUERY_LIMIT, rendering.py:24). Global statistics for
scalers/impute come from one aggregate; scalers attach them via broadcast
cross-join so the fact table never shuffles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..naming import cleanse_name
from ..registry import renderer, spark_transform
from ._util import (
    DISCOVERY_LIMIT,
    as_list,
    bucketed_global_rank,
    order_spec,
    order_sql,
    resolve_col,
    resolve_cols,
)


def _discover_values(df: DataFrame, column: str, cap: int) -> list:
    rows = (
        df.select(column).filter(F.col(column).isNotNull()).distinct().limit(cap + 1).collect()
    )
    if len(rows) > cap:
        raise ParameterException(
            f"{column!r} has more than {cap} distinct values; pass list_of_vals"
        )
    return sorted(r[0] for r in rows)


@spark_transform("one_hot_encode", category="ml", streaming_ok=False)
def one_hot_encode(df: DataFrame, column: str, list_of_vals=None, cap: int = 100) -> DataFrame:
    """0/1 indicator column per distinct value (reference
    tutorial_extended.ipynb:9284). Columns ``{COL}_{VAL}``; discovery is a
    bounded action (reference run_query pattern, rendering.py:272-291)."""
    col = resolve_col(df, column)
    vals = list(list_of_vals) if list_of_vals is not None else _discover_values(df, col, cap)
    out = {
        cleanse_name(f"{col}_{v}"): F.when(F.col(col) == F.lit(v), 1).otherwise(0)
        for v in vals
    }
    return df.withColumns(out)


@renderer("one_hot_encode")
def _r_one_hot_encode(source, column, list_of_vals=None, cap=100) -> str:
    if list_of_vals is None:
        raise ParameterException("rendered one_hot_encode requires list_of_vals")
    cols = ", ".join(
        f"CASE WHEN {column} = {v!r} THEN 1 ELSE 0 END AS {cleanse_name(f'{column}_{v}')}"
        for v in list_of_vals
    )
    return f"SELECT *, {cols} FROM {source}"


@spark_transform("label_encode", category="ml", streaming_ok=False)
def label_encode(df: DataFrame, column: str, cap: int = DISCOVERY_LIMIT) -> DataFrame:
    """Map categories to dense 1-based integers in value order (reference
    tutorial_extended.ipynb:9287). Implemented as a literal map built from a
    bounded distinct collect — NOT a global dense_rank window, which would
    funnel every row through one task at 100 TB. Output ``{COL}_ENCODED``."""
    col = resolve_col(df, column)
    vals = _discover_values(df, col, cap)
    mapping = F.create_map(*[F.lit(x) for pair in ((v, i + 1) for i, v in enumerate(vals)) for x in pair])
    return df.withColumn(cleanse_name(f"{col}_ENCODED"), mapping[F.col(col)])


@renderer("label_encode")
def _r_label_encode(source, column, cap=DISCOVERY_LIMIT) -> str:
    name = cleanse_name(f"{column}_ENCODED")
    return (
        f"SELECT s.*, m.{name} FROM {source} s LEFT JOIN "
        f"(SELECT {column}, CAST(DENSE_RANK() OVER (ORDER BY {column}) AS INT) AS {name} "
        f"FROM (SELECT DISTINCT {column} FROM {source} WHERE {column} IS NOT NULL)) m "
        f"USING ({column})"
    )


@spark_transform("target_encode", category="ml", streaming_ok=False)
def target_encode(df: DataFrame, column: str, target: str) -> DataFrame:
    """Replace category with mean(target) per category (reference
    tutorial.ipynb:5167): one windowed average partitioned by the category —
    a single hash shuffle on the category key. Output ``{COL}_TARGET_ENC``."""
    col, tgt = resolve_col(df, column), resolve_col(df, target)
    w = Window.partitionBy(col)
    return df.withColumn(cleanse_name(f"{col}_TARGET_ENC"), F.avg(tgt).over(w))


@renderer("target_encode")
def _r_target_encode(source, column, target) -> str:
    name = cleanse_name(f"{column}_TARGET_ENC")
    return f"SELECT *, AVG({target}) OVER (PARTITION BY {column}) AS {name} FROM {source}"


@spark_transform("target_encode_oof", category="ml", streaming_ok=False)
def target_encode_oof(
    df: DataFrame,
    column: str,
    target: str,
    fold_by: str,
    folds: int = 5,
    smoothing: float = 0.0,
) -> DataFrame:
    """Leakage-safe out-of-fold target encoding (the k-fold mean-encoding
    scheme popularized by the CatBoost/Kaggle literature; plain
    ``target_encode`` leaks each row's own label into its feature).

    Each row is assigned fold ``pmod(fold_by, folds)`` (``fold_by`` must be
    an integer key column — a deterministic, engine-portable assignment, the
    same reason ``train_test_split`` hashes a key), and its encoding is the
    target mean computed over the OTHER folds only:

        enc = (sum_all - sum_fold + smoothing * prior) /
              (cnt_all - cnt_fold + smoothing)

    ``prior`` is the global target mean (one bounded one-row aggregate).
    Categories entirely inside one fold — and NULL categories — fall back to
    the prior. Output ``{COL}_TARGET_ENC_OOF``.

    Scale: statistics come from two hash aggregates (map-side combine) whose
    output is |categories| and |categories|×folds rows; the fact table joins
    against that slim table on (category, fold) — AQE turns it into a
    broadcast join when the category space is small, and the facts never
    sort. No whole-table window."""
    col, tgt = resolve_col(df, column), resolve_col(df, target)
    fkey = resolve_col(df, fold_by)
    fkey_type = dict(df.dtypes)[fkey]
    is_integral = fkey_type in ("tinyint", "smallint", "int", "bigint") or (
        re.fullmatch(r"decimal\(\d+,0\)", fkey_type) is not None
    )
    if not is_integral:
        raise ParameterException(
            f"fold_by {fkey!r} has type {fkey_type}; the fold assignment is "
            "pmod(fold_by, folds) and needs an integer-valued key column "
            "(integral or decimal(p,0)) — hash non-integer keys into one "
            "first (e.g. math with xxhash64)"
        )
    if folds < 2:
        raise ParameterException("folds must be >= 2")
    if smoothing < 0:
        raise ParameterException("smoothing must be >= 0")
    name = cleanse_name(f"{col}_TARGET_ENC_OOF")
    prior = df.agg(F.avg(tgt)).collect()[0][0]
    if prior is None:
        raise ParameterException(f"target {tgt!r} has no non-null values")
    fold = F.pmod(F.col(fkey).cast("bigint"), F.lit(folds))
    src = df.withColumn("__fold", fold)
    cat = src.groupBy(F.col(col).alias("__c")).agg(
        F.sum(tgt).alias("__s_all"), F.count(tgt).alias("__c_all")
    )
    per_fold = src.groupBy(F.col(col).alias("__c"), F.col("__fold").alias("__ff")).agg(
        F.sum(tgt).alias("__s_f"), F.count(tgt).alias("__c_f")
    )
    stats = per_fold.join(cat, "__c")
    denom = F.col("__c_all") - F.col("__c_f") + F.lit(float(smoothing))
    enc = F.when(
        denom > 0,
        (F.col("__s_all") - F.col("__s_f") + F.lit(float(smoothing)) * F.lit(prior)) / denom,
    )
    stats = stats.select("__c", "__ff", enc.alias("__enc"))
    out = src.join(
        stats,
        (F.col(col) == F.col("__c")) & (F.col("__fold") == F.col("__ff")),
        "left",
    )
    return out.withColumn(name, F.coalesce(F.col("__enc"), F.lit(prior))).drop(
        "__fold", "__c", "__ff", "__enc"
    )


@renderer("target_encode_oof")
def _r_target_encode_oof(source, column, target, fold_by, folds=5, smoothing=0.0) -> str:
    name = cleanse_name(f"{column}_TARGET_ENC_OOF")
    s = float(smoothing)
    return (
        f"SELECT * FROM ("
        f"WITH __s AS (SELECT *, pmod(CAST({fold_by} AS BIGINT), {folds}) AS __fold "
        f"FROM {source}), "
        f"__p AS (SELECT AVG({target}) AS __prior FROM __s), "
        f"__a AS (SELECT {column} AS __c, SUM({target}) AS __s_all, "
        f"COUNT({target}) AS __c_all FROM __s GROUP BY {column}), "
        f"__f AS (SELECT {column} AS __c, __fold AS __ff, SUM({target}) AS __s_f, "
        f"COUNT({target}) AS __c_f FROM __s GROUP BY {column}, __fold) "
        f"SELECT __s.* EXCEPT (__fold), COALESCE(CASE WHEN __c_all - __c_f + {s} > 0 "
        f"THEN (__s_all - __s_f + {s} * __prior) / (__c_all - __c_f + {s}) END, __prior) "
        f"AS {name} FROM __s CROSS JOIN __p "
        f"LEFT JOIN (SELECT __f.__c, __f.__ff, __f.__s_f, __f.__c_f, __a.__s_all, "
        f"__a.__c_all FROM __f JOIN __a ON __f.__c = __a.__c) __st "
        f"ON __s.{column} = __st.__c AND __s.__fold = __st.__ff)"
    )


@spark_transform("impute", category="ml", streaming_ok=False)
def impute(df: DataFrame, imputations: dict) -> DataFrame:
    """Fill NULLs with a constant or 'mean'/'median'/'mode' (reference
    tutorial.ipynb:5649 — constant -999999 observed). ALL statistics —
    mean, median, AND mode for every requested column — come from ONE
    aggregate job (``F.mode(col, deterministic=True)`` returns the lowest
    value among equally-frequent candidates, matching a
    count-DESC/value-ASC tiebreak). All-NULL columns yield no statistic and
    are skipped rather than passed as a None fill (which would raise)."""
    stats_needed = {
        resolve_col(df, c): v for c, v in imputations.items() if v in ("mean", "median", "mode")
    }
    fills: dict = {
        resolve_col(df, c): v
        for c, v in imputations.items()
        if v not in ("mean", "median", "mode") and v is not None
    }
    if stats_needed:
        aggs = []
        for col, v in stats_needed.items():
            if v == "mean":
                aggs.append(F.avg(col).alias(col))
            elif v == "median":
                aggs.append(F.median(col).alias(col))
            else:  # mode
                aggs.append(F.mode(F.col(col), True).alias(col))
        row = df.agg(*aggs).collect()[0].asDict()
        fills.update({c: val for c, val in row.items() if val is not None})
    # na.fill needs consistent value types per call; apply per column
    for c, v in fills.items():
        df = df.na.fill({c: v})
    return df


@renderer("impute")
def _r_impute(source, imputations, _input_columns=()) -> str:
    def fill_expr(c, v):
        if v == "mean":
            return f"(SELECT AVG({c}) FROM {source})"
        if v == "median":
            return f"(SELECT MEDIAN({c}) FROM {source})"
        if v == "mode":
            # deterministic mode: count DESC, value ASC — portable SQL
            return (
                f"(SELECT {c} FROM {source} WHERE {c} IS NOT NULL "
                f"GROUP BY {c} ORDER BY COUNT(*) DESC, {c} ASC LIMIT 1)"
            )
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    if _input_columns:  # preserve exact column order
        cols = ", ".join(
            f"COALESCE({c}, {fill_expr(c, imputations[c])}) AS {c}"
            if c in imputations
            else c
            for c in _input_columns
        )
        return f"SELECT {cols} FROM {source}"
    parts = ", ".join(
        f"COALESCE({c}, {fill_expr(c, v)}) AS {c}" for c, v in imputations.items()
    )
    return f"SELECT * EXCEPT ({', '.join(imputations)}), {parts} FROM {source}"


@spark_transform("min_max_scaler", category="ml", streaming_ok=False)
def min_max_scaler(df: DataFrame, columns, group_by=None) -> DataFrame:
    """(x−min)/(max−min) per column (SURVEY §2.2 [B]); 0.0 when max==min.
    Global bounds broadcast from one aggregate; with ``group_by``, bounds come
    from a window partitioned on the keys (one hash shuffle). Output
    ``{COL}_SCALED``."""
    cols = resolve_cols(df, as_list(columns))
    keys = resolve_cols(df, as_list(group_by))
    if keys:
        w = Window.partitionBy(*keys)
        out = df
        for c in cols:
            lo = F.min(F.col(c).cast("double")).over(w)
            hi = F.max(F.col(c).cast("double")).over(w)
            out = out.withColumn(
                cleanse_name(f"{c}_SCALED"),
                F.when(hi > lo, (F.col(c).cast("double") - lo) / (hi - lo)).otherwise(F.lit(0.0)),
            )
        return out
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        out = out.withColumn(
            cleanse_name(f"{c}_SCALED"),
            F.when(hi > lo, (F.col(c).cast("double") - lo) / (hi - lo)).otherwise(F.lit(0.0)),
        )
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


@renderer("min_max_scaler")
def _r_min_max_scaler(source, columns, group_by=None) -> str:
    cols = as_list(columns)
    keys = as_list(group_by)
    if keys:
        over = f"OVER (PARTITION BY {', '.join(keys)})"
        scaled = ", ".join(
            f"CASE WHEN MAX(CAST({c} AS DOUBLE)) {over} > MIN(CAST({c} AS DOUBLE)) {over} "
            f"THEN (CAST({c} AS DOUBLE) - MIN(CAST({c} AS DOUBLE)) {over}) / "
            f"(MAX(CAST({c} AS DOUBLE)) {over} - MIN(CAST({c} AS DOUBLE)) {over}) "
            f"ELSE 0.0 END AS {cleanse_name(f'{c}_SCALED')}"
            for c in cols
        )
        return f"SELECT *, {scaled} FROM {source}"
    bounds = ", ".join(
        f"CAST(MIN({c}) AS DOUBLE) AS __min_{c}, CAST(MAX({c}) AS DOUBLE) AS __max_{c}"
        for c in cols
    )
    scaled = ", ".join(
        f"CASE WHEN b.__max_{c} > b.__min_{c} THEN (CAST(s.{c} AS DOUBLE) - b.__min_{c}) / "
        f"(b.__max_{c} - b.__min_{c}) ELSE 0.0 END AS {cleanse_name(f'{c}_SCALED')}"
        for c in cols
    )
    return (
        f"SELECT s.*, {scaled} FROM {source} s CROSS JOIN (SELECT {bounds} FROM {source}) b"
    )


@spark_transform("standard_scaler", category="ml", streaming_ok=False)
def standard_scaler(df: DataFrame, columns) -> DataFrame:
    """(x−μ)/σ (sample stddev) per column (SURVEY §2.2 [B]); 0.0 when σ==0.
    Output ``{COL}_ZSCORE``."""
    cols = resolve_cols(df, as_list(columns))
    stats = df.agg(
        *[F.avg(c).alias(f"__avg_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"__std_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        mu, sd = F.col(f"__avg_{c}"), F.col(f"__std_{c}")
        out = out.withColumn(
            cleanse_name(f"{c}_ZSCORE"),
            F.when(sd > 0, (F.col(c).cast("double") - mu) / sd).otherwise(F.lit(0.0)),
        )
    return out.drop(*[f"__avg_{c}" for c in cols], *[f"__std_{c}" for c in cols])


@renderer("standard_scaler")
def _r_standard_scaler(source, columns) -> str:
    cols = as_list(columns)
    stats = ", ".join(
        f"AVG({c}) AS __avg_{c}, STDDEV_SAMP({c}) AS __std_{c}" for c in cols
    )
    scaled = ", ".join(
        f"CASE WHEN b.__std_{c} > 0 THEN (CAST(s.{c} AS DOUBLE) - b.__avg_{c}) / b.__std_{c} "
        f"ELSE 0.0 END AS {cleanse_name(f'{c}_ZSCORE')}"
        for c in cols
    )
    return f"SELECT s.*, {scaled} FROM {source} s CROSS JOIN (SELECT {stats} FROM {source}) b"


@spark_transform("bin", category="ml", streaming_ok=False)
def bin_(df: DataFrame, column: str, bins: int = 10, method: str = "equal_width", tiebreak: str | None = None) -> DataFrame:
    """Discretize a numeric column (SURVEY §2.2 [B]): equal-width buckets
    (broadcast bounds) or ntile (global-order window — single-task at scale;
    pass tiebreak for determinism). Output ``{COL}_BIN``."""
    c = resolve_col(df, column)
    name = cleanse_name(f"{c}_BIN")
    if method == "equal_width":
        bounds = df.agg(
            F.min(c).cast("double").alias("__min"), F.max(c).cast("double").alias("__max")
        )
        width = (F.col("__max") - F.col("__min")) / bins
        bucket = (
            F.least(F.floor((F.col(c).cast("double") - F.col("__min")) / width), F.lit(bins - 1))
            .cast("int")
        )
        return (
            df.crossJoin(F.broadcast(bounds))
            .withColumn(name, F.when(F.col("__max") > F.col("__min"), bucket).otherwise(0))
            .drop("__min", "__max")
        )
    if method == "ntile":
        order_by = [c] + ([resolve_col(df, tiebreak)] if tiebreak else [])
        res = bucketed_global_rank(df, order_by, "row_number")
        if res is not None:  # multi-partition input: no single-task window
            from ._util import ntile_from_rownumber

            ranked, n = res
            tile = ntile_from_rownumber(F.col("__grank") - 1, n, bins)
            return ranked.withColumn(name, tile).drop("__grank")
        order = [F.col(k).asc() for k in order_by]
        return df.withColumn(name, F.ntile(bins).over(Window.orderBy(*order)))
    raise ParameterException("method must be 'equal_width' or 'ntile'")


@renderer("bin")
def _r_bin(source, column, bins=10, method="equal_width", tiebreak=None) -> str:
    name = cleanse_name(f"{column}_BIN")
    if method == "ntile":
        ob = column + (f", {tiebreak}" if tiebreak else "")
        return f"SELECT *, NTILE({bins}) OVER (ORDER BY {ob}) AS {name} FROM {source}"
    return (
        f"SELECT s.* EXCEPT (__min, __max), CASE WHEN s.__max > s.__min THEN "
        f"CAST(LEAST(FLOOR((CAST({column} AS DOUBLE) - __min) / ((__max - __min) / {bins})), {bins - 1}) AS INT) "
        f"ELSE 0 END AS {name} FROM (SELECT t.*, b.__min, b.__max FROM {source} t CROSS JOIN "
        f"(SELECT CAST(MIN({column}) AS DOUBLE) AS __min, CAST(MAX({column}) AS DOUBLE) AS __max "
        f"FROM {source}) b) s"
    )


@spark_transform("winsorize", category="ml", streaming_ok=False)
def winsorize(
    df: DataFrame, column: str, lower: float = 0.05, upper: float = 0.95
) -> DataFrame:
    """Clamp a column to its [lower, upper] percentiles (outlier capping —
    the keep-the-row sibling of remove_outliers). Exact percentiles from one
    aggregate, attached via broadcast; clamp is least/greatest. Output
    ``{COL}_WINSORIZED``."""
    c = resolve_col(df, column)
    bounds = df.agg(
        F.percentile(F.col(c), F.lit(lower)).alias("__lo"),
        F.percentile(F.col(c), F.lit(upper)).alias("__hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            cleanse_name(f"{c}_WINSORIZED"),
            F.least(F.greatest(F.col(c).cast("double"), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


@renderer("winsorize")
def _r_winsorize(source, column, lower=0.05, upper=0.95) -> str:
    name = cleanse_name(f"{column}_WINSORIZED")
    return (
        f"SELECT s.* EXCEPT (__lo, __hi), LEAST(GREATEST(CAST({column} AS DOUBLE), __lo), __hi) "
        f"AS {name} FROM (SELECT t.*, b.__lo, b.__hi FROM {source} t CROSS JOIN "
        f"(SELECT percentile({column}, {lower}) AS __lo, percentile({column}, {upper}) AS __hi "
        f"FROM {source}) b) s"
    )


@spark_transform("robust_scaler", category="ml", streaming_ok=False)
def robust_scaler(df: DataFrame, columns) -> DataFrame:
    """(x − median) / IQR per column — the outlier-insensitive sibling of
    ``standard_scaler`` (public scaling family; heavy-tailed metrics like
    doc length or token counts swamp a z-score's mean/stddev, while median
    and quartiles barely move). 0.0 when IQR == 0. Output ``{COL}_ROBUST``.

    Scale: all three exact percentiles per column come from ONE aggregate
    that returns a one-row broadcast frame — the corpus itself never
    shuffles, the scaling pass is a projection."""
    cols = resolve_cols(df, as_list(columns))
    stats = df.agg(
        *[F.percentile(F.col(c), F.lit(0.5)).alias(f"__med_{c}") for c in cols],
        *[
            (
                F.percentile(F.col(c), F.lit(0.75))
                - F.percentile(F.col(c), F.lit(0.25))
            ).alias(f"__iqr_{c}")
            for c in cols
        ],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        med, iqr = F.col(f"__med_{c}"), F.col(f"__iqr_{c}")
        out = out.withColumn(
            cleanse_name(f"{c}_ROBUST"),
            F.when(iqr > 0, (F.col(c).cast("double") - med) / iqr).otherwise(F.lit(0.0)),
        )
    return out.drop(*[f"__med_{c}" for c in cols], *[f"__iqr_{c}" for c in cols])


@renderer("robust_scaler")
def _r_robust_scaler(source, columns) -> str:
    cols = as_list(columns)
    stats = ", ".join(
        f"percentile({c}, 0.5) AS __med_{c}, "
        f"percentile({c}, 0.75) - percentile({c}, 0.25) AS __iqr_{c}"
        for c in cols
    )
    scaled = ", ".join(
        f"CASE WHEN b.__iqr_{c} > 0 THEN (CAST(s.{c} AS DOUBLE) - b.__med_{c}) / b.__iqr_{c} "
        f"ELSE 0.0 END AS {cleanse_name(f'{c}_ROBUST')}"
        for c in cols
    )
    return f"SELECT s.*, {scaled} FROM {source} s CROSS JOIN (SELECT {stats} FROM {source}) b"


@spark_transform("quantiles", category="ml", streaming_ok=False)
def quantiles(
    df: DataFrame,
    column: str,
    probs=(0.25, 0.5, 0.75),
    group_by=None,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Quantiles per group, one column per probability: ``{COL}_Q{P}``.

    Default is EXACT (linear interpolation — the oracle-checkable path; its
    aggregation buffers every group's values, fine up to millions of rows
    per group). ``approx=True`` switches to ``approx_percentile``
    (Greenwald-Khanna sketch, bounded memory at any scale, rank error ≤
    1/accuracy) — the 100 TB path when groups are huge; results are
    approximate, so no cross-engine oracle applies."""
    c = resolve_col(df, column)
    keys = resolve_cols(df, as_list(group_by))
    if approx:
        aggs = [
            F.approx_percentile(F.col(c), F.lit(float(p)), F.lit(accuracy)).alias(
                cleanse_name(f"{c}_Q{int(round(p * 100))}")
            )
            for p in probs
        ]
    else:
        aggs = [
            F.percentile(F.col(c), F.lit(float(p))).alias(
                cleanse_name(f"{c}_Q{int(round(p * 100))}")
            )
            for p in probs
        ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


@renderer("quantiles")
def _r_quantiles(source, column, probs=(0.25, 0.5, 0.75), group_by=None) -> str:
    keys = as_list(group_by)
    aggs = ", ".join(
        f"percentile({column}, {float(p)}) AS {cleanse_name(f'{column}_Q{int(round(p * 100))}')}"
        for p in probs
    )
    if keys:
        k = ", ".join(keys)
        return f"SELECT {k}, {aggs} FROM {source} GROUP BY {k}"
    return f"SELECT {aggs} FROM {source}"


@spark_transform("levenshtein", category="ml")
def levenshtein(df: DataFrame, column_1: str, column_2: str, name: str = "LEVENSHTEIN") -> DataFrame:
    """Edit distance between two string columns (SURVEY §2.2 [B]) — Spark
    built-in, JVM-side."""
    return df.withColumn(
        name, F.levenshtein(resolve_col(df, column_1), resolve_col(df, column_2))
    )


@renderer("levenshtein")
def _r_levenshtein(source, column_1, column_2, name="LEVENSHTEIN") -> str:
    return f"SELECT *, LEVENSHTEIN({column_1}, {column_2}) AS {name} FROM {source}"


@spark_transform("train_test_split", category="ml", streaming_ok=False)
def train_test_split(
    df: DataFrame, order_by, train_percent: float = 0.8, name: str = "TT_SPLIT"
) -> DataFrame:
    """Ordered (non-random) split (reference tutorial.ipynb:6057): rows with
    percent_rank < train_percent over the global order get 'TRAIN', the rest
    'TEST'. Include a unique tiebreak column in order_by for deterministic
    hash-comparable output (SURVEY §7.3).

    Scale path: ``bucketed_global_rank`` (operators/_util.py) computes the
    global percent_rank without a single-partition window — range buckets
    from approxQuantile boundaries + per-bucket counts + in-bucket rank.
    Small inputs (≤4 partitions) and keys with no monotone numeric proxy
    use the single-window formulation, which is optimal there."""
    res = bucketed_global_rank(df, order_by, method="rank")
    if res is None:
        w = Window.orderBy(*order_spec(df, order_by))
        return df.withColumn(
            name,
            F.when(
                F.percent_rank().over(w) < F.lit(train_percent), F.lit("TRAIN")
            ).otherwise(F.lit("TEST")),
        )
    ranked, n = res
    # same double arithmetic as percent_rank so boundary rows agree
    # bit-for-bit with the window/SQL formulation
    pr = (
        (F.col("__grank") - 1).cast("double") / F.lit(float(n - 1))
        if n > 1
        else F.lit(0.0)
    )
    return ranked.withColumn(
        name,
        F.when(pr < F.lit(float(train_percent)), F.lit("TRAIN")).otherwise(F.lit("TEST")),
    ).drop("__grank")


@renderer("train_test_split")
def _r_train_test_split(source, order_by, train_percent=0.8, name="TT_SPLIT") -> str:
    return (
        f"SELECT *, CASE WHEN PERCENT_RANK() OVER (ORDER BY {order_sql(order_by)}) < {train_percent} "
        f"THEN 'TRAIN' ELSE 'TEST' END AS {name} FROM {source}"
    )


@spark_transform("kfold", category="ml")
def kfold(df: DataFrame, key, k: int = 5, seed: int = 0, name: str = "FOLD") -> DataFrame:
    """Deterministic k-fold assignment: ``FOLD`` (int, 0..k-1) =
    ``md5(seed:key) % k``. Same key -> same fold in every run and on every
    engine, so grouped cross-validation (all rows of an entity share a
    fold) needs only the entity id as ``key``. Row-local, shuffle-free;
    pair with ``filter`` to carve train/validation per fold."""
    from ..operators._util import as_list as _as_list
    from ..operators._util import resolve_cols as _resolve_cols

    if k < 2:
        raise ParameterException("k must be >= 2")
    keys = _resolve_cols(df, _as_list(key))
    if not keys:
        raise ParameterException("kfold requires at least one key column")
    tagged = F.concat_ws(
        "\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in keys]
    )
    bucket = (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint") % k
    ).cast("int")
    return df.withColumn(cleanse_name(name), bucket)


@renderer("kfold")
def _r_kfold(source, key, k=5, seed=0, name="FOLD") -> str:
    from ..operators._util import as_list as _as_list

    keys = _as_list(key)
    tagged = ", ".join([f"'{seed}'"] + [f"CAST({c} AS STRING)" for c in keys])
    expr = (
        f"CAST(CAST(conv(substring(md5(concat_ws(char(31), {tagged})), 1, 8), 16, 10) "
        f"AS BIGINT) % {k} AS INT)"
    )
    return f"SELECT *, {expr} AS {cleanse_name(name)} FROM {source}"


@spark_transform("expect", category="quality")
def expect(
    df: DataFrame,
    expectations,
    max_violations: int = 0,
    mode: str = "fail",
) -> DataFrame:
    """Data-quality gate (public pattern: expectation testing a la Great
    Expectations, reduced to its Spark-native core): each expectation is a
    SQL boolean the GOOD rows satisfy. ``mode='fail'`` raises
    ParameterException naming the per-rule violation counts when total
    violations exceed ``max_violations`` and otherwise returns the input
    unchanged (a chainable assertion); ``mode='filter'`` drops violating
    rows; ``mode='flag'`` appends one boolean column per rule.

    Cost: fail mode is ONE aggregation computing every rule's violation
    count in a single pass (conditional sums — no per-rule scans); filter
    and flag are row-local."""
    from ..operators._util import as_list as _as_list

    rules = _as_list(expectations)
    if not rules:
        raise ParameterException("expect requires at least one expectation")
    if mode not in ("fail", "filter", "flag"):
        raise ParameterException("mode must be fail, filter, or flag")
    conds = [F.expr(r) for r in rules]
    if mode == "flag":
        out = df
        for j, (r, c) in enumerate(zip(rules, conds)):
            out = out.withColumn(cleanse_name(f"EXPECT_{j}"), F.coalesce(c, F.lit(False)))
        return out
    if mode == "filter":
        keep = None
        for c in conds:
            cc = F.coalesce(c, F.lit(False))
            keep = cc if keep is None else (keep & cc)
        return df.filter(keep)
    counts = df.agg(
        *[
            F.sum(
                F.when(~F.coalesce(c, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__v{j}")
            for j, c in enumerate(conds)
        ]
    ).collect()[0]
    per_rule = {rules[j]: int(counts[f"__v{j}"] or 0) for j in range(len(rules))}
    total = sum(per_rule.values())
    if total > max_violations:
        detail = "; ".join(f"{r!r}: {n}" for r, n in per_rule.items() if n)
        raise ParameterException(
            f"expect failed: {total} violations (allowed {max_violations}) — {detail}"
        )
    return df


@renderer("expect")
def _r_expect(source, expectations, max_violations=0, mode="fail") -> str:
    """flag/filter render row-locally; fail is an ACTION (driver-side
    violation count + raise), which SQL text cannot express."""
    from ..errors import TransformRenderingException
    from ..operators._util import as_list as _as_list

    rules = _as_list(expectations)
    if mode not in ("flag", "filter") or not rules:
        raise TransformRenderingException(
            "expect renders for mode='flag'/'filter' only (mode='fail' is "
            "a driver-side assertion, not a query)"
        )
    if mode == "filter":
        keep = " AND ".join(f"COALESCE(({r}), false)" for r in rules)
        return f"SELECT * FROM {source} WHERE {keep}"
    flags = ", ".join(
        f"COALESCE(({r}), false) AS {cleanse_name(f'EXPECT_{j}')}"
        for j, r in enumerate(rules)
    )
    return f"SELECT *, {flags} FROM {source}"
