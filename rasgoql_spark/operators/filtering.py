"""Filter / predicate / sampling transforms.

Reference inventory (SURVEY §2.2 "Filters / predicates / sampling"): filter
(tutorial_extended.ipynb:7126), dropna, remove_duplicates, remove_outliers,
sample, latest. Predicates are passed as raw SQL text exactly as the
reference does (filter_statements) — Catalyst parses them into the plan so
pushdown to the parquet scan still happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException, TransformRenderingException
from ..naming import cleanse_name
from ..registry import renderer, spark_transform
from ._util import (
    DISCOVERY_LIMIT,
    as_list,
    order_spec,
    order_sql,
    resolve_col,
    resolve_cols,
)


@spark_transform("filter", category="filter")
def filter_(df: DataFrame, filter_statements) -> DataFrame:
    """WHERE with raw SQL predicates, ANDed (reference tutorial_extended.ipynb:7126)."""
    for p in as_list(filter_statements):
        df = df.filter(F.expr(p))
    return df


@renderer("filter")
def _r_filter(source, filter_statements) -> str:
    preds = " AND ".join(f"({p})" for p in as_list(filter_statements))
    return f"SELECT * FROM {source} WHERE {preds}"


@spark_transform("dropna", category="filter")
def dropna(df: DataFrame, how: str = "any", subset=None, thresh: int | None = None) -> DataFrame:
    """Drop rows with NULLs (SURVEY §2.2 [B])."""
    subset = resolve_cols(df, as_list(subset)) if subset else None
    return df.na.drop(how=how, thresh=thresh, subset=subset)


@renderer("dropna")
def _r_dropna(source, how: str = "any", subset=None, thresh=None) -> str:
    cols = as_list(subset) if subset else ["*"]
    if cols == ["*"]:
        return f"SELECT * FROM {source}"  # schema unknown at render time
    joiner = " AND " if how == "any" else " OR "
    preds = joiner.join(f"{c} IS NOT NULL" for c in cols)
    return f"SELECT * FROM {source} WHERE {preds}"


@spark_transform("remove_duplicates", category="filter", streaming_ok=False)
def remove_duplicates(df: DataFrame, natural_key=None, order_by=None) -> DataFrame:
    """De-duplicate rows (SURVEY §2.2 [B]).

    Without a key: full-row DISTINCT. With ``natural_key``: keep the first row
    per key by ``order_by`` (required for deterministic results) —
    ``row_number() == 1`` over a key-partitioned window, a single hash
    shuffle on the key.
    """
    if natural_key is None:
        return df.distinct()
    keys = resolve_cols(df, as_list(natural_key))
    if order_by is None:
        raise ParameterException("order_by is required with natural_key for determinism")
    w = Window.partitionBy(*keys).orderBy(*order_spec(df, order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")
    )


@renderer("remove_duplicates")
def _r_remove_duplicates(source, natural_key=None, order_by=None) -> str:
    if natural_key is None:
        return f"SELECT DISTINCT * FROM {source}"
    keys = ", ".join(as_list(natural_key))
    return (
        f"SELECT * EXCEPT (__rn) FROM (SELECT *, ROW_NUMBER() OVER "
        f"(PARTITION BY {keys} ORDER BY {order_sql(order_by)}) AS __rn FROM {source}) "
        f"WHERE __rn = 1"
    )


@spark_transform("remove_outliers", category="filter", streaming_ok=False)
def remove_outliers(
    df: DataFrame, column: str, method: str = "iqr", factor: float = 1.5
) -> DataFrame:
    """Filter rows outside IQR or stddev bounds (SURVEY §2.2 [B]).

    Bounds come from one aggregate over the input, attached with a broadcast
    cross-join — no driver collect, no extra shuffle of the fact table, and
    the plan stays pure (safe to re-use / save as a view).
    """
    column = resolve_col(df, column)
    c = F.col(column)
    if method == "iqr":
        bounds = df.agg(
            (F.percentile(c, F.lit(0.25)) - factor * (F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25)))).alias("__lo"),
            (F.percentile(c, F.lit(0.75)) + factor * (F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25)))).alias("__hi"),
        )
    elif method == "stddev":
        bounds = df.agg(
            (F.avg(c) - factor * F.stddev_samp(c)).alias("__lo"),
            (F.avg(c) + factor * F.stddev_samp(c)).alias("__hi"),
        )
    else:
        raise ParameterException("method must be 'iqr' or 'stddev'")
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter((c >= F.col("__lo")) & (c <= F.col("__hi")))
        .drop("__lo", "__hi")
    )


@renderer("remove_outliers")
def _r_remove_outliers(source, column, method="iqr", factor=1.5) -> str:
    if method == "iqr":
        bounds = (
            f"SELECT percentile({column}, 0.25) - {factor} * (percentile({column}, 0.75) - percentile({column}, 0.25)) AS __lo, "
            f"percentile({column}, 0.75) + {factor} * (percentile({column}, 0.75) - percentile({column}, 0.25)) AS __hi FROM {source}"
        )
    else:
        bounds = (
            f"SELECT AVG({column}) - {factor} * STDDEV_SAMP({column}) AS __lo, "
            f"AVG({column}) + {factor} * STDDEV_SAMP({column}) AS __hi FROM {source}"
        )
    return (
        f"SELECT s.* FROM {source} s CROSS JOIN ({bounds}) b "
        f"WHERE s.{column} >= b.__lo AND s.{column} <= b.__hi"
    )


@spark_transform("sample", category="filter")
def sample(
    df: DataFrame,
    percent: float = 10.0,
    key: str | None = None,
    seed: int | None = None,
) -> DataFrame:
    """Sample rows (SURVEY §2.2 [B]).

    With ``key``: deterministic hash-free modulo sampling (``key % 100 <
    percent``) — reproducible across engines and runs, the right default for
    pipeline work. Without: Bernoulli ``df.sample`` with optional seed.
    """
    if key is not None:
        k = F.col(resolve_col(df, key))
        return df.filter(F.pmod(k, F.lit(100)) < F.lit(percent))
    return df.sample(fraction=percent / 100.0, seed=seed)


@renderer("sample")
def _r_sample(source, percent=10.0, key=None, seed=None) -> str:
    if key is not None:
        return f"SELECT * FROM {source} WHERE pmod({key}, 100) < {percent}"
    return f"SELECT * FROM {source} TABLESAMPLE ({percent} PERCENT)"


@spark_transform("stratified_sample", category="filter", streaming_ok=False)
def stratified_sample(
    df: DataFrame,
    stratify_by: str,
    fractions: dict | float,
    key: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling — balanced training-data draws (downsample the
    dominant class / language / source bucket without touching the rest).

    ``fractions``: {stratum_value: fraction} (values absent from the dict
    keep fraction 0.0, matching ``sampleBy``), or a single float applied to
    every stratum. With ``key``: deterministic per-stratum modulo sampling
    on the key column (reproducible across engines — the oracle-checkable
    path); without: seeded ``df.sampleBy``. One scan, no shuffle."""
    s = resolve_col(df, stratify_by)
    if key is not None:
        k = F.col(resolve_col(df, key))
        if isinstance(fractions, dict):
            expr = F.lit(None).cast("double")
            for v, frac in fractions.items():
                expr = F.when(F.col(s) == F.lit(v), F.lit(float(frac) * 100)).otherwise(expr)
            pct = F.coalesce(expr, F.lit(0.0))
        else:
            pct = F.lit(float(fractions) * 100)
        return df.filter(F.pmod(k, F.lit(100)) < pct)
    if not isinstance(fractions, dict):
        vals = [
            r[0]
            for r in df.select(s).distinct().limit(DISCOVERY_LIMIT + 1).collect()
        ]
        if len(vals) > DISCOVERY_LIMIT:
            raise ParameterException(
                f"{s!r} has more than {DISCOVERY_LIMIT} strata; pass a fractions dict"
            )
        fractions = {v: float(fractions) for v in vals if v is not None}
    return df.sampleBy(s, fractions={k_: float(v) for k_, v in fractions.items()}, seed=seed)


@renderer("stratified_sample")
def _r_stratified_sample(source, stratify_by, fractions, key=None, seed=42) -> str:
    if key is None or not isinstance(fractions, dict):
        raise TransformRenderingException(
            "rendered stratified_sample requires key + a fractions dict "
            "(the deterministic modulo path); sampleBy is RNG-based"
        )
    branches = " ".join(
        f"WHEN {stratify_by} = {v!r} THEN {float(frac) * 100}"
        for v, frac in fractions.items()
    )
    return (
        f"SELECT * FROM {source} WHERE pmod({key}, 100) < "
        f"COALESCE(CASE {branches} END, 0.0)"
    )


@spark_transform("latest", category="filter", streaming_ok=False)
def latest(df: DataFrame, group_by, order_by, n: int = 1) -> DataFrame:
    """Most recent ``n`` rows per group (SURVEY §2.2 [B]): ``row_number()``
    over a descending window — one shuffle on the group key."""
    keys = resolve_cols(df, as_list(group_by))
    if isinstance(order_by, dict):
        spec = order_spec(df, order_by)
    else:
        # bare column names mean "latest by these" → descending
        spec = [F.col(resolve_col(df, c)).desc() for c in as_list(order_by)]
    w = Window.partitionBy(*keys).orderBy(*spec)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n).drop("__rn")


@renderer("latest")
def _r_latest(source, group_by, order_by, n: int = 1) -> str:
    keys = ", ".join(as_list(group_by))
    if not isinstance(order_by, dict):
        ob = ", ".join(f"{c} DESC" for c in as_list(order_by))
    else:
        ob = order_sql(order_by)
    return (
        f"SELECT * EXCEPT (__rn) FROM (SELECT *, ROW_NUMBER() OVER "
        f"(PARTITION BY {keys} ORDER BY {ob}) AS __rn FROM {source}) WHERE __rn <= {n}"
    )


@spark_transform("top", category="filter", streaming_ok=False)
def top(df: DataFrame, n: int, order_by) -> DataFrame:
    """Top-N by a total order (SURVEY §2.3 — LIMIT as a first-class transform).

    Spark plans this as TakeOrderedAndProject: per-partition top-N then a
    driver-side merge of N×partitions rows — no global sort at 100 TB.
    """
    return df.orderBy(*order_spec(df, order_by)).limit(n)


@renderer("top")
def _r_top(source, n, order_by) -> str:
    return f"SELECT * FROM {source} ORDER BY {order_sql(order_by)} LIMIT {n}"
