"""Shared helpers for operator implementations."""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException

# Bounded-action cap for data-dependent transforms (pivot/encoder value
# discovery). Mirrors the reference's RUN_QUERY_LIMIT precedent
# (reference rasgoql/rasgoql/primitives/rendering.py:24) scaled up for
# real cardinalities; a transform that would collect more than this many
# distinct values errors out instead of melting the driver at 100 TB.
DISCOVERY_LIMIT = 10_000


def resolve_col(df: DataFrame, name: str) -> str:
    """Case-insensitive column resolution → actual column name."""
    if name in df.columns:
        return name
    lowered = {c.lower(): c for c in df.columns}
    actual = lowered.get(name.lower())
    if actual is None:
        raise ParameterException(
            f"column {name!r} not found; available: {', '.join(df.columns)}"
        )
    return actual


def resolve_cols(df: DataFrame, names: Iterable[str]) -> list[str]:
    return [resolve_col(df, n) for n in names]


def order_spec(df: DataFrame, order_by) -> list[Column]:
    """Build ORDER BY columns from a list of names or {name: 'ASC'|'DESC'}."""
    if order_by is None:
        raise ParameterException("order_by is required")
    if isinstance(order_by, dict):
        out = []
        for c, direction in order_by.items():
            col = F.col(resolve_col(df, c))
            d = str(direction).upper()
            if d.startswith("DESC"):
                out.append(col.desc())
            elif d.startswith("ASC"):
                out.append(col.asc())
            else:
                raise ParameterException(f"bad sort direction {direction!r} for {c!r}")
        return out
    if isinstance(order_by, str):
        order_by = [order_by]
    return [F.col(resolve_col(df, c)).asc() for c in order_by]


def order_sql(order_by) -> str:
    """Render an order_by arg as SQL text."""
    if isinstance(order_by, dict):
        return ", ".join(f"{c} {str(d).upper()}" for c, d in order_by.items())
    if isinstance(order_by, str):
        return order_by
    return ", ".join(order_by)


# Aggregate name → column-expression builder. COUNT DISTINCT follows the
# reference's space-separated spelling (SURVEY §2.2 aggregate row).
_AGGS = {
    "SUM": F.sum,
    "MIN": F.min,
    "MAX": F.max,
    "AVG": F.avg,
    "MEAN": F.avg,
    "COUNT": F.count,
    "COUNT DISTINCT": lambda c: F.count_distinct(F.col(c) if isinstance(c, str) else c),
    "COUNT_DISTINCT": lambda c: F.count_distinct(F.col(c) if isinstance(c, str) else c),
    "STDDEV": F.stddev_samp,
    "STDDEV_POP": F.stddev_pop,
    "VARIANCE": F.var_samp,
    "MEDIAN": F.median,
}


def agg_expr(agg: str, col) -> Column:
    fn = _AGGS.get(agg.upper())
    if fn is None:
        raise ParameterException(
            f"unsupported aggregation {agg!r}; supported: {', '.join(sorted(_AGGS))}"
        )
    return fn(col)


def agg_sql(agg: str, col: str) -> str:
    a = agg.upper()
    if a in ("COUNT DISTINCT", "COUNT_DISTINCT"):
        return f"COUNT(DISTINCT {col})"
    if a == "MEAN":
        return f"AVG({col})"
    if a == "STDDEV":
        return f"STDDEV_SAMP({col})"
    if a == "VARIANCE":
        return f"VAR_SAMP({col})"
    return f"{a}({col})"


def spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions to engage every core before a CPU-heavy
    row-local pipeline (hash signatures, vector math): small inputs often
    arrive as 1-2 parquet splits, which would serialize the whole pipeline
    on one task. Repartitioning a small input is cheap; inputs already at or
    above the session parallelism pass through untouched (at 100 TB the
    branch never triggers — scans come pre-split)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_columns_sql(source: str, exprs: dict, input_columns) -> str:
    """SQL mirror of ``df.withColumns(exprs)``: a column whose name matches an
    existing input column (case-insensitively) is REPLACED in place under the
    new name; genuinely new columns append in order. Falls back to
    ``SELECT *, ...`` when the input schema is unknown."""
    if not input_columns:
        appended = ", ".join(f"{e} AS {k}" for k, e in exprs.items())
        return f"SELECT *, {appended} FROM {source}"
    lower_new = {k.lower(): k for k in exprs}
    cols, used = [], set()
    for c in input_columns:
        k = lower_new.get(c.lower())
        if k is not None:
            cols.append(f"{exprs[k]} AS {k}")
            used.add(k)
        else:
            cols.append(c)
    for k, e in exprs.items():
        if k not in used:
            cols.append(f"{e} AS {k}")
    return f"SELECT {', '.join(cols)} FROM {source}"


def as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]
