"""Projection / column transforms.

Reference inventory (SURVEY §2.2 "Projection / column ops"): drop_columns
(reference README.md:153), rename (tutorials/tutorial.ipynb:2923), math
(tutorials/rasgoql-join-example.ipynb:2744), cast, concat, if_then,
replace_string, uppercase_columns, to_date. All are narrow (no shuffle);
Catalyst fuses them into the enclosing whole-stage-codegen span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..naming import cleanse_name
from ..registry import renderer, spark_transform
from ._util import as_list, resolve_col, resolve_cols


@spark_transform("drop_columns", category="projection")
def drop_columns(df: DataFrame, include_cols=None, exclude_cols=None) -> DataFrame:
    """Keep ``include_cols`` or drop ``exclude_cols`` (reference README.md:153)."""
    if (include_cols is None) == (exclude_cols is None):
        raise ParameterException("pass exactly one of include_cols / exclude_cols")
    if include_cols is not None:
        return df.select(*resolve_cols(df, as_list(include_cols)))
    return df.drop(*resolve_cols(df, as_list(exclude_cols)))


@renderer("drop_columns")
def _r_drop_columns(source, include_cols=None, exclude_cols=None) -> str:
    if include_cols is not None:
        return f"SELECT {', '.join(as_list(include_cols))} FROM {source}"
    return f"SELECT * EXCEPT ({', '.join(as_list(exclude_cols))}) FROM {source}"


@spark_transform("rename", category="projection")
def rename(df: DataFrame, renames: dict) -> DataFrame:
    """Rename columns, keep the rest (reference tutorial.ipynb:2923)."""
    return df.withColumnsRenamed({resolve_col(df, k): v for k, v in renames.items()})


@renderer("rename")
def _r_rename(source, renames: dict, _input_columns=()) -> str:
    if _input_columns:
        cols = ", ".join(
            f"{c} AS {renames[c]}" if c in renames else c for c in _input_columns
        )
        return f"SELECT {cols} FROM {source}"
    alias = ", ".join(f"{old} AS {new}" for old, new in renames.items())
    excl = ", ".join(renames)
    return f"SELECT * EXCEPT ({excl}), {alias} FROM {source}"


@spark_transform("math", category="projection")
def math(df: DataFrame, math_ops, names=None) -> DataFrame:
    """Append arithmetic SQL-expression columns (reference
    rasgoql-join-example.ipynb:2744). Output names default to the cleansed
    expression text — matching the reference's auto-generated names
    (tutorial_extended.ipynb:5810-6226)."""
    math_ops = as_list(math_ops)
    names = as_list(names) if names else [cleanse_name(op) for op in math_ops]
    if len(names) != len(math_ops):
        raise ParameterException("names must match math_ops length")
    return df.withColumns({n: F.expr(op) for n, op in zip(names, math_ops)})


@renderer("math")
def _r_math(source, math_ops, names=None) -> str:
    math_ops = as_list(math_ops)
    names = as_list(names) if names else [cleanse_name(op) for op in math_ops]
    exprs = ", ".join(f"{op} AS {n}" for op, n in zip(math_ops, names))
    return f"SELECT *, {exprs} FROM {source}"


@spark_transform("cast", category="projection")
def cast(df: DataFrame, casts: dict) -> DataFrame:
    """CAST columns in place (SURVEY §2.2 [B]). Accepts warehouse-style type
    names (NUMBER(10,2), TEXT, VARIANT, …) via the §1.3 type map as well as
    Spark-native names."""
    from ..types import normalize_type

    return df.withColumns(
        {
            resolve_col(df, c): F.col(resolve_col(df, c)).cast(normalize_type(t))
            for c, t in casts.items()
        }
    )


@renderer("cast")
def _r_cast(source, casts: dict, _input_columns=()) -> str:
    if _input_columns:
        cols = ", ".join(
            f"CAST({c} AS {casts[c]}) AS {c}" if c in casts else c
            for c in _input_columns
        )
        return f"SELECT {cols} FROM {source}"
    excl = ", ".join(casts)
    cols = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in casts.items())
    return f"SELECT * EXCEPT ({excl}), {cols} FROM {source}"


@spark_transform("concat", category="projection")
def concat(df: DataFrame, columns, separator: str = "", name: str | None = None) -> DataFrame:
    """Concatenate columns into one string column (SURVEY §2.2 [B])."""
    columns = resolve_cols(df, as_list(columns))
    name = name or cleanse_name("_".join(columns) + "_CONCAT")
    return df.withColumn(name, F.concat_ws(separator, *[F.col(c).cast("string") for c in columns]))


@renderer("concat")
def _r_concat(source, columns, separator: str = "", name: str | None = None) -> str:
    columns = as_list(columns)
    name = name or cleanse_name("_".join(columns) + "_CONCAT")
    cols = ", ".join(f"CAST({c} AS STRING)" for c in columns)
    return f"SELECT *, CONCAT_WS('{separator}', {cols}) AS {name} FROM {source}"


@spark_transform("if_then", category="projection")
def if_then(df: DataFrame, conditions, default=None, name: str = "CONDITIONAL_COL") -> DataFrame:
    """CASE WHEN column from (condition, value) pairs (SURVEY §2.2 [B]).

    ``conditions``: list of (sql_condition, sql_value_expr) pairs; ``default``
    is a SQL expression for the ELSE branch.
    """
    if not conditions:
        raise ParameterException("conditions must be a non-empty list of (cond, value)")
    whens = " ".join(f"WHEN {c} THEN {v}" for c, v in conditions)
    else_part = f" ELSE {default}" if default is not None else ""
    return df.withColumn(name, F.expr(f"CASE {whens}{else_part} END"))


@renderer("if_then")
def _r_if_then(source, conditions, default=None, name: str = "CONDITIONAL_COL") -> str:
    whens = " ".join(f"WHEN {c} THEN {v}" for c, v in conditions)
    else_part = f" ELSE {default}" if default is not None else ""
    return f"SELECT *, CASE {whens}{else_part} END AS {name} FROM {source}"


@spark_transform("replace_string", category="projection")
def replace_string(
    df: DataFrame,
    column: str,
    pattern: str,
    replacement: str,
    name: str | None = None,
    regex: bool = False,
) -> DataFrame:
    """String replace, literal by default (SURVEY §2.2 [B])."""
    column = resolve_col(df, column)
    name = name or column
    src = F.col(column)
    out = F.regexp_replace(src, pattern, replacement) if regex else F.replace(
        src, F.lit(pattern), F.lit(replacement)
    )
    return df.withColumn(name, out)


@renderer("replace_string")
def _r_replace_string(source, column, pattern, replacement, name=None, regex=False,
                      _input_columns=()) -> str:
    name = name or column
    fn = "REGEXP_REPLACE" if regex else "REPLACE"
    expr = f"{fn}({column}, '{pattern}', '{replacement}') AS {name}"
    if name != column:
        return f"SELECT *, {expr} FROM {source}"
    if _input_columns:
        cols = ", ".join(expr if c == column else c for c in _input_columns)
        return f"SELECT {cols} FROM {source}"
    return f"SELECT * EXCEPT ({column}), {expr} FROM {source}"


@spark_transform("uppercase_columns", category="projection")
def uppercase_columns(df: DataFrame) -> DataFrame:
    """Uppercase all column names (SURVEY §2.2 [B])."""
    return df.toDF(*[c.upper() for c in df.columns])


@renderer("uppercase_columns")
def _r_uppercase_columns(source) -> str:
    return f"SELECT * FROM {source}"  # names are metadata; rendered pass-through


@spark_transform("to_date", category="projection")
def to_date(df: DataFrame, column: str, format: str | None = None, name: str | None = None) -> DataFrame:
    """Parse a string column to date (SURVEY §2.2 [B])."""
    column = resolve_col(df, column)
    name = name or cleanse_name(f"{column}_DATE")
    return df.withColumn(name, F.to_date(F.col(column), format) if format else F.to_date(F.col(column)))


@renderer("to_date")
def _r_to_date(source, column, format=None, name=None) -> str:
    name = name or cleanse_name(f"{column}_DATE")
    inner = f"TO_DATE({column}, '{format}')" if format else f"TO_DATE({column})"
    return f"SELECT *, {inner} AS {name} FROM {source}"
