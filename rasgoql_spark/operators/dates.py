"""Date / time scalar transforms.

Reference inventory (SURVEY §2.2 "Date / time scalar ops"): datetrunc
(reference README.md:106, tutorial.ipynb:2906), dateadd, datediff, datepart.
``datediff`` implements warehouse-style boundary-crossing semantics (Snowflake
DATEDIFF), not elapsed-interval counting — documented divergence from Spark's
``timestampdiff``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..naming import cleanse_name, datetrunc_name
from ..registry import renderer, spark_transform
from ._util import resolve_col

_GRAINS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


def _check_grain(grain: str) -> str:
    g = grain.lower()
    if g not in _GRAINS:
        raise ParameterException(f"grain must be one of {sorted(_GRAINS)}; got {grain!r}")
    return g


@spark_transform("datetrunc", category="dates")
def datetrunc(df: DataFrame, dates: dict) -> DataFrame:
    """Truncate timestamp/date columns to a grain, appending ``{COL}_{GRAIN}``
    (reference README.md:106; naming tutorial.ipynb:2906)."""
    out = {}
    for col, grain in dates.items():
        col = resolve_col(df, col)
        g = _check_grain(grain)
        out[datetrunc_name(col, g)] = F.date_trunc(g, F.col(col))
    return df.withColumns(out)


@renderer("datetrunc")
def _r_datetrunc(source, dates: dict) -> str:
    cols = ", ".join(
        f"DATE_TRUNC('{g.lower()}', {c}) AS {datetrunc_name(c, g)}" for c, g in dates.items()
    )
    return f"SELECT *, {cols} FROM {source}"


@spark_transform("dateadd", category="dates")
def dateadd(df: DataFrame, date: str, amount: int, grain: str = "day", name: str | None = None) -> DataFrame:
    """Shift a date/timestamp column by ``amount`` grains (SURVEY §2.2 [B])."""
    col = resolve_col(df, date)
    g = _check_grain(grain)
    name = name or cleanse_name(f"{col}_ADD_{amount}_{g}")
    src_type = dict(df.dtypes)[col]
    expr = F.expr(f"{col} + INTERVAL '{amount}' {g.upper()}") if g != "week" else F.expr(
        f"{col} + INTERVAL '{amount * 7}' DAY"
    )
    if src_type == "date":
        expr = expr.cast("date") if g in ("day", "week", "month", "quarter", "year") else expr
    return df.withColumn(name, expr)


@renderer("dateadd")
def _r_dateadd(source, date, amount, grain="day", name=None) -> str:
    g = grain.lower()
    name = name or cleanse_name(f"{date}_ADD_{amount}_{g}")
    if g == "week":
        return f"SELECT *, {date} + INTERVAL '{amount * 7}' DAY AS {name} FROM {source}"
    return f"SELECT *, {date} + INTERVAL '{amount}' {g.upper()} AS {name} FROM {source}"


def _boundary_diff(c1: Column, c2: Column, g: str) -> Column:
    """Count grain-boundary crossings between two date/timestamp columns —
    Snowflake/Redshift DATEDIFF semantics (SURVEY §2.2 datediff row)."""
    if g == "day":
        return F.datediff(F.to_date(c2), F.to_date(c1)).cast("bigint")
    if g == "week":
        return (
            F.datediff(F.to_date(F.date_trunc("week", c2)), F.to_date(F.date_trunc("week", c1))) / 7
        ).cast("bigint")
    if g == "month":
        return ((F.year(c2) - F.year(c1)) * 12 + (F.month(c2) - F.month(c1))).cast("bigint")
    if g == "quarter":
        return ((F.year(c2) - F.year(c1)) * 4 + (F.quarter(c2) - F.quarter(c1))).cast("bigint")
    if g == "year":
        return (F.year(c2) - F.year(c1)).cast("bigint")
    secs = {"second": 1, "minute": 60, "hour": 3600}[g]
    return (
        F.floor(F.unix_timestamp(c2) / secs) - F.floor(F.unix_timestamp(c1) / secs)
    ).cast("bigint")


@spark_transform("datediff", category="dates")
def datediff(df: DataFrame, date_1: str, date_2: str, grain: str = "day", name: str | None = None) -> DataFrame:
    """Boundary-crossing difference ``date_2 - date_1`` in grains (SURVEY §2.2 [B])."""
    c1, c2 = resolve_col(df, date_1), resolve_col(df, date_2)
    g = _check_grain(grain)
    name = name or cleanse_name(f"DIFF_{g}_{c1}_{c2}")
    return df.withColumn(name, _boundary_diff(F.col(c1), F.col(c2), g))


@renderer("datediff")
def _r_datediff(source, date_1, date_2, grain="day", name=None) -> str:
    g = grain.lower()
    name = name or cleanse_name(f"DIFF_{g}_{date_1}_{date_2}")
    m = {
        "day": f"DATEDIFF(TO_DATE({date_2}), TO_DATE({date_1}))",
        "week": f"CAST(DATEDIFF(TO_DATE(DATE_TRUNC('week', {date_2})), TO_DATE(DATE_TRUNC('week', {date_1}))) / 7 AS BIGINT)",
        "month": f"(YEAR({date_2}) - YEAR({date_1})) * 12 + (MONTH({date_2}) - MONTH({date_1}))",
        "quarter": f"(YEAR({date_2}) - YEAR({date_1})) * 4 + (QUARTER({date_2}) - QUARTER({date_1}))",
        "year": f"YEAR({date_2}) - YEAR({date_1})",
    }
    expr = m.get(
        g,
        f"FLOOR(UNIX_TIMESTAMP({date_2}) / x) - FLOOR(UNIX_TIMESTAMP({date_1}) / x)",
    )
    return f"SELECT *, CAST({expr} AS BIGINT) AS {name} FROM {source}"


_PARTS = {
    "year": F.year,
    "quarter": F.quarter,
    "month": F.month,
    "week": F.weekofyear,
    "day": F.dayofmonth,
    "dayofweek": F.dayofweek,
    "dayofyear": F.dayofyear,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
}


@spark_transform("datepart", category="dates")
def datepart(df: DataFrame, dates: dict) -> DataFrame:
    """Extract date parts, appending ``{COL}_{PART}`` (SURVEY §2.2 [B])."""
    out = {}
    for col, part in dates.items():
        col = resolve_col(df, col)
        p = part.lower()
        if p not in _PARTS:
            raise ParameterException(f"part must be one of {sorted(_PARTS)}; got {part!r}")
        out[cleanse_name(f"{col}_{p}")] = _PARTS[p](F.col(col)).cast("int")
    return df.withColumns(out)


@renderer("datepart")
def _r_datepart(source, dates: dict) -> str:
    fn = {
        "year": "YEAR({c})", "quarter": "QUARTER({c})", "month": "MONTH({c})",
        "week": "WEEKOFYEAR({c})", "day": "DAY({c})", "dayofweek": "DAYOFWEEK({c})",
        "dayofyear": "DAYOFYEAR({c})", "hour": "HOUR({c})", "minute": "MINUTE({c})",
        "second": "SECOND({c})",
    }
    cols = ", ".join(
        f"CAST({fn[p.lower()].format(c=c)} AS INT) AS {cleanse_name(f'{c}_{p.lower()}')}"
        for c, p in dates.items()
    )
    return f"SELECT *, {cols} FROM {source}"
