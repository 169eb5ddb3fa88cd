"""Reshape transforms.

Reference inventory (SURVEY §2.2 "Reshape"): pivot (reference README.md:
165-171 — distinct-value discovery mirrors the run_query mechanism,
rendering.py:272-291), unpivot, union, datespine(_groups), funnel,
market_basket, histogram/heatmap, sankey, plus set ops (SURVEY §2.3).

Scale notes: pivot value discovery is a bounded action capped at
DISCOVERY_LIMIT (the reference precedent is RUN_QUERY_LIMIT,
rendering.py:24); datespine generates the dense scaffold with
``sequence``+``explode`` (tiny) and joins facts to it; histogram bounds come
from a broadcast 1-row aggregate, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..naming import cleanse_name
from ..registry import renderer, spark_transform
from ._util import (
    DISCOVERY_LIMIT,
    agg_expr,
    agg_sql,
    as_list,
    resolve_col,
    resolve_cols,
)


@spark_transform("pivot", category="reshape", streaming_ok=False)
def pivot(
    df: DataFrame,
    dimensions,
    pivot_column: str,
    value_column: str,
    agg_method: str = "SUM",
    list_of_vals=None,
) -> DataFrame:
    """Transpose distinct values of ``pivot_column`` into columns (reference
    README.md:165-171). Without ``list_of_vals`` the distinct values are
    discovered with a bounded action (reference's run_query pattern,
    rendering.py:272-291, cap rendering.py:24). Value columns are cleansed
    names; column order = dimensions, then values in discovery/list order."""
    dims = resolve_cols(df, as_list(dimensions))
    pc = resolve_col(df, pivot_column)
    vc = resolve_col(df, value_column)
    if list_of_vals is None:
        rows = df.select(pc).distinct().limit(DISCOVERY_LIMIT + 1).collect()
        if len(rows) > DISCOVERY_LIMIT:
            raise ParameterException(
                f"pivot discovery exceeded {DISCOVERY_LIMIT} distinct values; "
                "pass list_of_vals explicitly"
            )
        list_of_vals = sorted(r[0] for r in rows if r[0] is not None)
    out = df.groupBy(*dims).pivot(pc, list(list_of_vals)).agg(agg_expr(agg_method, vc))
    renames = {str(v): cleanse_name(v) for v in list_of_vals}
    return out.withColumnsRenamed(renames)


@renderer("pivot")
def _r_pivot(source, dimensions, pivot_column, value_column, agg_method="SUM", list_of_vals=None) -> str:
    dims = ", ".join(as_list(dimensions))
    if list_of_vals is None:
        raise ParameterException("rendered pivot requires list_of_vals")
    cases = ", ".join(
        f"{agg_sql(agg_method, f'CASE WHEN {pivot_column} = {v!r} THEN {value_column} END')} "
        f"AS {cleanse_name(v)}"
        for v in list_of_vals
    )
    return f"SELECT {dims}, {cases} FROM {source} GROUP BY {dims}"


@spark_transform("unpivot", category="reshape")
def unpivot(
    df: DataFrame,
    id_vars,
    value_vars,
    var_name: str = "VARIABLE",
    value_name: str = "VALUE",
) -> DataFrame:
    """Wide→long (SURVEY §2.2 [B]); value columns are cast to a common
    double type."""
    ids = resolve_cols(df, as_list(id_vars))
    vals = resolve_cols(df, as_list(value_vars))
    casted = df.withColumns({v: F.col(v).cast("double") for v in vals})
    return casted.unpivot(ids, vals, var_name, value_name)


@renderer("unpivot")
def _r_unpivot(source, id_vars, value_vars, var_name="VARIABLE", value_name="VALUE") -> str:
    ids = ", ".join(as_list(id_vars))
    stack = ", ".join(f"'{v}', CAST({v} AS DOUBLE)" for v in as_list(value_vars))
    n = len(as_list(value_vars))
    return (
        f"SELECT {ids}, stack({n}, {stack}) AS ({var_name}, {value_name}) FROM {source}"
    )


@spark_transform("union", category="reshape")
def union(
    df: DataFrame,
    union_table: DataFrame,
    by_name: bool = True,
    distinct: bool = False,
    allow_missing_columns: bool = False,
) -> DataFrame:
    """UNION ALL / UNION (SURVEY §2.2 [B])."""
    out = (
        df.unionByName(union_table, allowMissingColumns=allow_missing_columns)
        if by_name
        else df.union(union_table)
    )
    return out.distinct() if distinct else out


@renderer("union")
def _r_union(source, union_table, by_name=True, distinct=False, allow_missing_columns=False) -> str:
    op = "UNION" if distinct else "UNION ALL"
    return f"SELECT * FROM {source} {op} SELECT * FROM {union_table}"


@spark_transform("intersect", category="reshape", streaming_ok=False)
def intersect(df: DataFrame, other: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    """Set intersection (SURVEY §2.3 — absent from the reference as a
    transform, free in Spark)."""
    return df.intersectAll(other) if keep_duplicates else df.intersect(other)


@renderer("intersect")
def _r_intersect(source, other, keep_duplicates=False) -> str:
    op = "INTERSECT ALL" if keep_duplicates else "INTERSECT"
    return f"SELECT * FROM {source} {op} SELECT * FROM {other}"


@spark_transform("except_rows", category="reshape", streaming_ok=False)
def except_rows(df: DataFrame, other: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    """Set difference (SURVEY §2.3)."""
    return df.exceptAll(other) if keep_duplicates else df.subtract(other)


@renderer("except_rows")
def _r_except_rows(source, other, keep_duplicates=True) -> str:
    op = "EXCEPT ALL" if keep_duplicates else "EXCEPT"
    return f"SELECT * FROM {source} {op} SELECT * FROM {other}"


@spark_transform("datespine", category="reshape", streaming_ok=False)
def datespine(
    df: DataFrame,
    date_col: str,
    start: str | None = None,
    end: str | None = None,
    interval: str = "day",
) -> DataFrame:
    """Dense date scaffold left-joined to facts so gaps appear as NULL rows
    (SURVEY §2.2 [B]). The spine is ``sequence``+``explode`` (tiny; broadcast
    side); bounds default to the data's min/max via a 1-row aggregate."""
    dc = resolve_col(df, date_col)
    if start and end:
        bounds = df.sparkSession.range(1).select(
            F.to_timestamp(F.lit(start)).alias("__lo"), F.to_timestamp(F.lit(end)).alias("__hi")
        )
    else:
        bounds = df.agg(F.min(dc).alias("__lo"), F.max(dc).alias("__hi"))
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL '1' {interval.upper()}")
            )
        ).alias(dc)
    )
    return spine.join(df, on=dc, how="left")


@renderer("datespine")
def _r_datespine(source, date_col, start=None, end=None, interval="day") -> str:
    if start and end:
        bounds = f"SELECT TO_TIMESTAMP('{start}') AS __lo, TO_TIMESTAMP('{end}') AS __hi"
    else:
        bounds = f"SELECT MIN({date_col}) AS __lo, MAX({date_col}) AS __hi FROM {source}"
    return (
        f"SELECT s.* EXCEPT ({date_col}), d.{date_col} FROM "
        f"(SELECT EXPLODE(SEQUENCE(__lo, __hi, INTERVAL '1' {interval.upper()})) AS {date_col} "
        f"FROM ({bounds})) d LEFT JOIN {source} s USING ({date_col})"
    )


@spark_transform("datespine_groups", category="reshape", streaming_ok=False)
def datespine_groups(
    df: DataFrame,
    group_by,
    date_col: str,
    start: str | None = None,
    end: str | None = None,
    interval: str = "day",
) -> DataFrame:
    """Per-group dense date scaffold (SURVEY §2.2 [B]): distinct groups ×
    spine, left-joined to facts. Group cardinality shuffles once; the spine
    itself stays tiny."""
    dc = resolve_col(df, date_col)
    keys = resolve_cols(df, as_list(group_by))
    if start and end:
        bounds = df.sparkSession.range(1).select(
            F.to_timestamp(F.lit(start)).alias("__lo"), F.to_timestamp(F.lit(end)).alias("__hi")
        )
    else:
        bounds = df.agg(F.min(dc).alias("__lo"), F.max(dc).alias("__hi"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL '1' {interval.upper()}"))
        ).alias(dc)
    )
    groups = df.select(*keys).distinct()
    scaffold = groups.crossJoin(F.broadcast(spine))
    return scaffold.join(df, on=keys + [dc], how="left")


@renderer("datespine_groups")
def _r_datespine_groups(source, group_by, date_col, start=None, end=None, interval="day") -> str:
    keys = as_list(group_by)
    if start and end:
        bounds = f"SELECT TO_TIMESTAMP('{start}') AS __lo, TO_TIMESTAMP('{end}') AS __hi"
    else:
        bounds = f"SELECT MIN({date_col}) AS __lo, MAX({date_col}) AS __hi FROM {source}"
    gsel = ", ".join(f"g.{k}" for k in keys)
    on = " AND ".join([f"s.{k} = g.{k}" for k in keys] + [f"s.{date_col} = d.{date_col}"])
    drops = ", ".join(keys + [date_col])
    return (
        f"SELECT {gsel}, d.{date_col}, s.* EXCEPT ({drops}) FROM "
        f"(SELECT DISTINCT {', '.join(keys)} FROM {source}) g CROSS JOIN "
        f"(SELECT EXPLODE(SEQUENCE(__lo, __hi, INTERVAL '1' {interval.upper()})) "
        f"AS {date_col} FROM ({bounds})) d "
        f"LEFT JOIN {source} s ON {on}"
    )


@spark_transform("funnel", category="reshape", streaming_ok=False)
def funnel(df: DataFrame, entity: str, ts: str, event: str, steps) -> DataFrame:
    """Ordered-step conversion counts (SURVEY §2.2 [B]): an entity converts
    at step N if its first occurrence of step N is at/after its first
    occurrence of every earlier step. One conditional-aggregation pass per
    entity, then one tiny rollup. Output STEP_INDEX, STEP, ENTITIES."""
    steps = as_list(steps)
    e, t, ev = resolve_col(df, entity), resolve_col(df, ts), resolve_col(df, event)
    firsts = df.groupBy(e).agg(
        *[
            F.min(F.when(F.col(ev) == s, F.col(t))).alias(f"__t{i}")
            for i, s in enumerate(steps)
        ]
    )
    reached = F.lit(True)
    flags = []
    for i in range(len(steps)):
        cond = F.col(f"__t{i}").isNotNull()
        if i > 0:
            cond = cond & (F.col(f"__t{i}") >= F.col(f"__t{i-1}")) & flags[i - 1]
        flags.append(cond)
    counts = firsts.agg(
        *[F.sum(flags[i].cast("bigint")).alias(f"__c{i}") for i in range(len(steps))]
    )
    stack_args = ", ".join(f"{i}, '{s}', __c{i}" for i, s in enumerate(steps))
    return counts.select(
        F.expr(f"stack({len(steps)}, {stack_args}) AS (STEP_INDEX, STEP, ENTITIES)")
    )


@renderer("funnel")
def _r_funnel(source, entity, ts, event, steps) -> str:
    steps = as_list(steps)
    firsts = ", ".join(
        f"MIN(CASE WHEN {event} = '{s}' THEN {ts} END) AS __t{i}"
        for i, s in enumerate(steps)
    )
    flags: list[str] = []
    for i in range(len(steps)):
        cond = f"__t{i} IS NOT NULL"
        if i > 0:
            cond = f"({cond} AND __t{i} >= __t{i - 1} AND {flags[i - 1]})"
        else:
            cond = f"({cond})"
        flags.append(cond)
    counts = ", ".join(
        f"SUM(CAST({flags[i]} AS BIGINT)) AS __c{i}" for i in range(len(steps))
    )
    stack_args = ", ".join(f"{i}, '{s}', __c{i}" for i, s in enumerate(steps))
    return (
        f"SELECT stack({len(steps)}, {stack_args}) AS (STEP_INDEX, STEP, ENTITIES) "
        f"FROM (SELECT {counts} FROM "
        f"(SELECT {entity}, {firsts} FROM {source} GROUP BY {entity}))"
    )


@spark_transform("market_basket", category="reshape", streaming_ok=False)
def market_basket(df: DataFrame, transaction: str, item: str, min_count: int = 1) -> DataFrame:
    """Item co-occurrence pairs (SURVEY §2.2 [B]): self-join on the
    transaction key with ``item_a < item_b``, then a pair count. Skew note:
    a transaction with k items emits k², so pathological baskets should be
    capped upstream. Output ITEM_A, ITEM_B, PAIR_COUNT."""
    t, i = resolve_col(df, transaction), resolve_col(df, item)
    a = df.select(F.col(t).alias("__t"), F.col(i).alias("ITEM_A")).distinct()
    b = df.select(F.col(t).alias("__t"), F.col(i).alias("ITEM_B")).distinct()
    return (
        a.join(b, on="__t")
        .filter(F.col("ITEM_A") < F.col("ITEM_B"))
        .groupBy("ITEM_A", "ITEM_B")
        .agg(F.count(F.lit(1)).alias("PAIR_COUNT"))
        .filter(F.col("PAIR_COUNT") >= min_count)
    )


@renderer("market_basket")
def _r_market_basket(source, transaction, item, min_count=1) -> str:
    return (
        f"SELECT a.{item} AS ITEM_A, b.{item} AS ITEM_B, COUNT(*) AS PAIR_COUNT FROM "
        f"(SELECT DISTINCT {transaction}, {item} FROM {source}) a JOIN "
        f"(SELECT DISTINCT {transaction}, {item} FROM {source}) b "
        f"ON a.{transaction} = b.{transaction} AND a.{item} < b.{item} "
        f"GROUP BY a.{item}, b.{item} HAVING COUNT(*) >= {min_count}"
    )


@spark_transform("histogram", category="reshape", streaming_ok=False)
def histogram(df: DataFrame, column: str, num_buckets: int = 10) -> DataFrame:
    """Equal-width binned counts (SURVEY §2.2 [B]). Bounds attach via a
    broadcast 1-row aggregate; bucket = floor((x-min)/width) clamped to the
    last bucket. Output BUCKET, BUCKET_LOW, BUCKET_HIGH, ROW_COUNT."""
    c = resolve_col(df, column)
    bounds = df.agg(
        F.min(F.col(c)).cast("double").alias("__min"), F.max(F.col(c)).cast("double").alias("__max")
    )
    width = (F.col("__max") - F.col("__min")) / num_buckets
    bucket = F.least(
        F.floor((F.col(c).cast("double") - F.col("__min")) / width), F.lit(num_buckets - 1)
    ).cast("int")
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("BUCKET", F.when(width > 0, bucket).otherwise(F.lit(0)))
        .groupBy("BUCKET")
        .agg(
            F.min("__min").alias("__min"),
            F.min("__max").alias("__max"),
            F.count(F.lit(1)).alias("ROW_COUNT"),
        )
        .select(
            "BUCKET",
            (F.col("__min") + F.col("BUCKET") * (F.col("__max") - F.col("__min")) / num_buckets).alias("BUCKET_LOW"),
            (F.col("__min") + (F.col("BUCKET") + 1) * (F.col("__max") - F.col("__min")) / num_buckets).alias("BUCKET_HIGH"),
            "ROW_COUNT",
        )
    )


@renderer("histogram")
def _r_histogram(source, column, num_buckets=10) -> str:
    return (
        f"SELECT BUCKET, __min + BUCKET * (__max - __min) / {num_buckets} AS BUCKET_LOW, "
        f"__min + (BUCKET + 1) * (__max - __min) / {num_buckets} AS BUCKET_HIGH, "
        f"COUNT(*) AS ROW_COUNT FROM (SELECT s.*, b.__min, b.__max, "
        f"CASE WHEN b.__max > b.__min THEN CAST(LEAST(FLOOR((CAST({column} AS DOUBLE) - b.__min) / "
        f"((b.__max - b.__min) / {num_buckets})), {num_buckets - 1}) AS INT) ELSE 0 END AS BUCKET "
        f"FROM {source} s CROSS JOIN (SELECT CAST(MIN({column}) AS DOUBLE) AS __min, "
        f"CAST(MAX({column}) AS DOUBLE) AS __max FROM {source}) b) "
        f"GROUP BY BUCKET, __min, __max"
    )


@spark_transform("heatmap", category="reshape", streaming_ok=False)
def heatmap(df: DataFrame, x: str, y: str, num_buckets: int = 10) -> DataFrame:
    """2-D binned counts (SURVEY §2.2 [B]). Output X_BUCKET, Y_BUCKET, ROW_COUNT."""
    xc, yc = resolve_col(df, x), resolve_col(df, y)
    bounds = df.agg(
        F.min(F.col(xc)).cast("double").alias("__xmin"),
        F.max(F.col(xc)).cast("double").alias("__xmax"),
        F.min(F.col(yc)).cast("double").alias("__ymin"),
        F.max(F.col(yc)).cast("double").alias("__ymax"),
    )
    def bucketize(col, lo, hi):
        w = (F.col(hi) - F.col(lo)) / num_buckets
        b = F.least(F.floor((F.col(col).cast("double") - F.col(lo)) / w), F.lit(num_buckets - 1))
        return F.when(F.col(hi) > F.col(lo), b).otherwise(F.lit(0)).cast("int")

    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("X_BUCKET", bucketize(xc, "__xmin", "__xmax"))
        .withColumn("Y_BUCKET", bucketize(yc, "__ymin", "__ymax"))
        .groupBy("X_BUCKET", "Y_BUCKET")
        .agg(F.count(F.lit(1)).alias("ROW_COUNT"))
    )


@renderer("heatmap")
def _r_heatmap(source, x, y, num_buckets=10) -> str:
    def bucket_sql(col, lo, hi):
        return (
            f"CASE WHEN {hi} > {lo} THEN CAST(LEAST(FLOOR((CAST({col} AS DOUBLE) - {lo}) / "
            f"(({hi} - {lo}) / {num_buckets})), {num_buckets - 1}) AS INT) ELSE 0 END"
        )

    return (
        f"SELECT X_BUCKET, Y_BUCKET, COUNT(*) AS ROW_COUNT FROM (SELECT "
        f"{bucket_sql(x, 'b.__xmin', 'b.__xmax')} AS X_BUCKET, "
        f"{bucket_sql(y, 'b.__ymin', 'b.__ymax')} AS Y_BUCKET "
        f"FROM {source} s CROSS JOIN (SELECT CAST(MIN({x}) AS DOUBLE) AS __xmin, "
        f"CAST(MAX({x}) AS DOUBLE) AS __xmax, CAST(MIN({y}) AS DOUBLE) AS __ymin, "
        f"CAST(MAX({y}) AS DOUBLE) AS __ymax FROM {source}) b) "
        f"GROUP BY X_BUCKET, Y_BUCKET"
    )


@spark_transform("sankey", category="reshape", streaming_ok=False)
def sankey(df: DataFrame, entity: str, ts: str, stage: str, tiebreak: str | None = None) -> DataFrame:
    """Stage-to-stage flow counts (SURVEY §2.2 [B]): lag the stage per
    entity ordered by time, count (SOURCE, TARGET) pairs. Output
    SOURCE_STAGE, TARGET_STAGE, FLOW_COUNT."""
    e, t, s = resolve_col(df, entity), resolve_col(df, ts), resolve_col(df, stage)
    order = [F.col(t).asc()] + ([F.col(resolve_col(df, tiebreak)).asc()] if tiebreak else [])
    w = Window.partitionBy(e).orderBy(*order)
    return (
        df.withColumn("__prev", F.lag(s, 1).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("SOURCE_STAGE"), F.col(s).alias("TARGET_STAGE"))
        .agg(F.count(F.lit(1)).alias("FLOW_COUNT"))
    )


@renderer("sankey")
def _r_sankey(source, entity, ts, stage, tiebreak=None) -> str:
    order = ts + (f", {tiebreak}" if tiebreak else "")
    return (
        f"SELECT __prev AS SOURCE_STAGE, {stage} AS TARGET_STAGE, COUNT(*) AS FLOW_COUNT "
        f"FROM (SELECT *, LAG({stage}, 1) OVER (PARTITION BY {entity} ORDER BY {order}) "
        f"AS __prev FROM {source}) WHERE __prev IS NOT NULL "
        f"GROUP BY __prev, {stage}"
    )
