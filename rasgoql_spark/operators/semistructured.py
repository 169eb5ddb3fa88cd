"""Semi-structured (JSON / array / map) scalar transforms.

The reference leaves VARIANT opaque (SURVEY §1.3: Snowflake VARIANT has no
dedicated transforms; reachable only via raw ``apply`` SQL — SURVEY §2.3
gap list). These are first-class here because event/props-style JSON columns
are pervasive in the testdata and in real pipelines. All JVM built-ins —
``get_json_object`` / ``from_json`` stay inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..naming import cleanse_name
from ..registry import renderer, spark_transform
from ._util import as_list, resolve_col


@spark_transform("json_extract", category="semistructured")
def json_extract(df: DataFrame, column: str, paths: dict, types: dict | None = None) -> DataFrame:
    """Extract JSON paths into columns: ``paths={'K': '$.k'}`` appends column
    K holding ``get_json_object(column, '$.k')`` (string), optionally cast
    via ``types={'K': 'int'}``."""
    col = resolve_col(df, column)
    types = types or {}
    out = {}
    for name, path in paths.items():
        c = F.get_json_object(F.col(col), path)
        if name in types:
            c = c.cast(types[name])
        out[cleanse_name(name)] = c
    return df.withColumns(out)


@renderer("json_extract")
def _r_json_extract(source, column, paths: dict, types: dict | None = None) -> str:
    types = types or {}
    cols = []
    for name, path in paths.items():
        expr = f"get_json_object({column}, '{path}')"
        if name in types:
            expr = f"CAST({expr} AS {types[name]})"
        cols.append(f"{expr} AS {cleanse_name(name)}")
    return f"SELECT *, {', '.join(cols)} FROM {source}"


@spark_transform("explode_array", category="semistructured")
def explode_array(df: DataFrame, column: str, name: str | None = None, keep_nulls: bool = False) -> DataFrame:
    """One row per array element (UNNEST); ``keep_nulls`` keeps rows whose
    array is empty/null (LEFT-join semantics via explode_outer)."""
    col = resolve_col(df, column)
    name = name or cleanse_name(f"{col}_ITEM")
    fn = F.explode_outer if keep_nulls else F.explode
    return df.withColumn(name, fn(F.col(col))).drop(col)


@renderer("explode_array")
def _r_explode_array(source, column, name=None, keep_nulls=False) -> str:
    name = name or cleanse_name(f"{column}_ITEM")
    fn = "explode_outer" if keep_nulls else "explode"
    return f"SELECT * EXCEPT ({column}), {fn}({column}) AS {name} FROM {source}"


@spark_transform("array_agg_by", category="semistructured", streaming_ok=False)
def array_agg_by(df: DataFrame, group_by, column: str, sort: bool = True, distinct: bool = False) -> DataFrame:
    """Collect a column into a (deterministically sorted) array per group —
    the inverse of explode_array. ``sort=True`` makes output order stable
    (collect_list order is otherwise partition-dependent)."""
    keys = [resolve_col(df, k) for k in as_list(group_by)]
    col = resolve_col(df, column)
    agg = F.collect_set(col) if distinct else F.collect_list(col)
    if sort:
        agg = F.array_sort(agg)
    return df.groupBy(*keys).agg(agg.alias(cleanse_name(f"{col}_ARRAY")))


@renderer("array_agg_by")
def _r_array_agg_by(source, group_by, column, sort=True, distinct=False) -> str:
    keys = ", ".join(as_list(group_by))
    agg = f"collect_set({column})" if distinct else f"collect_list({column})"
    if sort:
        agg = f"array_sort({agg})"
    return (
        f"SELECT {keys}, {agg} AS {cleanse_name(f'{column}_ARRAY')} "
        f"FROM {source} GROUP BY {keys}"
    )


@spark_transform("map_from_entries_by", category="semistructured", streaming_ok=False)
def map_from_entries_by(df: DataFrame, group_by, key_column: str, value_column: str) -> DataFrame:
    """Build a map column per group from (key, value) rows."""
    keys = [resolve_col(df, k) for k in as_list(group_by)]
    kc, vc = resolve_col(df, key_column), resolve_col(df, value_column)
    return df.groupBy(*keys).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col(kc), F.col(vc))))
        ).alias(cleanse_name(f"{kc}_{vc}_MAP"))
    )


@renderer("map_from_entries_by")
def _r_map_from_entries_by(source, group_by, key_column, value_column) -> str:
    keys = ", ".join(as_list(group_by))
    name = cleanse_name(f"{key_column}_{value_column}_MAP")
    return (
        f"SELECT {keys}, map_from_entries(array_sort(collect_list("
        f"struct({key_column}, {value_column})))) AS {name} "
        f"FROM {source} GROUP BY {keys}"
    )


@spark_transform("json_flatten", category="semistructured", streaming_ok=False)
def json_flatten(
    df: DataFrame,
    column: str,
    keys=None,
    types: dict | None = None,
    uppercase: bool = True,
) -> DataFrame:
    """Flatten a JSON-object string column into one column per top-level
    key — the schema-on-read step for event ``props``-style payloads.

    ``keys=None`` discovers the key set from a BOUNDED sample (distinct
    json_object_keys over up to 1000 rows — a capped driver action, same
    budget class as pivot's value discovery); pass ``keys`` explicitly on
    streaming-adjacent or drifting payloads. Extraction itself is the
    row-local ``get_json_object`` projection — shuffle-free, whole-stage
    codegen, scales with cores.
    """
    from ..operators._util import as_list

    col = resolve_col(df, column)
    if keys is None:
        rows = (
            df.select(F.explode(F.json_object_keys(F.col(col))).alias("k"))
            .limit(1000)
            .dropDuplicates()
            .collect()
        )
        keys = sorted(r["k"] for r in rows)
        if not keys:
            raise ParameterException(
                f"json_flatten: no JSON object keys found in {col}"
            )
    else:
        keys = as_list(keys)
    types = types or {}
    out = {}
    for k in keys:
        c = F.get_json_object(F.col(col), f"$.{k}")
        if k in types:
            c = c.cast(types[k])
        out[cleanse_name(k) if uppercase else k] = c
    return df.withColumns(out)


@renderer("json_flatten")
def _r_json_flatten(source, column, keys=None, types: dict | None = None, uppercase: bool = True) -> str:
    from ..errors import TransformRenderingException
    from ..operators._util import as_list

    if keys is None:
        raise TransformRenderingException(
            "json_flatten renders only with explicit keys (discovery is a "
            "runtime sample)"
        )
    types = types or {}
    cols = []
    for k in as_list(keys):
        expr = f"get_json_object({column}, '$.{k}')"
        if k in types:
            expr = f"CAST({expr} AS {types[k]})"
        cols.append(f"{expr} AS {cleanse_name(k) if uppercase else k}")
    return f"SELECT *, {', '.join(cols)} FROM {source}"


@spark_transform("transform_pandas", category="escape")
def transform_pandas(df: DataFrame, func, schema) -> DataFrame:
    """THE sanctioned Python escape hatch: run an Arrow-batched pandas
    function over the frame (``mapInPandas``). ``func`` takes an iterator
    of pandas DataFrames and yields pandas DataFrames matching ``schema``
    (a DDL string like ``"id long, score double"`` or a StructType).

    Use this — never row-at-a-time Python UDFs — when the built-in
    operators genuinely can't express the logic (custom models, binary
    decoders, third-party libraries). Arrow moves columns in batches, so
    the Python boundary costs per-batch, not per-row; the multimodal
    decoders (functions/multimodal.py) are the house example of the
    pattern. Works on batch AND streaming frames. Not SQL-renderable by
    nature (``.sql()`` raises TransformRenderingException).
    """
    if not callable(func):
        raise ParameterException("func must be a callable of iter[pd.DataFrame] -> iter[pd.DataFrame]")
    return df.mapInPandas(func, schema=schema)
