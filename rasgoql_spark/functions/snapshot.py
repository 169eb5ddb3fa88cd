"""Corpus snapshot diff (public pattern: hash-compare change-data-capture,
the standard warehouse reconciliation shape).

A long-running training-data pipeline re-materializes its corpus every
cycle; the operational questions — what did this release add, drop, or
rewrite relative to the last accepted snapshot — reduce to a keyed diff.
Computing it by shipping full rows would shuffle the corpus twice; instead
both sides reduce to slim ``(key, 16-byte md5)`` rows before the one
full-outer join, so the shuffle is key-plus-hash regardless of document
width. Each column value is md5-hashed individually before the row-level
concat+md5, so values containing separator bytes cannot make distinct rows
collide. That row-hash trick is exactly what the DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import as_list, resolve_col
from ..registry import renderer, spark_transform

def _row_hash(cols: list[str]) -> Column:
    """Order-stable null-safe hash of ``cols``: each value is md5-hashed
    INDIVIDUALLY (fixed 32-hex-char tokens) before the row-level concat, so
    a value containing the separator — or any crafted byte sequence — can
    never shift column boundaries and make distinct rows collide. NULL maps
    to the literal token ``NULL``, which no md5 hex digest can equal."""
    return F.md5(
        F.concat_ws(
            "|",
            *[F.coalesce(F.md5(F.col(c).cast("string")), F.lit("NULL")) for c in cols],
        )
    )


@spark_transform("diff_datasets", category="snapshot", streaming_ok=False)
def diff_datasets(
    df: DataFrame,
    other: DataFrame,
    keys,
    compare_cols=None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff the NEW snapshot ``df`` against the OLD snapshot ``other``.

    Returns one row per key with ``STATUS`` in ``ADDED`` (new only),
    ``REMOVED`` (old only), ``CHANGED`` (both, compared columns differ) and
    — only with ``include_unchanged=True`` — ``UNCHANGED``.

    ``compare_cols`` defaults to every shared non-key column. Keys must be
    unique per side (enforce upstream with ``remove_duplicates``); duplicate
    keys would turn the outer join into a fan-out.
    """
    keys = [resolve_col(df, k) for k in as_list(keys)]
    if not keys:
        raise ParameterException("diff_datasets requires at least one key column")
    for k in keys:
        resolve_col(other, k)  # must exist on both sides
    if compare_cols is None:
        shared = [c for c in df.columns if c in set(other.columns)]
        compare_cols = [c for c in shared if c not in keys]
    else:
        compare_cols = [resolve_col(df, c) for c in as_list(compare_cols)]
        for c in compare_cols:
            resolve_col(other, c)
    new = df.select(*keys, _row_hash(compare_cols).alias("__h_new"))
    old = other.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        _row_hash(compare_cols).alias("__h_old"),
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
        cond = c if cond is None else (cond & c)
    joined = new.join(old, on=cond, how="full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("ADDED"))
        .when(F.col("__h_new").isNull(), F.lit("REMOVED"))
        .when(F.col("__h_new") != F.col("__h_old"), F.lit("CHANGED"))
        .otherwise(F.lit("UNCHANGED"))
    )
    out = joined.select(
        *[F.coalesce(F.col(k), F.col(f"__k_{k}")).alias(k) for k in keys],
        status.alias("STATUS"),
    )
    if not include_unchanged:
        out = out.filter(F.col("STATUS") != "UNCHANGED")
    return out


def diff_oracle_sql(
    new_sql: str,
    old_sql: str,
    keys: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> str:
    """DuckDB replay of :func:`diff_datasets` over two subqueries."""
    def h(alias: str) -> str:
        parts = ", ".join(
            f"COALESCE(md5(CAST({alias}.{c} AS VARCHAR)), 'NULL')"
            for c in compare_cols
        )
        return f"md5(concat_ws('|', {parts}))"

    on = " AND ".join(f"n.{k} IS NOT DISTINCT FROM o.{k}" for k in keys)
    key_sel = ", ".join(f"COALESCE(n.{k}, o.{k}) AS {k}" for k in keys)
    status = (
        f"CASE WHEN o.__h IS NULL THEN 'ADDED' WHEN n.__h IS NULL THEN 'REMOVED' "
        f"WHEN n.__h <> o.__h THEN 'CHANGED' ELSE 'UNCHANGED' END"
    )
    filt = "" if include_unchanged else " WHERE STATUS <> 'UNCHANGED'"
    keys_csv = ", ".join(keys)
    return (
        f"WITH n AS (SELECT {keys_csv}, {h('s')} AS __h FROM ({new_sql}) s), "
        f"o AS (SELECT {keys_csv}, {h('s')} AS __h FROM ({old_sql}) s) "
        f"SELECT * FROM (SELECT {key_sel}, {status} AS STATUS "
        f"FROM n FULL OUTER JOIN o ON {on}){filt}"
    )


def _render_hash(cols, alias: str) -> str:
    parts = ", ".join(
        f"COALESCE(md5(CAST({alias}.{c} AS STRING)), 'NULL')"
        for c in cols
    )
    return f"md5(concat_ws('|', {parts}))"


@renderer("diff_datasets")
def _r_diff_datasets(source, other, keys, compare_cols=None,
                     include_unchanged=False, _input_columns=(),
                     _table_columns=None) -> str:
    from ..errors import TransformRenderingException

    rcols = (_table_columns or {}).get("other")
    if not rcols:
        raise TransformRenderingException(
            "rendered diff_datasets needs the other table's schema — pass "
            "it by name/chain"
        )
    keys = as_list(keys)
    if compare_cols is None:
        shared = [c for c in _input_columns if c in set(rcols)]
        compare_cols = [c for c in shared if c not in keys]
    else:
        compare_cols = as_list(compare_cols)
    on = " AND ".join(f"n.{k} <=> o.{k}" for k in keys)
    key_sel = ", ".join(f"COALESCE(n.{k}, o.{k}) AS {k}" for k in keys)
    status = (
        "CASE WHEN o.__h IS NULL THEN 'ADDED' WHEN n.__h IS NULL THEN "
        "'REMOVED' WHEN n.__h != o.__h THEN 'CHANGED' ELSE 'UNCHANGED' END"
    )
    keys_csv = ", ".join(keys)
    filt = "" if include_unchanged else " WHERE STATUS != 'UNCHANGED'"
    return (
        f"SELECT * FROM (SELECT {key_sel}, {status} AS STATUS FROM "
        f"(SELECT {keys_csv}, {_render_hash(compare_cols, 's')} AS __h FROM {source} s) n "
        f"FULL OUTER JOIN "
        f"(SELECT {keys_csv}, {_render_hash(compare_cols, 's')} AS __h FROM {other} s) o "
        f"ON {on}){filt}"
    )
