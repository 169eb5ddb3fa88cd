"""Join transforms.

Reference inventory (SURVEY §2.2 "Joins"): join with column-map + right-side
prefix (reference README.md:132-137), multi-join, plus the extensions the
reference lacks (SURVEY §2.3): semi/anti joins, theta joins, as-of joins,
bucketed interval joins.

Scale notes: ``broadcast=True`` forces a broadcast-hash join for dimension
tables (no shuffle of the fact side); equi-joins otherwise let Catalyst/AQE
pick sort-merge vs shuffled-hash and split skewed partitions. The as-of join
is the union+window formulation — one shuffle, no UDF, no per-key loop — and
the interval join bucketizes ranges so it never degenerates into a broadcast
nested-loop cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException, TransformRenderingException
from ..naming import cleanse_name
from ..registry import renderer, spark_transform
from ._util import as_list, resolve_col, resolve_cols


def _require_named(table_rendered, tname: str) -> None:
    """Renderers need a catalog/table NAME for the right side; a bare
    DataFrame has no SQL-addressable source."""
    if not isinstance(table_rendered, str) or table_rendered == "<dataframe>":
        raise TransformRenderingException(
            f"rendered {tname} requires a table-name/chain argument, not a raw "
            "DataFrame (the chain still executes; only .sql()/to_dbt is "
            "unavailable)"
        )

_JOIN_TYPES = {
    "INNER": "inner",
    "LEFT": "left",
    "RIGHT": "right",
    "OUTER": "outer",
    "FULL": "outer",
}


@spark_transform("join", category="join", streaming_ok=False)
def join(
    df: DataFrame,
    join_table: DataFrame,
    join_columns: dict,
    join_type: str = "INNER",
    join_prefix: str | None = None,
    broadcast: bool = False,
    salt: int | None = None,
) -> DataFrame:
    """Equi-join on a left→right column map; right columns optionally prefixed
    (reference README.md:132-137: ``join_prefix='PRODUCT'``).

    ``broadcast=True`` marks the right side broadcastable — use for dimension
    tables so the fact side never shuffles. ``salt=N`` explicitly splits
    skewed join keys: the left side salts each row into one of N buckets and
    the right side replicates N×, turning one hot partition into N — use when
    a key's row count dwarfs the others and AQE's skew-join splitting isn't
    enough (result is identical to the unsalted join).
    """
    how = _JOIN_TYPES.get(join_type.upper())
    if how is None:
        raise ParameterException(f"join_type must be one of {sorted(_JOIN_TYPES)}")
    right = join_table
    jc = {resolve_col(df, l): resolve_col(right, r) for l, r in join_columns.items()}
    if join_prefix:
        mapping = {c: cleanse_name(f"{join_prefix}_{c}") for c in right.columns}
        right = right.withColumnsRenamed(mapping)
        jc = {l: mapping[r] for l, r in jc.items()}
    else:
        overlap = (set(right.columns) - set(jc.values())) & set(df.columns)
        if overlap:
            raise ParameterException(
                f"columns {sorted(overlap)} exist on both sides; pass join_prefix"
            )
    if salt:
        if broadcast:
            raise ParameterException("salt is pointless with broadcast (no shuffle to skew)")
        if how not in ("inner", "left"):
            raise ParameterException("salt supports INNER/LEFT joins")
        df = df.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(l) for l in jc.keys()], F.monotonically_increasing_id()), F.lit(salt))
        )
        right = right.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0).cast("bigint"), F.lit(salt - 1).cast("bigint")))
        )
        jc = {**jc, "__salt": "__salt"}
    if broadcast:
        right = F.broadcast(right)
    cond = [df[l] == right[r] for l, r in jc.items()]
    out = df.join(right, on=cond, how=how)
    if salt:
        out = out.drop(df["__salt"]).drop(right["__salt"])
    if not join_prefix:
        if how in ("right", "outer"):
            # For RIGHT/OUTER joins the left key is NULL on unmatched right
            # rows — fold the right key into the kept key column so the join
            # key survives (coalesce), instead of silently dropping it.
            keep = [
                F.coalesce(df[c], right[jc[c]]).alias(c) if c in jc else df[c]
                for c in df.columns
            ] + [right[c] for c in right.columns if c not in set(jc.values())]
            out = out.select(*keep)
        else:
            # drop the duplicated right-side key columns (classic equi-join shape)
            for r in jc.values():
                if r != "__salt":
                    out = out.drop(right[r])
    return out


@renderer("join")
def _r_join(source, join_table, join_columns, join_type="INNER", join_prefix=None,
            broadcast=False, salt=None, _table_columns=None, _input_columns=()) -> str:
    _require_named(join_table, "join")
    jt = join_type.upper()
    hint = "/*+ BROADCAST(r) */ " if broadcast else ""
    rcols = (_table_columns or {}).get("join_table")
    if join_prefix:
        on = " AND ".join(
            f"l.{l} = r.{cleanse_name(f'{join_prefix}_{r}')}" for l, r in join_columns.items()
        )
        if rcols:
            proj = ", ".join(f"{c} AS {cleanse_name(f'{join_prefix}_{c}')}" for c in rcols)
            right_src = f"(SELECT {proj} FROM {join_table})"
        else:  # schema unknown (manually-built Step) — best-effort r.*
            right_src = join_table
            on = " AND ".join(f"l.{l} = r.{r}" for l, r in join_columns.items())
        return f"SELECT {hint}l.*, r.* FROM {source} l {jt} JOIN {right_src} r ON {on}"
    on = " AND ".join(f"l.{l} = r.{r}" for l, r in join_columns.items())
    drops = ", ".join(f"r.{r}" for r in join_columns.values())
    if jt in ("RIGHT", "OUTER", "FULL"):
        # mirror the coalesced-key execution path: unmatched right rows keep
        # their key values in the left key columns
        if _input_columns:  # keys stay in their original positions
            lsel = ", ".join(
                f"COALESCE(l.{c}, r.{join_columns[c]}) AS {c}"
                if c in join_columns
                else f"l.{c}"
                for c in _input_columns
            )
        else:
            lcols = ", ".join(f"l.{l}" for l in join_columns)
            coal = ", ".join(
                f"COALESCE(l.{l}, r.{r}) AS {l}" for l, r in join_columns.items()
            )
            lsel = f"{coal}, l.* EXCEPT ({lcols})"
        return (
            f"SELECT {hint}{lsel}, r.* EXCEPT ({drops}) "
            f"FROM {source} l {jt} JOIN {join_table} r ON {on}"
        )
    return (
        f"SELECT {hint}l.*, r.* EXCEPT ({drops}) FROM {source} l {jt} JOIN {join_table} r ON {on}"
    )


@spark_transform("multi_join", category="join", streaming_ok=False)
def multi_join(df: DataFrame, joins: list) -> DataFrame:
    """N-way join in one step (SURVEY §2.2 multi-join [B]): fold of ``join``
    specs, each a dict of join() kwargs."""
    for spec in joins:
        df = join(df, **spec)
    return df


@renderer("multi_join")
def _r_multi_join(source, joins, _table_columns=None) -> str:
    """Fold of the join renderer: each spec's output becomes the next spec's
    (parenthesized) source."""
    cols_per_spec = (_table_columns or {}).get("joins", ())
    sql = None
    for n, spec in enumerate(joins):
        tc = {"join_table": cols_per_spec[n]} if n < len(cols_per_spec) else None
        src = source if sql is None else f"({sql})"
        sql = _r_join(src, _table_columns=tc, **spec)
    return sql or f"SELECT * FROM {source}"


@spark_transform("semi_join", category="join", streaming_ok=False)
def semi_join(df: DataFrame, join_table: DataFrame, join_columns: dict) -> DataFrame:
    """Keep left rows with a match (SURVEY §2.3 extension — reference reaches
    this only via raw SQL ``apply``)."""
    cond = [
        df[resolve_col(df, l)] == join_table[resolve_col(join_table, r)]
        for l, r in join_columns.items()
    ]
    return df.join(join_table, on=cond, how="left_semi")


@renderer("semi_join")
def _r_semi_join(source, join_table, join_columns) -> str:
    on = " AND ".join(f"l.{l} = r.{r}" for l, r in join_columns.items())
    return f"SELECT l.* FROM {source} l LEFT SEMI JOIN {join_table} r ON {on}"


@spark_transform("anti_join", category="join", streaming_ok=False)
def anti_join(df: DataFrame, join_table: DataFrame, join_columns: dict) -> DataFrame:
    """Keep left rows without a match (SURVEY §2.3 extension)."""
    cond = [
        df[resolve_col(df, l)] == join_table[resolve_col(join_table, r)]
        for l, r in join_columns.items()
    ]
    return df.join(join_table, on=cond, how="left_anti")


@renderer("anti_join")
def _r_anti_join(source, join_table, join_columns) -> str:
    on = " AND ".join(f"l.{l} = r.{r}" for l, r in join_columns.items())
    return f"SELECT l.* FROM {source} l LEFT ANTI JOIN {join_table} r ON {on}"


@spark_transform("theta_join", category="join", streaming_ok=False)
def theta_join(
    df: DataFrame,
    join_table: DataFrame,
    condition: str,
    join_type: str = "INNER",
    prefix: str = "R",
) -> DataFrame:
    """Join on an arbitrary SQL condition (SURVEY §2.3 extension). Right
    columns are prefixed ``{PREFIX}_``; reference the sides in ``condition``
    by those names. Beware: non-equi conditions plan as broadcast
    nested-loop — prefer ``interval_join`` for range predicates at scale."""
    right = join_table.withColumnsRenamed(
        {c: cleanse_name(f"{prefix}_{c}") for c in join_table.columns}
    )
    return df.join(right, on=F.expr(condition), how=_JOIN_TYPES.get(join_type.upper(), "inner"))


@renderer("theta_join")
def _r_theta_join(source, join_table, condition, join_type="INNER", prefix="R",
                  _table_columns=None) -> str:
    _require_named(join_table, "theta_join")
    rcols = (_table_columns or {}).get("join_table")
    if not rcols:
        raise TransformRenderingException(
            "rendered theta_join needs the right table's schema — pass the "
            "table by name/chain so the renderer can prefix its columns"
        )
    proj = ", ".join(f"{c} AS {cleanse_name(f'{prefix}_{c}')}" for c in rcols)
    jt = join_type.upper()
    return (
        f"SELECT l.*, r.* FROM {source} l {jt} JOIN "
        f"(SELECT {proj} FROM {join_table}) r ON {condition}"
    )


@spark_transform("asof_join", category="join", streaming_ok=False)
def asof_join(
    df: DataFrame,
    join_table: DataFrame,
    on: str,
    by=None,
    right_on: str | None = None,
    value_columns=None,
    tolerance_seconds: float | None = None,
    prefix: str = "ASOF",
) -> DataFrame:
    """As-of (backward) join: for each left row, the most recent right row
    with ``right.on <= left.on`` within the same ``by`` keys (SURVEY §2.2
    notes this is absent from the reference; extension).

    Spark-first formulation: union both sides tagged by origin, then one
    window pass per ``by``-partition carrying the last non-null right value
    forward (``last(..., ignorenulls=True)`` over rows unbounded-preceding →
    current). Exactly one shuffle on (by, ts); no Python, no per-key loop —
    survives arbitrarily large sides, unlike collect-and-merge asof joins.
    """
    lts = resolve_col(df, on)
    rts = resolve_col(join_table, right_on or on)
    by = as_list(by)
    lkeys = resolve_cols(df, by)
    rkeys = resolve_cols(join_table, by)
    vals = as_list(value_columns) or [
        c for c in join_table.columns if c not in set(rkeys) | {rts}
    ]
    pvals = {v: cleanse_name(f"{prefix}_{v}") for v in vals}

    left_tag = df.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(lkeys)],
        F.col(lts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(join_table.dtypes)[v]).alias(pvals[v]) for v in vals],
        F.lit(None).cast(dict(join_table.dtypes)[rts]).alias("__rts"),
        F.struct(*df.columns).alias("__row"),
    )
    right_tag = join_table.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(rkeys)],
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(v).alias(pvals[v]) for v in vals],
        F.col(rts).alias("__rts"),
        F.lit(None).cast(left_tag.schema["__row"].dataType).alias("__row"),
    )
    unioned = left_tag.unionByName(right_tag)
    # right rows sort before left rows at equal ts → the match is inclusive (<=)
    w = (
        Window.partitionBy(*[f"__k{i}" for i in range(len(by))])
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(pvals[v], ignorenulls=True).over(w).alias(f"__f_{pvals[v]}") for v in vals],
        F.last("__rts", ignorenulls=True).over(w).alias("__f_rts"),
    ).filter("__is_left = 1")
    within = (
        F.col("__f_rts").isNotNull()
        if tolerance_seconds is None
        else F.col("__f_rts").isNotNull()
        & (F.unix_timestamp("__ts") - F.unix_timestamp("__f_rts") <= F.lit(tolerance_seconds))
    )
    out_cols = [F.col("__row")[c].alias(c) for c in df.columns]
    out_cols += [
        F.when(within, F.col(f"__f_{pvals[v]}")).alias(pvals[v]) for v in vals
    ]
    return filled.select(*out_cols)


@renderer("asof_join")
def _r_asof_join(source, join_table, on, by=None, right_on=None, value_columns=None,
                 tolerance_seconds=None, prefix="ASOF", _input_columns=(),
                 _table_columns=None) -> str:
    """SQL mirror of the union+window as-of formulation (same shape the
    DataFrame path executes — one window pass, inclusive <= match)."""
    _require_named(join_table, "asof_join")
    rcols = (_table_columns or {}).get("join_table")
    rts = right_on or on
    by = as_list(by)
    vals = as_list(value_columns)
    if not vals:
        if not rcols:
            raise TransformRenderingException(
                "rendered asof_join needs value_columns or a named right table"
            )
        vals = [c for c in rcols if c not in set(by) | {rts}]
    if not _input_columns:
        raise TransformRenderingException("rendered asof_join needs chain context")
    pvals = {v: cleanse_name(f"{prefix}_{v}") for v in vals}
    keys = ", ".join(f"{k} AS __k{i}" for i, k in enumerate(by))
    keysel = (keys + ", ") if by else ""
    lnulls = ", ".join(f"NULL AS {pvals[v]}" for v in vals)
    rvals = ", ".join(f"{v} AS {pvals[v]}" for v in vals)
    lrow = ", ".join(_input_columns)
    left = (
        f"SELECT {keysel}{on} AS __ts, 1 AS __is_left, {lnulls}, NULL AS __rts, "
        f"struct({lrow}) AS __row FROM {source}"
    )
    right = (
        f"SELECT {keysel}{rts} AS __ts, 0 AS __is_left, {rvals}, {rts} AS __rts, "
        f"NULL AS __row FROM {join_table}"
    )
    part = "PARTITION BY " + ", ".join(f"__k{i}" for i in range(len(by))) + " " if by else ""
    win = (
        f"{part}ORDER BY __ts ASC, __is_left ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    filled = ", ".join(
        f"last({pvals[v]}, true) OVER ({win}) AS __f_{pvals[v]}" for v in vals
    )
    within = "__f_rts IS NOT NULL"
    if tolerance_seconds is not None:
        within += (
            f" AND unix_timestamp(__ts) - unix_timestamp(__f_rts) <= {tolerance_seconds}"
        )
    out = ", ".join(f"__row.{c} AS {c}" for c in _input_columns)
    outv = ", ".join(
        f"CASE WHEN {within} THEN __f_{pvals[v]} END AS {pvals[v]}" for v in vals
    )
    return (
        f"SELECT {out}, {outv} FROM (SELECT *, {filled}, "
        f"last(__rts, true) OVER ({win}) AS __f_rts FROM "
        f"(({left}) UNION ALL ({right}))) WHERE __is_left = 1"
    )


@spark_transform("interval_join", category="join", streaming_ok=False)
def interval_join(
    df: DataFrame,
    join_table: DataFrame,
    point: str,
    lower: str,
    upper: str,
    bucket_width: float,
    by=None,
    prefix: str = "R",
) -> DataFrame:
    """Point-in-interval join (``right.lower <= left.point <= right.upper``)
    via range bucketization (SURVEY §2.3 extension).

    Each right interval explodes into the buckets it spans; the join becomes
    an equi-join on (by, bucket) + a residual BETWEEN filter. OSS Spark has
    no range-join optimization (that hint is Databricks-only), so without
    this a point-in-interval join is a nested-loop cross product —
    bucketization keeps it a hash join at 100 TB. Choose ``bucket_width``
    near the typical interval length.
    """
    p = resolve_col(df, point)
    lo, hi = resolve_col(join_table, lower), resolve_col(join_table, upper)
    by = as_list(by)
    lkeys, rkeys = resolve_cols(df, by), resolve_cols(join_table, by)
    right = join_table.withColumnsRenamed(
        {c: cleanse_name(f"{prefix}_{c}") for c in join_table.columns}
    )
    rlo, rhi = cleanse_name(f"{prefix}_{lo}"), cleanse_name(f"{prefix}_{hi}")
    rkeys_p = [cleanse_name(f"{prefix}_{k}") for k in rkeys]
    right = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(rlo) / F.lit(bucket_width)),
                F.floor(F.col(rhi) / F.lit(bucket_width)),
            )
        ),
    )
    left = df.withColumn("__bucket", F.floor(F.col(p) / F.lit(bucket_width)))
    cond = [left["__bucket"] == right["__bucket"]] + [
        left[lk] == right[rk] for lk, rk in zip(lkeys, rkeys_p)
    ]
    return (
        left.join(right, on=cond, how="inner")
        .filter((F.col(p) >= F.col(rlo)) & (F.col(p) <= F.col(rhi)))
        .drop(left["__bucket"])
        .drop(right["__bucket"])
    )


@renderer("interval_join")
def _r_interval_join(source, join_table, point, lower, upper, bucket_width,
                     by=None, prefix="R", _table_columns=None) -> str:
    _require_named(join_table, "interval_join")
    rcols = (_table_columns or {}).get("join_table")
    if not rcols:
        raise TransformRenderingException(
            "rendered interval_join needs the right table's schema — pass it "
            "by name/chain so the renderer can prefix its columns"
        )
    by = as_list(by)
    proj = ", ".join(f"{c} AS {cleanse_name(f'{prefix}_{c}')}" for c in rcols)
    rlo, rhi = cleanse_name(f"{prefix}_{lower}"), cleanse_name(f"{prefix}_{upper}")
    keys = " AND ".join(
        f"l.{k} = r.{cleanse_name(f'{prefix}_{k}')}" for k in by
    )
    on = "l.__bucket = r.__bucket" + (f" AND {keys}" if keys else "")
    return (
        f"SELECT l.* EXCEPT (__bucket), r.* EXCEPT (__bucket) FROM "
        f"(SELECT t.*, FLOOR({point} / {bucket_width}) AS __bucket FROM {source} t) l JOIN "
        f"(SELECT *, explode(sequence(FLOOR({rlo} / {bucket_width}), "
        f"FLOOR({rhi} / {bucket_width}))) AS __bucket FROM "
        f"(SELECT {proj} FROM {join_table})) r ON {on} "
        f"WHERE l.{point} >= r.{rlo} AND l.{point} <= r.{rhi}"
    )


@spark_transform("fuzzy_join", category="join", streaming_ok=False)
def fuzzy_join(
    df: DataFrame,
    join_table: DataFrame,
    column: str,
    right_column: str | None = None,
    max_distance: int = 2,
    block: str = "prefix_length",
    block_len: int = 2,
    join_prefix: str = "R",
) -> DataFrame:
    """Approximate string equi-join for entity resolution (public
    blocking-and-verification pattern — the record-linkage analog of LSH):
    candidate pairs come from a cheap BLOCK equi-join, then only candidates
    pay the edit-distance verify. Rows join when their normalized
    (lower/trim) strings are within ``max_distance`` Levenshtein edits.

    ``block='prefix_length'`` (default): candidates must share the first
    ``block_len`` normalized characters AND sit in compatible length
    buckets of width ``max_distance + 1`` (the left side probes every
    bucket its ±max_distance window can touch, ≤ 3 of them, via a bounded
    explode). On natural-text keys this splits skew blocks like "th…" by
    length, so no single block key carries an unbounded share of the
    corpus. Because ``|len(l) − len(r)| ≤ max_distance`` is already implied
    by the edit-distance verify, the OUTPUT is identical to plain prefix
    blocking — only the candidate set (and the worst block) shrinks.
    ``block='prefix'``: prefix-only blocking (the classic scheme; one hot
    prefix = one hot block). ``block='suffix'`` / ``block='suffix_length'``
    mirror the two schemes on the LAST ``block_len`` characters — the right
    choice for keys with a constant boilerplate head (serial numbers,
    "Customer#000000001"-style ids, URL prefixes), where every prefix block
    collapses into one. All blocked schemes share the recall caveat: an
    edit inside the blocked substring escapes the block. ``block='none'``
    is the exact all-pairs fallback for SMALL right sides only.

    Output: left columns + right columns (prefixed ``{join_prefix}_``) +
    ``EDIT_DISTANCE``. Scale: the block join shuffles on the short block
    key; verification is row-local levenshtein on candidates only.
    """
    if block not in ("prefix", "prefix_length", "suffix", "suffix_length",
                     "none"):
        raise ParameterException(
            "block must be 'prefix', 'prefix_length', 'suffix', "
            "'suffix_length' or 'none'"
        )
    if max_distance < 0:
        raise ParameterException("max_distance must be >= 0")
    lc = resolve_col(df, column)
    rc = resolve_col(join_table, right_column or column)
    norm = lambda c: F.trim(F.lower(c))  # noqa: E731
    right = join_table.select(
        [F.col(c).alias(cleanse_name(f"{join_prefix}_{c}")) for c in join_table.columns]
    )
    prc = cleanse_name(f"{join_prefix}_{rc}")
    # blocked substring: first block_len chars for prefix schemes, last
    # block_len for suffix schemes (F.substring supports negative start)
    if block.startswith("suffix"):
        key = lambda c: F.substring(norm(c), -block_len, block_len)  # noqa: E731
    else:
        key = lambda c: F.substring(norm(c), 1, block_len)  # noqa: E731
    if block in ("prefix", "suffix"):
        cond = key(F.col(lc)) == key(F.col(prc))
        joined = df.join(right, on=cond, how="inner")
    elif block in ("prefix_length", "suffix_length"):
        w = max_distance + 1
        lln = F.length(norm(F.col(lc)))
        left = df.withColumn(
            "__fj_pb", key(F.col(lc))
        ).withColumn(
            # every length bucket a ≤max_distance edit can reach; the
            # window spans 2*max_distance < 2w, so ≤ 3 buckets
            "__fj_lb",
            F.explode(
                F.sequence(
                    F.floor((lln - F.lit(max_distance)) / F.lit(w)),
                    F.floor((lln + F.lit(max_distance)) / F.lit(w)),
                )
            ),
        )
        rln = F.length(norm(F.col(prc)))
        rightb = right.withColumn(
            "__fj_pb", key(F.col(prc))
        ).withColumn("__fj_lb", F.floor(rln / F.lit(w)))
        joined = left.join(rightb, on=["__fj_pb", "__fj_lb"], how="inner").drop(
            "__fj_pb", "__fj_lb"
        )
    else:
        joined = df.crossJoin(right)
    dist = F.levenshtein(norm(F.col(lc)), norm(F.col(prc)))
    return (
        joined.withColumn("EDIT_DISTANCE", dist)
        .filter(F.col("EDIT_DISTANCE") <= max_distance)
    )


@renderer("fuzzy_join")
def _r_fuzzy_join(source, join_table, column, right_column=None, max_distance=2,
                  block="prefix_length", block_len=2, join_prefix="R",
                  _table_columns=None) -> str:
    rcols = (_table_columns or {}).get("join_table")
    if not rcols:
        raise TransformRenderingException(
            "rendered fuzzy_join needs the right table's schema — pass the "
            "table by name/chain so the renderer can prefix its columns"
        )
    rc = right_column or column
    proj = ", ".join(f"{c} AS {cleanse_name(f'{join_prefix}_{c}')}" for c in rcols)
    prc = cleanse_name(f"{join_prefix}_{rc}")
    norm = lambda e: f"trim(lower({e}))"  # noqa: E731
    dist = f"levenshtein({norm(f'l.{column}')}, {norm(f'r.{prc}')})"
    if block in ("prefix", "prefix_length", "suffix", "suffix_length"):
        start = f"-{block_len}" if block.startswith("suffix") else "1"
        on = (f"ON substring({norm(f'l.{column}')}, {start}, {block_len}) = "
              f"substring({norm(f'r.{prc}')}, {start}, {block_len})")
        if block in ("prefix_length", "suffix_length"):
            # rendered form: the length-bucket probe is an execution detail;
            # its only semantic effect (|len diff| <= max_distance) is
            # implied by the edit-distance filter, stated here explicitly
            on += (f" AND abs(length({norm(f'l.{column}')}) - "
                   f"length({norm(f'r.{prc}')})) <= {max_distance}")
        jt = "JOIN"
    else:
        on, jt = "", "CROSS JOIN"
    return (
        f"SELECT l.*, r.*, {dist} AS EDIT_DISTANCE FROM {source} l {jt} "
        f"(SELECT {proj} FROM {join_table}) r {on} "
        f"WHERE {dist} <= {max_distance}"
    )
