"""Z-order (Morton-code) data layout for multi-dimensional data skipping.

Public technique (Morton 1966; the OPTIMIZE ZORDER BY of the Delta Lake /
Iceberg table formats): rank-normalize each clustering column into 2^bits
range buckets, interleave the bucket bits into a single 64-bit key, then
range-partition + sort files by that key. Rows close in ANY clustering
dimension land in the same parquet row groups, so the column min/max
statistics every parquet footer already carries prune scans on EVERY
clustering column at once — the single-column benefit of a sort, spread
across d dimensions at a d-th of the resolution.

100 TB design: this is a pure LAYOUT operator — the z-value is one
shuffle-free integer expression per row (bucket arithmetic over two
driver-collected doubles per column, then integer bit math), and the only
data movement is the one range-repartition any clustered write pays.
Skipping then happens at scan time for free, in any engine that reads
parquet statistics (Spark row-group pruning, DuckDB zone maps). The
interleave is deterministic integer math, so the operator carries a full
DuckDB hash oracle and a ``.sql()`` renderer (explicit ``ranges``, the
random_projection in_dim convention).

No counterpart in the reference repo (a SQL-string emitter has no layout
control); cites the public technique only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import as_list, resolve_col
from ..registry import spark_transform

MAX_Z_BITS = 62  # len(columns) * bits must fit a signed 64-bit key


def _as_double(df: DataFrame, col: str) -> Column:
    """Normalize an orderable column to double for range bucketing."""
    dt = dict(df.dtypes)[col]
    if dt == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if dt.startswith("timestamp"):
        return F.col(col).cast("double")
    if dt in ("string", "binary", "boolean") or dt.startswith(("array", "map", "struct")):
        raise ParameterException(
            f"zorder column {col!r} has type {dt}; z-ordering needs a "
            "numeric, date, or timestamp column (hash non-orderable types "
            "into a numeric surrogate first)"
        )
    return F.col(col).cast("double")


def zorder_ranges(df: DataFrame, columns: list[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per clustering column — ONE distributed aggregate, a
    bounded 2-doubles-per-column collect (the literal the bucket
    expression embeds)."""
    aggs = []
    for c in columns:
        d = _as_double(df, c)
        aggs += [F.min(d).alias(f"__mn_{c}"), F.max(d).alias(f"__mx_{c}")]
    row = df.agg(*aggs).first()
    out = {}
    for c in columns:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None:
            raise ParameterException(f"zorder column {c!r} is entirely NULL")
        out[c] = (float(mn), float(mx))
    return out


def _bucket_expr(d: Column, mn: float, mx: float, nb: int) -> Column:
    """Clamped range bucket in [0, nb): identical arithmetic shape in the
    renderer and the DuckDB oracle — (x - min) / span * nb, floored, then
    clamped (explicit ranges may not cover the data). NULL -> bucket 0
    (nulls-first, the standard layout convention)."""
    span = mx - mn
    if span <= 0:
        return F.lit(0).cast("bigint")
    b = F.floor((d - F.lit(mn)) / F.lit(span) * F.lit(float(nb)))
    b = F.least(F.lit(nb - 1).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), b))
    return F.coalesce(b, F.lit(0).cast("bigint"))


def zvalue_expr(
    df: DataFrame,
    columns: list[str],
    bits: int = 8,
    ranges: dict | None = None,
) -> Column:
    """The Morton key as a Column: bit b of column c's bucket lands at
    interleaved position b * n_cols + c (column-major interleave — every
    column contributes to the most-significant end symmetrically)."""
    cols = [resolve_col(df, c) for c in as_list(columns)]
    if not cols:
        raise ParameterException("zorder needs at least one column")
    if bits < 1 or bits > 16:
        raise ParameterException("bits must be in [1, 16]")
    if len(cols) * bits > MAX_Z_BITS:
        raise ParameterException(
            f"{len(cols)} columns x {bits} bits = {len(cols) * bits} "
            f"exceeds the {MAX_Z_BITS}-bit key"
        )
    rng = dict(ranges) if ranges else zorder_ranges(df, cols)
    nb = 1 << bits
    z = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        if c not in rng:
            raise ParameterException(f"ranges is missing column {c!r}")
        mn, mx = float(rng[c][0]), float(rng[c][1])
        bucket = _bucket_expr(_as_double(df, c), mn, mx, nb)
        for b in range(bits):
            z = z + F.shiftright(bucket, b).bitwiseAND(F.lit(1)) * F.lit(
                1 << (b * len(cols) + ci)
            ).cast("bigint")
    return z


@spark_transform("zorder", category="layout", streaming_ok=False)
def zorder(
    df: DataFrame,
    columns,
    bits: int = 8,
    name: str = "ZVALUE",
    ranges: dict | None = None,
) -> DataFrame:
    """Append ``name`` (bigint): the Morton z-order key over ``columns`` —
    each column range-bucketed into ``2**bits`` buckets between its
    observed (or explicitly passed ``ranges[col] = (min, max)``) bounds,
    bucket bits interleaved column-major. Sort or range-partition by this
    key before writing (``save_shards(zorder_by=...)`` does both) and
    parquet min/max statistics prune scans on every clustering column.

    NULLs bucket to 0 (nulls-first); values outside explicit ranges clamp
    to the edge buckets. Non-orderable types raise — hash them into a
    numeric surrogate first."""
    return df.withColumn(name, zvalue_expr(df, columns, bits=bits, ranges=ranges))


from ..registry import renderer as _renderer  # noqa: E402


@_renderer("zorder")
def _r_zorder(source, columns, bits=8, name="ZVALUE", ranges=None) -> str:
    """Spark-SQL replay with the identical bucket arithmetic; requires
    explicit ``ranges`` (min/max discovery is a runtime aggregate — the
    random_projection in_dim convention)."""
    from ..errors import TransformRenderingException

    cols = as_list(columns)
    if not cols:
        raise ParameterException("zorder needs at least one column")
    if bits < 1 or bits > 16:
        raise ParameterException("bits must be in [1, 16]")
    if len(cols) * bits > MAX_Z_BITS:
        raise ParameterException(
            f"{len(cols)} columns x {bits} bits = {len(cols) * bits} "
            f"exceeds the {MAX_Z_BITS}-bit key"
        )
    if ranges is None:
        raise TransformRenderingException(
            "rendered zorder needs explicit ranges={col: (min, max)} "
            "(min/max discovery is a runtime aggregate)"
        )
    nb = 1 << bits
    terms = []
    for ci, c in enumerate(cols):
        if c not in ranges:
            raise ParameterException(f"ranges is missing column {c!r}")
        mn, mx = float(ranges[c][0]), float(ranges[c][1])
        span = mx - mn
        if span <= 0:
            continue
        bucket = (
            f"COALESCE(LEAST(CAST({nb - 1} AS BIGINT), "
            f"GREATEST(CAST(0 AS BIGINT), "
            f"FLOOR((CAST({c} AS DOUBLE) - {mn!r}) / {span!r} * "
            f"CAST({nb} AS DOUBLE)))), CAST(0 AS BIGINT))"
        )
        for b in range(bits):
            terms.append(
                f"(shiftright({bucket}, {b}) & 1) * "
                f"CAST({1 << (b * len(cols) + ci)} AS BIGINT)"
            )
    zexpr = " + ".join(terms) if terms else "CAST(0 AS BIGINT)"
    return f"SELECT *, {zexpr} AS {name} FROM {source}"


# --- Hilbert curve (2-D) -------------------------------------------------

def _hilbert_level_exprs(s: int, n: int, x: str, y: str, d: str) -> dict[str, str]:
    """One unrolled iteration of the classic xy2d walk (public algorithm —
    the Wikipedia/Hacker's-Delight formulation) as dialect-neutral SQL:
    only ``&``, CASE, and integer arithmetic, which Spark SQL and DuckDB
    evaluate identically. The quadrant index ``(3*rx) XOR ry`` is replaced
    by the closed form ``3*rx + ry - 2*rx*ry`` (equal on {0,1} inputs), so
    no dialect-specific XOR operator is needed."""
    rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
    return {
        "d": f"{d} + CAST({s * s} AS BIGINT) * (3 * {rx} + {ry} - 2 * {rx} * {ry})",
        "x": (
            f"CASE WHEN {ry} = 1 THEN {x} "
            f"WHEN {rx} = 1 THEN {n - 1} - {y} ELSE {y} END"
        ),
        "y": (
            f"CASE WHEN {ry} = 1 THEN {y} "
            f"WHEN {rx} = 1 THEN {n - 1} - {x} ELSE {x} END"
        ),
    }


def hilbert_sql(
    source: str,
    x_bucket: str,
    y_bucket: str,
    bits: int,
    out_cols,
    name: str = "HVALUE",
) -> str:
    """Full dialect-neutral (Spark SQL == DuckDB) rendering of the 2-D
    Hilbert key: one nested subquery per bit level, so each level's (x, y,
    d) state is named once and never re-expanded — the same staging the
    DataFrame path uses. ``x_bucket``/``y_bucket`` are SQL expressions
    yielding bigint buckets in [0, 2**bits)."""
    n = 1 << bits
    sql = (
        f"(SELECT *, CAST({x_bucket} AS BIGINT) AS __gx0, "
        f"CAST({y_bucket} AS BIGINT) AS __gy0, "
        f"CAST(0 AS BIGINT) AS __gd0 FROM {source})"
    )
    lvl = 0
    for i in range(bits - 1, -1, -1):
        e = _hilbert_level_exprs(1 << i, n, f"__gx{lvl}", f"__gy{lvl}", f"__gd{lvl}")
        sql = (
            f"(SELECT *, {e['d']} AS __gd{lvl + 1}, {e['x']} AS __gx{lvl + 1}, "
            f"{e['y']} AS __gy{lvl + 1} FROM {sql})"
        )
        lvl += 1
    cols = ", ".join(out_cols)
    return f"SELECT {cols}, __gd{lvl} AS {name} FROM {sql}"


@spark_transform("hilbert", category="layout", streaming_ok=False)
def hilbert(
    df: DataFrame,
    columns,
    bits: int = 8,
    name: str = "HVALUE",
    ranges: dict | None = None,
) -> DataFrame:
    """Append ``name`` (bigint): the 2-D Hilbert-curve key over exactly two
    clustering columns (Hilbert 1891; the xy2d walk of the public
    literature, unrolled ``bits`` levels). Same contract as ``zorder`` —
    range-bucket each column into ``2**bits`` buckets between observed or
    explicit ``ranges``, then map (x, y) to the curve position — but with
    strictly better locality than Morton interleave: the Hilbert curve
    never jumps, so consecutive key ranges are contiguous 2-D blocks and
    parquet min/max pruning tightens on BOTH columns (measured vs Morton in
    SCALING.md).

    NULLs bucket to 0; out-of-range values clamp to edge buckets; exactly
    two columns (the classic construction is 2-D; use ``zorder`` for d>2).

    Scale: shuffle-free per-row integer math — ``bits`` staged projections
    (each level's curve state is a named column, so the expression tree
    stays linear in ``bits``), one aggregate for range discovery. The only
    data movement is the range-repartition of the clustered write
    (``save_shards``)."""
    cols = [resolve_col(df, c) for c in as_list(columns)]
    if len(cols) != 2:
        raise ParameterException(
            "hilbert needs exactly two columns (the classic 2-D curve); "
            "use zorder for other dimensionalities"
        )
    if bits < 1 or bits > 16:
        raise ParameterException("bits must be in [1, 16]")
    if name in df.columns:
        raise ParameterException(f"output column {name!r} already exists")
    rng = dict(ranges) if ranges else zorder_ranges(df, cols)
    nb = 1 << bits
    for c in cols:
        if c not in rng:
            raise ParameterException(f"ranges is missing column {c!r}")
    bx = _bucket_expr(_as_double(df, cols[0]), float(rng[cols[0]][0]),
                      float(rng[cols[0]][1]), nb)
    by = _bucket_expr(_as_double(df, cols[1]), float(rng[cols[1]][0]),
                      float(rng[cols[1]][1]), nb)
    out = df.withColumns({
        "__gx0": bx.cast("bigint"),
        "__gy0": by.cast("bigint"),
        "__gd0": F.lit(0).cast("bigint"),
    })
    lvl = 0
    for i in range(bits - 1, -1, -1):
        e = _hilbert_level_exprs(1 << i, nb, f"__gx{lvl}", f"__gy{lvl}", f"__gd{lvl}")
        out = out.withColumns({
            f"__gd{lvl + 1}": F.expr(e["d"]),
            f"__gx{lvl + 1}": F.expr(e["x"]),
            f"__gy{lvl + 1}": F.expr(e["y"]),
        })
        lvl += 1
    out = out.withColumn(name, F.col(f"__gd{lvl}"))
    return out.drop(*[c for l in range(lvl + 1)
                      for c in (f"__gx{l}", f"__gy{l}", f"__gd{l}")])


@_renderer("hilbert")
def _r_hilbert(source, columns, bits=8, name="HVALUE", ranges=None,
               _input_columns=()) -> str:
    """Rendered via :func:`hilbert_sql` (dialect-neutral); requires explicit
    ``ranges`` — the zorder renderer convention."""
    from ..errors import TransformRenderingException

    cols = as_list(columns)
    if len(cols) != 2:
        raise ParameterException("hilbert needs exactly two columns")
    if bits < 1 or bits > 16:
        raise ParameterException("bits must be in [1, 16]")
    if ranges is None:
        raise TransformRenderingException(
            "rendered hilbert needs explicit ranges={col: (min, max)} "
            "(min/max discovery is a runtime aggregate)"
        )
    nb = 1 << bits

    def bucket(c: str) -> str:
        mn, mx = float(ranges[c][0]), float(ranges[c][1])
        span = mx - mn
        if span <= 0:
            return "CAST(0 AS BIGINT)"
        return (
            f"COALESCE(LEAST(CAST({nb - 1} AS BIGINT), "
            f"GREATEST(CAST(0 AS BIGINT), "
            f"FLOOR((CAST({c} AS DOUBLE) - {mn!r}) / {span!r} * "
            f"CAST({nb} AS DOUBLE)))), CAST(0 AS BIGINT))"
        )

    for c in cols:
        if c not in ranges:
            raise ParameterException(f"ranges is missing column {c!r}")
    return hilbert_sql(source, bucket(cols[0]), bucket(cols[1]), bits,
                       list(_input_columns), name)
