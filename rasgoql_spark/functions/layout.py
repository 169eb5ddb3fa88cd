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
