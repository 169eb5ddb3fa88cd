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


# --- Hilbert curve (n-D, Skilling transpose) -----------------------------

def _xor_sql(a: str, b: str) -> str:
    """Dialect-neutral bitwise XOR on non-negative bigints:
    a ^ b == a + b - 2*(a & b) (Spark's ``^`` is XOR but DuckDB's is
    exponentiation, so the operator itself is NOT portable)."""
    return f"({a} + {b} - 2 * ({a} & {b}))"


def _hilbert_nd_stages(n: int, bits: int):
    """Skilling's AxestoTranspose (J. Skilling, "Programming the Hilbert
    curve", AIP Conf. Proc. 707, 2004 — public algorithm) as a staged
    dialect-neutral SQL program: only ``&``, ``>>``, ``bit_count``, CASE,
    and integer arithmetic, which Spark SQL and DuckDB evaluate
    identically. Returns ``(stages, dexpr)`` — ``stages`` is an ordered
    list of {new_column: sql_expr} projections (each may reference columns
    named by earlier stages; inputs are ``__hx0..__hx{n-1}`` bigint
    buckets in [0, 2**bits)), and ``dexpr`` computes the final key by
    interleaving the transposed coordinates dimension-major (bit ``b-1``
    of X[0] is the key's MSB).

    Per Q level the inverse-undo touches X[0] and X[i] only, so each
    (Q, i) pair is one small projection; the Gray encode is n-1 chained
    XOR stages; the final undo mask t collapses to ONE stage via the
    parity identity bit_j(t) = parity(popcount(X[n-1] >> (j+1))).
    Stage count is (bits-1)*n + (n-1) + 2 — linear, never nested
    expression blowup."""
    cur = [f"__hx{i}" for i in range(n)]
    stages: list[dict] = []
    for q in range(bits - 1, 0, -1):
        Q, P = 1 << q, (1 << q) - 1
        for i in range(n):
            x0, xi = cur[0], cur[i]
            if i == 0:
                new0 = f"__ha{q}_0"
                stages.append({new0: (
                    f"CASE WHEN ({x0} & {Q}) > 0 "
                    f"THEN {_xor_sql(x0, str(P))} ELSE {x0} END"
                )})
                cur[0] = new0
            else:
                t = f"({_xor_sql(x0, xi)} & {P})"
                new0, newi = f"__ha{q}_{i}", f"__hb{q}_{i}"
                stages.append({
                    new0: (
                        f"CASE WHEN ({xi} & {Q}) > 0 "
                        f"THEN {_xor_sql(x0, str(P))} "
                        f"ELSE {_xor_sql(x0, t)} END"
                    ),
                    newi: (
                        f"CASE WHEN ({xi} & {Q}) > 0 THEN {xi} "
                        f"ELSE {_xor_sql(xi, t)} END"
                    ),
                })
                cur[0], cur[i] = new0, newi
    for i in range(1, n):
        newi = f"__hg{i}"
        stages.append({newi: _xor_sql(cur[i], cur[i - 1])})
        cur[i] = newi
    tmask = " + ".join(
        f"(bit_count({cur[n - 1]} >> {j + 1}) & 1) * CAST({1 << j} AS BIGINT)"
        for j in range(bits - 1)
    ) or "CAST(0 AS BIGINT)"
    stages.append({"__hm": f"({tmask})"})
    stages.append({
        f"__hf{i}": _xor_sql(cur[i], "__hm") for i in range(n)
    })
    terms = []
    for i in range(n):
        for j in range(bits):
            w = 1 << (j * n + (n - 1 - i))
            terms.append(f"((__hf{i} >> {j}) & 1) * CAST({w} AS BIGINT)")
    return stages, "CAST(" + " + ".join(terms) + " AS BIGINT)"


def hilbert_nd_sql(
    source: str,
    bucket_exprs,
    bits: int,
    out_cols,
    name: str = "HVALUE",
) -> str:
    """Full dialect-neutral (Spark SQL == DuckDB) rendering of the n-D
    Hilbert key (n >= 2, Skilling transpose): one nested subquery per
    program stage so every intermediate is named once — the same staging
    discipline as the 2-D :func:`hilbert_sql`. ``bucket_exprs`` are SQL
    expressions yielding bigint buckets in [0, 2**bits)."""
    n = len(bucket_exprs)
    sql = (
        "(SELECT *, "
        + ", ".join(f"CAST({be} AS BIGINT) AS __hx{i}"
                    for i, be in enumerate(bucket_exprs))
        + f" FROM {source})"
    )
    stages, dexpr = _hilbert_nd_stages(n, bits)
    for st in stages:
        sel = ", ".join(f"{e} AS {c}" for c, e in st.items())
        sql = f"(SELECT *, {sel} FROM {sql})"
    cols = ", ".join(out_cols)
    return f"SELECT {cols}, {dexpr} AS {name} FROM {sql}"


@spark_transform("hilbert", category="layout", streaming_ok=False)
def hilbert(
    df: DataFrame,
    columns,
    bits: int = 8,
    name: str = "HVALUE",
    ranges: dict | None = None,
) -> DataFrame:
    """Append ``name`` (bigint): the Hilbert-curve key over two OR MORE
    clustering columns. Same contract as ``zorder`` — range-bucket each
    column into ``2**bits`` buckets between observed or explicit
    ``ranges``, then map the bucket tuple to the curve position — but
    with strictly better locality than Morton interleave: the Hilbert
    curve never jumps, so consecutive key ranges are contiguous blocks
    and parquet min/max pruning tightens on EVERY column (measured vs
    Morton in SCALING.md).

    Two columns use the classic unrolled xy2d walk (Hilbert 1891 — kept
    bit-for-bit stable for the existing baseline/oracle series); three or
    more use Skilling's transpose construction (AIP Conf. Proc. 707,
    2004), whose unit-step adjacency and bijectivity are property-pinned
    against a pure-Python reference. The two constructions are different
    (valid) curve orientations, so 2-D keys are NOT comparable with a
    3-D projection's first two dims.

    NULLs bucket to 0; out-of-range values clamp to edge buckets;
    ``len(columns) * bits`` must fit the 62-bit signed key (the zorder
    limit).

    Scale: shuffle-free per-row integer math — O(bits x dims) staged
    projections (each stage's curve state is a named column, so the
    expression tree stays linear), one aggregate for range discovery. The
    only data movement is the range-repartition of the clustered write
    (``save_shards``)."""
    cols = [resolve_col(df, c) for c in as_list(columns)]
    if len(cols) < 2:
        raise ParameterException(
            "hilbert needs at least two columns (one dimension has no "
            "curve; use a plain sort)"
        )
    if bits < 1 or bits > 16:
        raise ParameterException("bits must be in [1, 16]")
    if len(cols) * bits > MAX_Z_BITS:
        raise ParameterException(
            f"{len(cols)} columns x {bits} bits = {len(cols) * bits} "
            f"exceeds the {MAX_Z_BITS}-bit key"
        )
    if name in df.columns:
        raise ParameterException(f"output column {name!r} already exists")
    rng = dict(ranges) if ranges else zorder_ranges(df, cols)
    nb = 1 << bits
    for c in cols:
        if c not in rng:
            raise ParameterException(f"ranges is missing column {c!r}")
    buckets = [
        _bucket_expr(_as_double(df, c), float(rng[c][0]), float(rng[c][1]), nb)
        for c in cols
    ]
    if len(cols) == 2:
        out = df.withColumns({
            "__gx0": buckets[0].cast("bigint"),
            "__gy0": buckets[1].cast("bigint"),
            "__gd0": F.lit(0).cast("bigint"),
        })
        lvl = 0
        for i in range(bits - 1, -1, -1):
            e = _hilbert_level_exprs(1 << i, nb, f"__gx{lvl}", f"__gy{lvl}",
                                     f"__gd{lvl}")
            out = out.withColumns({
                f"__gd{lvl + 1}": F.expr(e["d"]),
                f"__gx{lvl + 1}": F.expr(e["x"]),
                f"__gy{lvl + 1}": F.expr(e["y"]),
            })
            lvl += 1
        out = out.withColumn(name, F.col(f"__gd{lvl}"))
        return out.drop(*[c for l in range(lvl + 1)
                          for c in (f"__gx{l}", f"__gy{l}", f"__gd{l}")])
    # n >= 3: Skilling transpose, same staged-projection discipline
    n = len(cols)
    out = df.withColumns({
        f"__hx{i}": b.cast("bigint") for i, b in enumerate(buckets)
    })
    stages, dexpr = _hilbert_nd_stages(n, bits)
    temp = [f"__hx{i}" for i in range(n)]
    for st in stages:
        out = out.withColumns({c: F.expr(e) for c, e in st.items()})
        temp.extend(st.keys())
    out = out.withColumn(name, F.expr(dexpr))
    return out.drop(*temp)


@_renderer("hilbert")
def _r_hilbert(source, columns, bits=8, name="HVALUE", ranges=None,
               _input_columns=()) -> str:
    """Rendered via :func:`hilbert_sql` (2-D) or :func:`hilbert_nd_sql`
    (n >= 3) — both dialect-neutral; requires explicit ``ranges`` — the
    zorder renderer convention."""
    from ..errors import TransformRenderingException

    cols = as_list(columns)
    if len(cols) < 2:
        raise ParameterException("hilbert needs at least two columns")
    if bits < 1 or bits > 16:
        raise ParameterException("bits must be in [1, 16]")
    if len(cols) * bits > MAX_Z_BITS:
        raise ParameterException(
            f"{len(cols)} columns x {bits} bits = {len(cols) * bits} "
            f"exceeds the {MAX_Z_BITS}-bit key"
        )
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
    if len(cols) == 2:
        return hilbert_sql(source, bucket(cols[0]), bucket(cols[1]), bits,
                           list(_input_columns), name)
    return hilbert_nd_sql(source, [bucket(c) for c in cols], bits,
                          list(_input_columns), name)
