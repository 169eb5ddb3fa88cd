"""Deterministic random projection (public technique: Johnson-Lindenstrauss
1984; Achlioptas 2003 database-friendly Rademacher variant).

Embedding pipelines at 100 TB shrink vectors before the expensive stages —
LSH banding, clustering, brute-force rerank all scale with dimension, and a
+-1 sign projection preserves pairwise distances within (1 +- eps) at
k = O(log n / eps^2) output dims. The sign matrix here is pseudo-random but
DETERMINISTIC (md5 of ``seed:row:col`` parity), generated driver-side as a
k x d literal matrix — a few KB — so the projection itself is a shuffle-free
JVM fold over each row (no Python on data, no join), and the DuckDB oracle
replays the identical literals.

No counterpart in the reference repo; cites the public technique only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import resolve_col
from ..registry import spark_transform
from ._litfast import double_array_lit

MAX_LITERAL_CELLS = 65536  # out_dim * in_dim ceiling for the literal matrix


def projection_signs(seed: int, out_dim: int, in_dim: int) -> list[list[int]]:
    """The deterministic Rademacher matrix: ``signs[j][i]`` is +1 when the
    first hex digit of md5('{seed}:{j}:{i}') is even, else -1. Stable across
    platforms and engines (pure md5)."""
    return [
        [
            1 if int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


@spark_transform("random_projection", category="similarity")
def random_projection(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    in_dim: int | None = None,
    seed: int = 0,
    round_to: int = 6,
) -> DataFrame:
    """Append ``PROJ`` (array<double>, length ``out_dim``): the sign
    projection ``PROJ[j] = round(sum_i vec[i] * signs[j][i] / sqrt(out_dim),
    round_to)``.

    ``in_dim`` defaults to the length of the first vector (one bounded
    driver peek); pass it explicitly on streaming frames. Rows whose vector
    length differs from ``in_dim`` get NULL (malformed embeddings surface
    instead of silently truncating)."""
    if out_dim < 1:
        raise ParameterException("out_dim must be >= 1")
    v = resolve_col(df, vec_col)
    if in_dim is None:
        if df.isStreaming:
            raise ParameterException("in_dim is required on streaming frames")
        first = df.select(F.size(F.col(v)).alias("n")).filter("n > 0").first()
        if first is None:
            raise ParameterException(f"cannot infer in_dim: no non-empty {v}")
        in_dim = int(first["n"])
    if out_dim * in_dim > MAX_LITERAL_CELLS:
        raise ParameterException(
            f"out_dim*in_dim = {out_dim * in_dim} exceeds the literal-matrix "
            f"ceiling {MAX_LITERAL_CELLS}; project in two stages"
        )
    signs = projection_signs(seed, out_dim, in_dim)
    inv = 1.0 / (out_dim ** 0.5)
    comps = [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col(v),
                    double_array_lit(list(signs[j])),
                    lambda x, sgn: x.cast("double") * sgn,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * inv,
            round_to,
        )
        for j in range(out_dim)
    ]
    proj = F.when(F.size(F.col(v)) == in_dim, F.array(*comps))
    return df.withColumn("PROJ", proj)


def random_projection_oracle_sql(
    source_sql: str,
    vec_expr: str,
    seed: int,
    out_dim: int,
    in_dim: int,
    round_to: int = 6,
    extra_cols: str = "",
) -> str:
    """DuckDB replay with the identical literal sign matrix: yields
    ``{extra_cols}, POS, PROJ_VAL`` — the projection exploded to
    (position, value) rows for canonical hashing."""
    signs = projection_signs(seed, out_dim, in_dim)
    inv = 1.0 / (out_dim ** 0.5)
    comps = ", ".join(
        "round(("
        + " + ".join(
            f"{'' if s > 0 else '-'}CAST({vec_expr}[{i + 1}] AS DOUBLE)"
            for i, s in enumerate(signs[j])
        )
        + f") * {inv!r}, {round_to})"
        for j in range(out_dim)
    )
    pre = f"{extra_cols}, " if extra_cols else ""
    return (
        f"SELECT {pre}CAST(generate_subscripts(p, 1) - 1 AS INT) AS POS, "
        f"unnest(p) AS PROJ_VAL FROM "
        f"(SELECT {pre}[{comps}] AS p FROM ({source_sql}) s WHERE len({vec_expr}) = {in_dim})"
    )


from ..registry import renderer as _renderer  # noqa: E402


@_renderer("random_projection")
def _r_random_projection(source, vec_col, out_dim, in_dim=None, seed=0, round_to=6) -> str:
    from ..errors import TransformRenderingException

    if in_dim is None:
        raise TransformRenderingException(
            "rendered random_projection needs explicit in_dim (discovery is "
            "a runtime sample)"
        )
    signs = projection_signs(seed, out_dim, in_dim)
    inv = 1.0 / (out_dim ** 0.5)
    comps = ", ".join(
        "round(("
        + " + ".join(
            f"{'' if s > 0 else '-'}CAST({vec_col}[{i}] AS DOUBLE)"
            for i, s in enumerate(signs[j])
        )
        + f") * {inv!r}, {round_to})"
        for j in range(out_dim)
    )
    return (
        f"SELECT *, CASE WHEN size({vec_col}) = {in_dim} "
        f"THEN array({comps}) END AS PROJ FROM {source}"
    )
