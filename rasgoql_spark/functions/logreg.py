"""Logistic-regression scoring — the trainable linear classifier of the
quality-filter family (public technique: full-batch gradient descent on the
log-loss; the model class behind CCNet/GPT-style "looks like the reference
corpus" quality filters when features are cheap numeric signals rather than
token counts — pair it with ``text_quality``'s ratio columns or
``nb_classify`` for token features).

Determinism contract (the kmeans_cluster pattern: bounded driver state +
staged rounding so both engines replay bit-for-bit):
- weights live on the DRIVER (k+1 doubles) and re-enter each pass as
  literals — data never leaves the executors;
- per row: z = round(w·x + b, 9) clamped to ±30, p = round(sigmoid(z), 7);
- per iteration: gradient components round to 7 dp after the mean; the
  weight update then rounds at 9 dp — deliberately FINER than the
  gradient: ``lr * g`` with a <=2-decimal ``lr`` and a 7-dp gradient is an
  exact multiple of 1e-9, so the 9-dp weight round never sits on a
  rounding boundary in ANY engine (rounding a 7-dp-scale product AT 7 dp
  would land exactly on half-boundaries every time lr=0.5 — Python
  banker's rounding vs SQL half-away then diverges, observed in testing);
- final score rounds to ``round_to``.
The staged rounding absorbs double-summation order differences (across
Spark partitionings AND across engines) and the 1-ulp exp() divergence
between libm implementations; the whole fixed-iteration fit then unrolls
to ANSI SQL (``logreg_oracle_sql``). ``lr`` is validated to 2 decimal
digits to keep the boundary-free-grid argument airtight.

100 TB design: each GD pass is ONE aggregation over the train rows (k+1
means with map-side partial combine — the corpus never shuffles); scoring
is a shuffle-free projection with literal weights. Iterations are bounded
and each moves k+1 doubles through the driver — the same budget as one
BPE merge step.
"""

from __future__ import annotations

from ._cache import release_now, scoped_persist
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import as_list, resolve_col, resolve_cols, spread
from ..registry import renderer, spark_transform

Z_ROUND = 9
P_ROUND = 7
GRAD_ROUND = 7
W_ROUND = 9  # must stay finer than GRAD_ROUND + decimals(lr); see module doc
Z_CLAMP = 30.0


def _z(weights: list[float], cols: list[str]) -> Column:
    z = F.lit(weights[0])
    for w, c in zip(weights[1:], cols):
        z = z + F.lit(w) * F.col(c).cast("double")
    return F.least(F.greatest(F.round(z, Z_ROUND), F.lit(-Z_CLAMP)), F.lit(Z_CLAMP))


def _p(weights: list[float], cols: list[str]) -> Column:
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights, cols))), P_ROUND)


@spark_transform("logreg_score", category="ml", streaming_ok=False)
def logreg_score(
    df: DataFrame,
    feature_cols,
    label_col: str,
    lr: float = 0.5,
    iterations: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Fit a logistic regression on ``feature_cols`` -> binary ``label_col``
    (values coerced with ``!= 0``) by ``iterations`` deterministic
    full-batch GD passes from zero weights, then append ``SCORE`` (the
    fitted probability, rounded) to every row.

    Features should be roughly unit-scale (pipe through ``robust_scaler``/
    ``standard_scaler`` first) — full-batch GD on wild scales moves
    nowhere in a few passes."""
    cols = resolve_cols(df, as_list(feature_cols))
    if not cols:
        raise ParameterException("feature_cols must be non-empty")
    if iterations < 0:
        raise ParameterException("iterations must be >= 0")
    if round(lr, 2) != lr or not 0 < lr <= 10:
        raise ParameterException("lr must have at most 2 decimal digits (cross-engine rounding grid)")
    lab = resolve_col(df, label_col)
    y = (F.col(lab).cast("double") != 0).cast("double")
    base = scoped_persist(spread(df.select(*[F.col(c) for c in cols], y.alias("__y"))))
    w = [0.0] * (len(cols) + 1)
    for _ in range(iterations):
        err = _p(w, cols) - F.col("__y")
        grad_row = base.agg(
            F.round(F.avg(err), GRAD_ROUND).alias("__g0"),
            *[
                F.round(F.avg(err * F.col(c).cast("double")), GRAD_ROUND).alias(f"__g{j + 1}")
                for j, c in enumerate(cols)
            ],
        ).collect()[0]
        if grad_row["__g0"] is None:
            break  # no train rows: avg() is NULL — keep zero weights
        w = [
            round(w[j] - lr * float(grad_row[f"__g{j}"]), W_ROUND)
            for j in range(len(w))
        ]
    release_now(base)
    # round the sigmoid ONCE at round_to — routing through the 7-dp training
    # rounding first would double-round onto exact half-boundaries (a 7-dp
    # value ends in 5 for ~1 row in 10) where engines disagree
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, cols))), round_to)
    return df.withColumn("SCORE", score)


def logreg_oracle_sql(
    source_sql: str,
    feature_exprs: list[str],
    label_expr: str,
    lr: float = 0.5,
    iterations: int = 3,
    round_to: int = 6,
    select_cols: str = "*",
) -> str:
    """Unrolled DuckDB replay of :func:`logreg_score`: same staged rounding,
    weights threaded through one-row CTEs. ``feature_exprs``/``label_expr``
    are SQL over ``source_sql``'s columns; yields ``{select_cols}, SCORE``."""
    k = len(feature_exprs)

    def z(prefix: str) -> str:
        terms = " + ".join(
            f"{prefix}.w{j + 1} * CAST({e} AS DOUBLE)" for j, e in enumerate(feature_exprs)
        )
        return (
            f"least(greatest(round({prefix}.w0 + {terms}, {Z_ROUND}), "
            f"-{Z_CLAMP}), {Z_CLAMP})"
        )

    def p(prefix: str) -> str:
        return f"round(1.0 / (1.0 + exp(-({z(prefix)}))), {P_ROUND})"

    ws = ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k + 1))
    parts = [
        f"WITH src AS (SELECT *, CAST(CAST({label_expr} AS DOUBLE) != 0 AS DOUBLE) "
        f"AS __y FROM ({source_sql}) s)",
        f"w0_ AS (SELECT {ws})",
    ]
    for i in range(iterations):
        prev, nxt = f"w{i}_", f"w{i + 1}_"
        gsel = ", ".join(
            [f"round(avg({p(prev)} - src.__y), {GRAD_ROUND}) AS g0"]
            + [
                f"round(avg(({p(prev)} - src.__y) * CAST({e} AS DOUBLE)), {GRAD_ROUND}) AS g{j + 1}"
                for j, e in enumerate(feature_exprs)
            ]
        )
        wsel = ", ".join(
            f"round({prev}.w{j} - {lr} * g.g{j}, {W_ROUND}) AS w{j}" for j in range(k + 1)
        )
        parts.append(f"g{i} AS (SELECT {gsel} FROM src CROSS JOIN {prev} {prev})")
        parts.append(f"{nxt} AS (SELECT {wsel} FROM g{i} g CROSS JOIN {prev} {prev})")
    fin = f"w{iterations}_"
    return (
        ", ".join(parts)
        + f" SELECT {select_cols}, "
        f"round(1.0 / (1.0 + exp(-({z(fin)}))), {round_to}) AS SCORE "
        f"FROM src CROSS JOIN {fin} {fin}"
    )

LOGREG_RENDER_MAX_ITER = 6


@renderer("logreg_score")
def _r_logreg_score(
    source, feature_cols, label_col, lr=0.5, iterations=3, round_to=6
) -> str:
    """Unrolled GD replay in Spark SQL (:func:`logreg_oracle_sql` in Spark
    dialect): the staged-rounding contract makes every weight update
    engine-independent, so the rendered text reproduces the executed SCORE
    exactly. The executed loop breaks when the INTERCEPT gradient is NULL
    (empty train set) and keeps the current weights; the render replays
    that exact condition — CASE WHEN g0 IS NULL THEN previous weights.
    (A single all-NULL feature column with non-empty input crashes the
    executed fit on float(None); the render is undefined there too — the
    NULL gradient propagates to NULL weights and NULL scores.) Each
    unrolled level references its predecessor weight row twice
    (gradient + update), so rendering is capped at
    ``LOGREG_RENDER_MAX_ITER`` iterations."""
    from ..errors import TransformRenderingException

    cols = as_list(feature_cols)
    if not cols:
        raise ParameterException("feature_cols must be non-empty")
    if iterations < 0:
        raise ParameterException("iterations must be >= 0")
    if round(lr, 2) != lr or not 0 < lr <= 10:
        raise ParameterException(
            "lr must have at most 2 decimal digits (cross-engine rounding grid)"
        )
    if iterations > LOGREG_RENDER_MAX_ITER:
        raise TransformRenderingException(
            "logreg_score renders unrolled GD passes; iterations > "
            f"{LOGREG_RENDER_MAX_ITER} produces an impractically large plan "
            "(each level references the previous weights twice)"
        )
    k = len(cols)
    lrs = f"CAST({float(lr)!r} AS DOUBLE)"

    def z(prefix: str, qual: str = "") -> str:
        terms = " + ".join(
            f"{prefix}.w{j + 1} * CAST({qual}{c} AS DOUBLE)"
            for j, c in enumerate(cols)
        )
        return (
            f"least(greatest(round({prefix}.w0 + {terms}, {Z_ROUND}), "
            f"CAST(-{Z_CLAMP!r} AS DOUBLE)), CAST({Z_CLAMP!r} AS DOUBLE))"
        )

    def p(prefix: str) -> str:
        return (
            f"round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + "
            f"exp(-({z(prefix)}))), {P_ROUND})"
        )

    ws = ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k + 1))
    parts = [
        f"__lr_src AS (SELECT *, CAST(CAST({label_col} AS DOUBLE) != 0 "
        f"AS DOUBLE) AS __y FROM {source})",
        f"__lr_w0 AS (SELECT {ws})",
    ]
    for i in range(int(iterations)):
        prev, nxt = f"__lr_w{i}", f"__lr_w{i + 1}"
        gsel = ", ".join(
            [f"round(avg({p(prev)} - __lr_src.__y), {GRAD_ROUND}) AS g0"]
            + [
                f"round(avg(({p(prev)} - __lr_src.__y) * "
                f"CAST({c} AS DOUBLE)), {GRAD_ROUND}) AS g{j + 1}"
                for j, c in enumerate(cols)
            ]
        )
        wsel = ", ".join(
            f"CASE WHEN g.g0 IS NULL THEN {prev}.w{j} ELSE "
            f"round({prev}.w{j} - {lrs} * g.g{j}, {W_ROUND}) END AS w{j}"
            for j in range(k + 1)
        )
        parts.append(
            f"__lr_g{i} AS (SELECT {gsel} FROM __lr_src CROSS JOIN {prev} {prev})"
        )
        parts.append(
            f"{nxt} AS (SELECT {wsel} FROM __lr_g{i} g CROSS JOIN {prev} {prev})"
        )
    fin = f"__lr_w{int(iterations)}"
    return (
        "SELECT * FROM (WITH " + ", ".join(parts)
        + f" SELECT s.*, round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + "
        f"exp(-({z(fin, 's.')}))), {int(round_to)}) AS SCORE "
        f"FROM {source} s CROSS JOIN {fin} {fin}) __lr_out"
    )
