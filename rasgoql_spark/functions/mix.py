"""Training-data mixture composition (north-star extension).

LLM training sets are weighted mixtures of sources (web / code / books /
synthetic...). ``mix_datasets`` unions sources sampled so the OUTPUT
proportions match target weights, maximizing volume subject to availability:
scale = min_i(n_i / w_i), target_i = w_i · scale. Per-source counts are one
cheap aggregate each (bounded by the number of sources, never by rows);
sampling is deterministic-by-key (reproducible across engines and runs) or
seeded Bernoulli. No shuffle — sampling and union are narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import as_list, resolve_col
from ..registry import renderer, spark_transform


@spark_transform("mix_datasets", category="ml", streaming_ok=False)
def mix_datasets(
    df: DataFrame,
    others,
    weights,
    key: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Weighted mixture of this dataset + ``others`` (same schema). Output
    proportions follow ``weights`` (normalized); the mixture is as large as
    the scarcest source allows. Appends ``MIX_SOURCE`` (0 = this dataset).
    With ``key``: deterministic hash-modulo sampling on a key column of any
    type (``xxhash64(key, seed)`` into a 10000-slot grid — same rows survive
    on every run regardless of partitioning).
    """
    sources = [df] + [o.df if hasattr(o, "df") else o for o in as_list(others)]
    weights = [float(w) for w in as_list(weights)]
    if len(weights) != len(sources):
        raise ParameterException(
            f"need one weight per source: {len(sources)} sources, "
            f"{len(weights)} weights"
        )
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ParameterException("weights must be non-negative with a positive sum")
    tot = sum(weights)
    ws = [w / tot for w in weights]
    ns = [s.count() for s in sources]
    scale = min(n / w for n, w in zip(ns, ws) if w > 0)
    out = None
    for idx, (s, n, w) in enumerate(zip(sources, ns, ws)):
        frac = 0.0 if n == 0 or w == 0 else min(1.0, (w * scale) / n)
        if key is not None:
            kc = resolve_col(s, key)
            # Hash the key into a 10000-slot grid: uniform regardless of the
            # key's range or type (raw pmod silently returned ZERO rows for
            # string keys and assumed ids uniform mod the grid size), and
            # fine enough that sub-percent weights don't quantize to whole
            # percent. xxhash64 is seed-stable → deterministic across runs.
            slot = F.pmod(F.xxhash64(F.col(kc), F.lit(seed)), F.lit(10_000))
            part = s.filter(slot < F.lit(round(frac * 10_000)))
        else:
            part = s.sample(fraction=frac, seed=seed + idx)
        part = part.withColumn("MIX_SOURCE", F.lit(idx))
        out = part if out is None else out.unionByName(part)
    return out


@spark_transform("sample_to_token_budget", category="ml", streaming_ok=False)
def sample_to_token_budget(
    df: DataFrame,
    token_count_col: str,
    budget: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic token-budget corpus sampling: keep documents, in
    md5-priority order, until the running token total reaches ``budget``
    (training sets are sized in tokens, not rows — "give me 1B tokens of
    this corpus" is the standard ask). A row is kept iff the EXCLUSIVE
    prefix sum of ``token_count_col`` over ``(priority, id)`` order is
    < ``budget``, so the kept set is the minimal priority-prefix whose
    total is >= budget (or the whole corpus when it is smaller). The
    priority ``md5(id || ':' || seed)`` is engine- and partitioning-
    independent: the same documents survive on every run and every engine.

    Scale path: the naive form is a GLOBAL ordered window (single task).
    Instead the 32-bit priority space is range-bucketed by its top 10 bits;
    one bounded aggregate (<=1024 rows to the driver) finds each bucket's
    exclusive token offset. Buckets wholly under budget are kept with a
    filter (no shuffle, no sort); buckets past it are dropped the same way;
    exactly ONE straddling bucket remains, which is re-bucketed by the next
    10 bits and only its final sub-straddle (~N/2^20 rows) pays an ordered
    window. At 100 TB that is ~100 MB of windowed data and two <=1024-row
    driver collects.
    """
    from pyspark.sql import Window

    from ._hash import md5_int

    tc = resolve_col(df, token_count_col)
    i = resolve_col(df, id_col)
    budget = int(budget)
    if budget <= 0:
        return df.filter(F.lit(False))
    pr = md5_int(F.concat_ws(":", F.col(i).cast("string"), F.lit(str(seed))))
    tagged = df.withColumn("__pr", pr)

    def _keep(scope: DataFrame, offset: int, shifts: list[int]) -> DataFrame:
        if not shifts:
            w = (
                Window.partitionBy()
                .orderBy(F.col("__pr"), F.col(i))
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            pfx = F.coalesce(F.sum(F.col(tc)).over(w), F.lit(0)) + F.lit(offset)
            return (
                scope.withColumn("__pfx", pfx)
                .filter(F.col("__pfx") < F.lit(budget))
                .drop("__pfx")
            )
        s = shifts[0]
        b = F.shiftright(F.col("__pr"), s)
        stats = (
            scope.groupBy(b.alias("__tb"))
            .agg(F.sum(F.col(tc)).alias("__s"))
            .collect()
        )
        acc = offset
        straddle = None
        straddle_off = 0
        for r in sorted(stats, key=lambda r: r["__tb"]):
            tot = int(r["__s"] or 0)
            if acc + tot >= budget:
                straddle, straddle_off = r["__tb"], acc
                break
            acc += tot
        if straddle is None:  # whole scope fits under budget
            return scope
        kept = scope.filter(b < F.lit(straddle))
        part = _keep(
            scope.filter(b == F.lit(straddle)), straddle_off, shifts[1:]
        )
        return kept.unionByName(part)

    out = _keep(tagged, 0, [22, 12]).drop("__pr")
    return out


@renderer("sample_to_token_budget")
def _r_sample_to_token_budget(
    source,
    token_count_col,
    budget,
    id_col,
    seed=42,
    _input_columns=(),
) -> str:
    pr = (
        f"CAST(conv(substr(md5(concat_ws(':', CAST({id_col} AS STRING), "
        f"'{int(seed)}')), 1, 8), 16, 10) AS BIGINT)"
    )
    cols = ", ".join(_input_columns) if _input_columns else "*"
    return (
        f"SELECT {cols} FROM (SELECT *, COALESCE(SUM({token_count_col}) OVER "
        f"(ORDER BY {pr}, {id_col} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING), 0) AS __pfx FROM {source}) WHERE __pfx < {int(budget)}"
    )
