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
    from ._cache import release_with, scoped_persist

    tot = sum(weights)
    ws = [w / tot for w in weights]
    # persist each source across its two consumers (round 13): the count
    # below and the sampled union branch otherwise EACH re-execute the
    # source's full upstream lineage — for a source at the end of a
    # curation chain (the pipeline_e2e shape) that doubles every operator
    # before the mix. The count doubles as the cache materialization;
    # caches release when the mixture frame is dropped.
    sources = [scoped_persist(s) for s in sources]
    # ONE availability-count action for every source (round 13): counting
    # each persisted source separately paid one full AQE job cascade per
    # source; a lit-tagged union aggregates all counts in a single job
    # (which also materializes every cache), and exchange reuse dedupes
    # identical upstream subtrees shared by sources derived from one
    # chain (the pipeline_e2e en/rest shape). Counts are exact integers —
    # identical to the per-source count() values.
    from functools import reduce

    counted = (
        reduce(
            lambda a, b: a.unionByName(b),
            [s.select(F.lit(ix).alias("__mx_i")) for ix, s in enumerate(sources)],
        )
        .groupBy("__mx_i").agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    got = {int(r["__mx_i"]): int(r["__n"]) for r in counted}
    ns = [got.get(ix, 0) for ix in range(len(sources))]
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
    return release_with(out, *sources)


@renderer("mix_datasets")
def _r_mix_datasets(source, others, weights, key=None, seed=42,
                    _input_columns=None) -> str:
    """Render-time replay of the mixture arithmetic: the normalized weights
    are Python-computed literals (they depend only on kwargs), per-source
    counts and the availability scale are in-flight scalar subqueries, and
    the slot threshold uses ``rint`` — IEEE roundTiesToEven, the exact
    semantics of the Python ``round()`` the executed path applies to
    ``frac * 10000``. Branches project the ENTRY source's explicit column
    list (the executed path unions by NAME, so a same-schema source with a
    different column order must not misalign under positional UNION ALL).
    Renders the deterministic key mode only: the seeded Bernoulli mode
    (``key=None``) samples with Spark's partition-dependent RNG, which no
    SQL text reproduces."""
    from ..errors import TransformRenderingException

    if key is None:
        raise TransformRenderingException(
            "mix_datasets renders only the deterministic key mode; "
            "key=None samples with Spark's partition-dependent RNG"
        )
    names = [source]
    for o in as_list(others):
        rn = getattr(o, "renderable_name", None)
        if rn is None:
            raise TransformRenderingException(
                "mix_datasets renders when every source is a Dataset/SQLChain "
                "(raw DataFrames have no SQL name)"
            )
        names.append(rn())
    weights = [float(w) for w in as_list(weights)]
    if len(weights) != len(names):
        raise ParameterException(
            f"need one weight per source: {len(names)} sources, "
            f"{len(weights)} weights"
        )
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ParameterException("weights must be non-negative with a positive sum")
    tot = sum(weights)
    ws = [w / tot for w in weights]
    cols = (
        ", ".join(f"s.{c}" for c in _input_columns) if _input_columns else "s.*"
    )
    ctes = [
        f"__mx_c{i} AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM {nm})"
        for i, nm in enumerate(names)
    ]
    ratio_terms = [
        f"(SELECT n FROM __mx_c{i}) / CAST({w!r} AS DOUBLE)"
        for i, w in enumerate(ws) if w > 0
    ]
    scale_expr = (
        f"LEAST({', '.join(ratio_terms)})" if len(ratio_terms) > 1
        else ratio_terms[0]
    )
    scale = f"__mx_s AS (SELECT {scale_expr} AS scale)"
    branches = []
    for i, (nm, w) in enumerate(zip(names, ws)):
        if w == 0:
            cond = "FALSE"
        else:
            frac = (
                f"CASE WHEN c.n = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
                f"LEAST(CAST(1.0 AS DOUBLE), (CAST({w!r} AS DOUBLE) * x.scale) "
                f"/ c.n) END"
            )
            cond = f"pmod(xxhash64(s.{key}, {int(seed)}), 10000) < rint({frac} * 10000)"
        branches.append(
            f"SELECT {cols}, {i} AS MIX_SOURCE FROM {nm} s "
            f"CROSS JOIN __mx_s x CROSS JOIN __mx_c{i} c WHERE {cond}"
        )
    return (
        "SELECT * FROM (WITH " + ", ".join(ctes + [scale]) + " "
        + " UNION ALL ".join(f"({b})" for b in branches)
        + ") __mx_out"
    )


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


@spark_transform("mixture_weights", category="ml", streaming_ok=False)
def mixture_weights(
    df: DataFrame,
    domain: str,
    temperature: float = 0.7,
    size_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled sampling weights per domain — the public
    alpha-sampling scheme of multilingual/multi-source LM training
    (w_i ∝ p_i^T, T<1 up-weights the tail; T=1 is proportional, T=0
    uniform). ``size_col`` weighs domains by a size column (e.g. token
    counts) instead of row counts. Output one row per domain:
    ``N_ITEMS`` (bigint), ``P`` (natural share), ``WEIGHT`` (normalized
    p^T), ``BOOST`` (weight/p — how much the scheme up/down-samples the
    domain).

    Scale: one hash aggregation on the domain key, then a one-row total
    broadcast onto the (domain-cardinality-bounded) result — the corpus
    itself never reshuffles.
    """
    d = resolve_col(df, domain)
    size = (
        F.count(F.lit(1)).cast("double")
        if size_col is None
        else F.sum(F.col(resolve_col(df, size_col))).cast("double")
    )
    per = df.groupBy(F.col(d)).agg(
        F.count(F.lit(1)).cast("bigint").alias("N_ITEMS"), size.alias("__sz")
    )
    tot = per.agg(F.sum("__sz").alias("__tot"))
    p = F.col("__sz") / F.col("__tot")
    raw = F.pow(p, F.lit(float(temperature)))
    withp = per.crossJoin(F.broadcast(tot)).withColumn("__p", p).withColumn("__raw", raw)
    wtot = withp.agg(F.sum("__raw").alias("__wtot"))
    out = (
        withp.crossJoin(F.broadcast(wtot))
        .withColumn("P", F.round("__p", round_to))
        .withColumn("WEIGHT", F.round(F.col("__raw") / F.col("__wtot"), round_to))
        .withColumn(
            "BOOST",
            F.round((F.col("__raw") / F.col("__wtot")) / F.col("__p"), round_to),
        )
    )
    return out.select(d, "N_ITEMS", "P", "WEIGHT", "BOOST")


@renderer("mixture_weights")
def _r_mixture_weights(source, domain, temperature=0.7, size_col=None, round_to=6) -> str:
    t = repr(float(temperature))
    sz = "CAST(count(1) AS DOUBLE)" if size_col is None else f"CAST(sum({size_col}) AS DOUBLE)"
    per = (
        f"SELECT {domain}, CAST(count(1) AS BIGINT) AS N_ITEMS, {sz} AS __sz "
        f"FROM {source} GROUP BY {domain}"
    )
    return (
        f"SELECT {domain}, N_ITEMS, ROUND(__p, {round_to}) AS P, "
        f"ROUND(__raw / sum(__raw) OVER (), {round_to}) AS WEIGHT, "
        f"ROUND((__raw / sum(__raw) OVER ()) / __p, {round_to}) AS BOOST FROM "
        f"(SELECT *, __sz / sum(__sz) OVER () AS __p, "
        f"pow(__sz / sum(__sz) OVER (), {t}) AS __raw FROM ({per}))"
    )


@spark_transform("importance_sample", category="ml", streaming_ok=False)
def importance_sample(
    df: DataFrame,
    weight: str,
    id_col: str,
    n: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of exactly ``n``
    rows, inclusion probability proportional to ``weight`` (public
    technique: Efraimidis & Spirakis 2006 weighted reservoir, A-ES
    variant): each row draws priority ``ln(u) / w`` with a DETERMINISTIC
    pseudo-uniform ``u = (md5_int(seed:id) + 1) / 2^32`` and the ``n``
    highest priorities win — the quality-weighted corpus sampling step
    (sample a training subset ∝ quality score). Same (seed, id, weight) ⇒
    same sample, across runs AND engines; change ``seed`` to redraw.

    Rows with NULL, NaN or non-positive weight have zero inclusion
    probability and are excluded (the standard convention; the explicit
    NaN guard matters because Spark orders NaN above every number, so an
    unguarded NaN-weight row would always win the sample). Output keeps
    the original columns.

    Scale: priority is a row-local codegen'd expression (md5 + ln) and the
    top-n plans as ``TakeOrderedAndProject`` (per-partition heaps, no
    global sort) — the ``top`` operator's shape. No shuffle beyond the
    final n-row gather. The priority is rounded to 9 dp before ranking
    (the repo-wide cross-engine contract: last-ulp libm differences
    between JVM ``Math.log`` and other engines' ``ln`` could otherwise
    flip membership at the rank-n boundary); ties break on id.
    """
    from ._hash import md5_int

    if n < 1:
        raise ParameterException("n must be >= 1")
    w, i = resolve_col(df, weight), resolve_col(df, id_col)
    wd = F.col(w).cast("double")
    u = (md5_int(F.concat(F.lit(f"{seed}:"), F.col(i).cast("string"))) + 1) / F.lit(
        4294967296.0
    )
    pri = F.round(F.log(u) / wd, 9)
    return (
        df.filter(wd.isNotNull() & ~F.isnan(wd) & (wd > 0))
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(i).asc())
        .limit(n)
        .drop("__pri")
    )


@renderer("importance_sample")
def _r_importance_sample(source, weight, id_col, n, seed="") -> str:
    # Spark dialect (the .sql() artifact target); the DuckDB oracle renders
    # the same md5-derived uniform with its own hex-cast idiom. The seed
    # lands inside a string literal: quote doubling is dialect-portable and
    # no raw backslash ever enters the literal (chr(92) splice) — the same
    # treatment as the pseudonymize salt.
    segs = [p.replace("'", "''") for p in str(seed).split("\\")]
    if len(segs) == 1:
        seed_lit = f"'{segs[0]}:'"
    else:
        seed_lit = (
            "concat(" + ", chr(92), ".join(f"'{p}'" for p in segs) + ", ':')"
        )
    key = f"concat({seed_lit}, CAST({id_col} AS STRING))"
    u = f"(CAST(conv(substr(md5({key}), 1, 8), 16, 10) AS BIGINT) + 1) / 4294967296.0"
    wd = f"CAST({weight} AS DOUBLE)"
    return (
        f"SELECT * EXCEPT (__pri) FROM (SELECT *, round(ln({u}) / {wd}, 9) AS __pri "
        f"FROM {source} WHERE {weight} IS NOT NULL AND NOT isnan({wd}) AND {wd} > 0 "
        f"ORDER BY __pri DESC, {id_col} ASC LIMIT {n})"
    )


@spark_transform("curriculum_order", category="ml", streaming_ok=False)
def curriculum_order(
    df: DataFrame,
    score_col: str,
    key: str,
    n_buckets: int = 10,
    seed: int = 42,
    descending: bool = False,
) -> DataFrame:
    """Curriculum ordering for training data: bucket documents by a
    difficulty/quality score into ``n_buckets`` equal-width bins, then
    order by (bucket, seeded shuffle key) — easy→hard progression between
    buckets, unbiased seeded shuffle within each (the standard curriculum-
    learning data layout, Bengio et al. 2009). Appends
    ``CURRICULUM_BUCKET`` (0-based; null AND NaN scores land in the LAST
    bucket — unknown difficulty trains last) and ``SHUFFLE_KEY``.
    ``descending`` reverses the bucket direction for SCORED rows
    (hard→easy, anti-curriculum); nulls/NaNs stay in the last bucket in
    both directions — the "trains last" rule is a position contract, not
    a score value. NaNs are also excluded from the min/max edge fit
    (Spark sorts NaN above every double, so one NaN would otherwise poison
    the span and NULL every scored row's bucket).

    Scale: bucket edges come from ONE broadcast min/max row (never a global
    rank — ntile/percent_rank would funnel one task); the final order is a
    range-partitioned sort, the scale-standard distributed reorder. Same
    seed → identical order on any cluster layout.
    """
    if n_buckets < 2:
        raise ParameterException("n_buckets must be >= 2")
    s, k = resolve_col(df, score_col), resolve_col(df, key)
    x = F.col(s).cast("double")
    # NaN-safe edges: min/max over finite-or-infinite scores only (NaN
    # compares greater than everything in Spark and would poison __hi)
    scored = F.when(~F.isnan(x), x)
    stats = df.agg(
        F.min(scored).alias("__lo"), F.max(scored).alias("__hi")
    )
    staged = df.crossJoin(F.broadcast(stats))
    span = F.col("__hi") - F.col("__lo")
    raw = F.floor((x - F.col("__lo")) / span * n_buckets).cast("int")
    core = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(raw, F.lit(int(n_buckets) - 1))
    )
    if descending:
        core = F.lit(int(n_buckets) - 1) - core
    # nulls AND NaNs land in the LAST bucket in BOTH directions —
    # "unknown difficulty trains last" is a position contract, not a
    # score value, so the descending flip must not apply to it (NaN is
    # not NULL: without its own branch the floor arithmetic yields a
    # NULL bucket that sorts FIRST, the opposite position)
    bucket = F.when(
        x.isNull() | F.isnan(x), F.lit(int(n_buckets) - 1)
    ).otherwise(core)
    skey = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(k).cast("string")))
    return (
        staged.withColumn("CURRICULUM_BUCKET", bucket)
        .withColumn("SHUFFLE_KEY", skey)
        .drop("__lo", "__hi")
        .orderBy("CURRICULUM_BUCKET", "SHUFFLE_KEY", F.col(k))
    )


@renderer("curriculum_order")
def _r_curriculum_order(source, score_col, key, n_buckets=10, seed=42,
                        descending=False, _input_columns=()) -> str:
    if n_buckets < 2:
        raise ParameterException("n_buckets must be >= 2")
    n = int(n_buckets)
    x = f"CAST({score_col} AS DOUBLE)"
    raw = f"CAST(FLOOR(({x} - __lo) / (__hi - __lo) * {n}) AS INT)"
    core = f"CASE WHEN (__hi - __lo) <= 0 THEN 0 ELSE LEAST({raw}, {n - 1}) END"
    if descending:
        core = f"({n - 1} - ({core}))"
    # nulls AND NaNs stay in the LAST bucket in both directions (position
    # contract), and NaNs are excluded from the edge fit — mirrors the
    # execution path exactly
    b = f"CASE WHEN {x} IS NULL OR isnan({x}) THEN {n - 1} ELSE {core} END"
    scored = f"CASE WHEN NOT isnan({x}) THEN {x} END"
    sel = ", ".join(_input_columns)
    return (
        f"SELECT {sel}, {b} AS CURRICULUM_BUCKET, "
        f"md5(concat_ws('|', '{seed}', CAST({key} AS STRING))) AS SHUFFLE_KEY "
        f"FROM {source} CROSS JOIN "
        f"(SELECT MIN({scored}) AS __lo, MAX({scored}) AS __hi FROM {source}) "
        f"ORDER BY CURRICULUM_BUCKET, SHUFFLE_KEY, {key}"
    )
