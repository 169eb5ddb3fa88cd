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
from ..registry import spark_transform


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
