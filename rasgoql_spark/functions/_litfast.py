"""Single-call construction of large literal arrays.

Every PySpark Column operation is a py4j round trip, so building a literal
``array<struct<c, v>>`` of k centroids × dim doubles out of per-element
``F.lit`` calls costs k·dim driver round trips — measured ~1.4 s for the
2,752-literal centroid array at sf0.1's auto-k, PER operator call, which
dominated update_ivf_index's bench entry and taxed every inline-fit
IVF/kmeans/PQ query (bench/results/creep_breakdown.json, round 8). Emitting
the whole literal as ONE ``F.expr`` SQL string is a single round trip and
one JVM parse; the resulting expression tree is value- and schema-identical
(Python ``repr`` of a float round-trips through Spark's double parser), so
plans, results, and semanticHash-based cache keys are unaffected.

Non-finite doubles have no SQL literal form; callers' values are means /
unit-normalized components / ±1 signs, so the finite check only ever takes
the fallback in adversarial unit tests.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _all_finite(vals) -> bool:
    return all(math.isfinite(float(x)) for x in vals)


def double_array_lit(vals: list) -> Column:
    """``[floats] → literal array<double>`` in one py4j call."""
    if not vals or not _all_finite(vals):
        return F.array(*[F.lit(float(x)) for x in vals])
    return F.expr("array(%s)" % ",".join(repr(float(x)) + "D" for x in vals))


def double_matrix_lit(rows: list) -> Column:
    """``[[floats]] → literal array<array<double>>`` in one py4j call —
    the PQ-codebook lookup shape (``element_at(matrix, code + 1)``)."""
    if not rows or not all(_all_finite(r) for r in rows):
        return F.array(*[F.array(*[F.lit(float(x)) for x in r]) for r in rows])
    return F.expr(
        "array(%s)"
        % ",".join(
            "array(%s)" % ",".join(repr(float(x)) + "D" for x in r) for r in rows
        )
    )


def centroid_array_lit(cents: list, id_type: str = "bigint") -> Column:
    """``[(cid, [floats])] → literal array<struct<c: id_type, v:
    array<double>>>`` in one py4j call — the shared shape of IVF centroids,
    kmeans centroids, and PQ codebooks."""
    suffix = {"bigint": "L", "int": ""}[id_type]
    if not cents or not all(_all_finite(vec) for _, vec in cents):
        return F.array(
            *[
                F.struct(
                    F.lit(int(cid)).cast(id_type).alias("c"),
                    F.array(*[F.lit(float(x)) for x in vec]).alias("v"),
                )
                for cid, vec in cents
            ]
        )
    parts = [
        "named_struct('c',%d%s,'v',array(%s))"
        % (int(cid), suffix, ",".join(repr(float(x)) + "D" for x in vec))
        for cid, vec in cents
    ]
    return F.expr("array(" + ",".join(parts) + ")")
