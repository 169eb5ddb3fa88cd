"""Span-level substring deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better" — approximated at fixed
token-span granularity, the shape a distributed engine can run without a
suffix array).

Documents are segmented into consecutive ``span``-token windows; a span is a
duplicate when its exact token sequence has already occurred earlier —
within the same document (``remove_repeated_spans``) or anywhere earlier in
the corpus by (doc_id, position) order (``dedup_spans``). Duplicated spans
are dropped and the surviving spans are re-joined into the cleaned text.

100 TB design:
- ``remove_repeated_spans`` is entirely row-local (pure JVM array
  expressions, zero shuffle, embarrassingly parallel). Per-row cost is
  O(m^2) span comparisons for m = tokens/span — quadratic in SPANS, not
  tokens, so a 10k-token page at span=16 does ~2e5 short-string equality
  checks, micro-seconds of CPU.
- ``dedup_spans`` never compares all pairs: spans ship as slim
  (fingerprint, doc_id, idx) triples, the global keep-first winner per
  fingerprint is a hash aggregation (min-struct — NOT a window, so a
  boilerplate span repeated across millions of pages is a single skew-free
  partial-aggregated group), and survivors re-assemble with one doc_id
  shuffle. Two slim shuffles total, both AQE-sized.

Both operators are exactly replayable in ANSI SQL (explode + keep-first +
ordered re-aggregation), which is what the DuckDB oracles run.

No counterpart in the reference (rasgoql has no text operators); public
technique only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import resolve_col, spread
from ..registry import spark_transform
from ._hash import tokens_expr


def _spans_expr(toks: Column, span: int) -> Column:
    """array<string> of consecutive ``span``-token windows (last may be
    short); empty token list -> empty array."""
    nspans = F.ceil(F.size(toks) / F.lit(span)).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nspans - 1),
            lambda j: F.concat_ws(" ", F.slice(toks, j * span + 1, span)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@spark_transform("remove_repeated_spans", category="curation")
def remove_repeated_spans(
    df: DataFrame,
    text: str,
    span: int = 16,
    name: str = "TEXT_DEDUPED",
) -> DataFrame:
    """Drop token spans repeated WITHIN a document (keep the first
    occurrence), appending ``name`` (cleaned text) and ``SPANS_REMOVED``.
    Catches the pathological self-repetition of crawled pages (nav bars,
    cookie banners, generation loops) without touching cross-document state.

    Row-local: spans are staged once per row, then a single indexed
    ``filter`` keeps span j iff it equals no span before j. Zero shuffle,
    zero Python; streaming-safe.
    """
    if span < 1:
        raise ParameterException("span must be >= 1")
    t = resolve_col(df, text)
    # stage the span array behind a projection boundary: lambdas re-evaluate
    # captured expressions PER ELEMENT (no invariant hoisting in Spark HOFs
    # — see minhash_signatures), so the filter below must reference a plain
    # column, not the span-construction expression.
    staged = df.withColumn("__spans", _spans_expr(tokens_expr(F.col(t)), span))
    kept = F.filter(
        F.col("__spans"),
        lambda s, j: ~F.array_contains(F.slice(F.col("__spans"), F.lit(1), j), s),
    )
    return (
        staged.withColumn("__kept", kept)
        .withColumn(name, F.concat_ws(" ", F.col("__kept")))
        .withColumn(
            "SPANS_REMOVED",
            (F.size("__spans") - F.size("__kept")).cast("bigint"),
        )
        .drop("__spans", "__kept")
    )


@spark_transform("dedup_spans", category="dedup", streaming_ok=False)
def dedup_spans(
    df: DataFrame,
    text: str,
    id_col: str,
    span: int = 16,
    name: str = "TEXT_DEDUPED",
    drop_empty: bool = False,
) -> DataFrame:
    """Corpus-level span dedup: every exact ``span``-token sequence survives
    only at its FIRST occurrence in (id, position) order; later occurrences
    anywhere in the corpus are removed and each document's remaining spans
    re-join into ``name``. ``SPANS_REMOVED`` counts the drops; documents
    reduced to nothing keep an empty string (or are dropped entirely with
    ``drop_empty``). The distributed approximation of suffix-array substring
    dedup: alignment-sensitive, but catches the dominant case (whole
    boilerplate blocks repeated verbatim across pages).

    Scale: spans shuffle once as slim (fingerprint, id, idx) triples; the
    keep-first winner per fingerprint is ``min(struct(id, idx))`` — a hash
    aggregation with partial (map-side) combine, so a span repeated on 10M
    pages never concentrates on one task the way a window would. Survivors
    re-assemble with one id-keyed aggregation. The document table itself
    never fans out beyond its own span count.
    """
    if span < 1:
        raise ParameterException("span must be >= 1")
    t, i = resolve_col(df, text), resolve_col(df, id_col)
    staged = spread(df).select(
        F.col(i).alias("__id"), _spans_expr(tokens_expr(F.col(t)), span).alias("__spans")
    )
    # full-width md5 fingerprint (NOT the 32-bit prefix the minhash family
    # uses): dedup groups by the fingerprint, and a 32-bit space collides at
    # ~10^5 distinct spans — a 128-bit key stays collision-free at corpus
    # scale while keeping the shuffled triple slim.
    exploded = staged.select(
        "__id", F.posexplode("__spans").alias("__idx", "__s")
    ).withColumn("__fp", F.md5(F.col("__s")))
    # global first occurrence per fingerprint: skew-free min-aggregation
    winners = exploded.groupBy("__fp").agg(
        F.min(F.struct("__id", "__idx")).alias("__w")
    ).select("__fp", F.col("__w.__id").alias("__wid"), F.col("__w.__idx").alias("__widx"))
    survivors = exploded.join(
        winners,
        (exploded["__fp"] == winners["__fp"])
        & (exploded["__id"] == winners["__wid"])
        & (exploded["__idx"] == winners["__widx"]),
        "left_semi",
    )
    rebuilt = survivors.groupBy("__id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__s"))),
                lambda s: s["__s"],
            ),
        ).alias(name),
        F.count(F.lit(1)).alias("__nkept"),
    )
    totals = staged.select("__id", F.size("__spans").alias("__ntotal"))
    out = (
        totals.join(rebuilt, on="__id", how="left")
        .withColumn(name, F.coalesce(F.col(name), F.lit("")))
        .withColumn(
            "SPANS_REMOVED",
            (F.col("__ntotal") - F.coalesce(F.col("__nkept"), F.lit(0))).cast("bigint"),
        )
        .select(F.col("__id").alias(i), F.col(name), "SPANS_REMOVED")
    )
    joined = df.join(out, on=i, how="inner")
    if drop_empty:
        joined = joined.filter(F.col(name) != "")
    return joined
