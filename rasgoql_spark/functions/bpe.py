"""Byte-pair-encoding tokenization (real BPE, not the regex proxy).

Training is the classic Sennrich et al. 2016 algorithm ("Neural Machine
Translation of Rare Words with Subword Units", public): repeatedly merge the
most frequent adjacent symbol pair. The corpus reduces to its WORD-FREQUENCY
table first — one Spark aggregation, capped at ``max_words`` — because that
table is the sufficient statistic for BPE training; the merge loop then runs
driver-side on the bounded dict (standard practice in every BPE trainer).

Application exploits a rank-order equivalence: a merge rule's constituent
symbols are always produced by EARLIER rules, so applying each rule
exhaustively left-to-right in rank order yields exactly the classic
min-rank-first result. Each rule application is a plain string ``replace``
over a delimited symbol string:

    symbols are joined by TWO spaces, the string is wrapped in two spaces,
    and words are separated by the unmergeable marker ``¶``. Rule (a, b)
    rewrites " a  b " → " ab " — the single outer spaces re-establish the
    two-space boundary, adjacent matches share no characters (so one
    non-overlapping left-to-right pass is exact), and a symbol can never
    match a substring of a longer symbol.

That keeps apply 100% JVM-side in Spark (a fold of ``F.replace`` — no
Python, no shuffle) and renders to the identical ``replace`` chain in ANSI
SQL for the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators._util import resolve_col, spread
from ..registry import renderer, spark_transform
from ._hash import TOKENS_SQL, tokens_expr

WORD_MARK = "¶"  # never appears in [a-z0-9] symbols → blocks cross-word merges

# The JVM replace fold builds an expression chain LINEAR in the number of
# merges. The hard wall is not codegen but plan conversion: Spark 4.1.2's
# ColumnNodeToExpressionConverter recurses per node and overflows the JVM
# stack near ~300 chained replaces (measured: 256 ok, 320
# StackOverflowError on this JVM); a production 32k-merge vocabulary is
# far beyond any expression-tree approach. Above this ceiling the ops
# switch to an Arrow-batched pandas UDF applying the IDENTICAL chain in
# Python — same output, O(1) plan size, still embarrassingly parallel
# (no shuffle); the per-batch Python cost is the price of vocab-scale
# tables. 192 leaves headroom for the expressions that wrap the fold.
BPE_EXPR_MERGE_MAX = 192


def train_bpe(
    df: DataFrame,
    text: str,
    num_merges: int = 96,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus. Deterministic: ties on pair
    frequency break to the lexicographically smallest pair. The Spark side
    is a single word-count aggregation (top ``max_words`` by frequency, then
    word asc — bounded like the discovery caps); the merge loop is
    driver-side over that dict."""
    t = resolve_col(df, text)
    rows = (
        spread(df)
        .select(F.explode(tokens_expr(F.col(t))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__w").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {tuple(r["__w"]): r["__c"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for j in range(len(word) - 1):
                p = (word[j], word[j + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        (a, b), _n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        merged: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out, j = [], 0
            while j < len(word):
                if j + 1 < len(word) and word[j] == a and word[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(word[j])
                    j += 1
            w2 = tuple(out)
            merged[w2] = merged.get(w2, 0) + c
        vocab = merged
    return merges


def _symbolize(text_col: Column) -> Column:
    """tokens → delimited symbol string: per-word chars joined by two
    spaces, words joined by ``  ¶  ``, wrapped in two spaces."""
    toks = tokens_expr(text_col)
    spaced = F.transform(
        toks, lambda w: F.trim(F.regexp_replace(w, "(.)", "$1  "))
    )
    return F.concat(
        F.lit("  "), F.concat_ws(f"  {WORD_MARK}  ", spaced), F.lit("  ")
    )


def _bpe_apply_pandas(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Arrow-batched pandas UDF producing the same delimited symbol string as
    the JVM fold — the big-vocab escape hatch (see ``BPE_EXPR_MERGE_MAX``).
    Replicates ``tokens_expr`` + ``_symbolize`` + the replace chain exactly;
    Python ``str.replace`` is the same non-overlapping left-to-right pass as
    ``F.replace``."""
    import re

    from pyspark.sql.functions import pandas_udf

    reps = [(f" {a}  {b} ", f" {a}{b} ") for a, b in merges]
    nonword = re.compile(r"[^a-z0-9\s]")

    @pandas_udf("string")
    def _apply(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            cleaned = nonword.sub(" ", t.lower()).strip()
            toks = cleaned.split() if cleaned else []
            s = "  " + f"  {WORD_MARK}  ".join("  ".join(w) for w in toks) + "  "
            for old, new in reps:
                s = s.replace(old, new)
            return s

        return texts.map(one)

    return _apply(text_col)


def bpe_apply_expr(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Delimited symbol string AFTER all merges — a JVM fold of string
    replaces, shuffle-free and Python-free, for merge tables up to
    ``BPE_EXPR_MERGE_MAX``; larger tables switch to the Arrow-batched
    Python path (identical output, O(1) plan size)."""
    if len(merges) > BPE_EXPR_MERGE_MAX:
        return _bpe_apply_pandas(text_col, merges)
    s = _symbolize(text_col)
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return s


def bpe_count_expr(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """BPE token count of a text column (word markers excluded)."""
    toks = tokens_expr(text_col)
    syms = F.split(F.trim(bpe_apply_expr(text_col, merges)), "  ")
    n = F.size(F.filter(syms, lambda p: p != WORD_MARK))
    return F.when(F.size(toks) > 0, n).otherwise(F.lit(0)).cast("bigint")


def bpe_tokens_expr(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """array<string> of BPE subword tokens (word markers excluded)."""
    syms = F.split(F.trim(bpe_apply_expr(text_col, merges)), "  ")
    out = F.filter(syms, lambda p: p != WORD_MARK)
    return F.when(
        F.size(tokens_expr(text_col)) > 0, out
    ).otherwise(F.array().cast("array<string>"))


@spark_transform("bpe_encode", category="text")
def bpe_encode(
    df: DataFrame, text: str, name: str = "BPE_TOKENS", merges=None
) -> DataFrame:
    """Append the BPE subword token array for a text column (trained merge
    table; ``DEFAULT_BPE_MERGES`` when omitted). Row-local JVM replace fold —
    shuffle-free at any scale."""
    m = merges if merges is not None else DEFAULT_BPE_MERGES
    return df.withColumn(name, bpe_tokens_expr(F.col(resolve_col(df, text)), m))


@renderer("bpe_encode")
def _r_bpe_encode(source, text, name="BPE_TOKENS", merges=None) -> str:
    from .text import _tokens_sql

    m = merges if merges is not None else DEFAULT_BPE_MERGES
    toks = _tokens_sql(text)
    spaced = f"transform({toks}, w -> trim(regexp_replace(w, '(.)', '$1  ')))"
    s = f"concat('  ', concat_ws('  {WORD_MARK}  ', {spaced}), '  ')"
    for a, b in m:
        s = f"replace({s}, ' {a}  {b} ', ' {a}{b} ')"
    arr = f"filter(split(trim({s}), '  '), p -> p != '{WORD_MARK}')"
    expr = (
        f"CASE WHEN size({toks}) > 0 THEN {arr} "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return f"SELECT *, {expr} AS {name} FROM {source}"


def bpe_count_spark_sql(text_expr: str, merges: list[tuple[str, str]], tokens_sql: str) -> str:
    """Spark-SQL rendering of ``bpe_count_expr`` (renderer parity path)."""
    spaced = f"transform({tokens_sql}, w -> trim(regexp_replace(w, '(.)', '$1  ')))"
    s = f"concat('  ', concat_ws('  {WORD_MARK}  ', {spaced}), '  ')"
    for a, b in merges:
        s = f"replace({s}, ' {a}  {b} ', ' {a}{b} ')"
    n = f"size(filter(split(trim({s}), '  '), p -> p != '{WORD_MARK}'))"
    return f"CASE WHEN size({tokens_sql}) > 0 THEN {n} ELSE 0 END"


def bpe_joined_sql(text_expr: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB rendering of the space-joined BPE token list (oracle side of
    ``bpe_encode``)."""
    s = _symbolize_sql(text_expr)
    for a, b in merges:
        s = f"replace({s}, ' {a}  {b} ', ' {a}{b} ')"
    arr = f"list_filter(string_split(trim({s}), '  '), p -> p != '{WORD_MARK}')"
    toks = TOKENS_SQL.format(t=text_expr)
    return f"CASE WHEN len({toks}) > 0 THEN array_to_string({arr}, ' ') ELSE '' END"


def _symbolize_sql(text_expr: str) -> str:
    """DuckDB rendering of ``_symbolize`` (RE2 'g' flag for all-chars)."""
    toks = TOKENS_SQL.format(t=text_expr)
    spaced = (
        f"list_transform({toks}, w -> trim(regexp_replace(w, '(.)', '\\1  ', 'g')))"
    )
    return f"('  ' || array_to_string({spaced}, '  {WORD_MARK}  ') || '  ')"


def bpe_count_sql(text_expr: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB rendering of ``bpe_count_expr`` — the identical replace chain,
    so Spark and the oracle agree bit-for-bit."""
    s = _symbolize_sql(text_expr)
    for a, b in merges:
        s = f"replace({s}, ' {a}  {b} ', ' {a}{b} ')"
    toks = TOKENS_SQL.format(t=text_expr)
    n = f"len(list_filter(string_split(trim({s}), '  '), p -> p != '{WORD_MARK}'))"
    return f"CAST(CASE WHEN len({toks}) > 0 THEN {n} ELSE 0 END AS BIGINT)"


# Default merge table: ``train_bpe(documents, "text", num_merges=96)`` over
# the sf0.01 synthetic documents table (TESTDATA.md). Training is
# deterministic (frequency desc, pair asc tie-break), so this constant is
# reproducible from public test data; retrain with ``train_bpe`` for any
# real corpus. 89 merges — the vocabulary saturates before 96 on this
# corpus (every remaining pair is unique).
DEFAULT_BPE_MERGES: list[tuple[str, str]] = [
    ('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'), ('s', 't'), ('m', 'er'),
    ('a', 't'), ('l', 'u'), ('a', 'r'), ('p', 'ar'), ('j', 'o'), ('jo', 'in'),
    ('a', 's'), ('as', 'h'), ('h', 'ash'), ('r', 'ow'), ('at', 'c'), ('atc', 'h'),
    ('b', 'atch'), ('a', 'n'), ('c', 'an'), ('s', 'can'), ('c', 'o'), ('c', 'u'),
    ('co', 'lu'), ('colu', 'm'), ('colum', 'n'), ('cu', 'st'), ('cust', 'o'), ('custo', 'mer'),
    ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er'), ('a', 'l'), ('al', 'l'),
    ('m', 'all'), ('s', 'mall'), ('g', 'e'), ('l', 'ow'), ('mer', 'ge'), ('s', 'low'),
    ('c', 't'), ('ct', 'or'), ('d', 'er'), ('e', 'ctor'), ('or', 'der'), ('v', 'ector'),
    ('in', 'e'), ('l', 'ine'), ('a', 'b'), ('ab', 'l'), ('abl', 'e'), ('at', 'a'),
    ('d', 'ata'), ('t', 'able'), ('u', 'p'), ('a', 'g'), ('ag', 'g'), ('a', 'lu'),
    ('alu', 'e'), ('v', 'alue'), ('e', 'y'), ('k', 'ey'), ('a', 'm'), ('e', 'am'),
    ('r', 'eam'), ('st', 'ream'), ('d', 'ow'), ('in', 'dow'), ('w', 'indow'), ('par', 'k'),
    ('s', 'park'), ('g', 'r'), ('gr', 'o'), ('gro', 'up'), ('par', 't'), ('b', 'i'),
    ('bi', 'g'), ('or', 't'), ('s', 'ort'), ('er', 'y'), ('q', 'u'), ('qu', 'ery'),
    ('a', 'st'), ('f', 'ast'), ('h', 'e'), ('t', 'he'), ('d', 'up'),
]
