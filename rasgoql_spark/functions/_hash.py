"""Cross-engine deterministic hashing primitives.

All hash-based LLM operators (minhash, simhash, fingerprints, LSH bands) use
md5-derived integer hashes: ``int(hex(md5(s))[:8], 16)``. Both Spark
(``conv(substr(md5(s),1,8),16,10)``) and DuckDB
(``('0x' || substr(md5(s),1,8))::BIGINT``) compute this identically, which is
what makes the DuckDB oracle checks possible for these operators. Spark
evaluates it fully JVM-side (codegen'd), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps a*h+b within int64 for a,b < 2^32.
MERSENNE = 2_147_483_647


def md5_int(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_int_sql(expr: str) -> str:
    """DuckDB rendering of md5_int."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def affine_hash(col: Column, a: int, b: int) -> Column:
    """Universal-hash family member: (a*md5_int(x) + b) mod 2^31-1."""
    return (md5_int(col) * F.lit(a) + F.lit(b)) % F.lit(MERSENNE)


def hash_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for hash-family member i (odd a, fixed stride)."""
    return 2 * i + 1, i * 12_345 + 1


def tokens_expr(text: Column) -> Column:
    """Normalized word tokens: lowercase, strip non-alphanumerics, split on
    whitespace. Empty text → empty array."""
    cleaned = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " "))
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, r"\s+")
    )


TOKENS_SQL = (
    "CASE WHEN trim(regexp_replace(lower({t}), '[^a-z0-9\\s]', ' ', 'g')) = '' "
    "THEN [] ELSE regexp_split_to_array(trim(regexp_replace(lower({t}), '[^a-z0-9\\s]', ' ', 'g')), '\\s+') END"
)


def shingles_expr(tokens: Column, k: int) -> Column:
    """Distinct k-gram shingles joined with spaces; if fewer than k tokens,
    the whole token list is one shingle."""
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, F.lit(k))),
    )
    return F.array_distinct(
        F.when(F.size(tokens) >= k, ngrams).otherwise(
            F.when(F.size(tokens) > 0, F.array(F.concat_ws(" ", tokens))).otherwise(
                F.array().cast("array<string>")
            )
        )
    )


def shingles_sql(tokens_sql: str, k: int) -> str:
    """DuckDB rendering of shingles_expr over a list-of-tokens expression."""
    ngram = (
        f"list_distinct(list_transform(range(1, len(__toks) - {k - 2}), "
        f"i -> array_to_string(__toks[i : i + {k - 1}], ' ')))"
    )
    return (
        f"(SELECT CASE WHEN len(__toks) >= {k} THEN {ngram} "
        f"WHEN len(__toks) > 0 THEN [array_to_string(__toks, ' ')] "
        f"ELSE [] END FROM (SELECT {tokens_sql} AS __toks))"
    )
