"""Round-5 10× stress check for the late-wave iterative/join-heavy ops
(pagerank, semantic_dedup, fuzzy_join, feature_hash): replicate sf0.1
inputs 10× with shifted keys IN MEMORY (data not committed) and compare
wall-clock against the 1× shape, looking for super-linear blow-ups.

Usage: python tools/stress_r5.py   (appends nothing; prints the table —
paste into SCALING.md's round-5 section)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402

SF = "/root/testdata/sf0.1"


def _timed(make_df) -> float:
    """Time construction + execution: several transforms do eager driver
    work (counts, centroid collects) during the call itself, so timing
    only the final action would under-report them."""
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _replicate(spark, table: str, copies: int, id_cols: list[str]):
    """UNION `copies` key-shifted replicas of a parquet table (ids offset
    by 10M per copy so the replicas are disjoint)."""
    base = spark.read.parquet(f"{SF}/{table}.parquet")
    shift = ", ".join(
        [f"{c} + {{off}} AS {c}" for c in id_cols]
        + [c for c in base.columns if c not in id_cols]
    )
    parts = [
        base.selectExpr(*shift.format(off=i * 10_000_000).split(", "))
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    spark = rql.default_spark(app_name="stress_r5", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []

    # -- pagerank: 600k-edge graph vs 6M-edge graph (10 disjoint replicas)
    pr = rql.get_transform("pagerank").apply
    e1 = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
        "l_partkey AS src", "200000 + l_suppkey AS dst")
    e10 = _replicate(spark, "lineitem", 10, ["l_partkey", "l_suppkey"]).selectExpr(
        "l_partkey AS src", "200000 + l_suppkey AS dst")
    _timed(lambda: pr(e1, src="src", dst="dst", iterations=3))  # warm
    t1 = _timed(lambda: pr(e1, src="src", dst="dst", iterations=3))
    t10 = _timed(lambda: pr(e10, src="src", dst="dst", iterations=3))
    rows.append(("pagerank (3 iters)", "600k edges", t1, "6M edges", t10))
    print("pagerank done", flush=True)

    # -- semantic_dedup: 2k embeddings vs 20k (10 replicas; 5 of the 10
    #    copies keep identical vectors -> big exact-dup groups exercise the
    #    collapse guard)
    sd = rql.get_transform("semantic_dedup").apply
    emb1 = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb10 = _replicate(spark, "embeddings", 10, ["vec_id"])
    _timed(lambda: sd(emb1, vec_col="embedding", id_col="vec_id", k=8, threshold=0.33))
    t1 = _timed(lambda: sd(emb1, vec_col="embedding", id_col="vec_id",
                           k=8, threshold=0.33))
    t10 = _timed(lambda: sd(emb10, vec_col="embedding", id_col="vec_id",
                            k=8, threshold=0.33))
    rows.append(("semantic_dedup (k=8, dup-heavy)", "2k vecs", t1,
                 "20k vecs (10x exact dups)", t10))
    print("semantic_dedup done", flush=True)

    # -- fuzzy_join: 15k x 15k names vs 150k x 15k (left replicated).
    #    TPC-H names all share prefix "customer#" AND length, so prefix
    #    blocking degenerates to ONE block — exactly the corpus shape the
    #    suffix schemes exist for; block on the last 3 chars instead.
    fj = rql.get_transform("fuzzy_join").apply
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_name")
    cust10 = _replicate(spark, "customer", 10, ["c_custkey"]).select(
        "c_custkey", "c_name")
    kw = dict(column="c_name", max_distance=1, block="suffix_length",
              block_len=3)
    _timed(lambda: fj(cust, join_table=cust, **kw))
    t1 = _timed(lambda: fj(cust, join_table=cust, **kw))
    t10 = _timed(lambda: fj(cust10, join_table=cust, **kw))
    rows.append(("fuzzy_join (suffix_length, len 3)", "15k x 15k", t1,
                 "150k x 15k", t10))

    # -- feature_hash: 5k docs vs 50k docs
    fh = rql.get_transform("feature_hash").apply
    docs1 = spark.read.parquet(f"{SF}/documents.parquet")
    docs10 = _replicate(spark, "documents", 10, ["doc_id"])
    _timed(lambda: fh(docs1, text="text", id_col="doc_id", dim=16))
    t1 = _timed(lambda: fh(docs1, text="text", id_col="doc_id", dim=16))
    t10 = _timed(lambda: fh(docs10, text="text", id_col="doc_id", dim=16))
    rows.append(("feature_hash (dim=16)", "5k docs", t1, "50k docs", t10))

    print("| operator | 1x shape | 1x s | 10x shape | 10x s | ratio |")
    print("|---|---|---|---|---|---|")
    for name, s1, t1, s10, t10 in rows:
        print(f"| {name} | {s1} | {t1:.1f} | {s10} | {t10:.1f} | "
              f"{t10 / t1 if t1 > 0 else float('nan'):.1f}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
