"""Round-6 large-k stress check for the kmeans/semantic_dedup assignment
path: above IVF_LITERAL_CENTROID_MAX (256) the centroid array ships as a
one-row broadcast instead of k·dim plan literals (VERDICT r5 item 2/7).
This measures that the documented k="auto" regime (k grows as n/5000) is
actually usable: plan size stays O(1) in k and wall-clock stays bounded.

Builds a 50k-vector corpus in memory (25 perturbed replicas of the sf0.1
embeddings table, ids disjoint; data not committed) and runs
kmeans_cluster / semantic_dedup at k=8 (literal path) and k=400
(broadcast path), recording wall-clock and the analyzed-plan string size.

Usage: python tools/stress_r6.py   (prints the table — paste into
SCALING.md's round-6 section)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402

SF = "/root/testdata/sf0.1"


def _timed(make_df):
    """(seconds, analyzed-plan chars) — construction + execution; the
    kmeans fit does eager seed/Lloyd collects inside the call."""
    t0 = time.time()
    df = make_df()
    df.write.format("noop").mode("overwrite").save()
    secs = time.time() - t0
    plan_chars = len(df._jdf.queryExecution().analyzed().toString())
    return secs, plan_chars


def main() -> int:
    spark = rql.default_spark(app_name="stress_r6", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    n0 = base.count()
    copies = max(1, 50_000 // n0)
    # perturb each replica by a tiny per-copy offset on the first component
    # so the corpus is 50k DISTINCT vectors (otherwise the exact-dup
    # collapse would trivialize the pair join and hide assignment cost)
    parts = [
        base.selectExpr(
            f"vec_id + {i * 10_000_000} AS vec_id",
            "transform(embedding, (x, j) -> CASE WHEN j = 0 THEN "
            f"x + {i} * 0.0001 ELSE x END) AS embedding",
        )
        for i in range(copies)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.persist()
    n = corpus.count()
    print(f"corpus: {n} vectors ({copies} perturbed replicas of {n0})")

    km = rql.get_transform("kmeans_cluster").apply
    sd = rql.get_transform("semantic_dedup").apply
    rows = []
    for k in (8, 400):
        _timed(lambda: km(corpus, vec_col="embedding", id_col="vec_id",
                          k=k, iterations=1))  # warm
        secs, chars = _timed(lambda: km(corpus, vec_col="embedding",
                                        id_col="vec_id", k=k, iterations=1))
        rows.append(("kmeans_cluster", k, secs, chars))
    # semantic_dedup's comparator is k=200 (literal path), not k=8: at 50k
    # DISTINCT vectors the pair join is O(n²/k), and k=8 would be the exact
    # ~300M-pair blow-up the k="auto" guidance exists to prevent — the
    # interesting comparison is literal-path vs broadcast-path at sane k
    for k in (200, 400):
        secs, chars = _timed(lambda: sd(corpus, vec_col="embedding",
                                        id_col="vec_id", k=k, iterations=1,
                                        threshold=0.95))
        rows.append(("semantic_dedup", k, secs, chars))

    print("| operator | corpus | k | time (s) | analyzed-plan chars |")
    print("|---|---|---|---|---|")
    for op, k, secs, chars in rows:
        path = "literal" if k <= 256 else "broadcast"
        print(f"| {op} ({path}) | {n} vecs | {k} | {secs:.1f} | {chars:,} |")

    # ---- round-6 new-operator stress (run with: python tools/stress_r6.py new)
    if len(sys.argv) > 1 and sys.argv[1] == "new":
        ej = rql.get_transform("embedding_join_ivf").apply
        left = corpus.filter("vec_id % 1000 < 10")  # ~500 query rows
        right = corpus.filter("vec_id % 1000 >= 10")
        for nc in (64,):
            _timed(lambda: ej(left, vec_col="embedding", id_col="vec_id",
                              other=right, k=2, num_centroids=nc, nprobe=4))
            secs, _ = _timed(lambda: ej(left, vec_col="embedding",
                                        id_col="vec_id", other=right, k=2,
                                        num_centroids=nc, nprobe=4))
            print(f"| embedding_join_ivf | ~500 q x {n} corpus | nc={nc} "
                  f"nprobe=4 | {secs:.1f} | — |")
        # containment on a duplicate-heavy corpus: 10 copies of each sf0.1
        # doc — the collapse path must keep the posting join at rep level
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        hot = docs
        for i in range(1, 10):
            hot = hot.unionByName(
                docs.selectExpr(f"doc_id + {i * 10_000_000} AS doc_id",
                                "text", *[c for c in docs.columns
                                          if c not in ("doc_id", "text")]))
        hot = hot.persist(); nh = hot.count()
        ct = rql.get_transform("ngram_containment").apply
        _timed(lambda: ct(docs, text="text", id_col="doc_id", threshold=0.5))
        s1, _ = _timed(lambda: ct(docs, text="text", id_col="doc_id",
                                  threshold=0.5))
        s10, _ = _timed(lambda: ct(hot, text="text", id_col="doc_id",
                                   threshold=0.5))
        print(f"| ngram_containment | {docs.count()} docs | thr=0.5 | "
              f"{s1:.1f} | — |")
        print(f"| ngram_containment (10x exact dups) | {nh} docs | thr=0.5 | "
              f"{s10:.1f} | — |")
        hot.unpersist()
    corpus.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
