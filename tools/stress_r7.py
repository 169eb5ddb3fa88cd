"""Round-7 stress checks (VERDICT r6 items 2 and 5).

1. ``cap`` — posting-list document-frequency cap under planted boilerplate.
   Every sf0.1 document gets the same boilerplate suffix appended, so a
   handful of shingles appear in all ~5k DISTINCT shingle sets.  Uncapped,
   the exact inverted-index candidate join must emit every C(n,2) pair
   (every pair shares a hot posting) — the O(df²) blow-up VERDICT r6
   flagged.  With the default ``max_doc_freq=1000`` the hot postings are
   dropped before the self-join and candidates stay bounded by the genuine
   (non-boilerplate) shingle overlaps.

2. ``skew`` — AQE skew-split on the IVF CENTROID_ID candidate join.
   50k-vector corpus where ~20% of vectors sit in one tight cluster (a
   dense embedding region = one hot inverted list).  Times the
   embedding_join_ivf candidate join with AQE skewJoin disabled vs enabled
   (with test-scale thresholds, mirroring tests/test_round7_ops.py's plan
   assertion) — the enabled run must not be slower, demonstrating the hot
   list's partition is splittable rather than a single-task straggler.

Usage: python tools/stress_r7.py [cap|skew]   (default: both; paste the
printed rows into SCALING.md's round-7 section — ad-hoc data, not
committed)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import rasgoql_spark as rql  # noqa: E402

SF = "/root/testdata/sf0.1"

BOILERPLATE = (
    " copyright terms of service all rights reserved privacy policy "
    "contact us about this site"
)


def _timed(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def stress_cap(spark) -> list[str]:
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("text", F.concat("text", F.lit(BOILERPLATE)))
        .persist()
    )
    n = docs.count()
    print(f"cap: {n} docs, each ending in the same boilerplate suffix")
    cont = rql.get_transform("ngram_containment").apply
    jac = rql.get_transform("dedup_ngram_jaccard").apply
    rows = []
    for name, fn, kw in (
        ("ngram_containment", cont, dict(threshold=0.8)),
        ("dedup_ngram_jaccard", jac, dict(threshold=0.8, mode="pairs")),
    ):
        for label, cap in (("capped (default 1000)", 1000), ("uncapped", None)):
            out = fn(docs, text="text", id_col="doc_id",
                     max_doc_freq=cap, **kw)
            secs = _timed(out)
            pairs = out.count()
            rows.append(
                f"| {name} ({label}) | {n} docs + hot suffix | "
                f"{secs:.1f} s | {pairs} pairs |"
            )
            print(rows[-1])
    docs.unpersist()
    return rows


def stress_skew(spark) -> list[str]:
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    n0 = base.count()
    copies = max(1, 50_000 // n0)
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
    # plant the hot cluster: every 5th vector collapses to (almost) one
    # point — a dense embedding region whose IVF inverted list is ~10×
    # the mean list size at num_centroids=64
    corpus = corpus.selectExpr(
        "vec_id",
        "CASE WHEN vec_id % 5 = 0 THEN transform(embedding, (x, j) -> "
        "CASE WHEN j = 0 THEN 1.0 + pmod(vec_id, 97) * 0.00001 ELSE 0.02 "
        "END) ELSE embedding END AS embedding",
    ).persist()
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") % 50 == 0).persist()
    nq = queries.count()
    print(f"skew: corpus {n} vectors ({n // 5} in one hot cluster), "
          f"{nq} queries")
    ej = rql.get_transform("embedding_join_ivf").apply

    def run():
        return _timed(ej(queries, vec_col="embedding", id_col="vec_id",
                         other=corpus, k=5, num_centroids=64, nprobe=4))

    skew_confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in skew_confs}
    rows = []
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        run()  # warm (fit caches nothing across runs; warms JVM/input)
        t_off = run()
        for k, v in skew_confs.items():
            spark.conf.set(k, v)
        t_on = run()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    rows.append(
        f"| embedding_join_ivf ({n} corpus, {n // 5}-vector hot list, "
        f"{nq} queries, nc=64) | skewJoin off {t_off:.1f} s | "
        f"skewJoin on {t_on:.1f} s |"
    )
    print(rows[-1])
    corpus.unpersist()
    queries.unpersist()
    return rows


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = rql.default_spark(app_name="stress_r7", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    if which in ("cap", "both"):
        out += stress_cap(spark)
    if which in ("skew", "both"):
        out += stress_skew(spark)
    print("\n".join(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
