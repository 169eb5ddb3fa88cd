"""Round-8 ad-hoc stress: similarity_search_ivfpq at 10× corpus.

Replicates the sf0.1 embeddings 10× (20k × 64 vectors, ids offset so every
copy is distinct), then measures:
  - brute similarity_search (the exact baseline every ANN entry is judged
    against),
  - similarity_search_ivfpq at scale-appropriate sizing (45 lists ≈ √20k,
    nprobe 7 ≈ √45, m=8, 16 codes),
and reports wall times plus the candidate-scan volume implied by the probe
(rows in probed lists vs corpus) — the quantity that shrinks with nprobe/k
and, in bytes, with the 64-float → 8-int PQ compression.

Usage: python tools/stress_r8_ivfpq.py [replicas]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = rql.default_spark(app_name="stress_ivfpq", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n0 = emb.count()
    big = emb
    for r in range(1, replicas):
        big = big.unionByName(
            emb.select(
                (F.col("vec_id") + r * n0).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    big = big.persist()
    n = big.count()
    print(f"corpus: {n} vectors x 64 dims ({replicas}x replicas)")

    from rasgoql_spark.functions.pq import similarity_search_ivfpq
    from rasgoql_spark.functions.similarity import similarity_search

    qids = [0, 1, 2, 3, 4]

    def timed(mk):
        mk().write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    t_brute = timed(lambda: similarity_search(
        big, "embedding", "vec_id", query_ids=qids, k=10))
    for (kc, nprobe) in ((45, 7), (45, 45)):
        dt = timed(lambda: similarity_search_ivfpq(
            big, "embedding", "vec_id", qids, k=10,
            num_centroids=kc, nprobe=nprobe, m=8, codebook_size=16,
        ))
        tag = "full-probe (no pruning)" if nprobe >= kc else "pruned"
        print(f"ivfpq k={kc} nprobe={nprobe} ({tag}): {dt:.2f}s")
    print(f"brute exact: {t_brute:.2f}s")
    # candidate volume: rows in probed lists per query at the pruned sizing
    from rasgoql_spark.functions.cluster import _fit_kmeans, _assign_expr
    from rasgoql_spark.functions.similarity import _attach_centroids
    from rasgoql_spark.functions.cluster import _unit_rounded

    staged = _unit_rounded(
        big.select(F.col("vec_id").alias("__id"), F.col("embedding").alias("__vec")),
        "__vec",
    ).persist()
    cents = _fit_kmeans(staged, 45, 1, 6)
    ab, carr, _ = _attach_centroids(staged, cents)
    sizes = (
        ab.withColumn("__cid", _assign_expr(carr, 6))
        .groupBy("__cid").count().agg(
            F.avg("count").alias("avg"), F.max("count").alias("max")
        ).first()
    )
    avg_candidates = 7 * float(sizes["avg"])
    print(
        f"list sizes: avg {sizes['avg']:.0f} max {sizes['max']} -> "
        f"~{avg_candidates:.0f} candidates/query at nprobe=7 "
        f"({100 * avg_candidates / n:.1f}% of corpus), each read as "
        f"8 int codes instead of 64 doubles (64x scan-byte reduction)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
