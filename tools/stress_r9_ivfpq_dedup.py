"""Round-9 ad-hoc stress: dedup_against_embedding(method='ivfpq') at 10×.

Reference = sf0.1 embeddings replicated REPLICAS× (20k × 64 vectors),
batch = 2,000 fresh vectors (half exact copies of reference rows, half
negated = novel). Measures brute vs ivf vs ivfpq wall (prebuilt indexes,
so the fits are amortized out — the steady-state ingest shape) and
reports the candidate/byte geometry: candidates per batch row in the
probed lists, and scan bytes per candidate (m ints for PQ codes vs dim
doubles for full vectors) — the quantity that decides the operator's
regime at the billion-vector scale.

Usage: python tools/stress_r9_ivfpq_dedup.py [replicas] [batch]
(defaults 10, 2000; prints SCALING.md rows — ad-hoc data, not committed)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import rasgoql_spark as rql  # noqa: E402


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = rql.default_spark(app_name="stress_r9_dedup", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from rasgoql_spark.functions.pq import ivfpq_index
    from rasgoql_spark.functions.similarity import (
        dedup_against_embedding,
        ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n0 = emb.count()
    ref = emb
    for r in range(1, replicas):
        ref = ref.unionByName(
            emb.select((F.col("vec_id") + r * n0).alias("vec_id"), "embedding")
        )
    ref = ref.persist()
    n = ref.count()
    half = batch_n // 2
    batch = ref.limit(half).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    ).unionByName(
        ref.limit(half).select(
            (F.col("vec_id") + 20_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    ).persist()
    bn = batch.count()
    print(f"reference {n} x 64, batch {bn} (half dups, half novel)")

    kc, nprobe = 45, 7
    t0 = time.time()
    pq_idx = ivfpq_index(ref, "embedding", "vec_id", num_centroids=kc,
                         m=8, codebook_size=16, iterations=1)
    t_pqfit = time.time() - t0
    t0 = time.time()
    iv_idx = ivf_index(ref, "embedding", "vec_id", num_centroids=kc)
    t_ivfit = time.time() - t0
    print(f"index builds: ivfpq {t_pqfit:.1f}s, ivf {t_ivfit:.1f}s (amortized)")

    def timed(mk):
        mk().write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    t_brute = timed(lambda: dedup_against_embedding(
        batch, "embedding", "vec_id", reference=ref, threshold=0.5,
        method="brute", mode="filter"))
    t_ivf = timed(lambda: dedup_against_embedding(
        batch, "embedding", "vec_id", index=iv_idx, threshold=0.5,
        method="ivf", nprobe=nprobe, mode="filter"))
    t_pq = timed(lambda: dedup_against_embedding(
        batch, "embedding", "vec_id", index=pq_idx, threshold=0.5,
        method="ivfpq", nprobe=nprobe, mode="filter"))
    print(f"brute {t_brute:.2f}s | ivf(prebuilt) {t_ivf:.2f}s | "
          f"ivfpq(prebuilt) {t_pq:.2f}s")

    # candidate geometry: rows in probed lists per batch row
    sizes = {
        int(r["__cid"]): int(r["c"])
        for r in pq_idx.frame.groupBy("__cid").count()
        .withColumnRenamed("count", "c").collect()
    }
    avg_list = sum(sizes.values()) / len(sizes)
    cand_per_row = nprobe * avg_list
    print(
        f"lists: {len(sizes)}, avg {avg_list:.0f} rows (max {max(sizes.values())}); "
        f"candidates/batch-row ~ {cand_per_row:.0f} = "
        f"{100 * cand_per_row / n:.1f}% of corpus; "
        f"scan bytes/candidate: ivfpq {pq_idx.m * 4}B (codes) vs "
        f"ivf/brute {64 * 8}B (full vector) = "
        f"{64 * 8 // (pq_idx.m * 4)}x reduction"
    )
    pq_idx.release()
    iv_idx.release()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
