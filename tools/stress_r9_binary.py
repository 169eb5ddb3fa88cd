"""Round-9 ad-hoc stress: Hamming-ANN over 1-bit signs at 10x corpus.

Same harness shape as stress_r8_ivfpq: sf0.1 embeddings replicated 10x
(20k x 64), 5 fixed queries, comparing brute cosine, plain Hamming
top-10, and the two-stage rerank form. The question at this scale is
CPU, not bytes: per candidate the binary scan does 2 xor+popcount word
ops instead of a 64-element double fold.

Usage: python tools/stress_r9_binary.py [replicas]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = rql.default_spark(app_name="stress_binary", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n0 = emb.count()
    big = emb
    for r in range(1, replicas):
        big = big.unionByName(emb.select(
            (F.col("vec_id") + r * n0).alias("vec_id"), "embedding", "label"))
    big = big.persist()
    n = big.count()
    print(f"corpus: {n} vectors x 64 dims")

    from rasgoql_spark.functions.similarity import (
        similarity_search, similarity_search_binary)

    qids = [0, 1, 2, 3, 4]

    def timed(mk):
        mk().write.format("noop").mode("overwrite").save()
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    t_brute = timed(lambda: similarity_search(
        big, "embedding", "vec_id", query_ids=qids, k=10))
    t_ham = timed(lambda: similarity_search_binary(
        big, "embedding", "vec_id", qids, k=10))
    t_rr = timed(lambda: similarity_search_binary(
        big, "embedding", "vec_id", qids, k=10, rerank=True))
    print(f"brute {t_brute:.2f}s | hamming {t_ham:.2f}s | "
          f"hamming+rerank {t_rr:.2f}s")
    # recall vs exact
    truth, gh, gr = {}, {}, {}
    for r in similarity_search(big, "embedding", "vec_id",
                               query_ids=qids, k=10).collect():
        truth.setdefault(r["QUERY_ID"], set()).add(r["MATCH_ID"])
    for r in similarity_search_binary(big, "embedding", "vec_id",
                                      qids, k=10).collect():
        gh.setdefault(r["QUERY_ID"], set()).add(r["MATCH_ID"])
    for r in similarity_search_binary(big, "embedding", "vec_id", qids,
                                      k=10, rerank=True).collect():
        gr.setdefault(r["QUERY_ID"], set()).add(r["MATCH_ID"])
    tot = sum(len(truth[q]) for q in truth)
    print(f"recall@10: hamming "
          f"{sum(len(truth[q] & gh.get(q, set())) for q in truth) / tot:.2f} | "
          f"rerank "
          f"{sum(len(truth[q] & gr.get(q, set())) for q in truth) / tot:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
