"""Round-10 ad-hoc stress: what the IVFADC+R exact re-rank buys.

Protocol mirrors tools/stress_r10_join_recall.py (same 10x corpus, same
code budget: m=8, 16 codes, sqrt-n lists, sqrt-k probes): recall@10 vs
the exact brute top-10 for plain ADC ranking vs rerank=True at factors
2/4/8, all over ONE prebuilt index (the amortized regime — the variants
differ only in the search stage, so the deltas are pure re-rank effect).
Repeated on the anisotropic copy (dim i scaled 0.9^i — the energy
profile real text embeddings have) where PQ quantization error is large
and the refine stage has the most to recover.

Usage: python tools/stress_r10_rerank.py [replicas]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def run_corpus(tag: str, big, out: dict) -> None:
    from rasgoql_spark.functions.pq import ivfpq_index, similarity_search_ivfpq
    from rasgoql_spark.functions.similarity import similarity_search

    n = big.count()
    kc = max(8, int(round(n ** 0.5)))
    npr = max(4, int(round(kc ** 0.5)))
    qids = list(range(50))
    exact = similarity_search(big, "embedding", "vec_id", query_ids=qids, k=10)
    truth: dict = {}
    for r in exact.collect():
        truth.setdefault(int(r["QUERY_ID"]), set()).add(int(r["MATCH_ID"]))
    idx = ivfpq_index(big, "embedding", "vec_id", num_centroids=kc,
                      coarse_iterations=1, m=8, codebook_size=16,
                      iterations=1)

    def recall(**kw) -> tuple[float, float]:
        t0 = time.time()
        got = similarity_search_ivfpq(
            big, "embedding", "vec_id", qids, k=10, nprobe=npr,
            index=idx, **kw)
        byq: dict = {}
        for r in got.collect():
            byq.setdefault(int(r["QUERY_ID"]), set()).add(int(r["MATCH_ID"]))
        wall = time.time() - t0
        hits = sum(len(t & byq.get(q, set())) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        return round(hits / total, 4), round(wall, 2)

    r0, w0 = recall()
    out[f"{tag}_recall_plain"], out[f"{tag}_wall_plain"] = r0, w0
    print(tag, "plain", r0, f"({w0}s)")
    for f_ in (2, 4, 8):
        r1, w1 = recall(rerank=True, rerank_factor=f_)
        out[f"{tag}_recall_rr{f_}"], out[f"{tag}_wall_rr{f_}"] = r1, w1
        print(tag, f"rerank x{f_}", r1, f"({w1}s)")
    idx.release()


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = rql.default_spark(app_name="stress_r10_rr", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n0 = emb.count()
    big = emb
    for r in range(1, replicas):
        big = big.unionByName(
            emb.select((F.col("vec_id") + r * n0).alias("vec_id"),
                       "embedding", "label"))
    big = big.persist()
    out: dict = {"corpus": big.count(), "replicas": replicas}
    run_corpus("iso", big, out)
    # anisotropic copy: the stress_r10 rotation-grounding profile
    aniso = big.withColumn(
        "embedding",
        F.expr("transform(embedding, (x, i) -> x * power(0.9, i))"),
    ).persist()
    aniso.count()
    run_corpus("aniso", aniso, out)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
