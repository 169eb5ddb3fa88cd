"""Round-10 ad-hoc stress (judge tasks #1 and #4 evidence):

1. embedding_join_ivfpq at 10× corpus — wall time plus the byte/candidate
   accounting the verdict asked for: candidate rows scanned (probed-list
   volume vs the full cross product) and bytes read per candidate (m
   small ints vs 64 float64s).
2. recall@10 of the PQ quantization variants at the SAME code budget
   (m=8, 16 codes, 45 lists ≈ √20k, nprobe 7 ≈ √45): plain vs
   residual=True (IVFADC) vs rotate=True (the deterministic
   orthogonal pre-rotation) vs residual+rotate — measured against the
   exact brute top-10.

Usage: python tools/stress_r10_join_recall.py [replicas]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = rql.default_spark(app_name="stress_r10", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n0 = emb.count()
    big = emb
    for r in range(1, replicas):
        big = big.unionByName(
            emb.select((F.col("vec_id") + r * n0).alias("vec_id"),
                       "embedding", "label"))
    big = big.persist()
    n = big.count()
    kc = max(8, int(round(n ** 0.5)))
    npr = max(4, int(round(kc ** 0.5)))
    print(f"corpus: {n} vectors x 64 dims ({replicas}x), "
          f"{kc} lists, {npr} probed")

    from rasgoql_spark.functions.pq import (
        embedding_join_ivfpq,
        ivfpq_index,
        similarity_search_ivfpq,
    )
    from rasgoql_spark.functions.similarity import similarity_search

    out: dict = {"corpus": n, "lists": kc, "nprobe": npr}

    # ---- 1. the ANN join at 10x: left = the original 2k rows, right =
    # the full 20k corpus (the enrichment shape: new batch vs big corpus)
    left = emb
    idx = ivfpq_index(big, "embedding", "vec_id", num_centroids=kc,
                      coarse_iterations=1, m=8, codebook_size=16,
                      iterations=1)
    t0 = time.time()
    j = embedding_join_ivfpq(left, "embedding", "vec_id", k=2, nprobe=npr,
                             index=idx)
    j.write.format("noop").mode("overwrite").save()
    out["join_prebuilt_sec"] = round(time.time() - t0, 3)
    # candidate accounting: rows in the probed lists per query vs full scan
    sizes = {int(r["__cid"]): int(r["n"]) for r in
             idx.frame.groupBy("__cid").count()
             .select("__cid", F.col("count").alias("n")).collect()}
    # average probed volume: mean over queries of sum of their probed list
    # sizes ~= nprobe * n / kc for balanced lists; report the implied mean
    mean_list = sum(sizes.values()) / len(sizes)
    cand_per_query = npr * mean_list
    out["candidates_per_query"] = round(cand_per_query, 1)
    out["candidate_fraction"] = round(cand_per_query / n, 4)
    # bytes per candidate: m x 1-byte-ish small ints (stored int32 in
    # practice: 8 x 4 B = 32 B) vs full vector 64 x 8 B = 512 B
    out["bytes_per_candidate"] = {"pq_codes": 8 * 4, "full_vector": 64 * 8}
    out["scan_bytes"] = {
        "pq": int(2000 * cand_per_query * 32),
        "full_vector_equiv": int(2000 * cand_per_query * 512),
        "brute_equiv": int(2000 * n * 512),
    }
    idx.release()

    # ---- 2. recall@10 at the same code budget across variants
    qids = list(range(50))
    exact = similarity_search(big, "embedding", "vec_id", query_ids=qids, k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(int(r["QUERY_ID"]), set()).add(int(r["MATCH_ID"]))

    def recall(residual: bool, rotate: bool) -> float:
        got = similarity_search_ivfpq(
            big, "embedding", "vec_id", qids, k=10, num_centroids=kc,
            nprobe=npr, coarse_iterations=1, m=8, codebook_size=16,
            iterations=1, residual=residual, rotate=rotate,
            rotation_seed=7)
        hits, total = 0, 0
        byq: dict = {}
        for r in got.collect():
            byq.setdefault(int(r["QUERY_ID"]), set()).add(int(r["MATCH_ID"]))
        for q, t in truth.items():
            hits += len(t & byq.get(q, set()))
            total += len(t)
        return round(hits / total, 4)

    for residual in (False, True):
        for rotate in (False, True):
            key = f"recall@10_res={residual}_rot={rotate}"
            t0 = time.time()
            out[key] = recall(residual, rotate)
            print(key, out[key], f"({time.time() - t0:.1f}s)")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
