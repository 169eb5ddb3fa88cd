"""Round-10 late-batch stress: 10× scale-ups for the new analysis ops
(ad-hoc, data not committed — the stress_r5 replication recipe).

- triangle_count on 1× vs 10× circulant graphs (2k → 20k nodes, 3 offsets
  → 6k → 60k undirected edges): oriented-wedge generation should scale
  with Σ outdeg² (bounded by the orientation), i.e. ~linearly in edges for
  a bounded-degree graph — no hub blowup by construction.
- label_propagation (2 rounds) on 1× vs 10× star graphs: per-round cost is
  one edges-by-label join + one (node,label) count — linear in edges.
- hybrid_search shape at 1× vs 10× corpus (documents unioned 10× with
  shifted ids, embeddings likewise): BM25 stats stay ONE broadcast row and
  cosine stays a shuffle-free projection, so wall should track the scan.
- autocorrelation lags [1,2,7] per event_type over 1× vs 10× events: one
  window pass + one decimal-moment aggregate; linear in rows.
- ewma span=8 over 1× vs 10× events: one window pass, linear.

Usage: python tools/stress_r10_late.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rasgoql_spark.functions.graph import label_propagation, triangle_count  # noqa: E402
from rasgoql_spark.functions.relevance import bm25_score, rrf_fuse, vector_score  # noqa: E402
from rasgoql_spark.functions.timeseries import autocorrelation, ewma  # noqa: E402

SF = "/root/testdata/sf0.1"


def timed(label, fn, results):
    t0 = time.time()
    n = fn()
    dt = round(time.time() - t0, 2)
    results[label] = {"rows": n, "sec": dt}
    print(f"{label:42s} {n:>10} rows  {dt:>7.2f}s", flush=True)


def main():
    spark = rql.default_spark(shuffle_partitions=32)
    results: dict = {}

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev10 = ev.crossJoin(spark.range(10).select(F.col("id").alias("__rep")))

    # --- triangle_count: circulant C(n;1,2,3) at n=2k and n=20k ---
    # (ids synthesized directly — the user_id space need not cover n)
    def circulant_range(n):
        base = spark.range(n).select(F.col("id").alias("i"))
        parts = [
            base.select(F.col("i").alias("src"),
                        ((F.col("i") + k) % n).alias("dst"))
            for k in (1, 2, 3)
        ]
        return parts[0].unionAll(parts[1]).unionAll(parts[2])

    timed("triangle_count 1x (2k nodes, 6k edges)",
          lambda: triangle_count(circulant_range(2000), "src", "dst").count(),
          results)
    timed("triangle_count 10x (20k nodes, 60k edges)",
          lambda: triangle_count(circulant_range(20000), "src", "dst").count(),
          results)

    # --- label_propagation: star graphs ---
    def star(n_users):
        return spark.range(n_users).select(
            F.col("id").alias("src"), (1000000 + F.col("id") % 37).alias("dst")
        )

    timed("label_propagation 1x (10k users)",
          lambda: label_propagation(star(10000), "src", "dst", 2).count(),
          results)
    timed("label_propagation 10x (100k users)",
          lambda: label_propagation(star(100000), "src", "dst", 2).count(),
          results)

    # --- hybrid_search shape: 5k docs vs 50k docs ---
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [round(((i * 37) % 64 - 31.5) / 32.0, 6) for i in range(64)]

    def hybrid(d, e):
        def run():
            bm = bm25_score(d, text="text", id_col="doc_id",
                            query=["spark", "query", "window"]
                            ).select("doc_id", "BM25_SCORE")
            j = bm.join(e.select(F.col("vec_id").alias("doc_id"), "embedding"),
                        on="doc_id")
            s = vector_score(j, "embedding", qv).drop("embedding")
            return rrf_fuse(s, "doc_id", ["BM25_SCORE", "QUERY_COSINE"],
                            k=25).count()
        return run

    timed("hybrid_search 1x (5k docs)", hybrid(docs, emb), results)
    rep = spark.range(10).select(F.col("id").alias("__rep"))
    docs10 = docs.crossJoin(rep).withColumn(
        "doc_id", F.col("doc_id") + F.col("__rep") * 1000000).drop("__rep")
    emb10 = emb.crossJoin(rep).withColumn(
        "vec_id", F.col("vec_id") + F.col("__rep") * 1000000).drop("__rep")
    timed("hybrid_search 10x (50k docs)", hybrid(docs10, emb10), results)

    # --- autocorrelation + ewma over events ---
    timed("autocorrelation 1x (100k events)",
          lambda: autocorrelation(ev, "value", ["ts", "event_id"],
                                  [1, 2, 7], ["event_type"]).count(),
          results)
    timed("autocorrelation 10x (1M events)",
          lambda: autocorrelation(
              ev10, "value", ["ts", "event_id", "__rep"], [1, 2, 7],
              ["event_type"]).count(),
          results)
    timed("ewma 1x (100k events)",
          lambda: ewma(ev, "value", ["ts", "event_id"], 0.3,
                       ["user_id"], span=8).count(),
          results)
    timed("ewma 10x (1M events)",
          lambda: ewma(ev10, "value", ["ts", "event_id", "__rep"], 0.3,
                       ["user_id"], span=8).count(),
          results)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def extra_batch():
    """Second late-round batch (run separately: python -c 'import tools.
    stress_r10_late as s; s.extra_batch()') — bm25_join, kcore, hll."""
    import rasgoql_spark as rql
    from pyspark.sql import functions as F

    from rasgoql_spark.functions.graph import kcore
    from rasgoql_spark.functions.relevance import bm25_join
    from rasgoql_spark.functions.sketch import hll_merge, hll_sketch

    spark = rql.default_spark(shuffle_partitions=32)
    results: dict = {}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rep = spark.range(10).select(F.col("id").alias("__rep"))
    docs10 = docs.crossJoin(rep).withColumn(
        "doc_id", F.col("doc_id") + F.col("__rep") * 1000000).drop("__rep")
    qdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark query window", "data pipeline quality",
             "window function aggregate", "distributed join shuffle"] * 5)],
        "query_id BIGINT, query_text STRING")

    timed("bm25_join 1x (5k docs, 20 queries)",
          lambda: bm25_join(docs, "text", "doc_id", qdf, k=10).count(),
          results)
    timed("bm25_join 10x (50k docs, 20 queries)",
          lambda: bm25_join(docs10, "text", "doc_id", qdf, k=10).count(),
          results)

    def kcore_run(n):
        base = spark.range(n).select(F.col("id").alias("i"))
        core = base.select(F.col("i").alias("src"), ((F.col("i") + 1) % n).alias("dst")) \
            .unionAll(base.select(F.col("i"), (F.col("i") + 2) % n))
        pend = base.select(F.col("i").alias("src"), (F.col("i") + 10_000_000).alias("dst"))
        return lambda: kcore(core.unionAll(pend), "src", "dst", k=3,
                             max_iterations=4).count()

    timed("kcore 1x (5k-node core + pendants)", kcore_run(5000), results)
    timed("kcore 10x (50k-node core + pendants)", kcore_run(50000), results)

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev10 = ev.crossJoin(rep)

    def hll_run(frame):
        def run():
            sk = hll_sketch(frame, ["user_id"], group_by=["event_type"],
                            lg_k=14)
            return hll_merge(sk, "USER_ID_SKETCH").count()
        return run

    timed("hll sketch+merge 1x (100k events)", hll_run(ev), results)
    timed("hll sketch+merge 10x (1M events)", hll_run(ev10), results)
    print(json.dumps(results))
