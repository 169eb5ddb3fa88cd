"""Round-9 grounding for the two r8 VERDICT watch entries.

(1) llm_ngram_containment read 4.842s in BENCH_r08 vs 3.531s in r07 on
    UNCHANGED code (verified via git log -L in the r8 verdict) — the
    demanded treatment is a stage breakdown (signature/collapse build vs
    posting + candidate join vs full verify) plus a same-session spread,
    so the r9 record can be attributed to a stage or to load rather than
    guessed at.
(2) llm_similarity_ivfpq_prebuilt read 1.25x of its just-recorded
    baseline on its first driver reading. bench.py builds the index in
    the WARM-UP call (bench.py run_one before the timed loop), so the
    median-of-5 times search only — this harness replicates that
    structure and prints the per-run spread to bound the entry's
    variance band.

Writes bench/results/r9_watch.json and prints one JSON line.
Usage: python tools/profile_r9_watch.py [repeats]   (default 7)
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="r9_watch_profile", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    from rasgoql_spark.functions import dedup as dd
    from rasgoql_spark.operators._util import spread
    from rasgoql_spark.functions.dedup import shingles_expr, tokens_expr

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def times_of(mk, n=repeats):
        noop(mk())  # warm-up
        out = []
        for _ in range(n):
            t0 = time.time()
            noop(mk())
            out.append(round(time.time() - t0, 3))
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # --- (1) ngram_containment stage breakdown (bench args: thr .5, cap 5)
    def sig_stage():
        cached_sig, has_dups, caches = dd._annotate_groups(
            spread(docs)
            .select(F.col("doc_id").alias("__id"),
                    tokens_expr(F.col("text")).alias("__t"))
            .select("__id", shingles_expr(F.col("__t"), 3).alias("__sh")),
            F.md5(F.concat_ws("\x1f", F.array_sort("__sh"))),
            F.size("__sh") > 0,
            probe_key=F.hash(F.array_sort("__sh")),
        )
        return cached_sig.filter(
            F.col("__id") == F.col("__rep")
        ).select("__id", "__sh")

    def cand_stage():
        rep_sig = sig_stage()
        inv, _live = dd._capped_postings(rep_sig, 5)
        left = inv.select(F.col("__id").alias("__id_a"), "__s")
        right = inv.select(F.col("__id").alias("__id_b"), "__s")
        return (
            left.join(right, on="__s")
            .filter(F.col("__id_a") < F.col("__id_b"))
            .select("__id_a", "__id_b")
            .dropDuplicates(["__id_a", "__id_b"])
        )

    full = lambda: entry.q_ngram_containment(spark, sf_dir)  # noqa: E731
    report: dict = {"sf_dir": sf_dir, "cpus": cpus, "repeats": repeats}
    report["ngram_sig_stage"] = times_of(sig_stage)
    report["ngram_cand_stage"] = times_of(cand_stage)
    report["ngram_full"] = times_of(full)

    # --- (2) ivfpq prebuilt: fit once (the bench warm-up analog), then
    # time search-only runs
    from rasgoql_spark.functions.pq import ivfpq_index, similarity_search_ivfpq

    emb = entry._s(spark, sf_dir).dataset("embeddings").df
    t0 = time.time()
    idx = ivfpq_index(
        emb, "embedding", "vec_id", num_centroids=16, coarse_iterations=1,
        m=8, codebook_size=16, iterations=1,
    )
    report["ivfpq_index_build"] = round(time.time() - t0, 3)
    report["ivfpq_prebuilt_search"] = times_of(
        lambda: similarity_search_ivfpq(
            emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=10, nprobe=4,
            index=idx,
        )
    )
    idx.release()
    for k in ("ngram_sig_stage", "ngram_cand_stage", "ngram_full",
              "ivfpq_prebuilt_search"):
        report[f"{k}_median"] = round(statistics.median(report[k]), 3)
    os.makedirs("bench/results", exist_ok=True)
    with open("bench/results/r9_watch.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
