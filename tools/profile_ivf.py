"""Stage-time breakdown for the llm_similarity_ivf bench query (VERDICT r6
item 3: 2.83s r4 → 4.23s r5 → 5.18s r6 with an unchanged plan): separates
normalize+persist / auto-k count / seed collect / Lloyd pass / final
assignment / probe+score+top-k so the drifting total can be attributed to a
stage. Also A/Bs the r6 fixed sizing (k=16, nprobe=4) against the r7 auto
sizing (k=ceil(sqrt(n)), nprobe=ceil(sqrt(k))) and measures the
prebuilt-index search alone (the amortized production path). Writes
bench/results/ivf_breakdown.json and prints one JSON line.

Usage: python tools/profile_ivf.py [repeats]
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

QIDS = [0, 1, 2, 3, 4]


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="ivf_profile", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rasgoql_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    stages: dict[str, list[float]] = {}

    def record(name, fn):
        stages.setdefault(name, []).append(timed(fn))

    for it in range(repeats + 1):  # first iteration = warm-up, dropped
        # ---- stage breakdown of the inline build (auto sizing) ----
        cached = sim._with_normalized(
            emb.select(F.col("vec_id").alias("__id"),
                       F.col("embedding").alias("__vec")), "__vec"
        ).persist()
        n = [0]
        record("normalize_persist_count", lambda: n.__setitem__(0, cached.count()))
        k = sim._resolve_k("auto", n[0])
        seeds_box = [None]
        record("seed_collect", lambda: seeds_box.__setitem__(
            0, cached.orderBy("__id").limit(k).select("__nvec").collect()))
        cents = [(j, list(r["__nvec"])) for j, r in enumerate(seeds_box[0])]

        def lloyd():
            abase, carr, _ = sim._attach_centroids(cached, cents)
            assigned = abase.withColumn("__cid", sim._argmax_cid(carr))
            (assigned.select("__cid", F.posexplode("__nvec").alias("__pos", "__v"))
             .groupBy("__cid", "__pos").agg(F.avg("__v").alias("__m")).collect())

        record("lloyd_pass", lloyd)

        def final_assign():
            fbase, fcarr, fdrop = sim._attach_centroids(cached, cents)
            noop(fbase.withColumn("CENTROID_ID", sim._argmax_cid(fcarr)).drop(*fdrop))

        record("final_assignment", final_assign)
        cached.unpersist()

        # ---- end-to-end variants ----
        record("e2e_auto", lambda: noop(sim.similarity_search_ivf(
            emb, "embedding", "vec_id", QIDS, k=10)))
        record("e2e_fixed_k16", lambda: noop(sim.similarity_search_ivf(
            emb, "embedding", "vec_id", QIDS, k=10,
            num_centroids=16, nprobe=4)))

        # ---- amortized path: search against a prebuilt index ----
        if it == 0:
            idx = sim.ivf_index(emb, "embedding", "vec_id")
        record("search_prebuilt", lambda: noop(sim.similarity_search_ivf(
            emb, "embedding", "vec_id", QIDS, k=10, index=idx)))

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n": n[0],
        "auto_k": k,
        "repeats": repeats,
        "stages_sec": {
            name: round(statistics.median(ts[1:]), 3)
            for name, ts in stages.items()
        },
        "all_runs": {name: [round(t, 3) for t in ts] for name, ts in stages.items()},
    }
    os.makedirs("bench/results", exist_ok=True)
    with open("bench/results/ivf_breakdown.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["stages_sec"] | {"auto_k": k, "n": n[0]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
