"""Stage-time breakdowns for the two creeping bench entries (VERDICT r7
item 4): llm_pii_scrub (1.54x, zero-shuffle regex pipeline, code unchanged
three rounds) and llm_update_ivf_index (1.50x on its first driver reading).

pii_scrub stages:
  - plan_build      : Python chain construction + Catalyst analysis only
                      (tests the "re-planned per run" hypothesis)
  - scan_apply      : parquet scan + the _PII_APPLY concat projection
  - full_pii        : + the 3-stage regexp_count/replace scrub
  The scrub marginal cost = full_pii - scan_apply; if plan_build is a
  meaningful fraction of full_pii the drift is analysis overhead, not regex.

update_ivf_index stages (base index over 90% built once, untimed):
  - batch_assign    : normalize + centroid argmax on the 10% batch only
  - base_scan       : re-read of the persisted base index frame
  - full_update     : the real operator (union + scoped_persist + eager
                      count) — the delta over batch_assign + base_scan is
                      the union materialization / re-cache cost

Writes bench/results/creep_breakdown.json and prints one JSON line.
Usage: python tools/profile_creep.py [repeats]   (default 5, median after
1 warm-up, same protocol as bench.py). Honors SPARK_GRAFT_SF_DIR/_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rasgoql_spark as rql  # noqa: E402


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="creep_profile", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn, materialize=noop):
        runs = []
        for i in range(repeats + 1):
            t0 = time.time()
            out = fn()
            if materialize is not None:
                materialize(out)
            el = time.time() - t0
            if i > 0:  # first run is the warm-up
                runs.append(el)
        return round(statistics.median(runs), 3)

    # ---- pii_scrub ------------------------------------------------------
    def build_full():
        return entry.q_pii_scrub(spark, sf_dir)

    def build_scan_apply():
        return entry._s(spark, sf_dir).dataset("documents").apply(
            sql=entry._PII_APPLY).df

    pii = {
        # schema touch forces full analysis without running a job
        "plan_build": timed(build_full, materialize=lambda df: df.schema),
        "scan_apply": timed(build_scan_apply),
        "full_pii": timed(build_full),
    }
    pii_deltas = {
        "scrub_marginal_cost": round(pii["full_pii"] - pii["scan_apply"], 3),
        "plan_build_fraction": round(pii["plan_build"] / pii["full_pii"], 3),
    }

    # ---- update_ivf_index -----------------------------------------------
    from rasgoql_spark.functions.similarity import (  # noqa: E402
        _argmax_cid,
        _attach_centroids,
        _with_normalized,
        ivf_index,
        update_ivf_index,
    )
    from pyspark.sql import functions as F  # noqa: E402

    emb = entry._s(spark, sf_dir).dataset("embeddings").df
    base = ivf_index(emb.filter("vec_id % 10 != 0"), "embedding", "vec_id")
    batch = emb.filter("vec_id % 10 = 0")
    cols = ["__id", "__nvec", "CENTROID_ID"]

    def assign_only():
        nbase = _with_normalized(
            batch.select(F.col("vec_id").alias("__id"),
                         F.col("embedding").alias("__vec")),
            "__vec")
        abase, carr, adrop = _attach_centroids(nbase, base.centroids)
        return abase.withColumn("CENTROID_ID", _argmax_cid(carr)) \
            .drop(*adrop).select(*cols)

    def base_scan():
        return base.frame.select(*cols)

    updated_holder = []

    def full_update():
        if updated_holder:
            updated_holder.pop().release()
        out = update_ivf_index(base, batch, "embedding", "vec_id")
        updated_holder.append(out)
        return out.frame

    ivf = {
        "batch_assign": timed(assign_only),
        "base_scan": timed(base_scan),
        # update_ivf_index already materializes eagerly (count inside);
        # timing the call itself is the operator's real per-batch cost
        "full_update": timed(full_update, materialize=None),
    }
    ivf_deltas = {
        "union_persist_cost": round(
            ivf["full_update"] - ivf["batch_assign"] - ivf["base_scan"], 3),
    }
    while updated_holder:
        updated_holder.pop().release()
    base.release()

    result = {
        "metric": "creep_breakdown",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "repeats": repeats,
        "pii_scrub": {"stages": pii, "deltas": pii_deltas},
        "update_ivf_index": {"stages": ivf, "deltas": ivf_deltas},
    }
    os.makedirs("bench/results", exist_ok=True)
    with open("bench/results/creep_breakdown.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
