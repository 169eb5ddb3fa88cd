"""Plan-construction vs execution split for every bench entry: times
fn(spark, sf) + .schema (chain build, Catalyst analysis, and any inline
driver-coordinated actions — kmeans/IVF fits, label-propagation rounds,
collapse pre-counts) separately from the noop-sink execution. The round-8
_litfast/memo work eliminated the pure py4j construction tax; what remains
in the build column for the IVF/kmeans/pagerank entries is genuine
algorithm work (bounded collects and iterative actions), which this
artifact documents so future drift is attributable.

Writes bench/results/build_exec_split.json and prints one JSON line.
Usage: python tools/profile_build_exec.py [repeats]
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
    # first iteration is the warm-up, so at least 2 are needed for a median
    repeats = max(2, int(sys.argv[1]) if len(sys.argv) > 1 else 3)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="build_exec_split", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    out = {}
    for name, fn in bench.BENCH_QUERIES.items():
        builds, execs = [], []
        for i in range(repeats):
            t0 = time.time()
            df = fn(spark, sf)
            df.schema
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            if i:  # first is warm-up
                builds.append(t1 - t0)
                execs.append(t2 - t1)
        out[name] = {
            "build_sec": round(statistics.median(builds), 3),
            "exec_sec": round(statistics.median(execs), 3),
        }
    result = {"metric": "build_exec_split", "sf_dir": sf, "cpus": cpus,
              "repeats": repeats, "queries": out}
    os.makedirs("bench/results", exist_ok=True)
    with open("bench/results/build_exec_split.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
