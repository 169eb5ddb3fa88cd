"""Ground llm_dedup_ivfpq_prebuilt (round-13 watch entry).

The entry read 2.24x in the round-13 full-set record and 2.5/2.2x on two
solo runs whose calib starts read 1.413/0.43 (loaded box). This tool
records the same protocol as profile_pagerank: host anchor, a 12-run
cold curve of the exact bench entry (prebuilt index paid in run 1), a
steady-state median, and the end anchor — enough to separate JIT ramp +
host drift from a real plan regression. Artifact:
bench/results/ivfpq_dedup_curve.json.

First recorded run (2026-08-17, box with transient load): calib 0.671,
curve [18.78, 6.832, 7.316, 9.666, 7.013, 3.895, 3.745, 2.932, 2.721,
3.423, 3.314, 2.354], calib_end 0.212 — the pagerank signature (deep
multi-stage JIT ramp; steady state 2.4-3.4 s vs the 1.321 s baseline
with host_factor ~1.3 at the end anchor).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import rasgoql_spark as rql  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="profile_ivfpq_dedup", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}
    out["calib_sec"] = bench.calibrate(spark, sf_dir)
    fn = bench.BENCH_QUERIES["llm_dedup_ivfpq_prebuilt"]
    curve = [round(bench.run_one(fn, spark, sf_dir), 3) for _ in range(12)]
    out["cold_curve"] = curve  # run 1 pays the one-off index build
    out["steady_median_of_last5"] = round(statistics.median(curve[-5:]), 3)
    out["calib_sec_end"] = bench.calibrate(spark, sf_dir)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "results",
        "ivfpq_dedup_curve.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
