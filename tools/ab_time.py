"""Minimal solo-entry timer for A/B experiments (round 13).

Runs the named bench entries with the exact bench protocol (1 warm-up +
5 timed noop saves, median) in one default_spark session — no UI, no
calibration loops — and prints one JSON line. For A/B runs interleave
invocations of the two code states so host drift cancels.

Usage: python tools/ab_time.py llm_similarity_ivfpq llm_embedding_join_ivfpq
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import rasgoql_spark as rql  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="ab_time", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = bench.BENCH_QUERIES[name]
        bench.run_one(fn, spark, sf_dir)  # warm-up (one-off index builds)
        times = [bench.run_one(fn, spark, sf_dir) for _ in range(5)]
        out[name] = {
            "median": round(statistics.median(times), 3),
            "times": [round(t, 3) for t in times],
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
