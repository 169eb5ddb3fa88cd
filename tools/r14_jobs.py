"""Round-14: one-run job attribution for a bench entry — lists every job
in the run with its description/callsite and stage names, to find which
construction-time actions (probes, cache materializations) own the job
count. Usage: python tools/r14_jobs.py [entry]"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _api(base, app, path):
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}",
                                timeout=10) as r:
        return json.load(r)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "llm_pipeline_e2e"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.appName("r14_jobs").master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "5000")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    fn = bench.BENCH_QUERIES[name]
    bench.run_one(fn, spark, sf_dir)  # warm-up
    base, app = sc.uiWebUrl, sc.applicationId
    before = {j["jobId"] for j in _api(base, app, "jobs")}
    bench.run_one(fn, spark, sf_dir)
    jobs = sorted((j for j in _api(base, app, "jobs")
                   if j["jobId"] not in before), key=lambda j: j["jobId"])
    for j in jobs:
        desc = (j.get("description") or j["name"])[:110]
        print(f'{j["jobId"]:>5} stages={len(j["stageIds"]):>2} '
              f'tasks={j.get("numTasks", 0):>4}  {desc}')
    print(f"total jobs: {len(jobs)}")


if __name__ == "__main__":
    main()
