"""Round-14: job/stage attribution for one non-bench entry (default
connected_components) via the local UI REST API — same split as
tools/profile_r13_entries.py but for `queries()` entries without a bench
registration.

Usage: python tools/r14_profile_cc.py [entry] [n_runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "connected_components"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # default_spark's exact confs, plus the UI (the REST API is the source) —
    # same parity block as tools/profile_r13_entries.py
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("r14_profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "64MB")
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "5000")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    fn = entry.queries()[name]

    def run_one() -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run_one()  # warm-up
    jobs_before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
    times = [run_one() for _ in range(n_runs)]
    jobs = [j for j in _api(base, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = []
    for sid in stage_ids:
        try:
            for att in _api(base, f"applications/{app_id}/stages/{sid}"):
                stages.append(att)
        except Exception:
            pass
    rows = [
        {
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "run_ms": s.get("executorRunTime", 0),
            "tasks": s.get("numCompleteTasks", 0),
            "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
        }
        for s in stages
    ]
    rows.sort(key=lambda r: -r["run_ms"])
    print(
        json.dumps(
            {
                "entry": name,
                "median_sec": round(statistics.median(times), 3),
                "times": [round(t, 3) for t in times],
                "jobs_per_run": len(jobs) / n_runs,
                "stages_per_run": len(rows) / n_runs,
                "sum_task_run_sec": round(
                    sum(r["run_ms"] for r in rows) / 1000, 2
                ),
                "top_stages": rows[:15],
            },
            indent=1,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
