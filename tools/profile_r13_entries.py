"""Round-13 optimization round: per-entry stage attribution.

For each named bench entry, runs the bench protocol (1 warm-up + N timed)
inside a dedicated job group, then pulls the local UI's REST API to
attribute the timed window to stages: per-stage executorRunTime,
shuffle read/write bytes, task counts, and the job count per run.
The gap between wall time and summed task time / cores is scheduler +
driver + planning overhead — at sf0.1 that split decides whether an entry
needs algorithmic work (task time) or plan-shape work (job/stage count).

Usage:
  python tools/profile_r13_entries.py llm_pipeline_e2e llm_language_id_model
  (no args = the round-13 hot list)

Writes bench/results/r13_profile.json (merges previous runs' entries).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import rasgoql_spark as rql  # noqa: E402

HOT = [
    "llm_pipeline_e2e",
    "llm_embedding_join_ivfpq",
    "llm_language_id_model",
    "llm_similarity_ivfpq",
    "llm_pagerank",
    "llm_embedding_join_ivfpq_prebuilt",
    "llm_bigram_logprob",
    "llm_ngram_containment",
    "llm_similarity_ivfpq_prebuilt",
    "llm_dedup_ivfpq_prebuilt",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> int:
    names = sys.argv[1:] or HOT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # default_spark but with the UI on (the REST API is the stage source)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("profile_r13")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep session parity with default_spark's round-13 confs — the
        # profile must measure the engine as the bench runs it
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
    assert rql  # session parity documented above; rql kept for bench import
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    base = sc.uiWebUrl
    app_id = sc.applicationId
    out: dict = {"sf_dir": sf_dir, "cpus": cpus,
                 "calib_sec": bench.calibrate(spark, sf_dir), "entries": {}}
    for name in names:
        fn = bench.BENCH_QUERIES[name]
        bench.run_one(fn, spark, sf_dir)  # warm-up (index builds live here)
        sc.setJobGroup(f"prof:{name}", name)
        jobs_before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
        times = [bench.run_one(fn, spark, sf_dir) for _ in range(5)]
        sc.setJobGroup("", "")
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
        per_stage = {}
        for s in stages:
            key = s["name"]
            d = per_stage.setdefault(key, {"n": 0, "run_ms": 0, "cpu_ms": 0,
                                           "sh_r_mb": 0.0, "sh_w_mb": 0.0,
                                           "tasks": 0})
            d["n"] += 1
            d["run_ms"] += s.get("executorRunTime", 0)
            d["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
            d["sh_r_mb"] += round(s.get("shuffleReadBytes", 0) / 1e6, 2)
            d["sh_w_mb"] += round(s.get("shuffleWriteBytes", 0) / 1e6, 2)
            d["tasks"] += s.get("numTasks", 0)
        total_run = sum(d["run_ms"] for d in per_stage.values())
        entry = {
            "median_sec": round(statistics.median(times), 3),
            "times": [round(t, 3) for t in times],
            "jobs_per_run": round(len(jobs) / 5.0, 1),
            "stages_per_run": round(len(stages) / 5.0, 1),
            "sum_task_run_sec": round(total_run / 1000.0, 2),
            "task_sec_per_core_per_run": round(total_run / 1000.0 / cpus / 5, 3),
            "top_stages": sorted(
                ({"name": k[:100], **v} for k, v in per_stage.items()),
                key=lambda d: -d["run_ms"])[:12],
        }
        out["entries"][name] = entry
        print(json.dumps({name: {k: entry[k] for k in (
            "median_sec", "jobs_per_run", "stages_per_run",
            "sum_task_run_sec")}}), flush=True)
    out["calib_sec_end"] = bench.calibrate(spark, sf_dir)
    path = "bench/results/r13_profile.json"
    merged = out
    if os.path.exists(path):
        try:
            prev = json.load(open(path))
            prev["entries"].update(out["entries"])
            prev["calib_sec_end"] = out["calib_sec_end"]
            merged = prev
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
