"""Round-14 session 3: paired jobs/time A/B for the selective
filter-mode input cache — runs llm_pipeline_e2e twice per state
(old = decontaminate never persists / minhash always persists, new =
the shipped cheap_to_recompute heuristic) and attributes jobs via the
UI REST API. Usage: python tools/r14s3_jobs_ab.py"""
import json, os, sys, urllib.request
sys.path.insert(0, "/root/repo")
import bench
from rasgoql_spark.functions import _cache, curation, dedup
from pyspark.sql import SparkSession
cpus = 32
spark = (SparkSession.builder.appName("jobs_ab").master(f"local[{cpus}]")
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
    .getOrCreate())
sc = spark.sparkContext; sc.setLogLevel("ERROR")
def _api(path):
    with urllib.request.urlopen(f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/{path}", timeout=10) as r:
        return json.load(r)
def set_state(new):
    curation.cheap_to_recompute = _cache.cheap_to_recompute if new else (lambda df: True)
    dedup.cheap_to_recompute = _cache.cheap_to_recompute if new else (lambda df: False)
fn = bench.BENCH_QUERIES["llm_pipeline_e2e"]
sf = "/root/testdata/sf0.1"
for label, new in (("old", False), ("new", True), ("old2", False), ("new2", True)):
    set_state(new)
    bench.run_one(fn, spark, sf)  # warm (state change -> fresh plans anyway)
    before = {j["jobId"] for j in _api("jobs")}
    t = bench.run_one(fn, spark, sf)
    jobs = [j for j in _api("jobs") if j["jobId"] not in before]
    print(label, "jobs:", len(jobs), "sec:", round(t, 3))
