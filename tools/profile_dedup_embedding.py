"""Ground llm_dedup_against_embedding (round-11 verdict task #3).

The round-11 adjudication left this entry `weak`: the driver read 3.646 s
(5.81x of the 0.628 s baseline) and even the judge's SOLO idle re-measures
read 0.923-1.080 s (1.5-1.7x) with code untouched since round 9. This tool
separates the three candidate explanations:

1. JVM/JIT warmth position effect — the 0.628 s baseline was a "first
   clean-run timing" recorded IN-CONTEXT of a full bench run (round 7,
   BASELINE.md:286), i.e. after ~25 entries had fully warmed the JVM; a
   solo re-measure runs the same plan on a near-cold JIT.
2. A real plan/stage regression — some stage (scan, normalize, broadcast,
   cross-score) got slower since r9.
3. Host drift — ruled in/out by the calibrate() anchor reading.

Protocol (all at $SPARK_GRAFT_SF_DIR, default sf0.1, local[32]):
  A. calibrate() anchor (host-speed reference, bench.py's frozen workload).
  B. COLD CURVE: 14 consecutive runs of the exact bench entry in a fresh
     process, each timed — if warmth is the story, the curve decays from
     ~1 s toward the baseline and flattens.
  C. STAGE BREAKDOWN at steady state (median of 5 each):
       - batch scan + filter + normalize  -> noop
       - reference scan + filter + normalize -> noop
       - full entry (adds broadcast + cross-score + threshold filter)
     The cross-score increment is (full - ref_normalize) since the
     reference side dominates the streamed work.
  D. WARM-CONTEXT EMULATION: run 3 unrelated bench entries first (like the
     full bench does), then the entry median-of-5 — the protocol the
     baseline was actually recorded under.

Findings land in BASELINE.md's round-12 grounding note.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
import bench  # noqa: E402
import rasgoql_spark as rql  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="profile_dedup_embedding", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    # A. host anchor
    out["calib_sec"] = bench.calibrate(spark, sf_dir)

    # B. cold curve (fresh-process consecutive runs of the exact entry)
    fn = entry.q_dedup_against_embedding
    curve = [round(_noop(fn(spark, sf_dir)), 3) for _ in range(14)]
    out["cold_curve"] = curve
    out["cold_first"] = curve[0]
    out["steady_median"] = round(statistics.median(curve[-5:]), 3)

    # C. stage breakdown at steady state
    from rasgoql_spark.functions.similarity import _with_normalized

    def batch_norm():
        d = entry._s(spark, sf_dir).dataset("embeddings").filter(
            filter_statements=["vec_id >= 450"]).df
        return _with_normalized(
            d.select(F.col("vec_id").alias("__qid"),
                     F.col("embedding").alias("__qvec")),
            "__qvec", "__qn").select("__qid", "__qn")

    def ref_norm():
        d = entry._s(spark, sf_dir).dataset("embeddings").filter(
            filter_statements=["vec_id < 450"]).df
        return _with_normalized(
            d.select(F.col("vec_id").alias("__rid"),
                     F.col("embedding").alias("__rvec")),
            "__rvec", "__rn").select("__rid", "__rn")

    stages = {}
    for name, maker in (("batch_normalize", batch_norm),
                        ("ref_normalize", ref_norm),
                        ("full_entry", lambda: fn(spark, sf_dir))):
        _noop(maker())  # stage warm-up
        stages[name] = round(statistics.median(
            [_noop(maker()) for _ in range(5)]), 3)
    stages["cross_score_increment"] = round(
        stages["full_entry"] - stages["ref_normalize"], 3)
    out["stages"] = stages

    # D. warm-context emulation (the protocol the baseline was recorded
    # under: entry timed mid-run of a full bench process)
    for warm in ("b1_filter_project", "b3_join_agg", "llm_text_quality"):
        bench.run_one(bench.BENCH_QUERIES[warm], spark, sf_dir)
    bench.run_one(fn, spark, sf_dir)
    out["warm_context_median"] = round(statistics.median(
        [bench.run_one(fn, spark, sf_dir) for _ in range(5)]), 3)

    out["baseline_sec"] = 0.628
    out["host_factor"] = round(out["calib_sec"] / 0.285, 3)
    out["steady_ratio"] = round(out["steady_median"] / 0.628, 3)
    out["warm_context_ratio"] = round(out["warm_context_median"] / 0.628, 3)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
