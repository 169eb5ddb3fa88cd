"""Ground llm_pagerank (round-13 verdict task #5).

llm_pagerank read 1.49x of its 5.448 s baseline on the clean closing runs
of BOTH round 10 and round 12 (8.099 s in r12_local_final.json) with
graph.py untouched — the last entry still adjudicated as "host variance"
without a stage-level artifact. Protocol (the profile_dedup_embedding
pattern, all at $SPARK_GRAFT_SF_DIR default sf0.1, local[32]):

  A. calibrate() anchor — host-speed reference (bench.py frozen workload).
  B. COLD CURVE: 12 consecutive runs of the exact bench entry in this
     fresh process — if JIT warmth is the story the curve decays and
     flattens near the baseline.
  C. STAGE BREAKDOWN at steady state (median of 5 each):
       - edges:       the apply() edge projection + dropDuplicates
       - invariant:   + node set, outdeg pre-join, dangling set (the
                      loop-invariant builds pagerank pays once)
       - pagerank:    the full 3-iteration rank loop, NO terminal sort
       - full entry:  + the terminal global order(NODE) (q_pagerank)
     Increments attribute cost to (iterations) = pagerank - invariant and
     (terminal sort) = full - pagerank.
  D. WARM-CONTEXT EMULATION: run 3 unrelated bench entries first (the
     protocol the baseline was recorded under), then median-of-5 of the
     full entry.

Findings land in bench/results/pagerank_breakdown.json and BASELINE.md's
round-13 grounding note.
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


def _med(fn, n=5):
    return round(statistics.median([fn() for _ in range(n)]), 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="profile_pagerank", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    # A. host anchor
    out["calib_sec"] = bench.calibrate(spark, sf_dir)

    # B. cold curve of the exact bench entry
    curve = [round(bench.run_one(entry.q_pagerank, spark, sf_dir), 3)
             for _ in range(12)]
    out["cold_curve"] = curve
    out["steady_median_of_last5"] = round(statistics.median(curve[-5:]), 3)

    # C. stage breakdown (reconstructs q_pagerank's frames stepwise with
    # the same expressions; pagerank() itself is used for the rank loop)
    from rasgoql_spark.functions.graph import pagerank

    def edges_frame():
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        return (
            li.select(F.col("l_partkey").alias("src"),
                      (F.lit(200000) + F.col("l_suppkey")).alias("dst"))
            .dropDuplicates(["src", "dst"])
        )

    def t_edges():
        return _noop(edges_frame())

    def t_invariant():
        e = edges_frame()
        t0 = time.time()
        ed = e.persist()
        nodes = (ed.select(F.col("src").alias("n"))
                 .union(ed.select("dst")).dropDuplicates(["n"]).persist())
        nodes.count()
        outdeg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        ed.join(outdeg, on="src").write.format("noop").mode("overwrite").save()
        nodes.join(outdeg, nodes["n"] == outdeg["src"], "left_anti")\
            .write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        nodes.unpersist(); ed.unpersist()
        return dt

    def t_pagerank():
        # construction INSIDE the timer — pagerank() materializes its
        # loop-invariant persists + node count eagerly while building
        t0 = time.time()
        pagerank(edges_frame(), "src", "dst", damping=0.85, iterations=3)\
            .write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def t_full():
        return bench.run_one(entry.q_pagerank, spark, sf_dir)

    out["stage_edges"] = _med(t_edges)
    out["stage_invariant"] = _med(t_invariant)
    out["stage_pagerank_noorder"] = _med(t_pagerank)
    out["stage_full_entry"] = _med(t_full)
    out["incr_iterations"] = round(
        out["stage_pagerank_noorder"] - out["stage_invariant"], 3)
    out["incr_terminal_sort"] = round(
        out["stage_full_entry"] - out["stage_pagerank_noorder"], 3)

    # D. warm-context emulation (3 unrelated entries first, as in the
    # full bench where ~30 entries precede llm_pagerank)
    for warm in (entry.q_aggregate, entry.q_join_agg, entry.q_rolling_agg):
        bench.run_one(warm, spark, sf_dir)
    out["warm_context_median"] = _med(t_full)

    out["calib_sec_end"] = bench.calibrate(spark, sf_dir)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "results",
        "pagerank_breakdown.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
