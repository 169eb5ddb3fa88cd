"""Round-14: measure + dump plans for the NON-BENCH graph entries.

The round-13 verdict's top order is porting pagerank's fused-build /
cache-discipline work to connected_components, label_propagation and
kcore — none of which has a bench entry, so this tool applies the bench
protocol (1 warm-up + 5 timed noop saves, median) to the `queries()`
entries directly, and can dump their `.explain("formatted")`.

Usage:
  python tools/r14_graph.py time  [entry ...]        # default: graph set
  python tools/r14_graph.py plans before|after [entry ...]

Timing runs at sf0.1 (bench scale); plans too.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
import rasgoql_spark as rql  # noqa: E402

GRAPH = ["connected_components", "label_propagation", "kcore",
         "pagerank", "triangle_count"]


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        tag, names = sys.argv[2], (sys.argv[3:] or GRAPH)
    else:
        tag, names = "", (sys.argv[2:] or GRAPH)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="r14_graph", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if mode == "plans":
        os.makedirs("plans/r14", exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            p = f"plans/r14/{name}_{tag}.txt"
            with open(p, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            print("wrote", p)
        return 0
    out = {}
    for name in names:
        fn = qs[name]

        def run_one() -> float:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        run_one()  # warm-up
        times = [run_one() for _ in range(5)]
        out[name] = {"median": round(statistics.median(times), 3),
                     "times": [round(t, 3) for t in times]}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
