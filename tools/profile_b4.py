"""Stage-time breakdown for the b4_window_chain bench query (VERDICT r7
item 3): the r7 driver reading was 2.983s = 2.49x baseline while bench.py
and operators/windows.py were unchanged since r1, so the breakdown separates
scan+datetrunc / + aggregate (2 exchanges) / + full window chain (1 more
exchange + sort) to attribute any drift to a stage instead of guessing.
The physical plan (pinned in tests/test_plans.py) is already minimal: ONE
Window node evaluates all 3 lags + the moving average over the shared
(l_partkey, L_SHIPDATE_WEEK) spec — 2 exchanges and 1 sort total.

Writes bench/results/b4_breakdown.json and prints one JSON line.

Usage: python tools/profile_b4.py [repeats]
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py.
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
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="b4_profile", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    import __spark_entry__ as entry

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def chain(upto: str):
        s = entry._s(spark, sf_dir)
        ds = s.dataset("lineitem").datetrunc(dates={"l_shipdate": "week"})
        if upto == "datetrunc":
            return ds.df
        ds = ds.aggregate(group_by=["l_partkey", "L_SHIPDATE_WEEK"],
                          aggregations={"l_extendedprice": ["SUM"]})
        if upto == "aggregate":
            return ds.df
        ds = ds.lag(columns=["L_EXTENDEDPRICE_SUM"], amounts=[1, 2, 3],
                    order_by=["L_SHIPDATE_WEEK"], partition=["l_partkey"])
        if upto == "lag":
            return ds.df
        return ds.moving_avg(
            input_columns=["L_EXTENDEDPRICE_SUM"], window_sizes=[4],
            order_by=["L_SHIPDATE_WEEK"], partition=["l_partkey"]).df

    stages = {
        # row-local scan + date_trunc projection (no shuffle)
        "scan_datetrunc": lambda: noop(chain("datetrunc")),
        # + the 2-exchange partial/final aggregate
        "plus_aggregate": lambda: noop(chain("aggregate")),
        # + the l_partkey re-exchange, sort, and 3 lag columns
        "plus_lag": lambda: noop(chain("lag")),
        # the full bench query (the moving avg rides the SAME window
        # exchange+sort, so this should cost ~the same as plus_lag)
        "full_b4": lambda: noop(bench._b4_window_chain(spark, sf_dir)),
    }
    out: dict[str, float] = {}
    for name, fn in stages.items():
        fn()  # warm-up
        times = [  # noqa: C416
            (lambda t0=time.time(): (fn(), time.time() - t0)[1])()
            for _ in range(repeats)
        ]
        out[name] = round(statistics.median(times), 3)
    deltas = {
        "aggregate_cost": round(out["plus_aggregate"] - out["scan_datetrunc"], 3),
        "window_exchange_sort_lag_cost": round(out["plus_lag"] - out["plus_aggregate"], 3),
        "moving_avg_marginal_cost": round(out["full_b4"] - out["plus_lag"], 3),
    }
    rec = {"metric": "b4_breakdown", "sf_dir": sf_dir, "cpus": cpus,
           "repeats": repeats, "stages": out, "deltas": deltas}
    os.makedirs("bench/results", exist_ok=True)
    with open("bench/results/b4_breakdown.json", "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
