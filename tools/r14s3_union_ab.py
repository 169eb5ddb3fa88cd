"""Same-JVM interleaved A/B for the arithmetic |A∪B| in the Jaccard
verification joins (round-14 session 3): flips dedup._UNION_VIA_SIZES
per round — old builds array_union per candidate pair, new derives
|A∪B| = |A|+|B|−|A∩B| from the staged intersect.

Usage: python tools/r14s3_union_ab.py [rounds] [entry ...]
(entries default to llm_dedup_minhash — pairs mode, verify in the timed
path)
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import rasgoql_spark as rql  # noqa: E402
from rasgoql_spark.functions import dedup  # noqa: E402


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    entries = sys.argv[2:] or ["llm_dedup_minhash"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="union_ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {e: {"old": [], "new": []} for e in entries}
    for e in entries:
        bench.run_one(bench.BENCH_QUERIES[e], spark, sf_dir)  # warm-up
    for r in range(rounds):
        for state in ("old", "new") if r % 2 == 0 else ("new", "old"):
            dedup._UNION_VIA_SIZES = state == "new"
            for e in entries:
                ts = [
                    bench.run_one(bench.BENCH_QUERIES[e], spark, sf_dir)
                    for _ in range(5)
                ]
                out[e][state].append(round(statistics.median(ts), 3))
    dedup._UNION_VIA_SIZES = True
    print(json.dumps({
        e: {
            "old_median": round(statistics.median(v["old"]), 3),
            "new_median": round(statistics.median(v["new"]), 3),
            "old": v["old"], "new": v["new"],
        }
        for e, v in out.items()
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
