"""Same-JVM interleaved A/B for the round-14 selective filter-mode input
cache (decontaminate + dedup_minhash, session 3).

OLD state is emulated in-process by monkeypatching the modules' imported
``cheap_to_recompute``: decontaminate OLD never persisted its input
(helper forced True), dedup_minhash OLD always persisted (helper forced
False). NEW state restores the real helper. States alternate per round so
host drift cancels — the same protocol as the r14 language-id flag flip.

Usage: python tools/r14s3_cache_ab.py [rounds] [entry ...]
(entries default to llm_pipeline_e2e + the two null controls)
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
from rasgoql_spark.functions import _cache, curation, dedup  # noqa: E402

ENTRIES = ["llm_pipeline_e2e", "llm_decontaminate", "llm_dedup_minhash"]


def set_state(new: bool) -> None:
    if new:
        curation.cheap_to_recompute = _cache.cheap_to_recompute
        dedup.cheap_to_recompute = _cache.cheap_to_recompute
    else:
        curation.cheap_to_recompute = lambda df: True   # old: never persist
        dedup.cheap_to_recompute = lambda df: False     # old: always persist


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    entries = sys.argv[2:] or ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="cache_ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {e: {"old": [], "new": []} for e in entries}
    for e in entries:
        bench.run_one(bench.BENCH_QUERIES[e], spark, sf_dir)  # warm-up
    for r in range(rounds):
        for state in ("old", "new") if r % 2 == 0 else ("new", "old"):
            set_state(state == "new")
            for e in entries:
                ts = [
                    bench.run_one(bench.BENCH_QUERIES[e], spark, sf_dir)
                    for _ in range(5)
                ]
                out[e][state].append(round(statistics.median(ts), 3))
    set_state(True)
    summary = {
        e: {
            "old_median": round(statistics.median(v["old"]), 3),
            "new_median": round(statistics.median(v["new"]), 3),
            "old": v["old"],
            "new": v["new"],
        }
        for e, v in out.items()
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
