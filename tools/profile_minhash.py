"""Stage-time breakdown for the llm_dedup_minhash bench query (VERDICT r5
item 3): separates signature build / guard pre-count / band candidate join /
verify+threshold so a drifting total can be attributed to a stage instead of
guessed at. Writes bench/results/minhash_breakdown.json and prints one JSON
line.

Usage: python tools/profile_minhash.py [repeats]
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
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="minhash_profile", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rasgoql_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    stages: dict[str, list[float]] = {}

    def record(name, fn):
        stages.setdefault(name, []).append(timed(fn))

    for _ in range(repeats + 1):  # first iteration = warm-up, dropped below
        # stage 1: shingle -> minhash signature pipeline, fully materialized
        sig = dd.minhash_signatures(docs, "text", "doc_id", 16, 3)
        record("signatures", lambda: noop(sig))

        # stage 2: the _annotate_groups guard pre-count (persist + slim
        # max-of-counts over the probe key) — the only synchronous driver
        # action in the pipeline
        def guard():
            annotated, has_dups, caches = dd._annotate_groups(
                dd.minhash_signatures(docs, "text", "doc_id", 16, 3),
                F.md5(F.concat_ws("\x1f", F.array_sort("__sh"))),
                F.size("__sh") > 0, probe_key=F.hash("__mh"),
            )
            guard.caches = caches
        record("sig_plus_guard", guard)
        for c in guard.caches:
            c.unpersist()

        # stage 3+4: full operator (band join + verify ride the cached sigs)
        record("full_dedup_minhash", lambda: noop(
            dd.dedup_minhash(docs, "text", "doc_id", threshold=0.2)))

    out = {
        name: {
            "median": round(statistics.median(ts[1:]), 3),
            "runs": [round(t, 3) for t in ts[1:]],
            "warmup": round(ts[0], 3),
        }
        for name, ts in stages.items()
    }
    med = {k: v["median"] for k, v in out.items()}
    out["derived"] = {
        "guard_overhead": round(med["sig_plus_guard"] - med["signatures"], 3),
        "band_join_plus_verify": round(
            med["full_dedup_minhash"] - med["sig_plus_guard"], 3),
    }
    os.makedirs("bench/results", exist_ok=True)
    with open("bench/results/minhash_breakdown.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
