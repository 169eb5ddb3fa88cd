"""Round-12 scaling evidence for dedup_substring (Lee et al. ExactSubstr).

Runs the gate workload (documents, min_tokens=20, max_doc_freq=50) at
sf0.01 and sf0.1 (10x the documents) and reports each pipeline stage's
cardinality — positioned shingles, post-cap postings, alignment
candidates, maximal runs — plus wall time. The claim under test: the
posting cap keeps the candidate join linear-ish in corpus size (no
all-pairs blowup), so a 10x corpus costs ~10x, not 100x.
Usage: python tools/stress_r12_substring.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


K, CAP = 20, 50


def stage_counts(spark, sf_dir: str) -> dict:
    from rasgoql_spark.functions._hash import tokens_expr
    from rasgoql_spark.functions.dedup import dedup_substring

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"docs": docs.count()}
    base = docs.select(
        F.col("doc_id").alias("__id"), tokens_expr(F.col("text")).alias("__t")
    ).filter(F.size("__t") >= K)
    fp_arr = F.transform(
        F.sequence(F.lit(1), F.size("__t") - K + 1),
        lambda j: F.md5(F.concat_ws(" ", F.slice("__t", j, F.lit(K)))),
    )
    sh = base.select(
        "__id", F.posexplode(fp_arr).alias("__p0", "__fp")
    ).select("__id", "__fp")
    sh = sh.persist()
    out["shingles"] = sh.count()
    live = (sh.groupBy("__fp").agg(F.count_distinct("__id").alias("__df"))
            .filter(F.col("__df") <= CAP).select("__fp"))
    inv = sh.join(live, "__fp", "left_semi").persist()
    out["postings_after_cap"] = inv.count()
    la = inv.select(F.col("__id").alias("__ia"), "__fp")
    lb = inv.select(F.col("__id").alias("__ib"), "__fp")
    out["alignment_candidates"] = (
        la.join(lb, "__fp").filter(F.col("__ia") < F.col("__ib")).count()
    )
    sh.unpersist()
    inv.unpersist()
    t0 = time.time()
    runs = dedup_substring(docs, "text", "doc_id", min_tokens=K,
                           max_doc_freq=CAP)
    out["maximal_runs"] = runs.count()
    out["wall_sec"] = round(time.time() - t0, 2)
    return out


def main() -> int:
    spark = rql.default_spark(app_name="stress_r12_sub", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for tag, sf in (("sf0.01", "/root/testdata/sf0.01"),
                    ("sf0.1", "/root/testdata/sf0.1")):
        res[tag] = stage_counts(spark, sf)
        print(tag, res[tag])
    a, b = res["sf0.01"], res["sf0.1"]
    res["growth"] = {k: round(b[k] / a[k], 2)
                     for k in ("docs", "shingles", "postings_after_cap",
                               "alignment_candidates", "wall_sec")
                     if a[k]}
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
