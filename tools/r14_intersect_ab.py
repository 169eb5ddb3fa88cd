"""Round-14 (VERDICT r13 item 3): isolate ngram_containment's verification
stage and A/B the intersect expression.

Builds the entry's real candidate table (pairs + both shingle arrays) on
the bench corpus, persists it, then times (1 warm-up + 5 noop-sink runs,
median) three formulations of |A intersect B|:

  v0_array_intersect   size(array_intersect(a, b))              (current)
  v1_union_arith       size(a) + size(b) - size(array_union(a,b))
  v2_sorted_merge_hof  adjacent-duplicate count over
                       array_sort(concat(a, b)) via filter() HOF — the
                       'merge-scan over sorted arrays' idea (arrays are
                       DISTINCT by construction, so a value appearing
                       twice in the merged multiset is in both)

Also cross-checks that all three agree row-for-row before timing.
Usage: python tools/r14_intersect_ab.py
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import rasgoql_spark as rql  # noqa: E402
from rasgoql_spark.functions._hash import shingles_expr, tokens_expr  # noqa: E402
from rasgoql_spark.functions.dedup import (  # noqa: E402
    _annotate_groups, _capped_postings,
)
from rasgoql_spark.operators._util import spread  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = rql.default_spark(app_name="r14_intersect_ab",
                              master=f"local[{cpus}]",
                              shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # entry parameters of llm_ngram_containment (shingle_size=3 defaults)
    cached_sig, has_dups, caches = _annotate_groups(
        spread(docs)
        .select(F.col("doc_id").alias("__id"),
                tokens_expr(F.col("text")).alias("__t"))
        .select("__id", shingles_expr(F.col("__t"), 3).alias("__sh")),
        F.md5(F.concat_ws("\x1f", F.array_sort("__sh"))),
        F.size("__sh") > 0,
        probe_key=F.hash(F.array_sort("__sh")),
    )
    rep_sig = cached_sig.filter(F.col("__id") == F.col("__rep"))
    inv, live = _capped_postings(rep_sig, 1000)
    left = inv.select(F.col("__id").alias("__id_a"), "__s")
    right = inv.select(F.col("__id").alias("__id_b"), "__s")
    cand_ids = (
        left.join(right, on="__s")
        .filter(F.col("__id_a") < F.col("__id_b"))
        .select("__id_a", "__id_b")
        .dropDuplicates(["__id_a", "__id_b"])
    )
    shingle_tbl = rep_sig.select("__id", "__sh")
    cand_ids = cand_ids.persist()
    n = cand_ids.count()
    print(f"candidate pairs: {n}", flush=True)

    def with_arrays(ids):
        return ids.join(
            shingle_tbl.select(F.col("__id").alias("__id_a"),
                               F.col("__sh").alias("__sh_a")), on="__id_a",
        ).join(
            shingle_tbl.select(F.col("__id").alias("__id_b"),
                               F.col("__sh").alias("__sh_b")), on="__id_b",
        )

    cand = with_arrays(cand_ids)

    a, b = F.col("__sh_a"), F.col("__sh_b")
    # v2 must STAGE the merged-sorted array as a real column before the
    # HOF: a lambda that captures the sort expression re-evaluates it per
    # element (the repo's round-1 25x lesson). Each variant is therefore a
    # (pre_projection, intersect_expr) pair.
    merged = F.col("__mg")
    variants = {
        "v0_array_intersect": (None, F.size(F.array_intersect(a, b))),
        "v1_union_arith": (
            None, F.size(a) + F.size(b) - F.size(F.array_union(a, b))),
        "v2_sorted_merge_hof": (
            F.array_sort(F.concat(a, b)).alias("__mg"),
            F.size(F.filter(
                F.sequence(F.lit(2), F.size(merged)),
                lambda k: F.element_at(merged, k) == F.element_at(merged, k - 1),
            ))),
    }

    def staged(frame, k):
        pre, expr = variants[k]
        if pre is not None:
            frame = frame.select("__id_a", "__id_b", "__sh_a", "__sh_b", pre)
        return frame, expr

    # agreement check (exact integers) on a 1-in-20 sample
    sample = with_arrays(cand_ids.filter(F.col("__id_a") % 20 == 0))
    sample = sample.select("*", variants["v2_sorted_merge_hof"][0])
    chk = sample.select(
        *[v[1].alias(k) for k, v in variants.items()]
    ).filter(
        (F.col("v0_array_intersect") != F.col("v1_union_arith"))
        | (F.col("v0_array_intersect") != F.col("v2_sorted_merge_hof"))
    ).count()
    print(f"disagreeing rows: {chk}", flush=True)
    if chk:
        return 1

    out = {}
    for k in variants:
        frame, expr = staged(cand, k)
        q = frame.select(
            "__id_a", "__id_b", expr.cast("double").alias("__inter"),
            F.size(a).alias("__na"), F.size(b).alias("__nb"),
        )
        times = []
        for r in range(6):
            t0 = time.time()
            q.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[k] = {"median": statistics.median(times[1:]), "times": times[1:]}
        print(k, out[k], flush=True)
    print(json.dumps(out))
    cand_ids.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
