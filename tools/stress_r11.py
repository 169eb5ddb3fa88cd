"""Round-11 stress: 10× scale-ups for the new training-prep operators
(ad-hoc, data not committed — the stress_r5 replication recipe).

- cms_sketch per-source over 1× vs 10× documents: the bucket-count shuffle
  is bounded by |groups|·depth·width ints regardless of rows, so wall
  should track the scan (map-side partial aggregation does the work).
- cms_merge over 10 vs 100 shard sketch rows per group: pure KB-sized
  state, expected flat.
- cap_per_group k=3 on a deliberately SKEWED host distribution (one host
  holding ~half the rows) at 1× vs 10×: the WindowGroupLimit pre-shuffle
  prune is the whole point — the mega-host must not funnel a partition.
- hard_negative_mine with 5 queries over 1× vs 10× corpus: broadcast
  queries, one corpus scan, one k-bounded window — linear.
- curriculum_order over 1× vs 10× documents: one broadcast min/max row +
  a range-partitioned sort — n·log n in rows, no single-task stage.

Usage: python tools/stress_r11.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rasgoql_spark.functions.cms import cms_merge, cms_sketch  # noqa: E402
from rasgoql_spark.functions.curation import cap_per_group  # noqa: E402
from rasgoql_spark.functions.mix import curriculum_order  # noqa: E402
from rasgoql_spark.functions.relevance import hard_negative_mine  # noqa: E402

SF = "/root/testdata/sf0.1"


def timed(label, fn, results):
    t0 = time.time()
    n = fn()
    dt = round(time.time() - t0, 2)
    results[label] = {"rows": n, "sec": dt}
    print(f"{label:42s} {n:>10} rows  {dt:>7.2f}s", flush=True)


def main():
    spark = rql.default_spark(shuffle_partitions=32)
    results: dict = {}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs10 = (
        docs.crossJoin(spark.range(10).select(F.col("id").alias("__rep")))
        .withColumn("doc_id", F.col("doc_id") * 10 + F.col("__rep"))
        .drop("__rep")
    )

    # --- cms_sketch: shuffle bounded by groups x depth x width ---
    timed("cms_sketch 1x", lambda: cms_sketch(
        docs, "lang", ["source"], depth=4, width=256).count(), results)
    timed("cms_sketch 10x", lambda: cms_sketch(
        docs10, "lang", ["source"], depth=4, width=256).count(), results)

    # --- cms_merge: 10 vs 100 shard rows per group ---
    sh10 = cms_sketch(
        docs10.withColumn("__shard", F.col("doc_id") % 10),
        "lang", ["source", "__shard"], depth=4, width=256)
    sh100 = cms_sketch(
        docs10.withColumn("__shard", F.col("doc_id") % 100),
        "lang", ["source", "__shard"], depth=4, width=256)
    timed("cms_merge 10 shards", lambda: cms_merge(
        sh10, ["source"]).count(), results)
    timed("cms_merge 100 shards", lambda: cms_merge(
        sh100, ["source"]).count(), results)

    # --- cap_per_group under skew: one host owns ~half the corpus ---
    def skewed(base):
        return base.withColumn(
            "host",
            F.when(F.col("doc_id") % 2 == 0, F.lit("megahost"))
            .otherwise(F.concat(F.lit("h"), (F.col("doc_id") % 97))),
        )

    timed("cap_per_group skew 1x", lambda: cap_per_group(
        skewed(docs), ["host"], k=3, order_by=["n_chars"],
        key="doc_id").count(), results)
    timed("cap_per_group skew 10x", lambda: cap_per_group(
        skewed(docs10), ["host"], k=3, order_by=["n_chars"],
        key="doc_id").count(), results)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb10 = (
        emb.crossJoin(spark.range(10).select(F.col("id").alias("__rep")))
        .withColumn("vec_id", F.col("vec_id") * 10 + F.col("__rep"))
        .drop("__rep")
    )
    pos = [(0, 170), (10, 2250), (20, 2570)]
    timed("hard_negative_mine 1x", lambda: hard_negative_mine(
        emb, "embedding", "vec_id", positives=pos,
        query_ids=[0, 10, 20, 30, 40], k=8).count(), results)
    timed("hard_negative_mine 10x", lambda: hard_negative_mine(
        emb10, "embedding", "vec_id", positives=pos,
        query_ids=[0, 10, 20, 30, 40], k=8).count(), results)

    timed("curriculum_order 1x", lambda: curriculum_order(
        docs, "n_chars", "doc_id", n_buckets=8).count(), results)
    timed("curriculum_order 10x", lambda: curriculum_order(
        docs10, "n_chars", "doc_id", n_buckets=8).count(), results)

    print(json.dumps(results))


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra_batch():
    """anomaly_mad + stream-shape scorers at 1x vs 10x events."""
    spark = rql.default_spark(shuffle_partitions=32)
    results: dict = {}
    from rasgoql_spark.functions.timeseries import (
        anomaly_mad,
        mad_against_stats,
        mad_stats,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev10 = (
        ev.crossJoin(spark.range(10).select(F.col("id").alias("__rep")))
        .withColumn("event_id", F.col("event_id") * 10 + F.col("__rep"))
        .drop("__rep")
    )
    timed("anomaly_mad 1x", lambda: anomaly_mad(
        ev, "value", ["event_type"]).count(), results)
    timed("anomaly_mad 10x", lambda: anomaly_mad(
        ev10, "value", ["event_type"]).count(), results)
    stats = mad_stats(ev, "value", ["event_type"])
    timed("mad_against_stats 1x", lambda: mad_against_stats(
        ev, "value", stats, ["event_type"]).count(), results)
    timed("mad_against_stats 10x", lambda: mad_against_stats(
        ev10, "value", stats, ["event_type"]).count(), results)
    print(json.dumps(results))


if __name__ == "__main__" and "--extra" in sys.argv:
    extra_batch()
