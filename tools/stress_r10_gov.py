"""Round-10 governance-family stress: 10× replicas (ad-hoc, data not
committed — the stress_r5 replication recipe).

- scd2 over 3 stacked snapshots of 10× orders (150k keys → 1.5M keys,
  4.5M snapshot rows): the one key-window shuffle should scale with
  shuffle volume, no driver work.
- k_anonymize flag over 10× orders (1.5M rows): one window shuffle on the
  quasi key.
- psi_drift 10× vs 10×: two bin aggregates; wall should stay ~flat (the
  post-aggregate frame is |bins|+1 rows regardless of input).
- target_encode_oof over 10× orders: two slim aggregates + broadcast-back.
- pmi_collocations over 10× documents (50k docs): distributed counting;
  cost tracks distinct grams, not docs².
- mutual_information over 10× orders: contingency aggregate only.

Usage: python tools/stress_r10_gov.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rasgoql_spark.functions.curation import (  # noqa: E402
    k_anonymize,
    l_diversity,
    t_closeness,
)
from rasgoql_spark.functions.snapshot import (  # noqa: E402
    psi_drift,
    psi_drift_categorical,
    scd2,
)
from rasgoql_spark.functions.text import pmi_collocations  # noqa: E402
from rasgoql_spark.operators.aggregates import mutual_information  # noqa: E402
from rasgoql_spark.operators.ml import target_encode_oof  # noqa: E402


def replicate(df, key_cols, n=10):
    """n shifted copies with disjoint keys (stress_r5 recipe)."""
    parts = []
    for i in range(n):
        d = df
        for k in key_cols:
            d = d.withColumn(k, F.col(k) + F.lit(i * 10_000_000))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label, fn, out):
    t0 = time.time()
    n = fn().count()
    out[label] = {"rows": n, "wall_sec": round(time.time() - t0, 2)}
    print(label, out[label])


def main() -> int:
    spark = rql.default_spark(app_name="stress_r10_gov", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    s = rql.connect(spark, data_dir="/root/testdata/sf0.1")
    orders = s.dataset("orders").df
    docs = s.dataset("documents").df
    out: dict = {}

    for tag, o in (("1x", orders), ("10x", replicate(orders, ["o_orderkey"]))):
        o = o.persist()
        o.count()
        snaps = (
            o.select("o_orderkey", F.lit(1).alias("snap"),
                     F.col("o_orderpriority").alias("prio"))
            .unionByName(o.select(
                "o_orderkey", F.lit(2).alias("snap"),
                F.when(F.col("o_orderkey") % 5 == 0, F.lit("X2"))
                .otherwise(F.col("o_orderpriority")).alias("prio")))
            .unionByName(o.select(
                "o_orderkey", F.lit(3).alias("snap"),
                F.when(F.col("o_orderkey") % 7 == 0, F.lit("X3"))
                .when(F.col("o_orderkey") % 5 == 0, F.lit("X2"))
                .otherwise(F.col("o_orderpriority")).alias("prio")))
        )
        timed(f"scd2_{tag}", lambda: scd2(
            snaps, keys=["o_orderkey"], snapshot_col="snap"), out)
        timed(f"k_anonymize_{tag}", lambda: k_anonymize(
            o, quasi_cols=["o_orderpriority", "o_orderstatus"], k=3,
            action="flag"), out)
        hi = o.filter("o_totalprice > 50000")
        timed(f"psi_drift_{tag}", lambda: psi_drift(
            hi, o, "o_totalprice",
            breakpoints=[25000.0, 100000.0, 200000.0]), out)
        timed(f"target_encode_oof_{tag}", lambda: target_encode_oof(
            o, "o_orderpriority", "o_totalprice", fold_by="o_orderkey",
            folds=5), out)
        timed(f"mutual_information_{tag}", lambda: mutual_information(
            o, "o_orderpriority", "o_orderstatus"), out)
        timed(f"psi_drift_categorical_{tag}", lambda: psi_drift_categorical(
            hi, o, "o_orderpriority"), out)
        timed(f"l_diversity_{tag}", lambda: l_diversity(
            o, quasi_cols=["o_orderpriority"], sensitive="o_orderstatus",
            l=2, action="flag"), out)
        timed(f"t_closeness_{tag}", lambda: t_closeness(
            o, quasi_cols=["o_orderpriority"], sensitive="o_orderstatus",
            t=0.5, action="flag"), out)
        o.unpersist()

    for tag, d in (("1x", docs), ("10x", replicate(docs, ["doc_id"]))):
        d = d.persist()
        d.count()
        timed(f"pmi_collocations_{tag}", lambda: pmi_collocations(
            d, "text", min_count=3, top_k=100), out)
        d.unpersist()

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
