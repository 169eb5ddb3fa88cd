"""Round-13 stress: dedup_substring's max_positions repetition bound.

Reproduces the SCALING.md "within-doc repetition bound" table: a
generation-loop doc (one 5-token phrase repeated r times) plus a partner
doc quoting the phrase. Uncapped, the candidate self-join grows O(r^2)
per shared fingerprint; capped (default 20), postings and alignments are
INVARIANT in r. Prints one JSON line per (r, mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rasgoql_spark as rql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rasgoql_spark.functions.dedup import (  # noqa: E402
    _cap_positions,
    _positioned_postings,
    dedup_substring,
)


def main() -> int:
    spark = rql.default_spark(app_name="stress_r13_substring_cap",
                              shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for r in (1_000, 10_000):
        loop = ("the model repeats this phrase " * r).strip()
        docs = spark.createDataFrame(
            [(1, loop),
             (2, "intro the model repeats this phrase and then moves on")],
            "id BIGINT, text STRING")
        raw = _positioned_postings(docs, "text", "id", 5)
        for cap in (None, 20):
            if cap is None and r > 1_000:
                # ~5x10^8 alignment rows — the point of the cap; skip
                print(json.dumps({"r": r, "cap": cap,
                                  "alignments": "skipped (O(r^2))"}))
                continue
            p = _cap_positions(raw, cap, "__id")
            la = p.select(F.col("__id").alias("ia"),
                          F.col("__pos").alias("pa"), "__fp")
            lb = p.select(F.col("__id").alias("ib"),
                          F.col("__pos").alias("pb"), "__fp")
            t0 = time.time()
            n_al = la.join(lb, on="__fp").filter("ia <= ib").count()
            dt = round(time.time() - t0, 2)
            print(json.dumps({"r": r, "cap": cap, "postings": p.count(),
                              "alignments": n_al, "sec": dt}))
        # the operator end-to-end stays bounded and still reports the
        # cross-doc run under the default cap
        t0 = time.time()
        n_pairs = dedup_substring(docs, "text", "id", min_tokens=5,
                                  max_doc_freq=None).count()
        print(json.dumps({"r": r, "dedup_substring_pairs": n_pairs,
                          "sec": round(time.time() - t0, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
