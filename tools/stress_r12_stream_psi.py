"""Round-12 streaming stress: stream_psi per-batch cost curve.

The contract under test (streaming/ops.py stream_psi docstring): per-batch
cost is ONE hash aggregate against a FROZEN expected-proportions literal —
independent of how many batches have already landed in the monitoring
sink (nothing reads the sink or any growing state).

Protocol: 20 single-file micro-batches (maxFilesPerTrigger=1) of sf0.1
lineitem slices streamed through stream_psi against a frozen baseline;
per-batch durations come from the StreamingQuery progress events
(triggerExecution ms). Run twice — 1x rows/batch and 10x rows/batch — so
the curve separates the two axes: FLAT in batch index (no history
growth), LINEAR-ish in batch size (the scan). A second pass re-runs 20
more batches into the SAME sink (now 20 partitions deep) to show the
accumulated sink does not tax later batches.
Usage: python tools/stress_r12_stream_psi.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

BPS = [900.0, 2000.0, 10000.0, 30000.0, 60000.0]


def write_batches(spark, src: str, n_batches: int, rows_per_batch: int,
                  offset: int = 0):
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_extendedprice").limit(n_batches * rows_per_batch)
    staged = li.withColumn(
        "__b", (F.monotonically_increasing_id() % n_batches).cast("int"))
    for b in range(n_batches):
        (staged.filter(F.col("__b") == b).drop("__b").coalesce(1)
         .write.mode("append").parquet(f"{src}/file{offset + b}"))


def run_stream(spark, src: str, ckpt: str, sink: str, expected) -> list:
    from rasgoql_spark.streaming.ops import stream_psi

    sdf = (spark.readStream.schema("l_extendedprice DOUBLE")
           .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = stream_psi(sdf, "l_extendedprice", BPS, checkpoint=ckpt,
                   expected=expected, sink_path=sink)
    q.awaitTermination(600)
    return [
        {"batch": p["batchId"],
         "rows": p["numInputRows"],
         "ms": p["durationMs"]["triggerExecution"]}
        for p in q.recentProgress if p["numInputRows"] > 0
    ]


def main() -> int:
    import shutil
    import tempfile

    from rasgoql_spark.functions.snapshot import psi_bin_stats

    spark = rql.default_spark(app_name="stress_r12_psi", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    expected = psi_bin_stats(base, "l_extendedprice", BPS)
    tmp = tempfile.mkdtemp(prefix="psi_stress_")
    out: dict = {}
    try:
        for tag, rows in (("1x", 2_000), ("10x", 20_000)):
            src = f"{tmp}/in_{tag}"
            write_batches(spark, src, 20, rows)
            t0 = time.time()
            prog = run_stream(spark, src, f"{tmp}/ck_{tag}",
                              f"{tmp}/out_{tag}", expected)
            med = sorted(p["ms"] for p in prog)[len(prog) // 2]
            out[tag] = {
                "batches": len(prog),
                "rows_per_batch": rows,
                "first5_ms": [p["ms"] for p in prog[:5]],
                "last5_ms": [p["ms"] for p in prog[-5:]],
                "median_ms": med,
                "total_sec": round(time.time() - t0, 2),
            }
            print(tag, out[tag], flush=True)
        # continuation: 20 MORE batches into the 20-partition-deep 1x sink
        write_batches(spark, f"{tmp}/in_1x", 20, 2_000, offset=20)
        prog2 = run_stream(spark, f"{tmp}/in_1x", f"{tmp}/ck_1x",
                           f"{tmp}/out_1x", expected)
        out["1x_continued"] = {
            "batches": len(prog2),
            "first5_ms": [p["ms"] for p in prog2[:5]],
            "last5_ms": [p["ms"] for p in prog2[-5:]],
            "median_ms": sorted(p["ms"] for p in prog2)[len(prog2) // 2],
        }
        print("1x_continued", out["1x_continued"], flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
