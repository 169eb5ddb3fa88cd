"""Round-10 layout evidence: what z-ordering buys at scan time.

Writes sf0.1 lineitem three ways (same 32-shard budget):
  natural  — as-read order (repartition only; the default layout)
  sorted1d — range-partitioned + sorted by l_partkey (the 1-D clustering
             a plain ORDER BY write gives)
  zorder   — save_shards(zorder_by=['l_partkey','l_suppkey']) — the
             Morton layout
then measures, from the parquet footers themselves (pyarrow row-group
min/max — exactly the statistics Spark's scan-level row-group pruning
and DuckDB's zone maps consult), the fraction of row groups a selective
filter can skip on (a) the leading column, (b) the second column, (c)
both — plus the Spark wall for the filtered counts.

The expected shape (Morton-curve theory): 1-D sort wins on its own
column and is useless on the other; z-order prunes on BOTH at ~sqrt
resolution. Usage: python tools/stress_r10_zorder.py
"""

from __future__ import annotations

import glob
import json
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402


PREDS = {
    "partkey": ("l_partkey", 1000, 1199, None, None, None),
    "suppkey": (None, None, None, "l_suppkey", 100, 109),
    "both": ("l_partkey", 1000, 1199, "l_suppkey", 100, 109),
}


def overlap_fraction(path: str) -> dict:
    """Fraction of row groups whose min/max CANNOT rule out each
    predicate — the rows-read proxy every stats-pruning reader shares."""
    total, hit = 0, {k: 0 for k in PREDS}
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            stats = {}
            for col in ("l_partkey", "l_suppkey"):
                s = md.row_group(rg).column(names[col]).statistics
                stats[col] = (s.min, s.max)
            for k, (c1, lo1, hi1, c2, lo2, hi2) in PREDS.items():
                ok = True
                if c1 is not None:
                    mn, mx = stats[c1]
                    ok = ok and not (mx < lo1 or mn > hi1)
                if c2 is not None:
                    mn, mx = stats[c2]
                    ok = ok and not (mx < lo2 or mn > hi2)
                if ok:
                    hit[k] += 1
    return {"row_groups": total,
            **{f"hit_{k}": round(v / total, 4) for k, v in hit.items()}}


def main() -> int:
    spark = rql.default_spark(app_name="stress_r10_z", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    s = rql.connect(spark, data_dir="/root/testdata/sf0.1")
    li = s.dataset("lineitem")
    n = li.df.count()
    out: dict = {"rows": n, "shards": 32}

    li.df.repartition(32).write.mode("overwrite").parquet("/tmp/z_natural")
    li.df.repartitionByRange(32, "l_partkey").sortWithinPartitions(
        "l_partkey").write.mode("overwrite").parquet("/tmp/z_sorted1d")
    t0 = time.time()
    li.save_shards("/tmp/z_zorder", num_shards=32,
                   zorder_by=["l_partkey", "l_suppkey"], mode="overwrite")
    out["zorder_write_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    li.save_shards("/tmp/z_hilbert", num_shards=32,
                   zorder_by=["l_partkey", "l_suppkey"], curve="hilbert",
                   mode="overwrite")
    out["hilbert_write_sec"] = round(time.time() - t0, 2)

    for tag, path in (("natural", "/tmp/z_natural"),
                      ("sorted1d", "/tmp/z_sorted1d"),
                      ("zorder", "/tmp/z_zorder"),
                      ("hilbert", "/tmp/z_hilbert")):
        out[tag] = overlap_fraction(path)
        # Spark wall for the 2-D filtered count (row-group pruning live)
        df = spark.read.parquet(path)
        t0 = time.time()
        c = df.filter(
            "l_partkey BETWEEN 1000 AND 1199 AND "
            "l_suppkey BETWEEN 100 AND 109").count()
        out[tag]["filtered_count"] = c
        out[tag]["filter_wall_sec"] = round(time.time() - t0, 3)
        print(tag, out[tag])

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
