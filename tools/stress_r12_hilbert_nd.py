"""Round-12 layout evidence: the n-D Hilbert key's row-group pruning.

3-D extension of tools/stress_r10_zorder.py: sf0.1 lineitem written at
the same 32-shard budget as
  natural    — as-read order (repartition only)
  zorder3d   — save_shards(zorder_by=[partkey, suppkey, quantity])
  hilbert3d  — same clustering columns, curve='hilbert' (the round-12
               Skilling-transpose n-D path)
then, from the parquet footers (pyarrow row-group min/max — the
statistics Spark row-group pruning and DuckDB zone maps consult), the
fraction of row groups a selective filter CANNOT skip on each single
column and on all three together, plus the live Spark wall for the 3-D
filtered count. Usage: python tools/stress_r12_hilbert_nd.py
"""

from __future__ import annotations

import glob
import json
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

import rasgoql_spark as rql  # noqa: E402

COLS = ("l_partkey", "l_suppkey", "l_quantity")
PREDS = {
    "partkey": {"l_partkey": (1000, 1199)},
    "suppkey": {"l_suppkey": (100, 109)},
    "quantity": {"l_quantity": (1, 10)},
    "all3": {"l_partkey": (1000, 1199), "l_suppkey": (100, 109),
             "l_quantity": (1, 10)},
}


def overlap_fraction(path: str) -> dict:
    total, hit = 0, {k: 0 for k in PREDS}
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            stats = {
                c: (md.row_group(rg).column(names[c]).statistics.min,
                    md.row_group(rg).column(names[c]).statistics.max)
                for c in COLS
            }
            for k, pred in PREDS.items():
                ok = True
                for c, (lo, hi) in pred.items():
                    mn, mx = stats[c]
                    ok = ok and not (mx < lo or mn > hi)
                if ok:
                    hit[k] += 1
    return {"row_groups": total,
            **{f"hit_{k}": round(v / total, 4) for k, v in hit.items()}}


def main() -> int:
    spark = rql.default_spark(app_name="stress_r12_hnd", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    s = rql.connect(spark, data_dir="/root/testdata/sf0.1")
    li = s.dataset("lineitem")
    out: dict = {"rows": li.df.count(), "shards": 32}

    li.df.repartition(32).write.mode("overwrite").parquet("/tmp/h3_natural")
    t0 = time.time()
    li.save_shards("/tmp/h3_zorder", num_shards=32,
                   zorder_by=list(COLS), mode="overwrite")
    out["zorder3d_write_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    li.save_shards("/tmp/h3_hilbert", num_shards=32,
                   zorder_by=list(COLS), curve="hilbert", mode="overwrite")
    out["hilbert3d_write_sec"] = round(time.time() - t0, 2)

    for tag, path in (("natural", "/tmp/h3_natural"),
                      ("zorder3d", "/tmp/h3_zorder"),
                      ("hilbert3d", "/tmp/h3_hilbert")):
        out[tag] = overlap_fraction(path)
        df = spark.read.parquet(path)
        t0 = time.time()
        c = df.filter(
            "l_partkey BETWEEN 1000 AND 1199 AND "
            "l_suppkey BETWEEN 100 AND 109 AND "
            "l_quantity BETWEEN 1 AND 10").count()
        out[tag]["filtered_count"] = c
        out[tag]["filter_wall_sec"] = round(time.time() - t0, 3)
        print(tag, out[tag])

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
