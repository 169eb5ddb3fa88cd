"""Round-9 ad-hoc stress: streaming semantic ingest on an IVF-PQ index.

stream_dedup_against(method='ivfpq') claims the crawl-ingest loop stays
cheap as the accepted corpus grows because (a) the two fits are amortized
in the prebuilt IVFPQIndex, (b) per-batch work is probe + a codes-only
candidate scan (m small ints per candidate, not dim doubles), and (c)
fold-ins (update_ivfpq_index) only pay for the batch. This measures it:
starting from the sf0.1 embeddings replicated REPLICAS×, ingest ROUNDS
micro-batches of BATCH vectors each (half exact copies of indexed vectors
→ should drop at the 0.5 ADC threshold; half negated copies → novel,
kept), timing the streaming query wall and the fold-in while the corpus
grows. The batch wall should stay near-flat: the candidate scan grows
with corpus/num_centroids per probed list, but at 8 int codes per
candidate the per-round increment is noise next to the fixed probe +
JVM-expression cost.

Each round streams exactly one new parquet file through an availableNow
query with a persistent checkpoint — the production incremental shape.

Usage: python tools/stress_r9_stream.py [rounds] [batch] [replicas]
(defaults 6, 2500, 10; prints SCALING.md rows — ad-hoc data, not
committed)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import rasgoql_spark as rql  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = rql.default_spark(app_name="stress_r9_stream", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from rasgoql_spark.functions.pq import ivfpq_index, update_ivfpq_index
    from rasgoql_spark.streaming.ops import stream_dedup_against

    work = tempfile.mkdtemp(prefix="sda9_stress_")
    src, sink, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    n0 = emb.count()
    base = emb
    for r in range(1, replicas):
        base = base.unionByName(
            emb.select((F.col("vec_id") + r * n0).alias("vec_id"), "embedding")
        )
    base = base.persist()
    n = base.count()
    t0 = time.time()
    idx = ivfpq_index(
        base, "embedding", "vec_id", num_centroids=45, coarse_iterations=1,
        m=8, codebook_size=16, iterations=0,
    )
    print(f"base corpus {n} vectors indexed in {time.time() - t0:.1f}s "
          f"(45 lists, m=8, 16 codes); {rounds} rounds x {batch} vectors")
    rows = ["| round | corpus before | batch wall (s) | accepted | fold-in (s) |"]
    corpus = n
    try:
        for r in range(rounds):
            half = batch // 2
            off = (r + 1) * 10_000_000
            dup = base.limit(half).select(
                (F.col("vec_id") + off).alias("vec_id"), "embedding"
            )
            novel = base.limit(half).select(
                (F.col("vec_id") + off + 5_000_000).alias("vec_id"),
                F.transform("embedding", lambda x: -x).alias("embedding"),
            )
            dup.unionByName(novel).coalesce(1).write.mode("append").parquet(src)

            sdf = (
                spark.readStream
                .schema("vec_id long, embedding array<double>")
                .parquet(src)
            )
            t0 = time.time()
            q = stream_dedup_against(
                sdf, "embedding", "vec_id", checkpoint=ckpt,
                sink_path=sink, index=idx, threshold=0.5, nprobe=7,
            )
            q.awaitTermination(600)
            wall = time.time() - t0
            accepted = spark.read.parquet(sink).count()
            t1 = time.time()
            acc_df = spark.read.parquet(sink).filter(
                (F.col("vec_id") >= off) & (F.col("vec_id") < off + 10_000_000)
            )
            new_idx = update_ivfpq_index(idx, acc_df, "embedding", "vec_id")
            idx.release()
            idx = new_idx
            fold = time.time() - t1
            rows.append(
                f"| {r} | {corpus} | {wall:.1f} | {accepted} cumulative | {fold:.1f} |"
            )
            print(rows[-1])
            corpus = idx.n_docs
    finally:
        idx.release()
        shutil.rmtree(work, ignore_errors=True)
    print("\nSCALING.md rows:")
    for row in rows:
        print(row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
