"""Round-10 ad-hoc stress (judge task #7): streaming binary-signature
ingest — the one streaming dedup path SCALING.md had not stressed.

stream_dedup_against(method='binary', index=BinaryIndex) claims the
flattest per-batch cost curve of the whole family: the reference state is
8 bytes/vector (64-dim signs packed into two 32-bit words), the per-batch
work is pack-batch + xor/popcount against the signature table, and
fold-ins (update_binary_index) have NO fitted state so update == rebuild
exactly. This measures the curve: ingest ROUNDS micro-batches of BATCH
vectors each (half exact copies of indexed vectors → Hamming 0, dropped at
max_hamming=6; half negated copies → Hamming 64, kept), timing the
streaming query wall and the fold-in while the corpus grows.

Usage: python tools/stress_r10_stream_binary.py [rounds] [batch] [replicas]
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
    spark = rql.default_spark(app_name="stress_r10_sbin", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from rasgoql_spark.functions.similarity import (
        binary_index,
        update_binary_index,
    )
    from rasgoql_spark.streaming.ops import stream_dedup_against

    work = tempfile.mkdtemp(prefix="sda10_stress_")
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
    idx = binary_index(base, "embedding", "vec_id")
    print(f"base corpus {n} vectors packed in {time.time() - t0:.1f}s "
          f"({idx.n_words} words = {idx.n_words * 8} B/vector); "
          f"{rounds} rounds x {batch} vectors")
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
                sink_path=sink, index=idx, max_hamming=6,
            )
            q.awaitTermination(600)
            wall = time.time() - t0
            accepted = spark.read.parquet(sink).count()
            t1 = time.time()
            acc_df = spark.read.parquet(sink).filter(
                (F.col("vec_id") >= off) & (F.col("vec_id") < off + 10_000_000)
            )
            new_idx = update_binary_index(idx, acc_df, "embedding", "vec_id")
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
