"""Round-8 streaming-ingest scale check: per-batch cost vs corpus growth.

The stream_dedup_against docstring claims "per-batch cost is independent of
corpus size" when dedup'ing against a prebuilt MinHashIndex that is folded
forward with update_minhash_index each round. This measures it: starting
from the sf0.1 documents corpus, ingest ROUNDS micro-batches of BATCH new
docs each (half genuine near-dups of already-accepted docs, half novel),
timing (a) the streaming query wall and (b) the index fold-in, while the
cumulative accepted corpus grows. A flat batch-wall column is the property
a 100 TB crawl-ingest loop needs; linear growth would mean the batch pays
for history.

Each round streams exactly one new parquet file through an availableNow
query with a persistent checkpoint, so processed files are never re-read —
the production incremental shape, not a full-input replay.

Usage: python tools/stress_r8_stream.py [rounds] [batch]   (defaults 6 and
2500; prints SCALING.md rows — ad-hoc data, not committed)
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
    spark = rql.default_spark(app_name="stress_r8_stream", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from rasgoql_spark.functions.dedup import minhash_index, update_minhash_index
    from rasgoql_spark.streaming.ops import stream_dedup_against

    work = tempfile.mkdtemp(prefix="sda_stress_")
    src, sink, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"

    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    n0 = base.count()
    idx = minhash_index(base, "text", "doc_id")
    print(f"base corpus {n0} docs indexed; {rounds} rounds x {batch} docs")
    rows = ["| round | corpus before | batch wall (s) | accepted | fold-in (s) |"]
    corpus = n0
    try:
        for r in range(rounds):
            # half near-dups of the BASE corpus (tail-suffixed copies →
            # rejected), half novel (word-shuffled + salted → accepted)
            half = batch // 2
            dup = base.limit(half).select(
                (F.col("doc_id") + (r + 1) * 1_000_000).alias("doc_id"),
                F.concat("text", F.lit(f" trailing crawl banner {r}")).alias("text"),
            )
            novel = base.limit(half).select(
                (F.col("doc_id") + (r + 1) * 1_000_000 + 500_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.lit(f"novel round {r} doc"),
                    F.reverse(F.split("text", " ")).getItem(0),
                    F.md5(F.concat("text", F.lit(str(r)))),
                    F.lit("entirely different content about"),
                    F.md5(F.concat(F.lit("salt"), "text", F.lit(str(r)))),
                ).alias("text"),
            )
            dup.unionByName(novel).coalesce(1).write.mode("append").parquet(src)

            sdf = (spark.readStream.schema("doc_id long, text string")
                   .parquet(src))
            t0 = time.time()
            q = stream_dedup_against(
                sdf, "text", "doc_id", checkpoint=ckpt,
                sink_path=sink, index=idx, threshold=0.5)
            q.awaitTermination(600)
            wall = time.time() - t0
            accepted = spark.read.parquet(sink).count()
            t1 = time.time()
            # fold this round's ACCEPTED docs into the index
            lo = (r + 1) * 1_000_000
            acc_df = (
                spark.read.parquet(sink)
                .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 2_000_000))
            )
            new_idx = update_minhash_index(idx, acc_df, "text", "doc_id")
            idx.release()
            idx = new_idx
            fold = time.time() - t1
            rows.append(
                f"| {r} | {corpus} | {wall:.1f} | {accepted} cumulative | {fold:.1f} |")
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
