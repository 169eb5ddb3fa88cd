"""Round-8 stress (VERDICT r7 item 7): the capped n-gram family at the
next order of magnitude — a 50k-document corpus with 10x exact-duplication
skew (every sf0.1 document replicated 10x under fresh ids) PLUS the planted
boilerplate suffix from stress_r7. Reports CANDIDATE COUNTS at each pipeline
stage, not just wall-clock, so SCALING.md can show capped candidate growth
stays proportional to genuine near-dup mass:

  raw docs -> distinct shingle-set reps (the exact-dup collapse absorbs the
  10x replication) -> postings before/after the df cap -> candidate pairs
  capped vs uncapped-at-rep-level -> final scored pairs.

The uncapped REP-LEVEL candidate count is computed analytically from the
posting document frequencies (sum of C(df,2) per shingle, an upper bound,
plus the exact distinct-pair count for the capped join) — actually running
the uncapped self-join at 50k docs with universal boilerplate is the
O(reps^2) blow-up this cap exists to prevent.

Usage: python tools/stress_r8.py   (paste the printed rows into SCALING.md's
round-8 section — ad-hoc data, not committed)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import rasgoql_spark as rql  # noqa: E402

SF = "/root/testdata/sf0.1"
COPIES = 10

BOILERPLATE = (
    " copyright terms of service all rights reserved privacy policy "
    "contact us about this site"
)


def main() -> int:
    spark = rql.default_spark(app_name="stress_r8", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    n0 = base.count()
    docs = (
        base.withColumn("__copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))))
        .select(
            (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
            F.concat("text", F.lit(BOILERPLATE)).alias("text"),
        )
        .persist()
    )
    n = docs.count()
    print(f"corpus: {n0} base docs x {COPIES} copies = {n} docs, "
          "all sharing the boilerplate suffix")

    from rasgoql_spark.functions.dedup import (
        _annotate_groups,
        _capped_postings,
        shingles_expr,
        tokens_expr,
    )
    from rasgoql_spark.operators._util import spread

    # mirror ngram_containment's pipeline stage by stage to expose counts
    sig = (
        spread(docs)
        .select(F.col("doc_id").alias("__id"),
                tokens_expr(F.col("text")).alias("__t"))
        .select("__id", shingles_expr(F.col("__t"), 3).alias("__sh"))
    )
    cached_sig, has_dups, caches = _annotate_groups(
        sig,
        F.md5(F.concat_ws("\x1f", F.array_sort("__sh"))),
        F.size("__sh") > 0,
        probe_key=F.hash(F.array_sort("__sh")),
    )
    rep_sig = cached_sig.filter(F.col("__id") == F.col("__rep")).persist()
    reps = rep_sig.count()
    print(f"collapse: {n} docs -> {reps} distinct shingle-set reps "
          f"(has_dups={has_dups}; the 10x replication is absorbed here)")

    rows = [
        "| corpus | raw docs | reps after collapse |",
        f"| sf0.1 x{COPIES} + boilerplate | {n} | {reps} |",
    ]

    for cap in (1000, 5):
        t0 = time.time()
        inv, _live = _capped_postings(rep_sig, cap)
        n_post = inv.count()
        # analytic uncapped candidate bound + exact capped candidates
        dfreq = inv.groupBy("__s").agg(F.countDistinct("__id").alias("d"))
        bound = dfreq.agg(
            F.sum(F.expr("d * (d - 1) / 2")).alias("b")).first().b
        left = inv.select(F.col("__id").alias("__id_a"), "__s")
        right = inv.select(F.col("__id").alias("__id_b"), "__s")
        cands = (
            left.join(right, on="__s")
            .filter(F.col("__id_a") < F.col("__id_b"))
            .select("__id_a", "__id_b").distinct().count()
        )
        secs = time.time() - t0
        print(f"cap={cap}: postings={n_post} candidate_pairs={cands} "
              f"(per-shingle C(df,2) bound {int(bound)}) in {secs:.1f}s")
        rows.append(
            f"| max_doc_freq={cap} | postings {n_post} | candidates {cands} "
            f"| C(df,2) bound {int(bound)} | {secs:.1f} s |")

    # uncapped: analytic only — every rep shares the boilerplate shingles,
    # so each hot posting alone contributes C(reps, 2) pairs
    inv_unc, _ = _capped_postings(rep_sig, None)
    dfreq_unc = inv_unc.groupBy("__s").agg(F.countDistinct("__id").alias("d"))
    hot = dfreq_unc.filter(F.col("d") >= reps * 0.9).count()
    bound_unc = dfreq_unc.agg(
        F.sum(F.expr("d * (d - 1) / 2")).alias("b")).first().b
    full_pairs = reps * (reps - 1) // 2
    print(f"uncapped (analytic): {hot} near-universal shingles, per-shingle "
          f"C(df,2) bound {int(bound_unc)}, floor C({reps},2)={full_pairs} "
          "distinct pairs — the join this cap prevents")
    rows.append(
        f"| uncapped (analytic) | {hot} near-universal shingles | candidates "
        f">= C({reps},2) = {full_pairs} | C(df,2) bound {int(bound_unc)} | not run |")

    # end-to-end wall-clock for the real operator at the default cap
    cont = rql.get_transform("ngram_containment").apply
    t0 = time.time()
    out = cont(docs, text="text", id_col="doc_id", threshold=0.8)
    pairs = out.count()
    secs = time.time() - t0
    print(f"ngram_containment end-to-end (cap 1000): {pairs} scored pairs "
          f"in {secs:.1f}s at {n} docs")
    rows.append(
        f"| ngram_containment e2e (cap 1000) | {n} docs | {pairs} scored "
        f"pairs | — | {secs:.1f} s |")

    print("\nSCALING.md rows:")
    for r in rows:
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
