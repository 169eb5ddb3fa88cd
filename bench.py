"""Benchmark harness (driver contract).

Runs the headline query set from BASELINE.md §2 (B1-B8 + LLM-pipeline ops) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing = median of 5 runs after 1 warm-up (protocol raised from 3 in
round 6 — the r5/r6 drift analysis showed ±0.3-0.5 s run-to-run noise on
sub-3-second queries, and a median of 5 halves the chance a single hot
run decides the record; baselines are medians either way, so the change
is estimator-consistent and the baseline file is untouched); execution is
forced with the noop sink so every column is actually computed (a bare
count() would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
import rasgoql_spark as rql  # noqa: E402


def _b4_window_chain(spark, sf):
    s = entry._s(spark, sf)
    return (
        s.dataset("lineitem")
        .datetrunc(dates={"l_shipdate": "week"})
        .aggregate(group_by=["l_partkey", "L_SHIPDATE_WEEK"],
                   aggregations={"l_extendedprice": ["SUM"]})
        .lag(columns=["L_EXTENDEDPRICE_SUM"], amounts=[1, 2, 3],
             order_by=["L_SHIPDATE_WEEK"], partition=["l_partkey"])
        .moving_avg(input_columns=["L_EXTENDEDPRICE_SUM"], window_sizes=[4],
                    order_by=["L_SHIPDATE_WEEK"], partition=["l_partkey"])
        .df
    )


def _llm_similarity_ivf(spark, sf):
    """Inline IVF search at the BASELINE's sizing (k=16, nprobe=4). The
    operator default became num_centroids='auto' in round 7 (k=ceil(√n) —
    45 at sf0.1), which trades a 2× costlier one-off fit for scale-correct
    list sizing; the bench series pins the r4-r6 workload so the record
    stays comparable, and llm_similarity_ivf_prebuilt below measures the
    amortized production path (fit excluded) at the auto sizing."""
    return entry._s(spark, sf).dataset("embeddings").similarity_search_ivf(
        vec_col="embedding", id_col="vec_id", query_ids=[0, 1, 2, 3, 4],
        k=10, num_centroids=16, nprobe=4).df


_IVF_STATE: dict = {}

# Count of one-off index builds performed by the prebuilt-entry wrappers.
# main() snapshots this around each entry's TIMED runs and emits the delta
# as build_counts[entry]; a nonzero value means a build leaked into a
# timed window (the warm-up run is where builds are supposed to happen),
# which invalidates that entry's reading for baseline comparison.
_BUILD_COUNT = 0


def _built(index):
    """Tag a just-built index artifact for the build_counts audit."""
    global _BUILD_COUNT
    _BUILD_COUNT += 1
    return index


# Entries whose timed runs are contractually build-free (they search or
# update against a process-cached index built during warm-up).
_PREBUILT_ENTRIES = frozenset({
    "llm_similarity_ivf_prebuilt",
    "llm_update_ivf_index",
    "llm_similarity_ivfpq_prebuilt",
    "llm_dedup_ivfpq_prebuilt",
    "llm_embedding_join_ivfpq_prebuilt",
    "llm_similarity_binary_prebuilt",
    "llm_ivfpq_rerank_prebuilt",
    "llm_dedup_against_substring",
})


def _llm_dedup_against_substring(spark, sf):
    """Amortized incremental substring screening: a 1000-doc batch checked
    for verbatim >=20-token runs against a prebuilt SubstringIndex over
    the 4000-doc accepted corpus (built once per bench process; each
    timed run pays only the batch shingling + fingerprint equi-join —
    the operator's per-crawl-batch contract)."""
    from rasgoql_spark.functions.dedup import (
        dedup_against_substring, substring_index)

    docs = entry._s(spark, sf).dataset("documents").df
    key = ("substr_idx", sf)
    if key not in _IVF_STATE:
        _IVF_STATE[key] = _built(substring_index(
            docs.filter("doc_id % 5 != 0"), "text", "doc_id",
            min_tokens=20, max_doc_freq=50))
    return dedup_against_substring(
        docs.filter("doc_id % 5 = 0"), "text", "doc_id",
        index=_IVF_STATE[key], min_tokens=20, mode="pairs")


def calibrate(spark, sf_dir) -> float:
    """Fixed host-speed reference workload (round-11 verdict task #2).

    FROZEN: this block must never change across rounds — it is the
    cross-round normalizer that separates driver-host drift from real
    engine regressions (BASELINE.md §calibration). It deliberately uses
    raw pyspark only (no rasgoql_spark code), so its reading tracks the
    host + JVM + shuffle machinery and nothing the engine ships:
    a cached two-column lineitem count plus one canonical groupBy-sum
    shuffle to the noop sink, median of 5 after TEN warm-ups (ten, not the
    entries' one, because a fresh process JITs this loop for ~9 iterations:
    the round-12 freeze-time curve read 1.61 s cold, 0.51 s at iteration 3,
    and flattened at 0.28-0.34 s from iteration 9 on — fewer warm-ups would
    fold JIT ramp into the host-speed reading).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_partkey", "l_extendedprice").cache()
    df.count()  # materialize the cache; excluded from timing

    def one() -> float:
        t0 = time.time()
        df.count()
        (df.groupBy("l_partkey")
           .agg(F.sum("l_extendedprice").alias("S"), F.count("*").alias("C"))
           .write.format("noop").mode("overwrite").save())
        return time.time() - t0

    for _ in range(10):  # codegen/scheduler/JIT warm-up (see docstring)
        one()
    val = round(statistics.median([one() for _ in range(5)]), 3)
    df.unpersist()
    return val


def _llm_similarity_ivf_prebuilt(spark, sf):
    """Search against a prebuilt auto-sized IVF index — the amortized
    production path (ivf_index built once per bench process, searches
    reuse it; the r6-verdict-requested entry so probe regressions are not
    masked by inline-fit cost)."""
    from rasgoql_spark.functions.similarity import ivf_index, similarity_search_ivf

    key = ("search_idx", sf)
    if key not in _IVF_STATE:
        emb = entry._s(spark, sf).dataset("embeddings").df
        _IVF_STATE[key] = _built(ivf_index(emb, "embedding", "vec_id"))
    emb = entry._s(spark, sf).dataset("embeddings").df
    return similarity_search_ivf(
        emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=10,
        index=_IVF_STATE[key])


def _llm_update_ivf_index(spark, sf):
    """Incremental IVF maintenance: fold a 10% batch into a prebuilt index
    over the other 90% (assignment against existing centroids + eager
    union materialization — no Lloyd re-fit). The base index is built once
    per bench process; each timed run pays only the per-batch cost, which
    is the operator's contract."""
    from rasgoql_spark.functions.similarity import ivf_index, update_ivf_index

    emb = entry._s(spark, sf).dataset("embeddings").df
    key = ("update_base", sf)
    if key not in _IVF_STATE:
        _IVF_STATE[key] = _built(ivf_index(
            emb.filter("vec_id % 10 != 0"), "embedding", "vec_id"))
    prev = _IVF_STATE.pop(("update_out", sf), None)
    if prev is not None:
        prev.release()
    updated = update_ivf_index(
        _IVF_STATE[key], emb.filter("vec_id % 10 = 0"), "embedding", "vec_id")
    _IVF_STATE[("update_out", sf)] = updated
    return updated.frame


def _llm_similarity_ivfpq(spark, sf):
    """IVF-PQ ANN (round 8): inline coarse-kmeans fit + PQ fit + probed ADC
    scan — the memory-bounded ANN form (candidates read m small ints, not
    dim floats). Sized like the inline-IVF entry (16 lists, 4 probed) with
    one Lloyd pass each so the record tracks the full build+search cost."""
    return entry._s(spark, sf).dataset("embeddings").similarity_search_ivfpq(
        vec_col="embedding", id_col="vec_id", query_ids=[0, 1, 2, 3, 4],
        k=10, num_centroids=16, nprobe=4, coarse_iterations=1,
        m=8, codebook_size=16, iterations=1).df


def _llm_similarity_ivfpq_prebuilt(spark, sf):
    """The amortized IVF-PQ path: search against a prebuilt IVFPQIndex
    (both fits paid once per bench process) — isolates the probe + codes
    scan the same way llm_similarity_ivf_prebuilt does for IVF."""
    from rasgoql_spark.functions.pq import ivfpq_index, similarity_search_ivfpq

    key = ("ivfpq_idx", sf)
    if key not in _IVF_STATE:
        emb = entry._s(spark, sf).dataset("embeddings").df
        _IVF_STATE[key] = _built(ivfpq_index(
            emb, "embedding", "vec_id", num_centroids=16,
            coarse_iterations=1, m=8, codebook_size=16, iterations=1))
    emb = entry._s(spark, sf).dataset("embeddings").df
    return similarity_search_ivfpq(
        emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=10, nprobe=4,
        index=_IVF_STATE[key])


def _llm_dedup_ivfpq_prebuilt(spark, sf):
    """Round 9: the steady-state semantic-ingest shape — a 500-vector
    batch checks against a prebuilt IVF-PQ index over the rest of the
    corpus (fits amortized in the warm-up, keyed process cache like the
    other prebuilt entries). Times probe + LUT preparation + the
    codes-only candidate scan + the flagged-id anti-join — what every
    micro-batch of stream_dedup_against(method='ivfpq') pays."""
    from rasgoql_spark.functions.pq import ivfpq_index
    from rasgoql_spark.functions.similarity import dedup_against_embedding

    key = ("ivfpq_dedup_idx", sf)
    emb = entry._s(spark, sf).dataset("embeddings").df
    if key not in _IVF_STATE:
        _IVF_STATE[key] = _built(ivfpq_index(
            emb.filter("vec_id % 4 != 0"), "embedding", "vec_id",
            num_centroids=16, coarse_iterations=1, m=8, codebook_size=16,
            iterations=1))
    return dedup_against_embedding(
        emb.filter("vec_id % 4 = 0"), "embedding", "vec_id",
        index=_IVF_STATE[key], method="ivfpq", threshold=0.5, nprobe=4,
        mode="filter")


def _llm_similarity_binary(spark, sf):
    """Round 9: two-stage binary ANN — Hamming over packed 1-bit signs
    (2 xor+popcount per candidate) keeps 40 survivors per query, exact
    cosine reranks them. The one ANN form that beats brute-broadcast on
    CPU even in-memory (SCALING.md r9 stress)."""
    return entry._s(spark, sf).dataset("embeddings").similarity_search_binary(
        vec_col="embedding", id_col="vec_id", query_ids=[0, 1, 2, 3, 4],
        k=10, rerank=True, rerank_factor=4).df


def _llm_embedding_join_ivfpq(spark, sf):
    """Round 10 (judge task #1): the ANN join at PQ memory footprint —
    every corpus row attaches its top-2 ADC-scored neighbors (self-
    enrichment, the 100 TB semantic-join workload). Inline build+search at
    the family's bench sizing (16 lists, 4 probed, m=8, cb=16, 1 Lloyd
    pass each) so the record tracks the full cost; the prebuilt entry
    below isolates the join itself."""
    from rasgoql_spark.functions.pq import embedding_join_ivfpq

    emb = entry._s(spark, sf).dataset("embeddings").df
    return embedding_join_ivfpq(
        emb, "embedding", "vec_id", other=emb, k=2, num_centroids=16,
        nprobe=4, coarse_iterations=1, m=8, codebook_size=16, iterations=1)


def _llm_embedding_join_ivfpq_prebuilt(spark, sf):
    """The amortized ANN-join regime: probes + LUT prep + the codes-only
    candidate join against a prebuilt IVFPQIndex (shares the process-
    cached index with llm_similarity_ivfpq_prebuilt — same corpus, same
    sizing), isolating what a steady-state enrichment batch pays."""
    from rasgoql_spark.functions.pq import embedding_join_ivfpq, ivfpq_index

    key = ("ivfpq_idx", sf)
    emb = entry._s(spark, sf).dataset("embeddings").df
    if key not in _IVF_STATE:
        _IVF_STATE[key] = _built(ivfpq_index(
            emb, "embedding", "vec_id", num_centroids=16,
            coarse_iterations=1, m=8, codebook_size=16, iterations=1))
    return embedding_join_ivfpq(
        emb, "embedding", "vec_id", k=2, nprobe=4, index=_IVF_STATE[key])


def _llm_similarity_binary_prebuilt(spark, sf):
    """Round 10 (judge task #6): the amortized binary-ANN regime — the
    Hamming scan reads the BinaryIndex's stored 8-byte signatures instead
    of re-packing full vectors per call (pack paid once per bench
    process), then the exact-cosine rerank. Mirrors
    llm_similarity_ivf_prebuilt for the 1-bit end of the ladder."""
    from rasgoql_spark.functions.similarity import (
        binary_index,
        similarity_search_binary,
    )

    key = ("binary_idx", sf)
    emb = entry._s(spark, sf).dataset("embeddings").df
    if key not in _IVF_STATE:
        _IVF_STATE[key] = _built(binary_index(emb, "embedding", "vec_id"))
    return similarity_search_binary(
        emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=10, rerank=True,
        rerank_factor=4, index=_IVF_STATE[key])


def _llm_ivfpq_rerank_prebuilt(spark, sf):
    """Round 10: the IVFADC+R refine stage on the amortized path — same
    prebuilt index and probe work as llm_similarity_ivfpq_prebuilt plus
    the exact-cosine re-rank of the 40 ADC survivors per query; the delta
    between the two entries IS the refine cost (recall evidence:
    SCALING.md r10, +0.21 recall@10 on the anisotropic corpus)."""
    from rasgoql_spark.functions.pq import ivfpq_index, similarity_search_ivfpq

    key = ("ivfpq_idx", sf)
    emb = entry._s(spark, sf).dataset("embeddings").df
    if key not in _IVF_STATE:
        _IVF_STATE[key] = _built(ivfpq_index(
            emb, "embedding", "vec_id", num_centroids=16,
            coarse_iterations=1, m=8, codebook_size=16, iterations=1))
    return similarity_search_ivfpq(
        emb, "embedding", "vec_id", [0, 1, 2, 3, 4], k=10, nprobe=4,
        rerank=True, rerank_factor=4, index=_IVF_STATE[key])


def _llm_zorder(spark, sf):
    """Round 10: the Morton layout key over lineitem's (partkey, suppkey)
    — one bounded min/max aggregate plus a per-row integer bit interleave
    (the compute half of save_shards(zorder_by=...); the write half is
    the one range shuffle any clustered write pays). Pruning evidence:
    SCALING.md r10 (2-D filter reads 6.2% of row groups vs 100%)."""
    from rasgoql_spark.functions.layout import zorder

    li = entry._s(spark, sf).dataset("lineitem").df
    return zorder(li, ["l_partkey", "l_suppkey"], bits=8).select(
        "l_orderkey", "l_linenumber", "ZVALUE")


# _URL_APPLY drops text/lang (built for the url-only oracles); the e2e
# pipeline carries them through the same synthetic url soup
_E2E_URL_APPLY = entry._URL_APPLY.replace(
    "SELECT doc_id, CASE", "SELECT doc_id, text, lang, CASE")


def _llm_pipeline_e2e(spark, sf):
    """Round 10 (judge task #5): the composed curation chain — the
    north-star workload every LLM op is benched solo for. One plan:
    url synth -> url_normalize -> dedup_url -> eval-ngram decontaminate
    -> Gopher quality gate -> MinHash-LSH near-dup filter -> weighted
    lang remix. Catches cross-operator cache/shuffle interactions no
    per-op entry sees (the scoped-cache bug class of r7/r8)."""
    s = entry._s(spark, sf)
    ev = s.dataset("documents").filter(filter_statements=["doc_id % 50 = 0"])
    cleaned = (
        s.dataset("documents")
        .apply(sql=_E2E_URL_APPLY)
        .url_normalize(url="url")
        .dedup_url(url="url", id_col="doc_id")
        .decontaminate(text="text", id_col="doc_id", eval_table=ev,
                       ngram=5, threshold=0.5, mode="filter")
        .quality_filter(text="text", min_tokens=20, max_word_rep_ratio=0.6)
        .dedup_minhash(text="text", id_col="doc_id", threshold=0.2,
                       mode="filter")
    )
    en = cleaned.filter(filter_statements=["lang = 'en'"])
    rest = cleaned.filter(filter_statements=["lang <> 'en'"])
    return en.mix_datasets(others=[rest], weights=[3, 1], key="doc_id").df


def _llm_embedding_join_binary(spark, sf):
    """Round 10: the big-big Hamming join — every corpus row vs the whole
    corpus through the pigeonhole nibble-band equi-join (no broadcast, no
    per-row corpus scan; the only ANN join shape that survives a
    billion x billion input). Self-enrichment at k=3 within Hamming 15."""
    from rasgoql_spark.functions.similarity import embedding_join_binary

    emb = entry._s(spark, sf).dataset("embeddings").df
    return embedding_join_binary(
        emb, "embedding", "vec_id", other=emb, k=3, max_hamming=15)


def _b6_encode_split(spark, sf):
    s = entry._s(spark, sf)
    return (
        s.dataset("orders")
        .one_hot_encode(column="o_orderpriority", list_of_vals=entry._PRIORITIES)
        .train_test_split(order_by=["o_orderdate", "o_orderkey"], train_percent=0.8)
        .df
    )


BENCH_QUERIES = {
    "b1_filter_project": entry.q_filter_project,
    "b2_aggregate": entry.q_aggregate,
    "b3_join_agg": entry.q_join_agg,
    "b4_window_chain": _b4_window_chain,
    "b5_pivot": entry.q_pivot,
    "b6_encode_split": _b6_encode_split,
    "b7_rolling_agg": entry.q_rolling_agg,
    "b8_tumbling_window": entry.q_tumbling_window,
    "llm_dedup_minhash": entry.q_dedup_minhash,
    "llm_similarity_search": entry.q_similarity_search,
    # the 100 TB-scale ANN path (brute above is the exact/oracle baseline):
    # inline fit at the baseline's fixed sizing (series-comparable; the
    # operator default is now auto — see _llm_similarity_ivf)
    "llm_similarity_ivf": _llm_similarity_ivf,
    "llm_text_quality": entry.q_text_quality,
    # curation flagships: broadcast eval-ngram decontamination + row-local
    # PII scrub (zero-shuffle regex path)
    "llm_decontaminate": entry.q_decontaminate,
    "llm_pii_scrub": entry.q_pii_scrub,
    # round-4 flagships: local-substring overlap dedup + bigram LM scoring
    "llm_dedup_winnow": entry.q_dedup_winnow,
    "llm_bigram_logprob": entry.q_bigram_logprob,
    # round-5 additions: the two slowest operators in SCALING.md, benched
    # so regressions get caught (iterative join+agg graph fit; k-means fit
    # + per-cluster pair join with exact-dup collapse)
    "llm_pagerank": entry.q_pagerank,
    "llm_semantic_dedup": entry.q_semantic_dedup,
    # round-6 flagships: exact containment dedup (inverted-index self-join
    # — the shuffle-heaviest dedup family member) and the ANN join (IVF
    # fit + nprobe inverted-list probe per left row)
    "llm_ngram_containment": entry.q_ngram_containment,
    "llm_embedding_join_ivf": entry.q_embedding_join_ivf_raw,
    # round-7 additions: the amortized ANN search path (fit excluded) and
    # the incremental family flagships (VERDICT r6 items 3 + 7)
    "llm_similarity_ivf_prebuilt": _llm_similarity_ivf_prebuilt,
    "llm_update_ivf_index": _llm_update_ivf_index,
    "llm_dedup_against_embedding": entry.q_dedup_against_embedding,
    # round-8 addition: the PQ-compressed ANN path (exact-replay contract)
    # — inline build+search, and the amortized prebuilt-index form
    "llm_similarity_ivfpq": _llm_similarity_ivfpq,
    "llm_similarity_ivfpq_prebuilt": _llm_similarity_ivfpq_prebuilt,
    "llm_dedup_ivfpq_prebuilt": _llm_dedup_ivfpq_prebuilt,
    "llm_similarity_binary": _llm_similarity_binary,
    # round-10 additions: the PQ-coded ANN join (inline + amortized), the
    # amortized binary-ANN regime, and the composed end-to-end curation
    # pipeline (judge tasks #1/#5/#6)
    "llm_embedding_join_ivfpq": _llm_embedding_join_ivfpq,
    "llm_embedding_join_ivfpq_prebuilt": _llm_embedding_join_ivfpq_prebuilt,
    "llm_similarity_binary_prebuilt": _llm_similarity_binary_prebuilt,
    "llm_pipeline_e2e": _llm_pipeline_e2e,
    "llm_embedding_join_binary": _llm_embedding_join_binary,
    # round-10 additions (second batch): the IVFADC+R refine stage on the
    # amortized path, and the Morton layout key
    "llm_ivfpq_rerank_prebuilt": _llm_ivfpq_rerank_prebuilt,
    "llm_zorder": _llm_zorder,
    # round-10 text-analysis addition: PMI collocation mining (distributed
    # bigram/unigram counting over the scoped-persisted token stage)
    "llm_pmi_collocations": entry.q_pmi_collocations,
    # round-10 additions (third batch): hybrid lexical+semantic retrieval
    # (BM25 + literal-query cosine fused by RRF) and the oriented-wedge
    # triangle counter (the join-heaviest new graph op)
    "llm_hybrid_search": entry.q_hybrid_search,
    "llm_triangle_count": entry.q_triangle_count,
    # round-10 addition (fourth batch): batch retrieval over the inverted
    # postings join (broadcast query terms, exact integer-sum scores)
    "llm_bm25_join": entry.q_bm25_join,
    # round-11 additions: the mergeable frequency-sketch path (shard build
    # + merge + estimate — shuffle bounded by groups x depth x width), the
    # contrastive-training hard-negative miner (broadcast queries + one
    # corpus scan + k-bounded window), and the skew-pruned per-group cap
    "llm_cms_merge": entry.q_cms_merge_estimate,
    "llm_hard_negatives": entry.q_hard_negative_mine,
    "llm_cap_per_group": entry.q_cap_per_group,
    # round-12 addition: exact maximal-substring dedup (positioned-
    # shingle inverted index + per-diagonal run extension — the
    # shuffle shape is the capped posting self-join, same family as
    # llm_ngram_containment but with positions and a window per
    # (pair, diagonal))
    "llm_dedup_substring": entry.q_dedup_substring,
    # the amortized incremental form (prebuilt SubstringIndex, build
    # paid once per process — the dedup_against family bench shape)
    "llm_dedup_against_substring": _llm_dedup_against_substring,
    # round-13 addition: trainable hashed char-trigram NB language ID.
    # The fit is INSIDE the timed body by design — the closed-form
    # counting fit IS the operator (two vocabulary-bounded aggregations
    # + broadcast-label scoring), the nb_classify cost shape
    "llm_language_id_model": entry.q_language_id_model,
}


def run_one(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = rql.default_spark(
        app_name="rasgoql_spark_bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # SPARK_GRAFT_BENCH_ONLY="b1_filter_project,b2_aggregate" runs a subset
    # (A/B experiments — e.g. re-running the r4 query set under r5+ code to
    # separate machine load from harness interactions); default = full set
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    queries = BENCH_QUERIES
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        queries = {n: f for n, f in BENCH_QUERIES.items() if n in keep}
    # Calibration anchor (round-11 verdict task #2): a frozen raw-pyspark
    # workload timed before and after the entry set. calib_sec divided by
    # BASELINE.md's calib_sec_ref estimates how much slower THIS host/run
    # is than the one the baselines were recorded on; calib_sec_end
    # brackets drift that develops during the run itself.
    calib_start = calibrate(spark, sf_dir)
    results: dict[str, float] = {}
    build_counts: dict[str, int] = {}
    for name, fn in queries.items():
        run_one(fn, spark, sf_dir)  # warm-up (pays one-off index builds)
        before = _BUILD_COUNT
        times = [run_one(fn, spark, sf_dir) for _ in range(5)]
        results[name] = round(statistics.median(times), 3)
        if name in _PREBUILT_ENTRIES:
            # expected 0: a nonzero delta means an index build leaked into
            # the timed window and the reading is not baseline-comparable
            build_counts[name] = _BUILD_COUNT - before
    calib_end = calibrate(spark, sf_dir)
    total = round(sum(results.values()), 3)
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "calib_sec": calib_start,
        "calib_sec_end": calib_end,
        "build_counts": build_counts,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
