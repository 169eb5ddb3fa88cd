"""Property-based tests (hypothesis) for the pure-Python layers, plus
determinism properties of data-dependent operators."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rasgoql_spark.guard import is_scary_sql
from rasgoql_spark.naming import agg_name, cleanse_name, lag_name

ident_ok = st.text(min_size=0, max_size=40)


@given(ident_ok)
@settings(max_examples=200, deadline=None)
def test_cleanse_name_is_valid_identifier(s):
    out = cleanse_name(s)
    assert out and out == out.upper()
    assert not out[0].isdigit()
    assert all(c.isalnum() or c == "_" for c in out)


@given(ident_ok)
@settings(max_examples=100, deadline=None)
def test_cleanse_name_idempotent(s):
    once = cleanse_name(s)
    assert cleanse_name(once) == once


@given(st.text(alphabet=st.characters(categories=["L", "N"]), min_size=1, max_size=20),
       st.sampled_from(["SUM", "MIN", "MAX", "AVG", "COUNT", "COUNT DISTINCT"]))
@settings(max_examples=50, deadline=None)
def test_agg_name_convention(col, agg):
    out = agg_name(col, agg)
    assert out.endswith(agg.replace(" ", "_").upper())


@given(st.integers(min_value=-20, max_value=20).filter(lambda n: n != 0))
@settings(max_examples=50, deadline=None)
def test_lag_name_sign(n):
    out = lag_name("v", n)
    assert out.startswith("LEAD_" if n < 0 else "LAG_")
    assert out.endswith(f"_{abs(n)}")


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_scary_guard_no_false_negatives(s):
    for kw in ("DROP", "DELETE", "TRUNCATE"):
        assert is_scary_sql(f"{s} {kw} TABLE t")


def test_scary_guard_word_boundaries():
    # keywords inside identifiers must NOT trip the guard
    assert not is_scary_sql("SELECT dropped_at, updated_count FROM t")
    assert is_scary_sql("update t set x = 1")


def test_deterministic_sample_is_stable(session):
    a = session.dataset("lineitem").sample(percent=10, key="l_orderkey").df
    b = session.dataset("lineitem").sample(percent=10, key="l_orderkey").df
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_join_equals_plain_join(session):
    plain = session.dataset("lineitem").join(
        join_table=session.dataset("orders"),
        join_columns={"l_orderkey": "o_orderkey"}, join_prefix="O").df
    salted = session.dataset("lineitem").join(
        join_table=session.dataset("orders"),
        join_columns={"l_orderkey": "o_orderkey"}, join_prefix="O", salt=4).df
    assert salted.columns == plain.columns
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_ivf_recall_against_brute(session):
    brute = session.dataset("embeddings").similarity_search(
        vec_col="embedding", id_col="vec_id", query_ids=[0, 1, 2], k=10).df.collect()
    ivf = session.dataset("embeddings").similarity_search_ivf(
        vec_col="embedding", id_col="vec_id", query_ids=[0, 1, 2], k=10).df.collect()
    bset = {(r["QUERY_ID"], r["MATCH_ID"]) for r in brute}
    iset = {(r["QUERY_ID"], r["MATCH_ID"]) for r in ivf}
    assert len(bset & iset) / len(bset) >= 0.5  # nprobe=4/16 keeps most of top-10


@given(st.integers(min_value=0, max_value=500), st.integers(min_value=1, max_value=40))
@settings(max_examples=200, deadline=None)
def test_ntile_formula_matches_spark_definition(n, buckets):
    """ntile_from_rownumber's arithmetic == Spark's NTILE: the first n % b
    tiles get ceil(n/b) rows, the rest floor(n/b)."""
    base, rem = divmod(n, buckets)

    def formula(r0):  # Python mirror of the Column expression
        if base == 0:
            return r0 + 1
        big = rem * (base + 1)
        return (r0 // (base + 1) if r0 < big else rem + (r0 - big) // base) + 1

    expected = []
    for tile in range(1, buckets + 1):
        size = base + (1 if tile <= rem else 0)
        expected.extend([tile] * size)
    assert [formula(r) for r in range(n)] == expected


@given(st.integers(min_value=1, max_value=2**31 - 1),
       st.integers(min_value=1, max_value=2**31 - 1),
       st.sampled_from([0, 2, 3, 4, 6]))
@settings(max_examples=100, deadline=None)
def test_png_header_roundtrip(w, h, color_type):
    from rasgoql_spark.functions.multimodal import _PNG_MODES, _parse_image_header

    data = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color_type, 0, 0, 0]))
    assert _parse_image_header(data) == (w, h, _PNG_MODES[color_type])


@given(st.integers(min_value=1, max_value=65535),
       st.integers(min_value=1, max_value=65535),
       st.sampled_from([1, 3, 4]))
@settings(max_examples=100, deadline=None)
def test_jpeg_header_roundtrip(w, h, ncomp):
    from rasgoql_spark.functions.multimodal import _JPEG_MODES, _parse_image_header

    sof = (b"\xff\xc0" + (8 + 3 * ncomp).to_bytes(2, "big") + bytes([8])
           + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp]))
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    assert _parse_image_header(b"\xff\xd8" + app0 + sof) == (w, h, _JPEG_MODES[ncomp])


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_image_header_parser_never_crashes(data):
    from rasgoql_spark.functions.multimodal import _parse_image_header

    _parse_image_header(data)  # arbitrary bytes: None or a tuple, no raise


_FILLER = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@given(st.lists(st.sampled_from(_FILLER), min_size=0, max_size=25),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=100, deadline=None)
def test_pii_email_pattern_counts_planted(words, k):
    """Digit-free, @-free filler cannot produce accidental matches, so the
    regex must count exactly the planted entities (same leftmost-first
    semantics in Python re and Java regex)."""
    import re

    from rasgoql_spark.functions.curation import EMAIL_PATTERN, IP_PATTERN

    text = " ".join(words)
    for j in range(k):
        text += f" u{j}@example.com"
    assert len(re.findall(EMAIL_PATTERN, text)) == k
    assert len(re.findall(IP_PATTERN, text)) == 0


@given(st.lists(st.sampled_from(_FILLER), min_size=0, max_size=25),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=100, deadline=None)
def test_pii_ip_pattern_counts_planted(words, k):
    import re

    from rasgoql_spark.functions.curation import IP_PATTERN

    text = " ".join(words)
    for j in range(k):
        text += f" 10.0.{j}.255"
    assert len(re.findall(IP_PATTERN, text)) == k


def test_ngram_counts_conserve_total_mass(session):
    """Term-frequency counts must sum to the exact number of n-grams in the
    corpus: sum over docs of max(len(tokens) - n + 1, 0)."""
    from pyspark.sql import functions as F

    from rasgoql_spark.functions._hash import tokens_expr

    n = 3
    counted = session.dataset("documents").ngram_counts(text="text", n=n).df
    total = counted.agg(F.sum("N_OCCURRENCES")).first()[0]
    expected = (
        session.dataset("documents").df
        .select(F.greatest(
            F.size(tokens_expr(F.col("text"))) - F.lit(n - 1), F.lit(0)
        ).alias("k"))
        .agg(F.sum("k")).first()[0]
    )
    assert total == expected


@given(st.integers(min_value=1, max_value=8),
       st.integers(min_value=8000, max_value=192000),
       st.sampled_from([8, 16, 24, 32]),
       st.integers(min_value=0, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_wav_header_roundtrip(ch, sr, bits, nsamples):
    import struct

    from rasgoql_spark.functions.multimodal import _parse_wav_header

    ba = max(ch * bits // 8, 1)
    br = sr * ba
    data_size = nsamples * ba
    blob = (b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr, br, ba, bits)
            + b"data" + struct.pack("<I", data_size))
    got = _parse_wav_header(blob)
    assert got == (ch, sr, bits, data_size * 1000 // br)


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_wav_header_parser_never_crashes(data):
    from rasgoql_spark.functions.multimodal import _parse_wav_header

    out = _parse_wav_header(data)
    assert out is None or len(out) == 4


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_mp4_header_parser_never_crashes(data):
    from rasgoql_spark.functions.multimodal import _parse_mp4_header

    out = _parse_mp4_header(data)
    assert out is None or len(out) == 3


@given(st.integers(min_value=1, max_value=65535),
       st.integers(min_value=1, max_value=65535),
       st.sampled_from([1, 3, 4]),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=50, deadline=None)
def test_jpeg_header_with_fill_bytes(w, h, ncomp, n_fill):
    """0xFF fill/padding bytes are legal before any JPEG marker; the segment
    walk must consume them instead of mis-reading a marker byte as a length."""
    from rasgoql_spark.functions.multimodal import _JPEG_MODES, _parse_image_header

    fill = b"\xff" * n_fill
    sof = (b"\xff\xc0" + (8 + 3 * ncomp).to_bytes(2, "big") + bytes([8])
           + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp]))
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    data = b"\xff\xd8" + fill + app0 + fill + sof
    assert _parse_image_header(data) == (w, h, _JPEG_MODES[ncomp])


@given(
    st.lists(
        st.tuples(st.sampled_from("ab"), st.sampled_from("ab")),
        min_size=1, max_size=4, unique=True,
    ),
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=12),
        min_size=1, max_size=5,
    ),
)
@settings(max_examples=150, deadline=None)
def test_bpe_replace_fold_equals_priority_merging(char_merges, words):
    """Property: the rank-order string-replace fold (pure Python mirror of
    the Spark/DuckDB expression) equals classic min-rank-first BPE for ANY
    valid merge table over a tiny alphabet — including pathological runs
    like 'aaaa' with rule (a, a). Valid tables only contain symbols created
    by earlier rules, which we construct by chaining char merges."""
    # build a valid merge table: char-level rules first, then one composite
    merges = list(char_merges)
    if len(merges) >= 2:
        a0, b0 = merges[0]
        a1, b1 = merges[1]
        merges.append((a0 + b0, a1 + b1))  # symbol from rule 0 + rule 1
    ranks = {m: r for r, m in enumerate(merges)}

    def fold_encode(word):  # the replace-fold construction
        s = "  " + "  ".join(word) + "  "
        for x, y in merges:
            s = s.replace(f" {x}  {y} ", f" {x}{y} ")
        return [p for p in s.strip().split("  ") if p]

    def prio_encode(word):  # classic min-rank-first reference
        syms = list(word)
        while len(syms) > 1:
            best, bi = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        return syms

    for w in words:
        assert fold_encode(w) == prio_encode(w), (w, merges)


@given(st.integers(min_value=0, max_value=4),
       st.sampled_from([0.1, 0.25, 0.5, 1.0, 2.0]),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=20, deadline=None)
def test_logreg_oracle_sql_generator_always_parses(iterations, lr, k):
    """The unrolled-GD SQL generator must emit valid DuckDB SQL for any
    (iterations, lr, feature-count) the operator accepts."""
    import duckdb

    from rasgoql_spark.functions.logreg import logreg_oracle_sql

    feats = [f"x{j}" for j in range(k)]
    cols = ", ".join(f"CAST({j + 1} AS DOUBLE) AS x{j}" for j in range(k))
    con = duckdb.connect()
    con.sql(f"CREATE TABLE t AS SELECT {cols}, 1 AS yl UNION ALL SELECT {cols}, 0")
    sql = logreg_oracle_sql("SELECT * FROM t", feats, "yl",
                            lr=lr, iterations=iterations, select_cols="x0")
    rows = con.sql(sql).fetchall()
    assert len(rows) == 2 and all(0.0 <= r[-1] <= 1.0 for r in rows)


@given(st.integers(min_value=0, max_value=4),
       st.sampled_from([0.5, 0.85, 0.99]))
@settings(max_examples=15, deadline=None)
def test_pagerank_oracle_sql_generator_always_parses(iterations, damping):
    import duckdb

    from rasgoql_spark.functions.graph import pagerank_oracle_sql

    con = duckdb.connect()
    con.sql("CREATE TABLE edges_t AS SELECT 1 src, 2 dst UNION ALL SELECT 2, 3 "
            "UNION ALL SELECT 3, 1 UNION ALL SELECT 1, 4")
    sql = pagerank_oracle_sql("SELECT * FROM edges_t", damping=damping,
                              iterations=iterations)
    rows = con.sql(sql).fetchall()
    assert len(rows) == 4
    total = sum(r[1] for r in rows)
    assert abs(total - 1.0) < 1e-6  # mass conserved at every depth


def test_semantic_dedup_collapse_equals_naive_pair_join(spark):
    """The round-5 exact-dup collapse must be result-preserving: on a
    randomized corpus with planted duplicate groups and zero vectors, the
    kept-id set equals the naive all-within-cluster pair join's."""
    import numpy as np
    from pyspark.sql import functions as F

    from rasgoql_spark.functions.cluster import (
        _unit_rounded, kmeans_cluster, semantic_dedup)

    rng = np.random.default_rng(42)
    rows = []
    vid = 0
    for g in range(12):           # 12 groups of 1-6 exact duplicates
        v = [float(x) for x in rng.normal(size=4)]
        for _ in range(int(rng.integers(1, 7))):
            rows.append((vid, v)); vid += 1
    hot = [float(x) for x in rng.normal(size=4)]
    for _ in range(25):           # one 25-copy group forces the collapse path
        rows.append((vid, hot)); vid += 1
    for _ in range(3):            # zero vectors (self-cos 0 edge case)
        rows.append((vid, [0.0, 0.0, 0.0, 0.0])); vid += 1
    for _ in range(20):           # singletons
        rows.append((vid, [float(x) for x in rng.normal(size=4)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for threshold in (0.9, 0.0, -0.5):
        kept = {r["vec_id"] for r in semantic_dedup(
            df, "embedding", "vec_id", k=3, threshold=threshold)
            .select("vec_id").collect()}
        # naive reference: same assignment, full within-cluster pair join
        assigned = kmeans_cluster(df, "embedding", "vec_id", k=3, iterations=1)
        withu = _unit_rounded(
            assigned.selectExpr("vec_id AS __id", "CLUSTER_ID",
                                "embedding AS __vec"), "__vec")
        a = withu.select(F.col("__id").alias("__ida"), "CLUSTER_ID",
                         F.col("__u").alias("__ua"))
        b = withu.select(F.col("__id").alias("__idb"), "CLUSTER_ID",
                         F.col("__u").alias("__ub"))
        dot = F.aggregate(F.zip_with("__ua", "__ub", lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        naive_drops = {r["__idb"] for r in (
            a.join(b, on="CLUSTER_ID")
            .filter(F.col("__ida") < F.col("__idb"))
            .withColumn("__cos", F.round(dot, 6))
            .filter(F.col("__cos") >= threshold)
            .select("__idb").dropDuplicates()).collect()}
        naive_kept = {r for r, _ in rows} - naive_drops
        assert kept == naive_kept, f"threshold={threshold}"


def test_fuzzy_join_length_bucket_schemes_preserve_output(spark):
    """prefix_length/suffix_length must equal their unbucketed scheme on a
    randomized corpus (short alphabet -> plenty of near-matches), for every
    max_distance — the length bucket only prunes candidates the verify
    would reject."""
    import numpy as np

    import rasgoql_spark as rql

    rng = np.random.default_rng(7)
    fuzzy = rql.get_transform("fuzzy_join").apply
    mk = lambda n: "".join(rng.choice(list("abc")) for _ in range(n))  # noqa: E731
    left = spark.createDataFrame(
        [(i, mk(int(rng.integers(0, 8)))) for i in range(120)],
        "id long, s string")
    right = spark.createDataFrame(
        [(1000 + i, mk(int(rng.integers(0, 8)))) for i in range(120)],
        "rid long, s string")
    key = lambda r: (r["id"], r["R_RID"], r["EDIT_DISTANCE"])  # noqa: E731
    for d in (0, 1, 2):
        for plain, bucketed in (("prefix", "prefix_length"),
                                ("suffix", "suffix_length")):
            o1 = sorted(map(key, fuzzy(left, join_table=right, column="s",
                                       max_distance=d, block=plain,
                                       block_len=1).collect()))
            o2 = sorted(map(key, fuzzy(left, join_table=right, column="s",
                                       max_distance=d, block=bucketed,
                                       block_len=1).collect()))
            assert o1 == o2 and o1, (d, plain)


@given(st.floats(min_value=0.05, max_value=0.95),
       st.sampled_from([8, 12, 16, 24, 32, 64]))
@settings(max_examples=40, deadline=None)
def test_minhash_tune_banding_invariants(threshold, num_hashes):
    """The S-curve optimizer must return a valid banding (bands divides
    num_hashes), a knee in (0, 1), and non-negative error areas bounded by
    the integration range on each side of the threshold."""
    from rasgoql_spark.functions.dedup import minhash_tune

    out = minhash_tune(threshold, num_hashes)
    b, r = out["bands"], out["rows_per_band"]
    assert b * r == num_hashes
    # knee = (1/b)^(1/r) is exactly 1.0 for the degenerate-but-legitimate
    # single-band choice high thresholds select
    assert 0.0 < out["knee"] <= 1.0
    # fp integrates collide over [0, threshold); fn integrates miss over
    # [threshold, 1) — each is bounded by its own interval's length
    assert 0.0 <= out["fp_area"] <= threshold + 0.01
    assert 0.0 <= out["fn_area"] <= (1.0 - threshold) + 0.01


@given(st.sampled_from([8, 16, 32]))
@settings(max_examples=10, deadline=None)
def test_minhash_tune_knee_tracks_threshold(num_hashes):
    """Raising the target threshold must never move the chosen knee DOWN:
    a higher-threshold objective penalizes low-similarity collisions more,
    so the selected banding's knee is monotone non-decreasing."""
    from rasgoql_spark.functions.dedup import minhash_tune

    knees = [minhash_tune(t, num_hashes)["knee"]
             for t in (0.1, 0.3, 0.5, 0.7, 0.9)]
    assert knees == sorted(knees)


# ---------------------------------------------------------------------------
# classifier_eval metric math (renderer evaluated on DuckDB per example —
# milliseconds each; the renderer==DataFrame-path equality is pinned
# separately in test_sql_parity.py, so this transitively covers Spark)
# ---------------------------------------------------------------------------

_cls_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),
        # coarse score grid to exercise cross-class ties heavily
        st.integers(min_value=-10, max_value=10).map(lambda i: i / 10.0),
    ),
    min_size=1,
    max_size=60,
)


@given(_cls_rows, st.sampled_from([-0.5, 0.0, 0.35]))
@settings(max_examples=60, deadline=None)
def test_classifier_eval_matches_pairwise_reference(rows, threshold):
    import duckdb
    import pandas as pd

    from rasgoql_spark.functions.classify import _r_classifier_eval

    con = duckdb.connect()
    con.register("t_prop", pd.DataFrame(rows, columns=["y", "s"]))
    got = con.sql(
        _r_classifier_eval("t_prop", "y", "s", threshold=threshold)
    ).df().iloc[0].to_dict()
    con.close()

    pos = [s for y, s in rows if y != 0]
    neg = [s for y, s in rows if y == 0]
    tp = sum(1 for s in pos if s >= threshold)
    fp = sum(1 for s in neg if s >= threshold)
    assert got["N"] == len(rows)
    assert got["N_POS"] == len(pos) and got["N_NEG"] == len(neg)
    assert got["TP"] == tp and got["FP"] == fp
    assert got["FN"] == len(pos) - tp and got["TN"] == len(neg) - fp
    assert abs(got["ACCURACY"] - (tp + len(neg) - fp) / len(rows)) <= 1e-6
    if tp + fp == 0:
        assert pd.isna(got["PRECISION"])
    else:
        assert abs(got["PRECISION"] - tp / (tp + fp)) <= 1e-6
    if not pos:
        assert pd.isna(got["RECALL"])
    else:
        assert abs(got["RECALL"] - tp / len(pos)) <= 1e-6
    if not pos or not neg:
        assert pd.isna(got["AUC"])
    else:
        auc = sum(
            1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
        ) / (len(pos) * len(neg))
        assert abs(got["AUC"] - auc) <= 1e-6


# --------------------------------------------------------------------------
# round-11 invariants: CMS bounds/mergeability, cap cardinality, curriculum
# monotonicity (hypothesis generates the data; Spark round-trips are kept
# small and example counts low — each draw is a distributed job)
# --------------------------------------------------------------------------

_values = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=1, max_size=60
)


@given(_values, st.integers(min_value=1, max_value=3),
       st.sampled_from([8, 16, 32]))
@settings(max_examples=8, deadline=None)
def test_cms_estimate_overestimates_only(spark, vals, depth, width):
    from collections import Counter

    from rasgoql_spark.functions.cms import cms_estimate, cms_sketch

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id BIGINT, v STRING")
    sk = cms_sketch(df, "v", depth=depth, width=width)
    truth = Counter(vals)
    est = {r["VALUE"]: r["EST"]
           for r in cms_estimate(sk, sorted(set(vals))).collect()}
    for v, c in truth.items():
        assert est[v] >= c                    # CMS never undercounts
        assert est[v] <= len(vals)            # and never exceeds N


@given(_values)
@settings(max_examples=6, deadline=None)
def test_cms_merge_equals_rebuild(spark, vals):
    from pyspark.sql import functions as F

    from rasgoql_spark.functions.cms import cms_estimate, cms_merge, cms_sketch

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id BIGINT, v STRING")
    whole = cms_sketch(df, "v", depth=2, width=16)
    shards = cms_sketch(df.withColumn("s", F.col("id") % 2), "v", ["s"],
                        depth=2, width=16)
    merged = cms_merge(shards).drop("SHAPE_OK")
    q = sorted(set(vals))
    a = {r["VALUE"]: r["EST"] for r in cms_estimate(whole, q).collect()}
    b = {r["VALUE"]: r["EST"] for r in cms_estimate(merged, q).collect()}
    assert a == b


@given(st.integers(min_value=1, max_value=9),
       st.lists(st.integers(min_value=0, max_value=4), min_size=1,
                max_size=40))
@settings(max_examples=8, deadline=None)
def test_cap_per_group_cardinality(spark, k, groups):
    from collections import Counter

    from rasgoql_spark.functions.curation import cap_per_group

    df = spark.createDataFrame(
        [(i, f"g{g}") for i, g in enumerate(groups)], "id BIGINT, g STRING"
    )
    out = cap_per_group(df, ["g"], k=k, key="id").collect()
    got = Counter(r["g"] for r in out)
    want = Counter(f"g{g}" for g in groups)
    for g, n in want.items():
        assert got[g] == min(k, n)            # exactly min(k, |group|) survive


@given(st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False), min_size=2, max_size=40,
                unique=True))
@settings(max_examples=8, deadline=None)
def test_curriculum_buckets_monotone_in_score(spark, scores):
    from rasgoql_spark.functions.mix import curriculum_order

    df = spark.createDataFrame([(i, s) for i, s in enumerate(scores)],
                               "id BIGINT, score DOUBLE")
    rows = curriculum_order(df, "score", "id", n_buckets=4).collect()
    by_score = sorted(rows, key=lambda r: r["score"])
    buckets = [r["CURRICULUM_BUCKET"] for r in by_score]
    assert buckets == sorted(buckets)         # bucket is monotone in score
    assert buckets[0] == 0 and buckets[-1] == 3


# --------------------------------------------------------------------------
# round-11 advisory-fix invariants: merge_upsert duplicate-key determinism,
# RRF null-absence semantics
# --------------------------------------------------------------------------

@given(st.lists(st.tuples(st.integers(min_value=1, max_value=5),
                          st.sampled_from(["a", "b", "c"])),
                min_size=1, max_size=15),
       st.lists(st.tuples(st.integers(min_value=1, max_value=5),
                          st.sampled_from(["X", "Y"])),
                min_size=1, max_size=10))
@settings(max_examples=6, deadline=None)
def test_merge_upsert_duplicates_deterministic_and_snapshot_wins(
        spark, base_rows, snap_rows):
    from rasgoql_spark.functions.snapshot import merge_upsert

    base = spark.createDataFrame(base_rows, "k BIGINT, v STRING")
    snap = spark.createDataFrame(snap_rows, "k BIGINT, v STRING")
    runs = [
        sorted(tuple(r) for r in merge_upsert(base, snap, ["k"]).collect())
        for _ in range(2)
    ]
    assert runs[0] == runs[1]                       # deterministic survivor
    out = dict(runs[0])
    assert len(runs[0]) == len(out)                 # one row per key
    snap_keys = {k for k, _ in snap_rows}
    for k, v in out.items():
        if k in snap_keys:
            assert v in ("X", "Y")                  # snapshot always wins
        else:
            assert v in ("a", "b", "c")


@given(st.lists(st.tuples(st.floats(min_value=0, max_value=10,
                                    allow_nan=False),
                          st.booleans()),
                min_size=2, max_size=12))
@settings(max_examples=6, deadline=None)
def test_rrf_null_rows_contribute_zero(spark, rows):
    """Rows with a NULL score in one ranking get exactly the other
    ranking's term — never a last-place contribution."""
    from rasgoql_spark.functions.relevance import rrf_fuse

    data = [(i, s, (s if has else None)) for i, (s, has) in enumerate(rows)]
    df = spark.createDataFrame(data, "id BIGINT, lex DOUBLE, sem DOUBLE")
    out = {r["id"]: r for r in rrf_fuse(df, "id", ["lex", "sem"]).collect()}
    for i, (s, has) in enumerate(rows):
        r = out[i]
        want = 1.0 / (60 + r["RANK_LEX"])
        if has:
            want += 1.0 / (60 + r["RANK_SEM"])
        else:
            assert r["RANK_SEM"] is None
        assert abs(r["RRF_SCORE"] - round(want, 6)) < 1e-9


# ---------------------------------------------------------------------------
# round-12 invariants: ranking_eval recall@k / AP vs a pairwise reference
# (same standard as test_classifier_eval_matches_pairwise_reference)
# ---------------------------------------------------------------------------

_rank_labels = st.lists(
    st.integers(min_value=0, max_value=3),   # graded labels incl. all-zero
    min_size=1, max_size=14,
)


@given(_rank_labels, st.integers(min_value=1, max_value=8))
@settings(max_examples=10, deadline=None)
def test_ranking_eval_recall_ap_match_pairwise_reference(spark, labels, k):
    """RECALL_K and AP equal the brute-force per-position reference:
    recall = hits@k / total_relevant; AP = mean over relevant ranked
    positions i<=k of precision@i, divided by TOTAL relevant (TREC)."""
    from rasgoql_spark.functions.relevance import ranking_eval

    rows = [(1, i + 1, lab) for i, lab in enumerate(labels)]
    df = spark.createDataFrame(rows, "q BIGINT, rank INT, rel INT")
    out = ranking_eval(df, "q", "rank", "rel", k=k).collect()[0]

    n_rel = sum(1 for lab in labels if lab > 0)
    hits = sum(1 for i, lab in enumerate(labels) if lab > 0 and i + 1 <= k)
    if n_rel == 0:
        assert out[f"RECALL_{k}"] == 0.0 and out["AP"] == 0.0
        return
    assert out[f"RECALL_{k}"] == pytest.approx(hits / n_rel, abs=1e-6)
    ap = 0.0
    seen = 0
    for i, lab in enumerate(labels):
        if lab > 0:
            seen += 1
            if i + 1 <= k:
                ap += seen / (i + 1)
    assert out["AP"] == pytest.approx(ap / n_rel, abs=1e-6)


@given(st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30),
    min_size=2, max_size=6,
), st.integers(min_value=2, max_value=4))
@settings(max_examples=10, deadline=None)
def test_max_positions_neutral_on_low_repetition_corpora(spark, docs, k):
    """Round-13 cap neutrality property: when no (doc, fp) exceeds the
    cap, dedup_substring with the default max_positions=20 is
    bit-identical to the unbounded paper-exact path; generated examples
    that DO exceed the cap are skipped (that is the bounded-recall
    regime, pinned separately by the generation-loop test)."""
    from collections import Counter

    from hypothesis import assume

    from rasgoql_spark.functions.dedup import dedup_substring

    for toks in docs:
        c = Counter(tuple(toks[j:j + k]) for j in range(len(toks) - k + 1))
        assume(not c or max(c.values()) <= 20)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "id BIGINT, text STRING")
    capped = sorted(map(tuple, dedup_substring(
        df, "text", "id", min_tokens=k, max_doc_freq=None).collect()))
    unbounded = sorted(map(tuple, dedup_substring(
        df, "text", "id", min_tokens=k, max_doc_freq=None,
        max_positions=None).collect()))
    assert capped == unbounded
