"""Similarity search over embedding columns (north-star extension;
SURVEY §7.2 M7): brute-force cosine top-k as the exact baseline, an
LSH-bucketed variant as the scale path.

Scale notes: the query side is assumed small relative to the corpus and is
broadcast — the corpus never shuffles. Cosine is computed with JVM array
expressions (zip_with + aggregate) in double precision; no Python UDF in the
hot path. The LSH variant prunes the corpus per query to matching
hyperplane-sign buckets, trading recall for a ~2^planes fan-in reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import resolve_col
from ..registry import spark_transform
from ._cache import release_with
from .dedup import _hyperplane_sign, cosine_expr


@spark_transform("similarity_search", category="similarity", streaming_ok=False)
def similarity_search(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    queries: DataFrame | None = None,
    query_ids=None,
    k: int = 10,
    method: str = "brute",
    num_planes: int = 6,
    round_scores: int | None = 6,
) -> DataFrame:
    """Top-k nearest corpus rows per query by cosine similarity.

    Queries come either as a DataFrame (same vec/id columns) or as
    ``query_ids`` selecting rows of the corpus itself. method='brute' scans
    the whole corpus per query (exact); method='lsh' compares only rows in
    the query's hyperplane-sign bucket (approximate, may return <k).
    Output (QUERY_ID, MATCH_ID, COSINE, RANK) excluding self-matches.
    """
    v, i = resolve_col(df, vec_col), resolve_col(df, id_col)
    corpus = df.select(F.col(i).alias("MATCH_ID"), F.col(v).alias("__cvec"))
    if queries is None:
        if query_ids is None:
            raise ParameterException("pass queries or query_ids")
        qdf = df.filter(F.col(i).isin(list(query_ids)))
    else:
        qdf = queries
    q = qdf.select(
        F.col(resolve_col(qdf, i)).alias("QUERY_ID"),
        F.col(resolve_col(qdf, v)).alias("__qvec"),
    )
    if method == "brute":
        joined = corpus.crossJoin(F.broadcast(q))
    elif method == "lsh":
        csig = F.concat_ws(
            "", *[_hyperplane_sign(F.col("__cvec"), j).cast("string") for j in range(num_planes)]
        )
        qsig = F.concat_ws(
            "", *[_hyperplane_sign(F.col("__qvec"), j).cast("string") for j in range(num_planes)]
        )
        joined = corpus.withColumn("__sig", csig).join(
            F.broadcast(q.withColumn("__sig", qsig)), on="__sig"
        )
    else:
        raise ParameterException("method must be 'brute' or 'lsh'")
    cos = cosine_expr(F.col("__qvec"), F.col("__cvec"))
    if round_scores is not None:
        cos = F.round(cos, round_scores)
    scored = (
        joined.filter(F.col("QUERY_ID") != F.col("MATCH_ID"))
        .withColumn("COSINE", cos)
    )
    w = Window.partitionBy("QUERY_ID").orderBy(F.col("COSINE").desc(), F.col("MATCH_ID").asc())
    return (
        scored.withColumn("RANK", F.row_number().over(w))
        .filter(F.col("RANK") <= k)
        .select("QUERY_ID", "MATCH_ID", "COSINE", "RANK")
    )


def _elementwise_mean(df: DataFrame, group_col: str, vec_col: str) -> DataFrame:
    """Per-group elementwise mean of array columns via posexplode →
    (group, pos) average → re-assemble sorted by position. Distributed —
    no driver-side vector math."""
    exploded = df.select(group_col, F.posexplode(vec_col).alias("__pos", "__v"))
    return (
        exploded.groupBy(group_col, "__pos")
        .agg(F.avg(F.col("__v").cast("double")).alias("__m"))
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                lambda s: s["__m"],
            ).alias(vec_col)
        )
    )


@spark_transform("build_ivf_index", category="similarity", streaming_ok=False)
def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_centroids: int = 16,
    iterations: int = 1,
) -> DataFrame:
    """IVF inverted-list index: (id, vec, centroid_id) with k-means-lite
    centroids (deterministic seed = lowest-id vectors, ``iterations`` Lloyd
    refinement passes, each one broadcast-assign + one shuffle to re-average).

    At 100 TB the assignment pass is a broadcast cross-join against k
    centroids (k ≪ corpus) — the corpus never shuffles for assignment, only
    the (cluster, pos, value) triples of the refinement aggregate do.
    """
    v, i = resolve_col(df, vec_col), resolve_col(df, id_col)
    corpus = df.select(F.col(i).alias("__id"), F.col(v).alias("__vec"))
    centroids = (
        corpus.orderBy("__id").limit(num_centroids)
        .select(F.monotonically_increasing_id().alias("__cid"), F.col("__vec").alias("__cvec"))
    )
    for _ in range(iterations):
        assigned = _assign_to_centroid(corpus, centroids)
        centroids = _elementwise_mean(
            assigned.select("__cid", "__vec"), "__cid", "__vec"
        ).select("__cid", F.col("__vec").alias("__cvec"))
    assigned = _assign_to_centroid(corpus, centroids)
    return assigned.select(
        F.col("__id").alias(i), F.col("__vec").alias(v), F.col("__cid").alias("CENTROID_ID")
    )


def _assign_to_centroid(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine_expr(F.col("__vec"), F.col("__cvec"))
    )
    w = Window.partitionBy("__id").orderBy(F.col("__sim").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select("__id", "__vec", "__cid")
    )


@spark_transform("similarity_search_ivf", category="similarity", streaming_ok=False)
def similarity_search_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_ids,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    round_scores: int | None = 6,
) -> DataFrame:
    """ANN top-k via an IVF index: queries probe their ``nprobe`` nearest
    centroids and scan only those inverted lists — cost ~ corpus × nprobe /
    num_centroids per query instead of the full corpus (approximate recall).
    Output (QUERY_ID, MATCH_ID, COSINE, RANK)."""
    v, i = resolve_col(df, vec_col), resolve_col(df, id_col)
    index = build_ivf_index(df, vec_col, id_col, num_centroids).persist()
    centroids = _elementwise_mean(
        index.select(F.col("CENTROID_ID").alias("__cid"), F.col(v).alias("__vec")),
        "__cid", "__vec",
    ).select("__cid", F.col("__vec").alias("__cvec"))
    q = index.filter(F.col(i).isin(list(query_ids))).select(
        F.col(i).alias("QUERY_ID"), F.col(v).alias("__qvec")
    )
    # probe: nprobe nearest centroids per query
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine_expr(F.col("__qvec"), F.col("__cvec"))
    )
    wq = Window.partitionBy("QUERY_ID").orderBy(F.col("__sim").desc(), F.col("__cid").asc())
    probes = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("QUERY_ID", "__qvec", "__cid")
    )
    lists = index.select(
        F.col(i).alias("MATCH_ID"), F.col(v).alias("__cvec2"),
        F.col("CENTROID_ID").alias("__cid"),
    )
    cos = cosine_expr(F.col("__qvec"), F.col("__cvec2"))
    if round_scores is not None:
        cos = F.round(cos, round_scores)
    scored = (
        lists.join(F.broadcast(probes), on="__cid")
        .filter(F.col("QUERY_ID") != F.col("MATCH_ID"))
        .withColumn("COSINE", cos)
    )
    w = Window.partitionBy("QUERY_ID").orderBy(F.col("COSINE").desc(), F.col("MATCH_ID").asc())
    out = (
        scored.withColumn("RANK", F.row_number().over(w))
        .filter(F.col("RANK") <= k)
        .select("QUERY_ID", "MATCH_ID", "COSINE", "RANK")
    )
    return release_with(out, index)


@spark_transform("knn_classify", category="similarity", streaming_ok=False)
def knn_classify(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    query_ids,
    k: int = 5,
) -> DataFrame:
    """Majority-label k-NN over the similarity search — demo composition of
    similarity_search + aggregation. Output (QUERY_ID, PREDICTED_LABEL)."""
    i, lbl = resolve_col(df, id_col), resolve_col(df, label_col)
    nn = similarity_search(df, vec_col, id_col, query_ids=query_ids, k=k)
    labeled = nn.join(
        df.select(F.col(i).alias("MATCH_ID"), F.col(lbl).alias("__lbl")), on="MATCH_ID"
    )
    counts = labeled.groupBy("QUERY_ID", "__lbl").agg(F.count(F.lit(1)).alias("__votes"))
    w = Window.partitionBy("QUERY_ID").orderBy(F.col("__votes").desc(), F.col("__lbl").asc())
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select("QUERY_ID", F.col("__lbl").alias("PREDICTED_LABEL"))
    )
