"""Graph centrality over edge tables (public technique: Brin & Page 1998).

Link-graph authority is a first-class crawl-curation signal: Common Crawl
publishes host-level link graphs and rank files precisely so pipelines can
weight or gate documents by the linking structure of their origin. This
module computes PageRank with the standard dangling-mass redistribution as
pure DataFrame iteration — no GraphX/graphframes dependency (neither ships
with a stock PySpark container).

Determinism contract (same idea as cluster.kmeans_cluster): every rank is
rounded to ``round_to`` decimals after each iteration, absorbing
double-summation order differences across engines and partitionings, so the
whole fixed-iteration computation replays as unrolled ANSI SQL — the DuckDB
oracle does exactly that.

100 TB design: ranks and out-degrees are slim ``(node, double)`` tables;
each iteration is one edges-by-src join + one sum-by-dst shuffle — partial
aggregation combines map-side, AQE handles skewed hub nodes. The dangling
mass is a one-row aggregate broadcast back (never a collect of node data).
``localCheckpoint`` every few rounds bounds lineage exactly like
dedup.near_dup_clusters does for label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ParameterException
from ..operators._util import resolve_col
from ..registry import renderer, spark_transform
from ._cache import release_now, release_with, scoped_persist

RANK_ROUND_MAX = 15


@spark_transform("pagerank", category="graph", streaming_ok=False)
def pagerank(
    df: DataFrame,
    src: str,
    dst: str,
    damping: float = 0.85,
    iterations: int = 3,
    round_to: int = 9,
) -> DataFrame:
    """PageRank over the edge list ``df[src] -> df[dst]``.

    Returns ``(NODE, PAGERANK)`` for every node appearing as source or
    target. Duplicate edges collapse to one; nodes with no out-edges
    (dangling) redistribute their mass uniformly each iteration — the
    standard formulation, so ranks sum to ~1.
    """
    if not 0.0 < damping < 1.0:
        raise ParameterException("damping must be in (0, 1)")
    if iterations < 0:
        raise ParameterException("iterations must be >= 0")
    if not 1 <= round_to <= RANK_ROUND_MAX:
        raise ParameterException(f"round_to must be in [1, {RANK_ROUND_MAX}]")
    s, d = resolve_col(df, src), resolve_col(df, dst)
    edges = (
        df.select(F.col(s).alias("__src"), F.col(d).alias("__dst"))
        .dropDuplicates(["__src", "__dst"])
    )
    edges = scoped_persist(edges)
    # ONE endpoint-explode aggregation replaces the union+dedup node build,
    # the separate out-degree aggregation, and the nodes-x-outdeg join
    # (round 13): each edge contributes (src, 1) and (dst, 0); summing per
    # node yields the distinct node set WITH its out-degree — deg 0 IS the
    # dangling flag. Exact integers, so the node set, degrees, and every
    # downstream rank are unchanged; two full shuffles and one persisted
    # frame fewer in the loop-invariant build.
    node_stats = scoped_persist(
        edges.select(F.col("__src").alias("__node"), F.lit(1).alias("__e"))
        .union(edges.select(F.col("__dst").alias("__node"), F.lit(0).alias("__e")))
        .groupBy("__node")
        .agg(F.sum("__e").alias("__deg"))
    )
    n = node_stats.count()  # bounded driver scalar (node count), like BPE's loop
    if n == 0:
        release_now(edges, node_stats)
        return node_stats.select(
            F.col("__node").alias("NODE"), F.lit(0.0).alias("PAGERANK")
        )
    # loop-invariant frames, built ONCE: degree pre-joined onto edges (the
    # per-iteration plan then needs only ranks-by-src join + sum-by-dst),
    # and the dangling FLAG carried on the node frame itself (round 13) —
    # the per-iteration dangling mass is then a filter+sum over ranks
    # instead of a semi-join, removing one join and its shuffle per
    # iteration (same rows summed, order noise absorbed by the
    # per-iteration round like every other aggregate here)
    edges_deg = scoped_persist(
        edges.join(
            node_stats.filter(F.col("__deg") > 0)
            .select(F.col("__node").alias("__src"), "__deg"),
            on="__src",
        )
    )
    nodes_meta = node_stats.select("__node", (F.col("__deg") == 0).alias("__dang"))
    base = (1.0 - damping) / n
    ranks = nodes_meta.select(
        "__node", "__dang", F.round(F.lit(1.0 / n), round_to).alias("__r")
    )
    iter_caches: list[DataFrame] = []
    for it in range(iterations):
        # ranks feeds TWO consumers per iteration (contrib join + dangling
        # mass); without a cache the lineage re-executes each prior
        # iteration per consumer — exponential recompute
        ranks = scoped_persist(ranks)
        iter_caches.append(ranks)
        # dangling mass as a DRIVER SCALAR (round 13): the one-row
        # aggregate used to ride a crossJoin(broadcast(...)) — under AQE
        # that broadcast is its own job cascade per iteration, and the
        # scalar must synchronize before the next level either way (rank
        # i+1 needs it). Collecting the single double and re-embedding it
        # as a literal is bit-exact (the same aggregated double) and drops
        # one broadcast exchange + one join per iteration at any scale;
        # the collect doubles as this iteration's cache materialization.
        # NOTE: iteration caches must stay registered until the RESULT is
        # dropped — Dataset.unpersist() recaches dependents by plan, so an
        # eager mid-loop release would clear every later iteration's
        # materialized cache and the final query would recompute the whole
        # unrolled lineage uncached (measured: 2 -> 381 Exchanges in the
        # final plan when released eagerly).
        dm = ranks.filter(F.col("__dang")).agg(
            F.coalesce(F.sum("__r"), F.lit(0.0)).alias("__dm")
        ).first()["__dm"]
        contrib = (
            edges_deg.join(ranks, edges_deg["__src"] == ranks["__node"])
            .select(F.col("__dst").alias("__node"), (F.col("__r") / F.col("__deg")).alias("__c"))
            .groupBy("__node")
            .agg(F.sum("__c").alias("__sum"))
        )
        ranks = (
            nodes_meta.join(contrib, on="__node", how="left")
            .select(
                "__node", "__dang",
                F.round(
                    F.lit(base)
                    + damping
                    * (F.coalesce(F.col("__sum"), F.lit(0.0)) + F.lit(float(dm)) / n),
                    round_to,
                ).alias("__r"),
            )
        )
        # bound lineage every few rounds — but never on the LAST iteration,
        # whose checkpoint would only re-materialize the final ranks
        if (it + 1) % 3 == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    out = ranks.select(F.col("__node").alias("NODE"), F.col("__r").alias("PAGERANK"))
    return release_with(out, edges, node_stats, edges_deg, *iter_caches)


PAGERANK_RENDER_MAX_ITER = 6


@renderer("pagerank")
def _r_pagerank(
    source, src, dst, damping=0.85, iterations=3, round_to=9
) -> str:
    """Unrolled replay of the fixed-iteration loop in Spark SQL (the same
    technique as :func:`pagerank_oracle_sql`, emitted in Spark dialect):
    per-iteration ROUND absorbs summation-order differences, so the
    rendered text reproduces the executed ranks exactly. Float literals are
    CAST AS DOUBLE — a bare ``0.85`` is DECIMAL in Spark SQL and would
    change the arithmetic. Each unrolled level references its predecessor
    twice (neighbor-sum + dangling mass), so plan size grows ~2^iterations
    when Catalyst inlines the CTEs; rendering is capped at
    ``PAGERANK_RENDER_MAX_ITER`` iterations (the DataFrame path has no
    cap — it persists per-iteration instead)."""
    from ..errors import TransformRenderingException

    if not 0.0 < damping < 1.0:
        raise ParameterException("damping must be in (0, 1)")
    if iterations < 0:
        raise ParameterException("iterations must be >= 0")
    if not 1 <= round_to <= RANK_ROUND_MAX:
        raise ParameterException(f"round_to must be in [1, {RANK_ROUND_MAX}]")
    if iterations > PAGERANK_RENDER_MAX_ITER:
        raise TransformRenderingException(
            "pagerank renders unrolled iterations; iterations > "
            f"{PAGERANK_RENDER_MAX_ITER} produces an impractically large plan "
            "(each level references the previous twice)"
        )
    d = f"CAST({float(damping)!r} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    rt = int(round_to)
    n = "(SELECT c FROM __pr_nn)"
    parts = [
        f"__pr_e AS (SELECT DISTINCT {src} AS src, {dst} AS dst FROM {source})",
        "__pr_nodes AS (SELECT src AS node FROM __pr_e "
        "UNION SELECT dst FROM __pr_e)",
        "__pr_nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM __pr_nodes)",
        "__pr_outdeg AS (SELECT src, COUNT(*) AS deg FROM __pr_e GROUP BY src)",
        f"__pr_r0 AS (SELECT node, ROUND({one} / {n}, {rt}) AS r FROM __pr_nodes)",
    ]
    for i in range(int(iterations)):
        p, q = f"__pr_r{i}", f"__pr_r{i + 1}"
        parts.append(
            f"__pr_d{i} AS (SELECT COALESCE(SUM({p}.r), CAST(0.0 AS DOUBLE)) AS dm "
            f"FROM {p} LEFT JOIN __pr_outdeg o ON {p}.node = o.src "
            "WHERE o.src IS NULL)"
        )
        parts.append(
            f"__pr_c{i} AS (SELECT e.dst AS node, SUM({p}.r / o.deg) AS s "
            f"FROM __pr_e e JOIN {p} ON e.src = {p}.node "
            "JOIN __pr_outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        parts.append(
            f"{q} AS (SELECT n.node, ROUND(({one} - {d}) / {n} + {d} * ("
            f"COALESCE(c.s, CAST(0.0 AS DOUBLE)) + d.dm / {n}), {rt}) AS r "
            f"FROM __pr_nodes n LEFT JOIN __pr_c{i} c ON n.node = c.node "
            f"CROSS JOIN __pr_d{i} d)"
        )
    return (
        "SELECT * FROM (WITH " + ", ".join(parts)
        + f" SELECT node AS NODE, r AS PAGERANK FROM __pr_r{int(iterations)}"
        ") __pr_out"
    )


def pagerank_oracle_sql(
    edges_sql: str,
    damping: float = 0.85,
    iterations: int = 3,
    round_to: int = 9,
) -> str:
    """Unrolled ANSI-SQL replay of :func:`pagerank` for DuckDB oracles.

    ``edges_sql`` must yield columns ``src, dst``; the returned query yields
    ``NODE, PAGERANK`` and matches the Spark result bit-for-bit under the
    shared per-iteration rounding."""
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) c FROM nodes)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) deg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, ROUND(1.0 / (SELECT c FROM nn), {round_to}) r FROM nodes)",
    ]
    for i in range(iterations):
        p, q = f"r{i}", f"r{i + 1}"
        parts.append(
            f"{q} AS (SELECT nodes.node, ROUND((1 - {d}) / (SELECT c FROM nn) + {d} * ("
            f"COALESCE(c.s, 0) + (SELECT COALESCE(SUM({p}.r), 0) FROM {p} "
            f"LEFT JOIN outdeg ON {p}.node = outdeg.src WHERE outdeg.src IS NULL)"
            f" / (SELECT c FROM nn)), {round_to}) r FROM nodes LEFT JOIN "
            f"(SELECT e.dst, SUM({p}.r / outdeg.deg) s FROM e "
            f"JOIN {p} ON e.src = {p}.node JOIN outdeg ON e.src = outdeg.src "
            f"GROUP BY e.dst) c ON nodes.node = c.dst)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node AS NODE, r AS PAGERANK FROM r{iterations}"
    )


@spark_transform("connected_components", category="graph", streaming_ok=False)
def connected_components(
    df: DataFrame,
    src: str,
    dst: str,
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components of the undirected graph induced by the edge
    list: ``(NODE, COMPONENT)`` where COMPONENT is the minimum node id
    reachable from NODE. The general-graph form of the min-label
    propagation inside ``dedup.near_dup_clusters`` — exposed directly so
    pipelines can cluster arbitrary relation graphs (URL redirect chains,
    citation/link groups, entity-resolution match pairs) without routing
    through the text-dedup API.

    Scale: each round is one slim (node, label) join + min-aggregation;
    converges in <= component-diameter rounds with an early-exit count;
    per-round ``localCheckpoint`` bounds lineage and driver planning.
    Same guarantees and cost model as the dedup path.
    """
    if max_iterations < 1:
        raise ParameterException("max_iterations must be >= 1")
    s, d = resolve_col(df, src), resolve_col(df, dst)
    half = df.select(F.col(s).alias("__src"), F.col(d).alias("__dst")).dropDuplicates()
    edges = scoped_persist(half.union(
        half.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
    ))
    labels = (
        edges.select(F.col("__src").alias("__id"))
        .dropDuplicates()
        .withColumn("__lab", F.col("__id"))
    )
    lab_type = labels.schema["__lab"].dataType
    # Round-14 loop, two changes over the round-13 form (10.7 s before on
    # the sf0.1 entry — 88 jobs for 4 core-seconds of task work, i.e.
    # job-count/driver-bound, not compute-bound):
    #
    # 1. Fused convergence check: carry each node's PREVIOUS label through
    #    the min-aggregation — labels holds exactly one row per id, so
    #    max(__old) recovers it (msgs contribute nulls, which aggregates
    #    ignore); min(__lab) aggregates exactly the same union rows as
    #    before, so labels are unchanged. The old form joined new labels
    #    back to old labels: one extra join + exchange per round, in its
    #    own job.
    # 2. Plan truncation EVERY round (lazy localCheckpoint; the
    #    changed-count materializes it, so each round still pays exactly
    #    one action). Each round references the previous frame twice
    #    (union + msgs), so between the round-13 every-5-rounds
    #    checkpoints the driver re-traversed 2^k shared-subtree paths at
    #    every plan build. Per-round truncation makes planning cost
    #    constant; the checkpointed frames are the slim (id, label) pairs
    #    the loop must materialize anyway.
    #
    # NOT taken: a pointer-doubling shortcut (lab <- lab-of-lab) converges
    # in O(log diameter) rounds and measured 2.8 s here — but
    # max_iterations is part of the operator contract (the .sql() renderer
    # unrolls exactly N plain propagation levels and the renderer-parity
    # fixtures pin capped, non-converged graphs), and shortcut rounds
    # advance further per round than the rendered SQL. Kept the plain
    # per-round trajectory, bit-identical at every cap.
    # Batching (round 14, second pass): TWO plain propagation levels per
    # action. The first level of each batch is composed lazily (no
    # checkpoint, no count); the second carries the fused __old check and
    # materializes both via one count. The label value at every level is
    # still the plain one-level recurrence — batching only changes WHERE
    # the plan is cut, so the capped trajectory stays bit-identical to
    # the renderer's unrolled SQL. Early exit checks the batch's LAST
    # transition: min-propagation is monotone, so an unchanged last level
    # means a fixpoint (the composed extra level is then the identity and
    # the output equals the plain loop's early-exit output). Halves the
    # action count — the loop was measured job-cascade-bound, not
    # compute-bound.
    labels = labels.localCheckpoint(eager=True)

    def _level(lab_frame, with_old: bool):
        msgs = edges.join(
            lab_frame.withColumnRenamed("__id", "__src"), on="__src"
        ).select(F.col("__dst").alias("__id"), "__lab")
        if not with_old:
            return (
                lab_frame.unionByName(msgs)
                .groupBy("__id").agg(F.min("__lab").alias("__lab"))
            )
        return (
            lab_frame.select("__id", "__lab", F.col("__lab").alias("__old"))
            .unionByName(msgs.withColumn("__old", F.lit(None).cast(lab_type)))
            .groupBy("__id")
            .agg(F.min("__lab").alias("__lab"), F.max("__old").alias("__old"))
        )

    done = 0
    while done < max_iterations:
        if max_iterations - done >= 2:
            mid = _level(labels, with_old=False)
            done += 2
        else:
            mid = labels
            done += 1
        new_labels = _level(mid, with_old=True).localCheckpoint(eager=False)
        # one job per batch: the count doubles as the checkpoint painting
        changed = new_labels.filter(
            ~F.col("__lab").eqNullSafe(F.col("__old"))
        ).count()
        labels = new_labels.select("__id", "__lab")
        if changed == 0:
            break
    out = labels.select(F.col("__id").alias("NODE"), F.col("__lab").alias("COMPONENT"))
    return release_with(out, edges)

CC_RENDER_MAX_ITER = 24


def unrolled_min_label_sql(prefix: str, iterations: int) -> list[str]:
    """Per-level CTEs for unrolled min-label propagation: level ``i+1`` takes
    the per-node MIN label over ``{prefix}_e`` (which callers build as
    symmetrized edges PLUS self-loops) joined to level ``i``. The self-loops
    make each level a SINGLE reference to its predecessor — the
    labels-union-messages form would reference it twice and explode
    exponentially under CTE inlining (measured: a 20-level double-reference
    chain kills the driver; single-reference runs in seconds). Shared by the
    connected_components and near_dup_clusters renderers so that invariant
    lives in one place."""
    return [
        f"{prefix}_l{i + 1} AS (SELECT e.dst AS node, MIN(l.lab) AS lab "
        f"FROM {prefix}_e e JOIN {prefix}_l{i} l ON e.src = l.node "
        "GROUP BY e.dst)"
        for i in range(int(iterations))
    ]


@renderer("connected_components")
def _r_connected_components(source, src, dst, max_iterations=20) -> str:
    """Unrolled min-label propagation in Spark SQL
    (:func:`unrolled_min_label_sql`). The executed loop early-exits on
    convergence; extra unrolled rounds are no-ops on an already-converged
    labeling (min over a fixed point is the fixed point), so replaying all
    ``max_iterations`` rounds is result-equal. The final SELECT left-joins
    the node list: a NULL endpoint never matches its own self-loop join, so
    without it the rendered output would drop the (NULL, NULL) row the
    executed groupBy keeps."""
    from ..errors import TransformRenderingException

    if max_iterations < 1:
        raise ParameterException("max_iterations must be >= 1")
    if max_iterations > CC_RENDER_MAX_ITER:
        raise TransformRenderingException(
            "connected_components renders unrolled propagation rounds; "
            f"max_iterations > {CC_RENDER_MAX_ITER} produces an impractically "
            "deep plan (~1s of scheduling per level)"
        )
    parts = [
        f"__cc_h AS (SELECT DISTINCT {src} AS src, {dst} AS dst FROM {source})",
        "__cc_n AS (SELECT DISTINCT src AS node FROM "
        "(SELECT src, dst FROM __cc_h UNION ALL SELECT dst, src FROM __cc_h))",
        "__cc_e AS (SELECT src, dst FROM __cc_h "
        "UNION ALL SELECT dst, src FROM __cc_h "
        "UNION ALL SELECT node, node FROM __cc_n)",
        "__cc_l0 AS (SELECT node, node AS lab FROM __cc_n)",
    ] + unrolled_min_label_sql("__cc", max_iterations)
    return (
        "SELECT * FROM (WITH " + ", ".join(parts)
        + " SELECT n.node AS NODE, l.lab AS COMPONENT FROM __cc_n n "
        f"LEFT JOIN __cc_l{int(max_iterations)} l ON n.node = l.node"
        ") __cc_out"
    )


@spark_transform("triangle_count", category="graph", streaming_ok=False)
def triangle_count(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Per-node triangle counts of the undirected simple graph induced by
    the edge list (self-loops and duplicate/reverse edges collapse; null
    endpoints drop).

    Degree-ordered edge orientation (Schank & Wagner 2005, the standard
    distributed formulation): each undirected edge is directed from its
    lower-(degree, id) endpoint, so every triangle {a,b,c} is found exactly
    once as the wedge a->b, a->c closed by b->c. Wedge generation cost is
    Σ outdeg² with outdeg bounded by ~√m after orientation — the hub-node
    quadratic blowup of naive wedge counting cannot happen. Returns
    ``(NODE, TRIANGLES)`` for every node in the edge set, zeros included.

    Scale: three equi-joins on slim id columns + one count — all
    shuffle-hash/AQE territory, no collects, no Python. Skewed residual
    wedges (a few same-degree hubs) are AQE-skew-split like any join.
    """
    s, d = resolve_col(df, src), resolve_col(df, dst)
    canon = scoped_persist(
        df.filter(F.col(s).isNotNull() & F.col(d).isNotNull() & (F.col(s) != F.col(d)))
        .select(F.least(s, d).alias("__lo"), F.greatest(s, d).alias("__hi"))
        .dropDuplicates()
    )  # feeds deg (twice via the union) AND the orientation join: without
    # the cache the full upstream scan+distinct re-executes per consumer
    deg = scoped_persist(
        canon.select(F.col("__lo").alias("__node"))
        .unionAll(canon.select(F.col("__hi").alias("__node")))
        .groupBy("__node")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    dl = deg.select(F.col("__node").alias("__lo"), F.col("__deg").alias("__dl"))
    dh = deg.select(F.col("__node").alias("__hi"), F.col("__deg").alias("__dh"))
    keep = F.col("__dl") <= F.col("__dh")  # tie -> lo first (lo < hi always)
    oriented = scoped_persist(
        canon.join(dl, on="__lo").join(dh, on="__hi").select(
            F.when(keep, F.col("__lo")).otherwise(F.col("__hi")).alias("__a"),
            F.when(keep, F.col("__hi")).otherwise(F.col("__lo")).alias("__b"),
            F.when(keep, F.col("__dh")).otherwise(F.col("__dl")).alias("__degb"),
        )
    )
    e2 = oriented.select(
        F.col("__a"), F.col("__b").alias("__c"), F.col("__degb").alias("__degc")
    )
    wedges = oriented.join(e2, on="__a").filter(
        (F.col("__degb") < F.col("__degc"))
        | ((F.col("__degb") == F.col("__degc")) & (F.col("__b") < F.col("__c")))
    )
    closer = oriented.select(
        F.col("__a").alias("__b"), F.col("__b").alias("__c")
    )
    tris = wedges.join(closer, on=["__b", "__c"]).select("__a", "__b", "__c")
    tris = scoped_persist(tris)
    counts = (
        tris.select(F.col("__a").alias("__node"))
        .unionAll(tris.select(F.col("__b").alias("__node")))
        .unionAll(tris.select(F.col("__c").alias("__node")))
        .groupBy("__node")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    out = deg.join(counts, on="__node", how="left").select(
        F.col("__node").alias("NODE"),
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("TRIANGLES"),
    )
    return release_with(out, canon, deg, oriented, tris)


@renderer("triangle_count")
def _r_triangle_count(source, src, dst) -> str:
    """Engine-portable CTE replay of the oriented-wedge algorithm (LEAST/
    GREATEST/ROW-free — plain joins and counts, identical in Spark SQL and
    DuckDB)."""
    parts = [
        f"__tc_c AS (SELECT DISTINCT LEAST({src}, {dst}) AS lo, "
        f"GREATEST({src}, {dst}) AS hi FROM {source} "
        f"WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst})",
        "__tc_d AS (SELECT node, COUNT(*) AS deg FROM "
        "(SELECT lo AS node FROM __tc_c UNION ALL SELECT hi FROM __tc_c) "
        "GROUP BY node)",
        "__tc_o AS (SELECT CASE WHEN dl.deg <= dh.deg THEN c.lo ELSE c.hi END AS a, "
        "CASE WHEN dl.deg <= dh.deg THEN c.hi ELSE c.lo END AS b, "
        "CASE WHEN dl.deg <= dh.deg THEN dh.deg ELSE dl.deg END AS degb "
        "FROM __tc_c c JOIN __tc_d dl ON c.lo = dl.node "
        "JOIN __tc_d dh ON c.hi = dh.node)",
        "__tc_t AS (SELECT w.a, w.b, w.c FROM "
        "(SELECT e1.a, e1.b, e2.b AS c FROM __tc_o e1 JOIN __tc_o e2 "
        "ON e1.a = e2.a AND (e1.degb < e2.degb OR "
        "(e1.degb = e2.degb AND e1.b < e2.b))) w "
        "JOIN __tc_o e ON w.b = e.a AND w.c = e.b)",
        "__tc_n AS (SELECT node, COUNT(*) AS n FROM "
        "(SELECT a AS node FROM __tc_t UNION ALL SELECT b FROM __tc_t "
        "UNION ALL SELECT c FROM __tc_t) GROUP BY node)",
    ]
    return (
        "SELECT * FROM (WITH " + ", ".join(parts)
        + " SELECT d.node AS NODE, CAST(COALESCE(t.n, 0) AS BIGINT) AS TRIANGLES "
        "FROM __tc_d d LEFT JOIN __tc_n t ON d.node = t.node"
        ") __tc_out"
    )


LP_RENDER_MAX_ITER = 8


@spark_transform("label_propagation", category="graph", streaming_ok=False)
def label_propagation(
    df: DataFrame,
    src: str,
    dst: str,
    iterations: int = 2,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) made
    deterministic: labels start as node ids; each round every node adopts
    its neighbors' MOST FREQUENT label, ties broken by smallest label.
    Fixed ``iterations`` (no convergence stop — synchronous LPA can
    oscillate on bipartite structures, so a bounded round count is the
    reproducible contract). Returns ``(NODE, LABEL)`` over the undirected
    simple graph induced by the edges (self-loops/duplicates collapse,
    null endpoints drop).

    Scale: per round one edges-by-src join + one (node,label) count + one
    per-node top-1 min-struct aggregation (both aggregations combine
    map-side) — the same slim-id shuffle profile as pagerank;
    ``localCheckpoint`` every 3 rounds bounds lineage.
    """
    if iterations < 1:
        raise ParameterException("iterations must be >= 1")
    s, d = resolve_col(df, src), resolve_col(df, dst)
    half = (
        df.filter(F.col(s).isNotNull() & F.col(d).isNotNull() & (F.col(s) != F.col(d)))
        .select(F.col(s).alias("__src"), F.col(d).alias("__dst"))
    )
    edges = scoped_persist(
        half.union(
            half.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
        ).dropDuplicates()
    )
    labels = edges.select(F.col("__src").alias("__node")).dropDuplicates().withColumn(
        "__lab", F.col("__node")
    )
    # No per-level persists (round 14): each label level feeds exactly ONE
    # consumer (the next round's join; the last feeds the output), so the
    # whole fixed-iteration computation is one lazy plan — the old per-level
    # scoped_persist only added a cache write+read per round. Lineage depth
    # stays bounded by the localCheckpoint every 3 rounds (lazy checkpoint
    # truncates the Catalyst plan immediately; the final action
    # materializes it).
    for it in range(iterations):
        counts = (
            edges.join(labels, edges["__src"] == labels["__node"])
            .groupBy(F.col("__dst").alias("__n2"), F.col("__lab"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        # per-node top-1 as an aggregation, not a row_number window
        # (round 14): min over (-count, label) structs is exactly the
        # window's (count desc, label asc) first row — field-wise struct
        # comparison is the ORDER BY semantics for any orderable label
        # type, and (node, label) rows are unique after the groupBy, so
        # the argmin is the same row. The window shape paid a full sort of
        # the (node, label, count) table inside its exchange; the
        # aggregation pre-reduces map-side to one row per node per
        # partition before shuffling, and sorts nothing.
        labels = (
            counts.groupBy(F.col("__n2").alias("__node"))
            .agg(F.min(F.struct(
                (-F.col("__cnt")).alias("__nc"), F.col("__lab").alias("__l")
            )).alias("__m"))
            .select("__node", F.col("__m.__l").alias("__lab"))
        )
        if (it + 1) % 3 == 0:
            labels = labels.localCheckpoint(eager=False)
    out = labels.select(F.col("__node").alias("NODE"), F.col("__lab").alias("LABEL"))
    return release_with(out, edges)


@renderer("label_propagation")
def _r_label_propagation(source, src, dst, iterations=2) -> str:
    """Unrolled engine-portable replay: each level references its
    predecessor ONCE (counts -> window top-1), so plan depth is linear —
    the same single-reference invariant as unrolled_min_label_sql. Capped
    at ``LP_RENDER_MAX_ITER`` levels."""
    from ..errors import TransformRenderingException

    if iterations < 1:
        raise ParameterException("iterations must be >= 1")
    if iterations > LP_RENDER_MAX_ITER:
        raise TransformRenderingException(
            "label_propagation renders unrolled rounds; iterations > "
            f"{LP_RENDER_MAX_ITER} produces an impractically deep plan"
        )
    parts = [
        f"__lp_h AS (SELECT DISTINCT {src} AS src, {dst} AS dst FROM {source} "
        f"WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst})",
        "__lp_e AS (SELECT src, dst FROM __lp_h UNION SELECT dst, src FROM __lp_h)",
        "__lp_l0 AS (SELECT DISTINCT src AS node, src AS lab FROM __lp_e)",
    ]
    for i in range(int(iterations)):
        parts.append(
            f"__lp_l{i + 1} AS (SELECT node, lab FROM "
            f"(SELECT e.dst AS node, l.lab, "
            "ROW_NUMBER() OVER (PARTITION BY e.dst "
            "ORDER BY COUNT(*) DESC, l.lab ASC) AS rn "
            f"FROM __lp_e e JOIN __lp_l{i} l ON e.src = l.node "
            "GROUP BY e.dst, l.lab) x WHERE rn = 1)"
        )
    return (
        "SELECT * FROM (WITH " + ", ".join(parts)
        + f" SELECT node AS NODE, lab AS LABEL FROM __lp_l{int(iterations)}"
        ") __lp_out"
    )


KCORE_RENDER_MAX_ITER = 6


@spark_transform("kcore", category="graph", streaming_ok=False)
def kcore(
    df: DataFrame,
    src: str,
    dst: str,
    k: int,
    max_iterations: int = 20,
) -> DataFrame:
    """k-core membership of the undirected simple graph: iteratively peel
    nodes of degree < ``k`` until stable (Seidman 1983). Returns
    ``(NODE, DEGREE)`` for the surviving nodes — DEGREE is the within-core
    degree (≥ k by construction). The classic link-graph curation gate:
    pages outside a reasonable core are orphans/link-farm tendrils.

    RENDER CONTRACT: the default ``max_iterations=20`` favors execution
    correctness (deep peels — long chains shed one layer per round), but
    the SQL renderer unrolls the peel and caps at
    ``KCORE_RENDER_MAX_ITER`` (6) levels, so a DEFAULT-PARAMS CHAIN
    EXECUTES FINE BUT ``.sql()``/``to_dbt()`` RAISES — pass
    ``max_iterations <= 6`` (and confirm the peel converges within it: a
    ``RuntimeWarning`` fires when the loop exhausts without stabilizing)
    to keep a chain renderable. Executed-N and rendered-N are result-equal
    round for round either way.

    Scale: each round is one degree aggregate + two semi-joins on slim id
    columns; early-exits when the edge count stabilizes (≤ peel-depth
    rounds); ``localCheckpoint`` every 3 rounds bounds lineage — the
    connected_components cost model.
    """
    if k < 1:
        raise ParameterException("k must be >= 1")
    if max_iterations < 1:
        raise ParameterException("max_iterations must be >= 1")
    s, d = resolve_col(df, src), resolve_col(df, dst)
    half = (
        df.filter(F.col(s).isNotNull() & F.col(d).isNotNull() & (F.col(s) != F.col(d)))
        .select(F.col(s).alias("__src"), F.col(d).alias("__dst"))
    )
    edges = scoped_persist(
        half.union(
            half.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
        ).dropDuplicates()
    )
    n_edges = edges.count()
    caches = [edges]
    for it in range(max_iterations):
        if n_edges == 0:
            break
        deg = edges.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("__src")
        # dst-side semi first, src-side LAST (round 14): the surviving edge
        # set then leaves the round hash-partitioned by __src — the key the
        # NEXT round's degree aggregation and src-side semi-join need — so
        # checkpointed rounds hand their partitioning straight to the next
        # round. The two semi-joins are filters; order cannot change the
        # result.
        new_edges = (
            edges.join(keep.withColumnRenamed("__src", "__dst"), on="__dst",
                       how="left_semi")
            .join(keep, on="__src", how="left_semi")
        )
        if (it + 1) % 3 == 0:
            # lazy: the early-exit count below materializes the checkpoint,
            # so the round pays one pass, not a checkpoint pass + a count
            new_edges = new_edges.localCheckpoint(eager=False)
        else:
            new_edges = scoped_persist(new_edges)
            caches.append(new_edges)
        n_new = new_edges.count()
        stable = n_new == n_edges
        edges, n_edges = new_edges, n_new
        if stable:
            break
    else:
        if n_edges > 0:
            import warnings

            warnings.warn(
                f"kcore: peel did not stabilize within max_iterations="
                f"{max_iterations}; the result is a partially-peeled graph "
                "— raise max_iterations for the exact k-core",
                RuntimeWarning,
                stacklevel=2,
            )
    out = (
        edges.groupBy("__src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("DEGREE"))
        .select(F.col("__src").alias("NODE"), "DEGREE")
    )
    return release_with(out, *caches)


@renderer("kcore")
def _r_kcore(source, src, dst, k, max_iterations=20) -> str:
    """Unrolled peel in engine-portable SQL. Extra rounds past the fixed
    point are no-ops (a stable edge set reproduces itself), so replaying a
    FIXED round count is result-equal to the executed early-exit loop —
    provided the executed loop converged within the same count. Each level
    references its predecessor three times (degree + two keeps), so the
    render caps at ``KCORE_RENDER_MAX_ITER`` levels; the DataFrame path
    has no cap (it persists per round instead)."""
    from ..errors import TransformRenderingException

    if k < 1:
        raise ParameterException("k must be >= 1")
    if max_iterations < 1:
        raise ParameterException("max_iterations must be >= 1")
    if max_iterations > KCORE_RENDER_MAX_ITER:
        raise TransformRenderingException(
            "kcore renders unrolled peel rounds; max_iterations > "
            f"{KCORE_RENDER_MAX_ITER} produces an impractically large plan "
            "(each level references the previous three times)"
        )
    parts = [
        f"__kc_h AS (SELECT DISTINCT {src} AS src, {dst} AS dst FROM {source} "
        f"WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst})",
        "__kc_e0 AS (SELECT src, dst FROM __kc_h "
        "UNION SELECT dst, src FROM __kc_h)",
    ]
    for i in range(int(max_iterations)):
        p, q = f"__kc_e{i}", f"__kc_e{i + 1}"
        parts.append(
            f"__kc_k{i} AS (SELECT src AS node FROM {p} "
            f"GROUP BY src HAVING COUNT(*) >= {int(k)})"
        )
        parts.append(
            f"{q} AS (SELECT e.src, e.dst FROM {p} e "
            f"JOIN __kc_k{i} a ON e.src = a.node "
            f"JOIN __kc_k{i} b ON e.dst = b.node)"
        )
    last = f"__kc_e{int(max_iterations)}"
    return (
        "SELECT * FROM (WITH " + ", ".join(parts)
        + f" SELECT src AS NODE, CAST(COUNT(*) AS BIGINT) AS DEGREE FROM {last} "
        "GROUP BY src"
        ") __kc_out"
    )
