"""Dynamic query-graph construction + centrality — the deep-research
DynamicKnowledgeGraphBuilder's data operations (reference
search/tool/reasoning/kg_builder.py) as batched table programs:

  - ``build_query_graphs``: the per-query BFS expansion
    (:27-146 build_query_graph/_explore_graph) for a whole batch of
    seed sets at once — each level is ONE join of the frontier
    against the triples table (out-edges, the reference's directed
    MATCH), with the per-level LIMIT 100 as a per-query window;
  - ``pagerank``: get_central_entities' PageRank (:293) as an
    iterative DataFrame program with networkx-equivalent semantics
    (damping 0.85, uniform personalization, dangling mass spread to
    all nodes, L1 convergence at N×tol) — the graph never leaves the
    cluster;
  - ``central_entities``: the top-limit selection (:297-301).

Deterministic pins (documented — the reference relies on Neo4j's
unordered LIMIT and dict iteration): the per-level LIMIT keeps the
first 100 rows by (subj, pred, obj) ASC; duplicate (source, target)
edges keep that order's first (= min pred); centrality ties break
entity_id ASC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: kg_builder.py:89 — LIMIT 100 per expansion query
PER_LEVEL_LIMIT = 100
#: networkx pagerank defaults (nx.pagerank — the reference calls it
#: with defaults, kg_builder.py:293)
DAMPING = 0.85
MAX_ITER = 100
TOL = 1e-6


def build_query_graphs(
    seeds: DataFrame,
    triples: DataFrame,
    depth: int = 2,
    per_level_limit: int = PER_LEVEL_LIMIT,
) -> dict[str, DataFrame]:
    """build_query_graph batched (kg_builder.py:27-146).

    ``seeds``: (query_id, entity_id); ``triples``: (subj, pred, obj).
    Returns {"nodes": (query_id, entity_id, node_type, level),
    "edges": (query_id, subj, pred, obj, level)} — node_type
    'seed_entity' for level-0 seeds, 'entity' for discovered nodes,
    exactly the reference's node typing."""
    nodes = (
        seeds.select("query_id", "entity_id")
        .distinct()
        .withColumn("node_type", F.lit("seed_entity"))
        .withColumn("level", F.lit(0))
        .localCheckpoint()
    )
    edges = None
    frontier = nodes.select("query_id", "entity_id")
    t = triples.select("subj", "pred", "obj").distinct()
    for level in range(depth):
        if frontier.limit(1).count() == 0:
            break
        rels = t.join(
            frontier.select(
                "query_id", F.col("entity_id").alias("subj")
            ),
            "subj",
        )
        w = Window.partitionBy("query_id").orderBy("subj", "pred", "obj")
        limited = (
            rels.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= per_level_limit)
            .drop("__rk")
        )
        # has_edge dedup: first (src, dst) occurrence in the pinned
        # iteration order = min pred; edges from earlier levels win
        wd = Window.partitionBy("query_id", "subj", "obj").orderBy("pred")
        fresh = (
            limited.withColumn("__rk", F.row_number().over(wd))
            .where(F.col("__rk") == 1)
            .drop("__rk")
        )
        if edges is not None:
            fresh = fresh.join(
                edges.select("query_id", "subj", "obj"),
                ["query_id", "subj", "obj"],
                "left_anti",
            )
        fresh = fresh.withColumn("level", F.lit(level)).localCheckpoint()
        edges = (
            fresh if edges is None else edges.unionByName(fresh)
        ).localCheckpoint()
        new_nodes = (
            limited.select("query_id", F.col("obj").alias("entity_id"))
            .distinct()
            .join(
                nodes.select("query_id", "entity_id"),
                ["query_id", "entity_id"],
                "left_anti",
            )
            .withColumn("node_type", F.lit("entity"))
            .withColumn("level", F.lit(level + 1))
            .localCheckpoint()
        )
        nodes = nodes.unionByName(new_nodes).localCheckpoint()
        frontier = new_nodes.select("query_id", "entity_id")
    if edges is None:
        spark = seeds.sparkSession
        edges = spark.createDataFrame(
            [],
            "query_id string, subj string, pred string, obj string, "
            "level int",
        )
    return {"nodes": nodes, "edges": edges}


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping: float = DAMPING,
    max_iter: int = MAX_ITER,
    tol: float = TOL,
    group_col: str | None = None,
) -> DataFrame:
    """networkx-equivalent PageRank over an edge table (src, dst) —
    duplicate edges collapse (DiGraph semantics), uniform
    personalization, dangling mass redistributed to every node, stop
    when Σ|Δ| < N×tol (``tol=0`` runs exactly ``max_iter`` sweeps —
    the replayable fixed-iteration mode the SQL oracle unrolls).

    ``group_col`` runs one independent PageRank per group (the
    batched per-query-graph shape) — N, dangling mass and
    convergence are all per-group. → (group?, node, rank).

    Like nx.pagerank, a ``tol > 0`` run that exhausts ``max_iter``
    without every group converging RAISES (RuntimeError standing in
    for PowerIterationFailedConvergence) — the reference's
    get_central_entities catches exactly that and falls back to
    degree centrality (kg_builder.py:316-333; see
    central_entities_ladder)."""
    # a constant synthetic group unifies the single-graph and
    # per-query-graph shapes (dropped on return when absent)
    synthetic = group_col is None
    gc = group_col or "__g"
    if synthetic:
        edges = edges.withColumn(gc, F.lit(0))
        if nodes is not None:
            nodes = nodes.withColumn(gc, F.lit(0))
    e = edges.select(gc, "src", "dst").distinct().localCheckpoint()
    n = (
        e.select(gc, F.col("src").alias("node"))
        .unionByName(e.select(gc, F.col("dst").alias("node")))
        .distinct()
    )
    if nodes is not None:
        n = n.unionByName(nodes.select(gc, "node")).distinct()
    n = n.localCheckpoint()
    counts = n.groupBy(gc).agg(F.count(F.lit(1)).alias("__N")).localCheckpoint()
    outdeg = e.groupBy(gc, "src").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = (
        n.join(counts, gc)
        .select(gc, "node", (F.lit(1.0) / F.col("__N")).alias("rank"))
        .localCheckpoint()
    )

    key = [gc, "node"]
    # per-group convergence: each group freezes at ITS OWN stop point
    # (err < N_g × tol), exactly like running nx.pagerank per graph —
    # a global criterion would keep iterating converged groups past
    # their reference stop and drift their values by ~tol
    frozen = None
    active = ranks
    for _ in range(max_iter):
        ranks = active
        with_deg = ranks.join(
            outdeg.select(gc, F.col("src").alias("node"), "__deg"),
            key,
            "left",
        )
        # mass flowing along edges: rank/outdeg per source, summed at
        # each target (partial map-side combine on the group+dst key)
        contrib = (
            e.join(
                with_deg.where(F.col("__deg").isNotNull()).select(
                    gc,
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("__deg")).alias("__share"),
                ),
                [gc, "src"],
            )
            .groupBy(gc, "dst")
            .agg(F.sum("__share").alias("__in"))
        )
        # dangling mass per group, spread uniformly
        dang = (
            with_deg.where(F.col("__deg").isNull())
            .groupBy(gc)
            .agg(F.sum("rank").alias("__dang"))
        )
        active_nodes = n.join(
            active.select(gc).distinct(), gc, "left_semi"
        )
        new_ranks = (
            active_nodes.join(counts, gc)
            .join(dang, gc, "left")
            .join(
                contrib.select(gc, F.col("dst").alias("node"), "__in"),
                key,
                "left",
            )
            .select(
                gc,
                "node",
                (
                    (1.0 - damping) / F.col("__N")
                    + damping
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.coalesce(F.col("__dang"), F.lit(0.0))
                        / F.col("__N")
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if tol > 0:
            errs = (
                new_ranks.join(
                    ranks.select(*key, F.col("rank").alias("__old")), key
                )
                .groupBy(gc)
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))).alias("e"))
                .join(counts, gc)
                .select(gc, (F.col("e") < F.col("__N") * tol).alias("done"))
                .collect()
            )
            done_groups = [r[gc] for r in errs if r["done"]]
            if done_groups:
                just_frozen = new_ranks.join(
                    ranks.sparkSession.createDataFrame(
                        [(d,) for d in done_groups],
                        new_ranks.select(gc).schema,
                    ),
                    gc,
                    "left_semi",
                ).localCheckpoint()
                frozen = (
                    just_frozen
                    if frozen is None
                    else frozen.unionByName(just_frozen).localCheckpoint()
                )
                active = new_ranks.join(
                    just_frozen.select(gc).distinct(), gc, "left_anti"
                ).localCheckpoint()
                if active.limit(1).count() == 0:
                    break
            else:
                active = new_ranks
        else:
            active = new_ranks
    else:
        # for/else: the loop ran out of sweeps without breaking
        if tol > 0 and active.limit(1).count() > 0:
            raise RuntimeError(
                f"pagerank failed to converge in {max_iter} iterations"
            )
    ranks = active if frozen is None else frozen.unionByName(active)
    return ranks.drop(gc) if synthetic else ranks


def central_entities_ladder(
    edges: DataFrame,
    limit: int = 5,
    group_col: str | None = None,
    **pagerank_kwargs,
) -> DataFrame:
    """get_central_entities' full resilience ladder (kg_builder.py:
    279-345): PageRank top-``limit``; if the power iteration fails to
    converge (nx raises there), fall back to degree centrality —
    in-degree + out-degree per node, top-``limit`` by (degree DESC,
    node ASC pin). → (group?, node, score, method) where method is
    'pagerank' | 'degree'."""
    g = [group_col] if group_col else []
    try:
        ranks = pagerank(edges, group_col=group_col, **pagerank_kwargs)
        top = central_entities(ranks, limit=limit, group_col=group_col)
        return top.select(
            *g,
            "node",
            F.col("rank").alias("score"),
            F.lit("pagerank").alias("method"),
        )
    except RuntimeError:
        e = edges.select(*g, "src", "dst").distinct()
        deg = (
            e.select(*g, F.col("src").alias("node"))
            .unionByName(e.select(*g, F.col("dst").alias("node")))
            .groupBy(*g, "node")
            .agg(F.count(F.lit(1)).alias("score"))
        )
        if group_col:
            w = Window.partitionBy(group_col).orderBy(
                F.desc("score"), F.asc("node")
            )
            deg = (
                deg.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") <= limit)
                .drop("__rk")
            )
        else:
            deg = deg.orderBy(F.desc("score"), F.asc("node")).limit(limit)
        return deg.select(
            *g,
            "node",
            F.col("score").cast("double"),
            F.lit("degree").alias("method"),
        )


def central_entities(
    ranks: DataFrame, limit: int = 5, group_col: str | None = None
) -> DataFrame:
    """get_central_entities' selection (kg_builder.py:293-301): top
    ``limit`` by rank, ties pinned entity_id ASC; per group when
    ``group_col`` given."""
    if group_col:
        w = Window.partitionBy(group_col).orderBy(
            F.desc("rank"), F.asc("node")
        )
        return (
            ranks.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= limit)
            .drop("__rk")
        )
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(limit)
