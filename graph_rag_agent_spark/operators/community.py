"""Hierarchical community detection + catalog (SURVEY.md G3/G5, J5-J7,
A4, L5, W-ops).

DataFrame implementation of the half-sweep weighted LPA spec in
core/lpa.py (the GDS-Leiden replacement; schema parity with
/root/reference/community/detector/leiden.py:91-140 — ids "{level}-{n}",
IN_COMMUNITY hierarchy, maxLevels=3). The pure-Python core version is
the oracle; tests assert level-by-level equality.

Physical shape per sweep: one shuffle for the vote aggregation
(edges ⋈ labels → groupBy(node, label) sum(weight)) + a window top-1.
The driver loop localCheckpoints labels each sweep to truncate
lineage. Parity is computed JVM-side from sha1 so it matches
core.lpa._parity exactly (tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.lpa import MAX_LEVELS, MAX_SWEEPS
from ..core.stub_summary import prepare_string, stub_summarize
from .components import EDGE_DRIVER_THRESHOLD, dense_number_labels

# Same rationale as operators/components.DRIVER_THRESHOLD: tiny
# contracted graphs run the identical core spec driver-side instead of
# paying O(levels × sweeps) shuffle-job latency. The driver path bounds
# BOTH collects: a 100k-node similarity graph can still carry 10⁹ edges
# (dense cliques), so the edge count is guarded by
# components.EDGE_DRIVER_THRESHOLD exactly like connected_components.
DRIVER_THRESHOLD = 100_000

# Crossover for the incremental LOCALIZED detection (plans/
# incremental._localized_communities): below this entity count the
# full detector's driver fast path (collect + pure-Python LPA) beats
# the localized path's ~15 fixed-latency assembly jobs, so warehouses
# skip both the localization AND the maintenance of its stored state
# (community_labels / proj_wcc — ~2 s/cycle of writes + one
# projection-CC run that would buy nothing). One patchable symbol
# read at call time by every write/use site, so tests force the path
# on sandbox-sized fixtures with a single monkeypatch.
LOCALIZE_MIN_ENTITIES = DRIVER_THRESHOLD


def localization_crossover(n_entities: int, n_edges_upper: int) -> bool:
    """True when a full detection at this size takes the DISTRIBUTED
    leveled loop — i.e. when the localized path and its stored aux
    state pay off. Mirrors detect_communities' driver gate exactly:
    the driver fast path needs BOTH node count ≤ the driver threshold
    AND edge count ≤ EDGE_DRIVER_THRESHOLD, so a dense small-node
    graph (the cliquey case the edge guard exists for) correctly
    crosses over too. ``n_edges_upper`` may be any cheap UPPER bound
    on the projection edge count (triple row count qualifies:
    projection pairs ≤ triple rows) — an over-estimate can only
    enable the localization early, never skip it where the full path
    is distributed."""
    return (
        n_entities > LOCALIZE_MIN_ENTITIES
        or n_edges_upper > EDGE_DRIVER_THRESHOLD
    )


def projection_edges(triples: DataFrame) -> DataFrame:
    """Canonical triples → undirected weighted edges: weight = COUNT of
    relationships per unordered pair (reference projection config
    orientation UNDIRECTED, weight aggregation COUNT —
    community/detector/projections.py:24-34)."""
    return (
        triples.where(F.col("subj") != F.col("obj"))
        .select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("w"))
    )


def lpa_level(nodes: DataFrame, edges: DataFrame, max_sweeps: int = MAX_SWEEPS) -> DataFrame:
    """nodes(node) + edges(a, b, w) → (node, label).

    Monotone weighted LPA (core/lpa.py spec): synchronous sweeps; a
    node adopts its weighted-majority neighbor label (tie → smallest)
    only if that label sorts before its current one — guaranteed
    convergent, no oscillation."""
    from ..session import loop_checkpoint, materialize

    sym = edges.select(
        F.col("a").alias("node"), F.col("b").alias("nbr"), "w"
    ).union(edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"), "w"))
    # loop state: materialize (stats reset), not localCheckpoint —
    # see session.materialize
    sym = materialize(sym, "lpa-sym")

    labels = materialize(
        nodes.select(F.col(nodes.columns[0]).alias("node")).withColumn(
            "label", F.col("node")
        ),
        "lpa-labels",
    )

    w_top = Window.partitionBy("node").orderBy(F.desc("vote"), F.asc("nbr_label"))
    for _sweep in range(max_sweeps):
        votes = (
            sym.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
                ),
                "nbr",
            )
            .groupBy("node", "nbr_label")
            .agg(F.sum("w").alias("vote"))
        )
        best = (
            votes.withColumn("rn", F.row_number().over(w_top))
            .where(F.col("rn") == 1)
            .select("node", F.col("nbr_label").alias("best_label"))
        )
        new_label = F.when(
            F.col("best_label").isNotNull()
            & (F.col("best_label") < F.col("label")),
            F.col("best_label"),
        ).otherwise(F.col("label"))
        # checkpoint once; change detection reads the materialized flag
        new_labels = loop_checkpoint(
            labels.join(best, "node", "left").select(
                "node",
                new_label.alias("label"),
                (new_label != F.col("label")).alias("changed"),
            ),
            "lpa-labels",
            _sweep,
        )
        changed = new_labels.where("changed").limit(1).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select("node", "label")


LABELS_SCHEMA = "entity_id string, level int, label string"


def _distributed_level_labels(
    nodes: DataFrame, edges: DataFrame, max_levels: int
) -> list[DataFrame]:
    """The leveled LPA/contraction loop, emitting the per-level RAW
    label assignment (entity_id, label) instead of interleaving the
    dense numbering — labels are the delta-maintainable state (they
    are per-projection-component deterministic; numbers are one
    global rank away, applied by assemble_communities_from_labels).
    Returns one checkpointed frame per EXECUTED level."""
    # node → supernode of current level (starts as itself)
    assignment = nodes.withColumn("super", F.col("node"))
    parts: list[DataFrame] = []
    cur_nodes = nodes
    for level in range(max_levels):
        labels = lpa_level(cur_nodes, edges)
        n_labels = labels.select("label").distinct().count()
        n_nodes = cur_nodes.count()
        parts.append(
            assignment.join(
                labels.withColumnRenamed("node", "super2"),
                F.col("super") == F.col("super2"),
            )
            .select(
                F.col("node").alias("entity_id"),
                F.lit(level).alias("level"),
                "label",
            )
            .localCheckpoint()
        )
        if n_labels == n_nodes:
            break

        # contract
        assignment = (
            assignment.join(
                labels.withColumnRenamed("node", "super2"),
                F.col("super") == F.col("super2"),
            )
            .select("node", F.col("label").alias("super"))
            .localCheckpoint()
        )
        lab_a = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
        lab_b = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
        edges = (
            edges.join(lab_a, "a")
            .join(lab_b, "b")
            .where(F.col("la") != F.col("lb"))
            .select(
                F.least("la", "lb").alias("a"),
                F.greatest("la", "lb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint()
        )
        cur_nodes = labels.select(F.col("label").alias("node")).distinct()
        if edges.limit(1).count() == 0:
            break
    return parts


def detect_level_labels(
    nodes: DataFrame,
    edges: DataFrame,
    max_levels: int = MAX_LEVELS,
    driver_threshold: int = DRIVER_THRESHOLD,
    edge_driver_threshold: int = EDGE_DRIVER_THRESHOLD,
) -> DataFrame:
    """(nodes(node), weighted edges(a, b, w)) → per-level raw LPA
    labels (entity_id, level, label) for the EXECUTED levels — the
    subgraph entry point the incremental localized detection uses
    (labels restricted to a union of whole projection components equal
    the full run's labels for those components: LPA votes travel only
    along edges). Same driver/distributed routing as
    detect_communities."""
    spark = nodes.sparkSession
    nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    edges = edges.select("a", "b", "w").localCheckpoint()
    if (
        driver_threshold > 0
        and nodes.count() <= driver_threshold
        and edges.count() <= edge_driver_threshold
    ):
        from ..core.lpa import detect_label_hierarchy

        node_list = [r["node"] for r in nodes.collect()]
        edge_list = [(r["a"], r["b"], r["w"]) for r in edges.collect()]
        lbl_levels = detect_label_hierarchy(
            node_list, edge_list, max_levels=max_levels
        )
        rows = [
            (n, level, lvl[n])
            for level, lvl in enumerate(lbl_levels)
            for n in node_list
        ]
        return spark.createDataFrame(rows or [], LABELS_SCHEMA)
    parts = _distributed_level_labels(nodes, edges, max_levels)
    labels = parts[0]
    for part in parts[1:]:
        labels = labels.unionByName(part)
    return labels


def extend_labels_to(labels: DataFrame, max_levels: int) -> DataFrame:
    """Pad (entity_id, level, label) rows so every entity has a row at
    every level 0..max_levels-1, carrying its deepest label forward.

    Sound because the leveled loop is monotone per component: once a
    component stops merging, its labels are constant at every deeper
    level — so a stored/locally-computed prefix extends uniquely. The
    incremental assembly pads reused and recomputed label sets to a
    common depth, then truncates to the executed-level count a full
    run would have chosen (merges-per-level rule)."""
    last = labels.groupBy("entity_id").agg(F.max("level").alias("__ml"))
    deepest = (
        labels.join(last, "entity_id")
        .where(F.col("level") == F.col("__ml"))
        .select("entity_id", "label", "__ml")
        .localCheckpoint()
    )
    parts = [labels]
    for lvl in range(1, max_levels):
        parts.append(
            deepest.where(F.col("__ml") < lvl).select(
                "entity_id", F.lit(lvl).alias("level"), "label"
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def assemble_communities_from_labels(
    labels: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """(entity_id, level, label) rows for levels 0..E-1 →
    (membership(entity_id, community_id, level),
     hierarchy(child_community, parent_community)).

    The ONE numbering/assembly implementation shared by the full
    detector and the incremental localized path: per level,
    dense-number the distinct labels (range-partitioned two-phase —
    no global-sort Window) and stamp "{level}-{number}" ids; the
    hierarchy is the distinct (child, parent) co-membership of
    adjacent levels. Deterministic in the label rows, so reused +
    recomputed label sets assemble to exactly what a full recompute
    would produce."""
    spark = labels.sparkSession
    level_vals = sorted(
        r["level"] for r in labels.select("level").distinct().collect()
    )
    membership_parts: list[DataFrame] = []
    hierarchy_parts: list[DataFrame] = []
    for level in level_vals:
        lvl = labels.where(F.col("level") == level).select("entity_id", "label")
        numbering = dense_number_labels(lvl, "label", "number")
        membership_parts.append(
            lvl.join(numbering, "label")
            .select(
                "entity_id",
                F.concat_ws("-", F.lit(level), F.col("number")).alias(
                    "community_id"
                ),
                F.lit(level).alias("level"),
            )
            .localCheckpoint()
        )
        if len(membership_parts) > 1:
            hierarchy_parts.append(
                membership_parts[-2]
                .select(
                    "entity_id", F.col("community_id").alias("child_community")
                )
                .join(
                    membership_parts[-1].select(
                        "entity_id",
                        F.col("community_id").alias("parent_community"),
                    ),
                    "entity_id",
                )
                .select("child_community", "parent_community")
                .distinct()
            )
    membership = membership_parts[0]
    for part in membership_parts[1:]:
        membership = membership.unionByName(part)
    if hierarchy_parts:
        hierarchy = hierarchy_parts[0]
        for part in hierarchy_parts[1:]:
            hierarchy = hierarchy.unionByName(part)
        hierarchy = hierarchy.distinct()
    else:
        hierarchy = spark.createDataFrame(
            [], "child_community string, parent_community string"
        )
    return membership, hierarchy


def detect_communities(
    entities: DataFrame,
    triples: DataFrame,
    max_levels: int = MAX_LEVELS,
    driver_threshold: int = DRIVER_THRESHOLD,
    edge_driver_threshold: int = EDGE_DRIVER_THRESHOLD,
    return_labels: bool = False,
) -> tuple[DataFrame, ...]:
    """→ (membership(entity_id, community_id, level),
         hierarchy(child_community, parent_community))
       [+ labels(entity_id, level, label) when return_labels].

    Isolated entities keep their own label → singleton communities,
    matching a GDS projection over all __Entity__ nodes. The raw
    per-level labels are the incremental-maintenance state
    (plans/incremental.py stores them as ``community_labels``)."""
    spark = entities.sparkSession
    nodes = entities.select(F.col("entity_id").alias("node")).distinct()
    # checkpoint before the threshold counts: both the driver collect
    # and the distributed loop re-read this (components.py rationale)
    edges = projection_edges(triples).localCheckpoint()

    if (
        driver_threshold > 0
        and nodes.count() <= driver_threshold
        and edges.count() <= edge_driver_threshold
    ):
        from ..core.lpa import detect_label_hierarchy

        node_list = [r["node"] for r in nodes.collect()]
        edge_list = [(r["a"], r["b"], r["w"]) for r in edges.collect()]
        lbl_levels = detect_label_hierarchy(
            node_list, edge_list, max_levels=max_levels
        )
        m_rows, h_rows, l_rows = [], set(), []
        numbers = [
            {lbl: i for i, lbl in enumerate(sorted(set(lvl.values())))}
            for lvl in lbl_levels
        ]
        for n in node_list:
            arr = [num[lvl[n]] for lvl, num in zip(lbl_levels, numbers)]
            for level, num in enumerate(arr):
                m_rows.append((n, f"{level}-{num}", level))
                l_rows.append((n, level, lbl_levels[level][n]))
            for level in range(1, len(arr)):
                h_rows.add((f"{level - 1}-{arr[level - 1]}", f"{level}-{arr[level]}"))
        membership = spark.createDataFrame(
            m_rows, "entity_id string, community_id string, level int"
        )
        hierarchy = spark.createDataFrame(
            sorted(h_rows) or [],
            "child_community string, parent_community string",
        )
        if return_labels:
            return membership, hierarchy, spark.createDataFrame(
                l_rows, LABELS_SCHEMA
            )
        return membership, hierarchy

    parts = _distributed_level_labels(nodes, edges, max_levels)
    labels = parts[0]
    for part in parts[1:]:
        labels = labels.unionByName(part)
    membership, hierarchy = assemble_communities_from_labels(labels)
    if return_labels:
        return membership, hierarchy, labels
    return membership, hierarchy


def projection_components(
    entities: DataFrame, triples: DataFrame
) -> DataFrame:
    """(entity_id, pwcc): connected components of the undirected triple
    projection graph — the stored state the incremental localized
    detection's delta solver (components.connected_components_delta)
    keys its affected-component computation off. ONE implementation so
    every write site (build_all, both incremental paths) stores exactly
    the labeling the solver's soundness precondition assumes."""
    from .components import connected_components

    return connected_components(
        projection_edges(triples),
        nodes=entities.select("entity_id"),
        src="a",
        dst="b",
    ).select(
        F.col("node").alias("entity_id"), F.col("component").alias("pwcc")
    )


def localized_community_catalog(
    membership: DataFrame,
    dirty_entities: DataFrame,
    stored_communities: DataFrame,
    entities: DataFrame,
    triples: DataFrame,
    mentions: DataFrame,
    extra_changed_ids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Recompute catalog/summary rows ONLY for communities holding a
    dirty entity (plus any explicitly named ids, e.g. renumbered
    ones); stored rows stand in verbatim for the rest. Returns
    (communities, changed_ids). Sound because community_catalog is
    deterministic per community in (members, member entity rows,
    intra-community triples, member mentions) — the caller's
    dirty_entities must cover every entity whose contribution to any
    of those changed; `summary_created_at` on kept rows keeps the
    writing cycle's stamp (the one permitted divergence from a full
    recompute). The frames returned are lazy; callers checkpoint."""
    changed_ids = (
        membership.join(dirty_entities, "entity_id", "left_semi")
        .select("community_id")
        .distinct()
    )
    if extra_changed_ids is not None:
        changed_ids = changed_ids.union(extra_changed_ids).distinct()
    changed_ids = changed_ids.localCheckpoint()
    fresh = community_catalog(
        membership.join(changed_ids, "community_id", "left_semi"),
        entities,
        triples,
        mentions,
    ).localCheckpoint()
    keep_ids = (
        membership.select("community_id")
        .distinct()
        .join(changed_ids, "community_id", "left_anti")
    )
    kept = stored_communities.join(
        keep_ids, "community_id", "left_semi"
    ).select(*fresh.columns)
    return kept.unionByName(fresh), changed_ids


def detect_communities_factory(
    entities: DataFrame,
    triples: DataFrame,
    algorithm: str = "leiden",
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Algorithm selector mirroring the reference's
    ``community_algorithm`` setting (config/settings.py:48 — 'leiden'
    or 'sllpa', factory community/detector/__init__).

    'leiden' → the hierarchical LPA/contraction detector above;
    'sllpa' → overlapping single-level SLLPA (operators/sllpa.py) —
    its hierarchy is empty (level-0 only, like the reference's SLLPA
    save path)."""
    if algorithm == "leiden":
        return detect_communities(entities, triples, **kwargs)
    if algorithm == "sllpa":
        from .sllpa import sllpa_membership_table

        kwargs.pop("max_levels", None)
        membership = sllpa_membership_table(entities, triples, **kwargs)
        hierarchy = entities.sparkSession.createDataFrame(
            [], "child_community string, parent_community string"
        )
        return membership, hierarchy
    raise ValueError(f"unknown community algorithm: {algorithm!r}")


def community_catalog(
    membership: DataFrame,
    entities: DataFrame,
    triples: DataFrame,
    mentions: DataFrame,
) -> DataFrame:
    """Community table: rank = countDistinct chunks mentioning members
    (IN_COMMUNITY* transitive — summary/base.py:59-64), weight =
    member count, stub summary + full_content (summary/base.py:15-45).
    """
    # rank via mentions ⋈ membership (J7)
    rank = (
        membership.join(mentions, "entity_id")
        .groupBy("community_id")
        .agg(F.countDistinct("chunk_id").cast("long").alias("community_rank"))
    )
    weight = membership.groupBy("community_id", "level").agg(
        F.count("*").cast("long").alias("weight")
    )

    # intra-community rels: both endpoints in same community+level (J6)
    m_subj = membership.select(
        F.col("entity_id").alias("subj"), "community_id", "level"
    )
    m_obj = membership.select(F.col("entity_id").alias("obj"), "community_id", "level")
    intra = (
        triples.where(F.col("subj") != F.col("obj"))
        .join(m_subj, "subj")
        .join(m_obj, ["obj", "community_id", "level"])
        .select("community_id", "subj", "pred", "obj", "description")
    )

    members = membership.join(
        entities.select("entity_id", "entity_type", "description"), "entity_id"
    )

    nodes_packed = members.groupBy("community_id").agg(
        F.sort_array(
            F.collect_list(F.struct("entity_id", "entity_type", "description"))
        ).alias("nodes")
    )
    rels_packed = intra.groupBy("community_id").agg(
        F.sort_array(
            F.collect_list(F.struct("subj", "pred", "obj", "description"))
        ).alias("rels")
    )

    packed = (
        weight.join(nodes_packed, "community_id", "left")
        .join(rels_packed, "community_id", "left")
        .join(rank, "community_id", "left")
    )

    summary_schema = (
        "community_id string, level int, community_rank long, weight long, "
        "summary string, full_content string"
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in pdf.itertuples(index=False):
            raw_nodes = row.nodes if row.nodes is not None else []
            raw_rels = row.rels if row.rels is not None else []
            nodes = [
                {
                    "id": n["entity_id"],
                    "type": n["entity_type"],
                    "description": n["description"],
                }
                for n in raw_nodes
            ]
            rels = [
                {
                    "start": r["subj"],
                    "end": r["obj"],
                    "type": r["pred"],
                    "description": r["description"],
                }
                for r in raw_rels
            ]
            out.append(
                (
                    row.community_id,
                    row.level,
                    row.community_rank if row.community_rank is not None else 0,
                    row.weight,
                    stub_summarize(row.community_id, nodes, rels),
                    prepare_string(nodes, rels),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "community_id",
                "level",
                "community_rank",
                "weight",
                "summary",
                "full_content",
            ],
        )

    return (
        packed.groupBy("community_id")
        .applyInPandas(lambda pdf: summarize(pdf), schema=summary_schema)
        .withColumn("summary_created_at", F.current_timestamp())
    )
