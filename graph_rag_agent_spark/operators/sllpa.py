"""Distributed SLLPA — overlapping community detection (SURVEY §2 G4).

DataFrame implementation of the deterministic Speaker-Listener LPA
spec in core/sllpa.py (reference community/detector/sllpa.py:10-80,
factory-selectable via the ``community_algorithm`` setting —
config/settings.py:48). Tests assert exact equality with the
pure-Python oracle; small graphs take a driver fast path running the
oracle directly (same rationale as components/community).

Physical shape per iteration (the 100 TB path):
  - speaker pick: one window over the memory table (partition = node);
  - listen: edges ⋈ speakers (shuffle on the speaker key) →
    groupBy(listener, label) count — every heard label is accumulated
    into the listener's memory (core/sllpa spec; no top-1 pick here);
  - memory update: union + groupBy(node, label) — map-side combinable.
State (node, label, cnt) is localCheckpointed every iteration to
truncate lineage, exactly like the CC/LPA loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.sllpa import (
    MAX_ITERATIONS,
    MIN_ASSOCIATION_STRENGTH,
    community_numbering,
    sllpa_memberships,
)
from .components import EDGE_DRIVER_THRESHOLD, dense_number_labels

DRIVER_THRESHOLD = 100_000


def sllpa_communities(
    nodes: DataFrame,
    edges: DataFrame,
    max_iterations: int = MAX_ITERATIONS,
    min_association_strength: float = MIN_ASSOCIATION_STRENGTH,
    driver_threshold: int = DRIVER_THRESHOLD,
    edge_driver_threshold: int = EDGE_DRIVER_THRESHOLD,
) -> DataFrame:
    """nodes(node) + edges(a, b) → (node, label) rows, one per
    (node, community) pair — OVERLAPPING membership."""
    spark = nodes.sparkSession
    nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    e = (
        edges.select(F.col(edges.columns[0]).alias("a"), F.col(edges.columns[1]).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    # both collects bounded (components.py rationale: small node sets
    # can still carry dense-clique edge lists that OOM the driver)
    if (
        driver_threshold > 0
        and nodes.count() <= driver_threshold
        and e.count() <= edge_driver_threshold
    ):
        node_list = [r["node"] for r in nodes.collect()]
        edge_list = [(r["a"], r["b"]) for r in e.collect()]
        members = sllpa_memberships(
            node_list, edge_list, max_iterations, min_association_strength
        )
        rows = [(n, l) for n in sorted(members) for l in members[n]]
        return spark.createDataFrame(rows or [], "node string, label string")

    from ..session import loop_checkpoint, materialize

    # symmetric neighbor list: (listener, speaker). Loop state uses
    # materialize (stats reset), not localCheckpoint — see
    # session.materialize.
    sym = materialize(
        e.select(F.col("a").alias("listener"), F.col("b").alias("speaker")).union(
            e.select(F.col("b").alias("listener"), F.col("a").alias("speaker"))
        ),
        "sllpa-sym",
    )

    memory = materialize(
        nodes.select(
            "node", F.col("node").alias("label"), F.lit(1).cast("long").alias("cnt")
        ),
        "sllpa-memory",
    )

    w_speak = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _round in range(max_iterations):
        speak = (
            memory.withColumn("rn", F.row_number().over(w_speak))
            .where(F.col("rn") == 1)
            .select(F.col("node").alias("speaker"), F.col("label").alias("slabel"))
        )
        heard = (
            sym.join(speak, "speaker")
            .groupBy("listener", "slabel")
            .agg(F.count("*").alias("cnt"))
            .select(
                F.col("listener").alias("node"),
                F.col("slabel").alias("label"),
                "cnt",
            )
        )
        memory = loop_checkpoint(
            memory.unionByName(heard)
            .groupBy("node", "label")
            .agg(F.sum("cnt").alias("cnt")),
            "sllpa-memory",
            _round,
        )

    totals = memory.groupBy("node").agg(F.sum("cnt").alias("total"))
    kept = (
        memory.join(totals, "node")
        .where(F.col("cnt") / F.col("total") >= min_association_strength)
        .select("node", "label")
    )
    # a node whose every label fell under the threshold keeps its
    # strongest (min-memory) label — spec's `kept or [min(mem)]`
    fallback = (
        memory.join(kept.select("node").distinct(), "node", "left_anti")
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    return kept.unionByName(fallback)


def sllpa_membership_table(
    entities: DataFrame,
    triples: DataFrame,
    max_iterations: int = MAX_ITERATIONS,
    min_association_strength: float = MIN_ASSOCIATION_STRENGTH,
    driver_threshold: int = DRIVER_THRESHOLD,
    edge_driver_threshold: int = EDGE_DRIVER_THRESHOLD,
) -> DataFrame:
    """→ membership(entity_id, community_id, level) with level-0
    '0-<n>' ids and OVERLAPPING rows, matching the reference's SLLPA
    save shape (sllpa.py:95-118: id = '0-'+communityId, level 0)."""
    from .community import projection_edges

    nodes = entities.select(F.col("entity_id").alias("node")).distinct()
    edges = projection_edges(triples).select("a", "b")
    labeled = sllpa_communities(
        nodes,
        edges,
        max_iterations,
        min_association_strength,
        driver_threshold,
        edge_driver_threshold,
    )
    # two-phase range-partitioned numbering — same rationale as
    # components.consecutive_component_ids (no global-sort Window)
    numbering = dense_number_labels(labeled, "label", "number")
    return labeled.join(numbering, "label").select(
        F.col("node").alias("entity_id"),
        F.concat(F.lit("0-"), F.col("number").cast("string")).alias("community_id"),
        F.lit(0).alias("level"),
    )
