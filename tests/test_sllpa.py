"""SLLPA overlapping community detection (SURVEY §2 G4) — oracle
equality (driver + forced-distributed paths), overlap semantics, and
factory selection (reference community_algorithm setting)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_rag_agent_spark.core.sllpa import community_numbering, sllpa_memberships
from graph_rag_agent_spark.operators.sllpa import (
    sllpa_communities,
    sllpa_membership_table,
)

# two triangles joined by one bridge node 'x' — the classic overlap
# fixture: x belongs to both triangles
NODES = ["a1", "a2", "a3", "b1", "b2", "b3", "x", "iso"]
EDGES = [
    ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
    ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
    ("x", "a1"), ("x", "a2"), ("x", "a3"),
    ("x", "b1"), ("x", "b2"), ("x", "b3"),
]


def _spark_result(spark, driver_threshold, iters=20, strength=0.1):
    nodes = spark.createDataFrame([(n,) for n in NODES], "node string")
    edges = spark.createDataFrame(EDGES, "a string, b string")
    got = sllpa_communities(
        nodes,
        edges,
        max_iterations=iters,
        min_association_strength=strength,
        driver_threshold=driver_threshold,
    ).collect()
    return {(r["node"], r["label"]) for r in got}


def _oracle_result(iters=20, strength=0.1):
    members = sllpa_memberships(NODES, EDGES, iters, strength)
    return {(n, l) for n, ls in members.items() for l in ls}


def test_driver_path_matches_oracle(spark):
    assert _spark_result(spark, driver_threshold=10_000) == _oracle_result()


def test_distributed_path_matches_oracle(spark):
    # driver_threshold=0 forces the iterative DataFrame loop
    assert _spark_result(spark, driver_threshold=0) == _oracle_result()


def test_overlap_and_isolated_semantics():
    members = sllpa_memberships(NODES, EDGES, 20, 0.1)
    # every node has at least one community; isolated keeps its own
    assert members["iso"] == ["iso"]
    # overlapping output: at least one node carries ≥2 communities
    assert any(len(ls) > 1 for ls in members.values())
    # dense numbering is 0-based and gap-free
    numbering = community_numbering(members)
    assert sorted(numbering.values()) == list(range(len(numbering)))


def test_membership_table_shape_and_factory(spark, transcripts_df):
    from graph_rag_agent_spark.operators.community import (
        detect_communities_factory,
    )
    from graph_rag_agent_spark.plans.inmem import build_kg_tables

    tables = build_kg_tables(transcripts_df)
    membership, hierarchy = detect_communities_factory(
        tables["entities"],
        tables["triples"],
        algorithm="sllpa",
        max_iterations=10,
    )
    rows = membership.collect()
    assert rows and all(r["level"] == 0 for r in rows)
    assert all(r["community_id"].startswith("0-") for r in rows)
    assert hierarchy.count() == 0  # single-level algorithm
    # every entity is a member of ≥1 community
    n_entities = tables["entities"].select("entity_id").distinct().count()
    assert membership.select("entity_id").distinct().count() == n_entities

    direct = sllpa_membership_table(
        tables["entities"], tables["triples"], max_iterations=10
    )
    assert {tuple(r) for r in direct.collect()} == {tuple(r) for r in rows}


def test_edge_guard_routes_dense_graph_to_distributed_loop(spark):
    """Small node set + edge guard tripped (edge_driver_threshold=0)
    → the distributed loop runs, never the driver collect; output
    equality with the driver path proves the routing is safe."""
    nodes = spark.createDataFrame([(n,) for n in NODES], "node string")
    edges = spark.createDataFrame(EDGES, "a string, b string")
    dist = sllpa_communities(
        nodes, edges, max_iterations=20, min_association_strength=0.1,
        driver_threshold=10_000, edge_driver_threshold=0,
    )
    assert {(r["node"], r["label"]) for r in dist.collect()} == _oracle_result()
