"""Consistency validator (P6) over the built KG + violation fixtures."""

from __future__ import annotations

import pytest

from graph_rag_agent_spark.operators import validate
from graph_rag_agent_spark.plans.inmem import build_kg_tables


@pytest.fixture(scope="module")
def kg(transcripts_df):
    t = build_kg_tables(transcripts_df, with_communities=True)
    return t


def test_built_graph_is_consistent(kg):
    counts = validate.validate_graph(kg)
    assert counts == {k: 0 for k in counts}, counts


def test_broken_chain_detected(spark):
    chunks = spark.createDataFrame(
        [("c1", "convA", 1, "a"), ("c2", "convA", 3, "b"), ("c3", "convB", 2, "x")],
        "chunk_id string, conv_id string, position int, text string",
    )
    broken = validate.broken_chunk_chains(chunks).collect()
    assert {(r["conv_id"], r["position"]) for r in broken} == {
        ("convA", 3),  # gap 1→3
        ("convB", 2),  # no position 1 at all
    }
    missing_first = validate.docs_without_first_chunk(chunks).collect()
    assert {r["conv_id"] for r in missing_first} == {"convB"}


def test_orphans_detected(spark):
    entities = spark.createDataFrame([("E1",), ("E2",)], "entity_id string")
    mentions = spark.createDataFrame(
        [("c1", "convA", "E1"), ("c2", "convA", "GHOST")],
        "chunk_id string, conv_id string, entity_id string",
    )
    assert {r["entity_id"] for r in validate.orphan_entities(entities, mentions).collect()} == {"E2"}
    assert {r["entity_id"] for r in validate.dangling_mentions(mentions, entities).collect()} == {"GHOST"}


def test_graph_statistics(kg):
    row = validate.graph_statistics(kg).collect()[0]
    assert row["n_chunks"] > 0 and row["n_triples"] > 0
    assert row["n_entities"] > 0 and row["n_communities"] > 0
