"""Hybrid search tool (reference search/tool/hybrid_tool.py): the
three-rung seed ladder and the low/high-level fan-out halves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.search import (
    hybrid_search_batch,
    hybrid_seed_entities,
)

ENT_SCHEMA = "entity_id string, description string, embedding array<long>"
Q_SCHEMA = (
    "query_id long, query string, low_keywords array<string>, "
    "qvec array<long>"
)


@pytest.fixture(scope="module")
def entities(spark):
    rows = [
        ("alpha corp", "makes widgets", [5, 0, 0]),
        ("beta labs", "studies widgets", [0, 5, 0]),
        ("gamma inc", "sells gadgets", [0, 0, 5]),
        ("delta fund", "finances gadgets", [1, 1, 1]),
    ]
    return spark.createDataFrame(rows, ENT_SCHEMA).cache()


def _seeds(spark, entities, queries, **kw):
    qdf = spark.createDataFrame(queries, Q_SCHEMA)
    rows = hybrid_seed_entities(qdf, entities, **kw).collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rung"], r["entity_id"]))
    return {k: sorted(v) for k, v in out.items()}


def test_ladder_rung_selection(spark, entities):
    got = _seeds(
        spark,
        entities,
        [
            # keyword 'widget' matches two descriptions → keyword rung
            (1, "who makes widgets", ["widget"], [9, 9, 9]),
            # keywords match nothing → vector rung top-k
            (2, "unrelated", ["zzqx"], [5, 0, 0]),
            # no keywords and a null qvec (vector search failed, the
            # reference's exception path) → text rung: the whole query
            # string must be CONTAINed — 'gamma' appears in one id
            (3, "gamma", [], None),
        ],
        entity_limit=2,
    )
    assert got[1] == [("keyword", "alpha corp"), ("keyword", "beta labs")]
    assert [r for r, _ in got[2]] == ["vector", "vector"]
    # top-2 by dot with qvec [5,0,0]: alpha (25) then delta (5)
    assert got[2] == [("vector", "alpha corp"), ("vector", "delta fund")]
    assert got[3] == [("text", "gamma inc")]


def test_keyword_cap_is_deterministic(spark, entities):
    got = _seeds(
        spark,
        entities,
        # 'dget' substring-matches ALL four descriptions (wi-dget-s
        # and ga-dget-s); cap 1 → the entity_id-ASC pick (documented
        # deviation from Neo4j's unordered LIMIT)
        [(1, "q", ["dget"], [1, 1, 1])],
        entity_limit=1,
    )
    assert got[1] == [("keyword", "alpha corp")]


def test_hybrid_search_batch_fanout(spark, entities):
    queries = spark.createDataFrame(
        [(1, "who makes widgets", ["widget"], [9, 9, 9], ["gadget topic"])],
        Q_SCHEMA + ", high_keywords array<string>",
    )
    triples = spark.createDataFrame(
        [
            ("alpha corp", "SUPPLIES", "beta labs", "d", 1.0),
            ("beta labs", "OWNS", "alpha corp", "d", 1.0),  # reverse dir
            ("alpha corp", "SELLS_TO", "gamma inc", "d", 1.0),  # gamma ∉ seeds
        ],
        "subj string, pred string, obj string, description string, weight double",
    )
    mentions = spark.createDataFrame(
        [("c1", "alpha corp"), ("c2", "alpha corp"), ("c2", "beta labs"),
         ("c3", "gamma inc")],
        "chunk_id string, entity_id string",
    )
    communities = spark.createDataFrame(
        [
            ("0-0", 0, 5, "about the gadget topic", "gadget topic body"),
            ("0-1", 0, 9, "gadget topic again", "more gadget topic"),
            ("0-2", 0, None, "unrelated", "unrelated"),
            ("1-0", 1, 99, "gadget topic at level 1", "gadget topic"),
        ],
        "community_id string, level int, community_rank int, "
        "summary string, full_content string",
    )
    out = hybrid_search_batch(
        queries, entities, triples, mentions, communities,
        entity_limit=5, chunk_limit=1, top_communities=2,
    )
    seeds = {r["entity_id"] for r in out["seeds"].collect()}
    assert seeds == {"alpha corp", "beta labs"}
    rels = [
        (r["subj"], r["pred"], r["obj"]) for r in out["relationships"].collect()
    ]
    # both endpoints seeded, subj < obj — each direction kept as its
    # own canonical row; the gamma edge drops
    assert sorted(rels) == [
        ("alpha corp", "OWNS", "beta labs"),
        ("alpha corp", "SUPPLIES", "beta labs"),
    ]
    chunks = [r["chunk_id"] for r in out["chunks"].collect()]
    assert chunks == ["c1"]  # distinct {c1, c2} capped at 1, id ASC
    comm = sorted(
        ((r["community_id"], r["rank0"]) for r in out["communities"].collect()),
        key=lambda t: -t[1],
    )
    # level-0 only, keyword-matched, top-2 by rank: 0-1 (9), 0-0 (5)
    assert comm == [("0-1", 9), ("0-0", 5)]


def test_high_level_whole_query_fallback(spark, entities):
    queries = spark.createDataFrame(
        [(1, "gadget topic", ["widget"], [1, 1, 1], [])],
        Q_SCHEMA + ", high_keywords array<string>",
    )
    communities = spark.createDataFrame(
        [("0-0", 0, None, "has the gadget topic inside", "x")],
        "community_id string, level int, community_rank int, "
        "summary string, full_content string",
    )
    empty = spark.createDataFrame(
        [], "subj string, pred string, obj string, description string, "
        "weight double",
    )
    noment = spark.createDataFrame([], "chunk_id string, entity_id string")
    out = hybrid_search_batch(
        queries, entities, empty, noment, communities
    )
    comm = out["communities"].collect()
    # no high keywords → the whole query gates; NULL rank reads as 0
    assert [(r["community_id"], r["rank0"]) for r in comm] == [("0-0", 0)]
