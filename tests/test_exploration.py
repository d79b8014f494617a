"""Multi-hop Chain of Exploration (G6) vs a pure-Python transcription
of the reference's frontier loop (chain_of_exploration.py:33-170)."""

from __future__ import annotations

import pytest

from graph_rag_agent_spark.core.stub_embed import cosine, embed_text
from graph_rag_agent_spark.operators.exploration import (
    adaptive_width,
    chain_of_exploration,
    estimate_query_complexity,
)

# small KG: star around A plus a 3-hop tail
ENTITIES = ["Acme Corp", "Sony", "Alice Zhang", "Widget X", "Beijing", "Gizmo 9"]
TRIPLES = [
    ("Acme Corp", "PARTNERS_WITH", "Sony", 5.0),
    ("Alice Zhang", "WORKS_AT", "Acme Corp", 3.0),
    ("Sony", "MAKES", "Widget X", 2.0),
    ("Widget X", "LOCATED_IN", "Beijing", 1.0),
    ("Beijing", "MAKES", "Gizmo 9", 1.0),
]
QUERY = "为什么 Acme Corp 与 Sony 有合作关系?"


def _py_explore(query, seeds, max_steps=5, width=3, limit=100):
    qvec = embed_text(query)
    emb = {e: embed_text(e + " " + e) for e in ENTITIES}
    sym = []
    for s, p, o, w in TRIPLES:
        sym.append((s, p, o, w))
        sym.append((o, p, s, w))
    visited = list(dict.fromkeys(seeds))
    frontier = list(visited)
    steps = {e: 0 for e in visited}
    for step in range(max_steps):
        if not frontier:
            break
        edges = [
            (s, p, d, w)
            for s, p, d, w in sym
            if s in frontier and d not in visited
        ]
        edges.sort(key=lambda t: (-t[3], t[2], t[0], t[1]))
        edges = edges[:limit]
        cand = sorted({d for _, _, d, _ in edges})
        scored = sorted(
            ((cosine(emb[d], qvec), d) for d in cand if d in emb),
            key=lambda t: (-t[0], t[1]),
        )
        if not scored:
            break
        w = adaptive_width(step, query, len(scored), width)
        selected = [d for _, d in scored[:w]]
        for d in selected:
            visited.append(d)
            steps[d] = step + 1
        frontier = sorted(selected)
    return steps


@pytest.fixture(scope="module")
def kg(spark):
    entities = spark.createDataFrame(
        [(e, embed_text(e + " " + e)) for e in ENTITIES],
        "entity_id string, embedding array<double>",
    )
    triples = spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, weight double"
    )
    return entities, triples


def test_formula_transcriptions():
    assert 0.5 <= estimate_query_complexity("hi") <= 1.5
    assert estimate_query_complexity(QUERY) > estimate_query_complexity("hi")
    assert adaptive_width(0, QUERY, 100) == min(
        5, max(1, int(3 * 1.0 * 1.5 * estimate_query_complexity(QUERY)))
    )
    assert adaptive_width(9, "x?", 1) == 1  # deep step + few neighbors → 1


def test_multihop_reaches_tail(kg):
    entities, triples = kg
    out = chain_of_exploration(
        entities, triples, QUERY, ["Alice Zhang"], max_steps=5
    )
    got = {r["entity_id"]: r["step"] for r in out["visited"].collect()}
    want = _py_explore(QUERY, ["Alice Zhang"])
    assert got == want
    # genuinely multi-hop: something ≥3 steps away from the seed
    assert max(got.values()) >= 3

    trail = out["trail"].collect()
    assert trail
    # every trail edge lands on a visited entity at that step
    for r in trail:
        assert got[r["dst"]] == r["step"]


def test_visited_excluded_and_deterministic(kg):
    entities, triples = kg
    a = chain_of_exploration(entities, triples, QUERY, ["Acme Corp"], max_steps=3)
    b = chain_of_exploration(entities, triples, QUERY, ["Acme Corp"], max_steps=3)
    ra = sorted(map(tuple, a["visited"].collect()))
    rb = sorted(map(tuple, b["visited"].collect()))
    assert ra == rb
    ids = [r[0] for r in ra]
    assert len(ids) == len(set(ids))  # no entity visited twice
