"""Dynamic query-graph builder + PageRank centrality: operators vs
python/networkx replay. Reference:
/root/reference/search/tool/reasoning/kg_builder.py."""

from __future__ import annotations

import pytest


def _bfs_replay(seeds, triples, depth, limit):
    """Pure-python replay of the reference BFS with the documented
    pins (per-level rows by (subj,pred,obj) capped, first-edge dedup,
    new-node discovery)."""
    nodes = {s: ("seed_entity", 0) for s in seeds}
    edges = {}
    frontier = list(seeds)
    for level in range(depth):
        if not frontier:
            break
        fs = set(frontier)
        rows = sorted(t for t in triples if t[0] in fs)[:limit]
        new = []
        for s, p, o in rows:
            if (s, o) not in edges:
                edges[(s, o)] = (p, level)
            if o not in nodes:
                nodes[o] = ("entity", level + 1)
                new.append(o)
        frontier = new
    return nodes, edges


def test_build_query_graphs_matches_replay(spark):
    from graph_rag_agent_spark.operators.kg_builder import build_query_graphs

    triples = [
        ("a", "R1", "b"),
        ("a", "R2", "b"),  # duplicate (src,dst): min-pred wins
        ("a", "R1", "c"),
        ("b", "R1", "d"),
        ("c", "R1", "a"),  # back-edge: a already in graph
        ("d", "R1", "e"),  # only reached at depth 3
        ("x", "R1", "y"),
    ]
    tdf = spark.createDataFrame(triples, "subj string, pred string, obj string")
    seeds = spark.createDataFrame(
        [("q0", "a"), ("q1", "x"), ("q2", "zzz")],
        "query_id string, entity_id string",
    )
    out = build_query_graphs(seeds, tdf, depth=2)
    nodes = {
        (r["query_id"], r["entity_id"]): (r["node_type"], r["level"])
        for r in out["nodes"].collect()
    }
    edges = {
        (r["query_id"], r["subj"], r["obj"]): (r["pred"], r["level"])
        for r in out["edges"].collect()
    }
    for q, seed_set in [("q0", ["a"]), ("q1", ["x"]), ("q2", ["zzz"])]:
        wn, we = _bfs_replay(seed_set, triples, depth=2, limit=100)
        assert {k[1]: v for k, v in nodes.items() if k[0] == q} == wn, q
        assert {
            (k[1], k[2]): v for k, v in edges.items() if k[0] == q
        } == we, q


def test_build_query_graphs_per_level_limit(spark):
    from graph_rag_agent_spark.operators.kg_builder import build_query_graphs

    triples = [("s", f"R{i:03d}", f"t{i:03d}") for i in range(10)]
    tdf = spark.createDataFrame(triples, "subj string, pred string, obj string")
    seeds = spark.createDataFrame([("q", "s")], "query_id string, entity_id string")
    out = build_query_graphs(seeds, tdf, depth=1, per_level_limit=4)
    got = sorted(r["obj"] for r in out["edges"].collect())
    # the pinned order keeps the 4 smallest (subj, pred, obj) rows
    assert got == ["t000", "t001", "t002", "t003"]


def _pagerank_py(edge_list, alpha=0.85, max_iter=100, tol=1e-6):
    """Pure-python power iteration with networkx.pagerank semantics
    (uniform start + personalization, dangling mass to all nodes,
    L1 stop at N×tol) — nx itself needs scipy, absent here; these
    semantics are what the reference's nx.pagerank call computes."""
    edges = sorted(set(edge_list))
    nodes = sorted({n for e in edges for n in e})
    out = {n: [] for n in nodes}
    for s, d in edges:
        out[s].append(d)
    n_count = len(nodes)
    x = {n: 1.0 / n_count for n in nodes}
    p = 1.0 / n_count
    for _ in range(max_iter):
        dangle = alpha * sum(x[n] for n in nodes if not out[n])
        new = {}
        for n in nodes:
            inc = sum(x[m] / len(out[m]) for m in nodes if n in out[m])
            new[n] = dangle * p + (1.0 - alpha) * p + alpha * inc
        err = sum(abs(new[n] - x[n]) for n in nodes)
        x = new
        if err < n_count * tol:
            return x
    raise AssertionError("power iteration failed to converge")


def test_pagerank_matches_networkx_semantics(spark):
    from graph_rag_agent_spark.operators.kg_builder import (
        central_entities,
        pagerank,
    )

    edge_list = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"),
        ("e", "a"),  # e is only a source; d→a keeps d non-dangling
        ("f", "g"),  # separate component; g dangles
    ]
    want = _pagerank_py(edge_list)

    edf = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edf).collect()}
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-9, node
    # ranks sum to 1 per graph
    assert abs(sum(got.values()) - 1.0) < 1e-9

    top = central_entities(pagerank(edf), limit=3).collect()
    want_top = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert [r["node"] for r in top] == [n for n, _ in want_top]


def test_pagerank_grouped_equals_independent(spark):
    from graph_rag_agent_spark.operators.kg_builder import pagerank

    graphs = {
        "g1": [("a", "b"), ("b", "a"), ("b", "c")],
        "g2": [("x", "y"), ("y", "z"), ("z", "x"), ("w", "x")],
    }
    rows = [(g, s, d) for g, es in graphs.items() for s, d in es]
    edf = spark.createDataFrame(rows, "query_id string, src string, dst string")
    got = {
        (r["query_id"], r["node"]): r["rank"]
        for r in pagerank(edf, group_col="query_id").collect()
    }
    for gname, es in graphs.items():
        want = _pagerank_py(es)
        for node, rank in want.items():
            assert abs(got[(gname, node)] - rank) < 1e-9, (gname, node)


def test_pagerank_nonconvergence_raises_and_ladder_falls_back(spark):
    """nx.pagerank RAISES at max_iter without convergence; the
    reference's get_central_entities catches that and ranks by
    degree (kg_builder.py:316-333). max_iter=1 forces the failure."""
    import pytest as _pytest

    from graph_rag_agent_spark.operators.kg_builder import (
        central_entities_ladder,
        pagerank,
    )

    edge_list = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    edf = spark.createDataFrame(edge_list, "src string, dst string")
    with _pytest.raises(RuntimeError, match="failed to converge"):
        pagerank(edf, max_iter=1, tol=1e-12)

    top = central_entities_ladder(edf, limit=3, max_iter=1, tol=1e-12)
    rows = top.collect()
    assert all(r["method"] == "degree" for r in rows)
    # degree = in+out: a:4 (b,c out; c,d in), b:2, c:3 → a, c, b
    assert [r["node"] for r in rows] == ["a", "c", "b"]
    assert [r["score"] for r in rows] == [4.0, 3.0, 2.0]

    # converging parameters take the pagerank rung
    ok = central_entities_ladder(edf, limit=2).collect()
    assert all(r["method"] == "pagerank" for r in ok) and len(ok) == 2


def test_pagerank_fixed_iterations_deterministic(spark):
    # tol=0 runs exactly max_iter sweeps — the replayable mode the
    # SQL oracle unrolls; two runs agree bit-for-bit
    from graph_rag_agent_spark.operators.kg_builder import pagerank

    edge_list = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    edf = spark.createDataFrame(edge_list, "src string, dst string")
    r1 = {r["node"]: r["rank"] for r in pagerank(edf, max_iter=3, tol=0.0).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank(edf, max_iter=3, tol=0.0).collect()}
    assert r1 == r2
    # hand-rolled 3 sweeps
    nodes = ["a", "b", "c"]
    out = {"a": ["b", "c"], "b": ["c"], "c": ["a"]}
    ranks = {n: 1 / 3 for n in nodes}
    for _ in range(3):
        new = {}
        for n in nodes:
            inc = sum(
                ranks[m] / len(out[m]) for m in nodes if n in out[m]
            )
            new[n] = 0.15 / 3 + 0.85 * inc
        ranks = new
    for n in nodes:
        assert abs(r1[n] - ranks[n]) < 1e-12, n
