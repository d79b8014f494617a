"""DataFrame connected components vs the pure-Python union-find spec
(FIXTURES.md §4 fixture shapes)."""

from __future__ import annotations

import pytest

from graph_rag_agent_spark.core.linkage import connected_components as py_cc
from graph_rag_agent_spark.operators.components import (
    connected_components,
    consecutive_component_ids,
)


def _run(spark, nodes, edges, driver_threshold=0):
    # driver_threshold=0 forces the DISTRIBUTED min-label loop; the
    # driver-side fast path is the py_cc spec itself (tested by
    # test_driver_fast_path_equivalent)
    e = spark.createDataFrame(edges or [("__none__", "__none__")], "src string, dst string")
    n = spark.createDataFrame([(x,) for x in nodes], "node string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            e, nodes=n, driver_threshold=driver_threshold
        ).collect()
        if r["node"] != "__none__"
    }
    want = py_cc(nodes, edges)
    return got, want


def test_driver_fast_path_equivalent(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    nodes = ["a", "b", "c", "x", "y", "solo"]
    fast, want = _run(spark, nodes, edges, driver_threshold=10**6)
    dist, _ = _run(spark, nodes, edges, driver_threshold=0)
    assert fast == dist == want


def test_chain_transitive(spark):
    got, want = _run(spark, ["A", "B", "C", "D"], [("A", "B"), ("B", "C")])
    assert got == want
    assert got["C"] == "A" and got["D"] == "D"


def test_two_disjoint_clusters(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    got, want = _run(spark, ["a", "b", "c", "x", "y"], edges)
    assert got == want
    assert got["c"] == "a" and got["y"] == "x"


def test_star_500(spark):
    nodes = [f"n{i:03d}" for i in range(500)]
    edges = [("hub", n) for n in nodes]
    got, want = _run(spark, nodes + ["hub"], edges)
    assert got == want
    assert len(set(got.values())) == 1


def test_long_chain_log_rounds(spark):
    # pointer-halving must converge well under MAX_ITERATIONS
    nodes = [f"c{i:03d}" for i in range(64)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(63)]
    got, want = _run(spark, nodes, edges)
    assert got == want
    assert set(got.values()) == {"c000"}


def test_consecutive_ids(spark):
    e = spark.createDataFrame([("a", "b"), ("x", "y")], "src string, dst string")
    comp = connected_components(e)
    wcc = {r["node"]: r["wcc"] for r in consecutive_component_ids(comp).collect()}
    # components ordered by min label: {a,b}→0, {x,y}→1
    assert wcc == {"a": 0, "b": 0, "x": 1, "y": 1}


def _delta_fixture(spark):
    """Old graph + a delta exercising every component event at once:
    a MERGE (edge c-x joins {a,b,c} and {x,y}), a SPLIT (edge q-r
    removed from {p,q,r}), a node REMOVAL (gone), a brand-new
    component ({w,z}), and untouched components ({m,n}, {solo})."""
    old_edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"),
                 ("q", "r"), ("m", "n")]
    old_nodes = ["a", "b", "c", "x", "y", "p", "q", "r", "m", "n",
                 "solo", "gone"]
    new_edges = [("a", "b"), ("b", "c"), ("c", "x"), ("x", "y"),
                 ("p", "q"), ("m", "n"), ("w", "z")]
    new_nodes = [n for n in old_nodes if n != "gone"] + ["w", "z"]
    old_part = py_cc(old_nodes, old_edges)
    # stored-wcc shape: dense ids, NOT the min-member label — the
    # delta solver must only rely on per-component stability
    dense = {lbl: i for i, lbl in enumerate(sorted(set(old_part.values())))}
    old_labels = spark.createDataFrame(
        [(n, dense[c]) for n, c in old_part.items()], "node string, wcc int"
    )
    return (
        spark.createDataFrame(new_edges, "src string, dst string"),
        spark.createDataFrame([(n,) for n in new_nodes], "node string"),
        spark.createDataFrame(old_edges, "src string, dst string"),
        old_labels,
        py_cc(new_nodes, new_edges),
    )


def test_cc_delta_equals_full_recompute(spark):
    """Merge + split + removal + new component in one delta: the
    localized solver must equal the full recompute, and the untouched
    components must stay OUT of the recomputed scope."""
    from graph_rag_agent_spark.operators.components import (
        connected_components_delta,
    )

    edges, nodes, old_edges, old_labels, want = _delta_fixture(spark)
    out = connected_components_delta(edges, nodes, old_edges, old_labels)
    assert not out["unchanged"]
    got = {r["node"]: r["component"] for r in out["components"].collect()}
    assert got == want
    affected = {r["node"] for r in out["affected_nodes"].collect()}
    # merge endpoints, split members, the removed node and the new
    # component are all in scope…
    assert {"a", "b", "c", "x", "y", "p", "q", "r", "gone", "w", "z"} <= affected
    # …and the untouched components are not (the whole point)
    assert affected.isdisjoint({"m", "n", "solo"})
    local = {r["node"] for r in out["local"].collect()}
    assert local.isdisjoint({"m", "n", "solo", "gone"})


def test_cc_delta_with_changed_src_hint(spark):
    """A correct hint (superset of sources whose edge rows changed,
    plus removed nodes) must produce the identical result — the hint
    only localizes the edge diff."""
    from graph_rag_agent_spark.operators.components import (
        connected_components_delta,
    )

    edges, nodes, old_edges, old_labels, want = _delta_fixture(spark)
    # directed rows that changed: -(q,r), +(c,x), +(w,z) → srcs
    # {q, c, w}; removed node: gone
    hint = spark.createDataFrame(
        [("q",), ("c",), ("w",), ("gone",)], "entity_id string"
    )
    out = connected_components_delta(
        edges, nodes, old_edges, old_labels, changed_src_hint=hint
    )
    got = {r["node"]: r["component"] for r in out["components"].collect()}
    assert got == want


def test_cc_delta_unchanged_short_circuit(spark):
    """Identical edge/node sets → unchanged=True and no recompute
    frames (the caller reuses the stored wcc/canonical_map verbatim)."""
    from graph_rag_agent_spark.operators.components import (
        connected_components_delta,
    )

    old_edges = [("a", "b"), ("x", "y")]
    nodes = ["a", "b", "x", "y", "solo"]
    part = py_cc(nodes, old_edges)
    e = spark.createDataFrame(old_edges, "src string, dst string")
    n = spark.createDataFrame([(x,) for x in nodes], "node string")
    labels = spark.createDataFrame(list(part.items()), "node string, lbl string")
    out = connected_components_delta(e, n, e, labels)
    assert out["unchanged"] and out["components"] is None
    assert out["affected_nodes"].count() == 0


def test_cc_delta_dense_renumber_matches_full(spark):
    """consecutive_component_ids over the delta-assembled map must
    equal the full path's dense numbering (the stored-wcc contract)."""
    from graph_rag_agent_spark.operators.components import (
        connected_components_delta,
    )

    edges, nodes, old_edges, old_labels, _ = _delta_fixture(spark)
    out = connected_components_delta(edges, nodes, old_edges, old_labels)
    got = {
        r["node"]: r["wcc"]
        for r in consecutive_component_ids(out["components"]).collect()
    }
    want = {
        r["node"]: r["wcc"]
        for r in consecutive_component_ids(
            connected_components(edges, nodes=nodes)
        ).collect()
    }
    assert got == want
