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
