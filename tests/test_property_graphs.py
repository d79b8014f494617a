"""Property-based tests (hypothesis) for the LPA / SLLPA cores.

These are the specs the distributed community operators
(operators/community.py, operators/sllpa.py) assert equality with,
so the properties pin the CONTRACT of the graph loops:

  - monotone LPA (core/lpa.py): labels only ever decrease, stay node
    ids, and never escape the node's connected component — the
    monotonicity is what makes the synchronous distributed sweep
    convergent (no LPA oscillation), so a violation here means the
    DataFrame loop can diverge;
  - hierarchy levels are coarsening partitions with dense 0..k-1
    numbering ("{level}-{n}" ids, reference
    community/summary/leiden.py:107,126-128);
  - SLLPA memberships (core/sllpa.py) are nonempty, component-local,
    and edge-order invariant — the deterministic stand-in for GDS's
    randomized speaker/listener must not depend on input ordering or
    the distributed groupBy's partitioning would change answers.

No SparkSession; small graphs, milliseconds per example.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hypothesis import settings as _settings

# The driver's correctness gate runs this suite; derandomize so a
# fresh-example counterexample can't appear for the first time in a
# gating run (the properties still execute their full example budget).
_settings.register_profile("ci", derandomize=True)
_settings.load_profile("ci")

from graph_rag_agent_spark.core.linkage import connected_components
from graph_rag_agent_spark.core.lpa import (
    communities_array,
    detect_hierarchy,
    lpa_once,
)
from graph_rag_agent_spark.core.sllpa import (
    community_numbering,
    sllpa_memberships,
)

NODE = st.integers(min_value=0, max_value=11).map(lambda i: f"n{i:02d}")
NODES = st.lists(NODE, min_size=1, max_size=12, unique=True)
WEDGES = st.lists(
    st.tuples(NODE, NODE, st.floats(min_value=0.1, max_value=5.0)),
    max_size=20,
)
EDGES = st.lists(st.tuples(NODE, NODE), max_size=20)


def _close(nodes, edges):
    """Restrict edges to declared nodes (the spec requires it)."""
    ns = set(nodes)
    return [e for e in edges if e[0] in ns and e[1] in ns]


# ------------------------------------------------------------------- LPA


@given(NODES, WEDGES)
@settings(max_examples=150)
def test_lpa_labels_monotone_and_component_local(nodes, edges):
    edges = _close(nodes, edges)
    labels = lpa_once(nodes, edges)
    comp = connected_components(nodes, [(a, b) for a, b, _ in edges])
    assert set(labels) == set(nodes)
    for n, lbl in labels.items():
        assert lbl <= n  # adopt-iff-smaller ⇒ monotone
        assert lbl in labels  # labels are node ids
        assert comp[lbl] == comp[n]  # never escapes the component
    # isolated nodes keep their own label
    touched = {x for a, b, _ in edges for x in (a, b) if a != b}
    for n in nodes:
        if n not in touched:
            assert labels[n] == n


@given(NODES, WEDGES, st.randoms(use_true_random=False))
def test_lpa_edge_order_invariant(nodes, edges, rng):
    edges = _close(nodes, edges)
    base = lpa_once(nodes, edges)
    shuffled = list(edges)
    rng.shuffle(shuffled)
    assert lpa_once(nodes, shuffled) == base


@given(NODES, WEDGES)
@settings(max_examples=100)
def test_hierarchy_levels_coarsen_with_dense_numbers(nodes, edges):
    edges = _close(nodes, edges)
    levels = detect_hierarchy(nodes, edges)
    assert 1 <= len(levels) <= 3
    for lvl in levels:
        assert set(lvl) == set(nodes)
        k = len(set(lvl.values()))
        assert set(lvl.values()) == set(range(k))  # dense 0..k-1
    # each level is a coarsening: same community at level l ⇒ same at l+1
    for lo, hi in zip(levels, levels[1:]):
        rep: dict[int, int] = {}
        for n in nodes:
            c = rep.setdefault(lo[n], hi[n])
            assert hi[n] == c
    # communities_array returns one entry per level, in order
    for n in nodes:
        assert communities_array(levels, n) == [lvl[n] for lvl in levels]


# ----------------------------------------------------------------- SLLPA


@given(NODES, EDGES)
@settings(max_examples=60)
def test_sllpa_memberships_nonempty_sorted_component_local(nodes, edges):
    edges = _close(nodes, edges)
    member = sllpa_memberships(nodes, edges, max_iterations=12)
    comp = connected_components(nodes, edges)
    assert set(member) == set(nodes)
    for n, labels in member.items():
        assert labels and labels == sorted(labels)
        assert len(labels) == len(set(labels))
        for lbl in labels:
            assert lbl in member  # labels are node ids
            assert comp[lbl] == comp[n]  # overlap stays in-component


@given(NODES, EDGES, st.randoms(use_true_random=False))
@settings(max_examples=60)
def test_sllpa_edge_order_invariant(nodes, edges, rng):
    edges = _close(nodes, edges)
    base = sllpa_memberships(nodes, edges, max_iterations=8)
    shuffled = list(edges)
    rng.shuffle(shuffled)
    assert sllpa_memberships(nodes, shuffled, max_iterations=8) == base


@given(NODES, EDGES)
def test_sllpa_numbering_dense(nodes, edges):
    edges = _close(nodes, edges)
    member = sllpa_memberships(nodes, edges, max_iterations=6)
    numbering = community_numbering(member)
    k = len(numbering)
    assert set(numbering.values()) == set(range(k))
    # numbering covers exactly the labels in use
    assert set(numbering) == {l for ls in member.values() for l in ls}


def test_sllpa_bridge_node_keeps_overlap():
    # two triangles joined by one bridge node: the deterministic
    # accumulate-every-heard-label listener must keep BOTH communities
    # on the bridge (the overlap-preservation rationale in the module
    # docstring)
    a = ["a1", "a2", "a3"]
    b = ["b1", "b2", "b3"]
    tri = lambda ns: [(ns[0], ns[1]), (ns[1], ns[2]), (ns[0], ns[2])]
    edges = tri(a) + tri(b) + [("a1", "x"), ("b1", "x")]
    member = sllpa_memberships(a + b + ["x"], edges, max_iterations=30)
    assert len(member["x"]) >= 2
