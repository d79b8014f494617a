"""Deterministic Speaker-Listener LPA (SLLPA / SLPA) spec — the
pure-Python oracle for operators/sllpa.py.

Reference: /root/reference/community/detector/sllpa.py:10-80 calls
Neo4j GDS ``gds.sllpa.write`` with maxIterations=100,
minAssociationStrength=0.05 and stores the resulting OVERLAPPING
community ids per entity as level-0 communities ('0-<id>',
algorithm='SLLPA'). GDS's speaker rule is randomized; as with every
other stochastic boundary in this repo we pin a deterministic
equivalent so CI and the distributed implementation are bit-stable:

  - speaker: the label with the highest count in the node's memory,
    ties → smallest label;
  - listener: accumulates EVERY label spoken by its neighbors into
    memory, weighted by how many neighbors spoke it (the
    deterministic stand-in for GDS's randomized single-label
    sampling: in expectation the random listener receives labels in
    exactly these proportions, so the accumulated histogram matches
    the expected SLPA memory). Isolated nodes hear nothing. This is
    what preserves OVERLAP deterministically — a bridge node between
    two dense groups accrues both labels at equal rates, which a
    deterministic argmax listener would collapse to one;
  - post-processing: labels whose frequency (count / memory size)
    ≥ min_association_strength become the node's community set
    (GDS SLLPA post-processing step).

Edges are unweighted — GDS SLLPA ignores relationship weights.
"""

from __future__ import annotations

from collections import Counter

MAX_ITERATIONS = 100  # reference sllpa.py:66 (>32GB tier)
MIN_ASSOCIATION_STRENGTH = 0.05  # reference sllpa.py:67


def sllpa_memberships(
    nodes: list[str],
    edges: list[tuple[str, str]],
    max_iterations: int = MAX_ITERATIONS,
    min_association_strength: float = MIN_ASSOCIATION_STRENGTH,
) -> dict[str, list[str]]:
    """node → sorted list of community labels (overlapping)."""
    nbrs: dict[str, list[str]] = {n: [] for n in nodes}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    memory: dict[str, Counter] = {n: Counter({n: 1}) for n in nbrs}

    for _ in range(max_iterations):
        speak = {}
        for n, mem in memory.items():
            top = max(mem.values())
            speak[n] = min(label for label, c in mem.items() if c == top)
        for n, neigh in nbrs.items():
            if not neigh:
                continue
            memory[n].update(speak[m] for m in neigh)

    out: dict[str, list[str]] = {}
    for n, mem in memory.items():
        total = sum(mem.values())
        kept = sorted(
            l for l, c in mem.items() if c / total >= min_association_strength
        )
        out[n] = kept or [min(mem)]
    return out


def community_numbering(memberships: dict[str, list[str]]) -> dict[str, int]:
    """Distinct community labels → dense 0-based numbers, ordered by
    label (mirrors the consecutive-ids convention used everywhere)."""
    labels = sorted({l for ls in memberships.values() for l in ls})
    return {l: i for i, l in enumerate(labels)}
