"""Hierarchical community detection spec: monotone weighted label
propagation with level contraction.

Replaces the reference's Neo4j GDS Leiden call
(/root/reference/community/detector/leiden.py:10-65). Per SURVEY.md
§2 G3, the contract is the reference's SCHEMA, not its modularity:
hierarchical communities with a per-entity ``communities`` array,
community ids "{level}-{n}" (leiden.py:107,126-128) and an
IN_COMMUNITY hierarchy (leiden.py:118-136), maxLevels=3 (small-memory
tier, leiden.py:83-89).

Algorithm (deterministic, convergent, shuffle-parallel — the pure-
Python version here and the DataFrame version in operators/community.py
implement exactly this):
  - labels start as the node id;
  - every sweep is fully synchronous: each node computes the label
    with the largest incident edge-weight sum among its neighbors'
    current labels (ties → smallest label), and ADOPTS it ONLY IF it
    is lexicographically smaller than its current label;
  - the adopt-iff-smaller rule makes per-node labels monotonically
    decreasing, which guarantees convergence (no synchronous-LPA
    oscillation) in O(diameter) sweeps, while the weighted vote keeps
    dense clusters from absorbing each other across weak bridges;
  - stop at the first sweep with no change, or MAX_SWEEPS;
  - next level: contract communities to supernodes, sum weights
    between distinct communities, repeat. Stop early when a level no
    longer merges anything or no edges remain.
"""

from __future__ import annotations

MAX_LEVELS = 3  # leiden.py:83-89 small-memory tier
MAX_SWEEPS = 20


def lpa_once(
    nodes: list[str], weighted_edges: list[tuple[str, str, float]]
) -> dict[str, str]:
    """One LPA level: node → final label (a node id)."""
    adj: dict[str, list[tuple[str, float]]] = {n: [] for n in nodes}
    for a, b, w in weighted_edges:
        if a == b:
            continue
        adj[a].append((b, w))
        adj[b].append((a, w))

    labels = {n: n for n in nodes}
    for _sweep in range(MAX_SWEEPS):
        updates: dict[str, str] = {}
        for n in nodes:
            if not adj[n]:
                continue
            votes: dict[str, float] = {}
            for neighbor, w in adj[n]:
                lbl = labels[neighbor]
                votes[lbl] = votes.get(lbl, 0.0) + w
            best = min(votes, key=lambda l: (-votes[l], l))
            if best < labels[n]:
                updates[n] = best
        if not updates:
            break
        labels.update(updates)
    return labels


def detect_label_hierarchy(
    nodes: list[str],
    weighted_edges: list[tuple[str, str, float]],
    max_levels: int = MAX_LEVELS,
) -> list[dict[str, str]]:
    """Run leveled LPA; returns per-level {node → LABEL} (a node id).

    The raw labels are the delta-maintainable representation: they are
    deterministic PER projection-component (LPA votes travel only
    along edges), while the dense community numbers derive from them
    by one global rank per level — so an incremental cycle can reuse
    stored labels for untouched components and renumber globally
    (operators/community.py assembly, plans/incremental.py)."""
    levels: list[dict[str, str]] = []
    cur_nodes = sorted(set(nodes))
    cur_edges = weighted_edges
    # node → current supernode (label of previous level)
    node_to_super = {n: n for n in cur_nodes}

    for _level in range(max_levels):
        labels = lpa_once(cur_nodes, cur_edges)
        ordered = sorted(set(labels.values()))
        levels.append({n: labels[node_to_super[n]] for n in node_to_super})

        if len(ordered) == len(cur_nodes):  # nothing merged → stop
            break

        # contract
        node_to_super = {n: labels[node_to_super[n]] for n in node_to_super}
        agg: dict[tuple[str, str], float] = {}
        for a, b, w in cur_edges:
            la, lb = labels[a], labels[b]
            if la == lb:
                continue
            key = (min(la, lb), max(la, lb))
            agg[key] = agg.get(key, 0.0) + w
        cur_nodes = ordered
        cur_edges = [(a, b, w) for (a, b), w in agg.items()]
        if not cur_edges:
            break
    return levels


def detect_hierarchy(
    nodes: list[str],
    weighted_edges: list[tuple[str, str, float]],
    max_levels: int = MAX_LEVELS,
) -> list[dict[str, int]]:
    """Run leveled LPA; returns per-level {node → community_number}.

    Community numbers are dense ranks of labels in lexicographic order
    per level (deterministic replacement for GDS's internal ids).
    Level l+1 numbers are assigned over the contracted supergraph; each
    original node inherits its supernode's community. Thin numbering
    shell over detect_label_hierarchy (one implementation of the
    level loop)."""
    out: list[dict[str, int]] = []
    for lvl in detect_label_hierarchy(nodes, weighted_edges, max_levels):
        ordered = sorted(set(lvl.values()))
        number = {lbl: i for i, lbl in enumerate(ordered)}
        out.append({n: number[lbl] for n, lbl in lvl.items()})
    return out


def communities_array(levels: list[dict[str, int]], node: str) -> list[int]:
    """Per-entity communities array (leiden.py:102-106 semantics)."""
    return [lvl[node] for lvl in levels if node in lvl]
