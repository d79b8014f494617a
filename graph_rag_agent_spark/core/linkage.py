"""Entity-linking semantics: KNN pairs, WCC, duplicate candidates,
merge-group resolution. Pure Python — the oracle runs these directly;
the DataFrame operators implement the same spec distributed and are
tested for equivalence on fixtures.

Reference behavior being reproduced
(/root/reference/graph/processing/similar_entity.py):
  - KNN over embeddings, topK=10, cosine similarityCutoff=0.9
    (:162-180; threshold config/settings.py:38);
  - WCC over the SIMILAR edges (undirected, :224-286) → wcc id;
  - duplicate candidates: entities with len(id) > 1, grouped by wcc,
    pairwise Levenshtein(lower(a), lower(b)) < 3, overlapping
    candidate lists unioned transitively (:289-365) — equivalent to
    connected components of the lev<3 graph inside each wcc;
  - merge groups from the judge are themselves unioned when they share
    an entity (entity_merger.py:233-280, a union-find).
"""

from __future__ import annotations

from .stub_embed import cosine
from .stub_judge import judge_group, survivor

SIMILARITY_TOP_K = 10
SIMILARITY_CUTOFF = 0.9
WORD_EDIT_DISTANCE = 3  # similar_entity.py:18


def levenshtein(a: str, b: str) -> int:
    """Plain edit distance — matches Spark's F.levenshtein and
    apoc.text.distance (similar_entity.py:324)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def knn_pairs(
    embeddings: dict[str, list[float]],
    top_k: int = SIMILARITY_TOP_K,
    cutoff: float = SIMILARITY_CUTOFF,
) -> list[tuple[str, str, float]]:
    """Exact KNN: per src, top-k others by (cosine desc, dst asc),
    keeping score >= cutoff. O(n²) — oracle/fixture scale only."""
    ids = sorted(embeddings)
    out: list[tuple[str, str, float]] = []
    for src in ids:
        scored = [
            (cosine(embeddings[src], embeddings[dst]), dst) for dst in ids if dst != src
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for score, dst in scored[:top_k]:
            if score >= cutoff:
                out.append((src, dst, score))
    return out


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def connected_components(
    nodes: list[str], edges: list[tuple[str, str]]
) -> dict[str, str]:
    """node → component label (= min node id in the component)."""
    uf = _UnionFind()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in uf.parent}


def wcc_ids(
    nodes: list[str], similar_edges: list[tuple[str, str]]
) -> dict[str, int]:
    """WCC with consecutive ids (similar_entity.py:240-244,
    consecutiveIds=True); component order = sorted min-member label."""
    comp = connected_components(nodes, similar_edges)
    labels = sorted(set(comp.values()))
    index = {label: i for i, label in enumerate(labels)}
    return {n: index[c] for n, c in comp.items()}


def duplicate_candidate_groups(
    entities: list[str], wcc: dict[str, int], max_distance: int = WORD_EDIT_DISTANCE
) -> list[list[str]]:
    """Connected components of the lev<max_distance graph within each
    wcc, over entities with len(id) > 1 (similar_entity.py:302,318);
    only groups with ≥2 members survive. Groups sorted (apoc.coll.sort
    at :331) for determinism."""
    by_wcc: dict[int, list[str]] = {}
    for e in entities:
        if len(e) > 1 and e in wcc:
            by_wcc.setdefault(wcc[e], []).append(e)

    groups: list[list[str]] = []
    for members in by_wcc.values():
        if len(members) < 2:
            continue
        edges = [
            (a, b)
            for i, a in enumerate(members)
            for b in members[i + 1 :]
            if levenshtein(a.lower(), b.lower()) < max_distance
        ]
        comp = connected_components(members, edges)
        by_comp: dict[str, list[str]] = {}
        for n, c in comp.items():
            by_comp.setdefault(c, []).append(n)
        groups.extend(sorted(g) for g in by_comp.values() if len(g) > 1)
    return sorted(groups)


def merge_overlapping_groups(groups: list[list[str]]) -> list[list[str]]:
    """Union groups sharing an entity (entity_merger.py:233-280)."""
    uf = _UnionFind()
    for group in groups:
        for member in group[1:]:
            uf.union(group[0], member)
    by_root: dict[str, set[str]] = {}
    for group in groups:
        for member in group:
            by_root.setdefault(uf.find(member), set()).add(member)
    return sorted(sorted(g) for g in by_root.values())


def resolve_canonical_map(candidate_groups: list[list[str]]) -> dict[str, str]:
    """Judge each candidate group, union overlapping merge suggestions,
    pick survivors → entity_id → canonical_id (members only)."""
    suggestions: list[list[str]] = []
    for group in candidate_groups:
        suggestions.extend(judge_group(group))
    mapping: dict[str, str] = {}
    for group in merge_overlapping_groups(suggestions):
        winner = survivor(group)
        for member in group:
            mapping[member] = winner
    return mapping
