"""Deterministic merge-judge stub + survivor rule.

Stands in for the reference's LLM merge decision
(/root/reference/graph/processing/entity_merger.py:282-311, prompt
config/prompt.py:103-144): given a duplicate-candidate group, decide
which subsets are truly the same entity.

Stub policy (same knowledge source as the embedding stub): two
candidates merge iff they map to the same vocabulary cluster, or —
for out-of-vocabulary ids — iff they are equal after normalization
(casefold + strip punctuation + collapse whitespace).

Survivor rule: the reference merges via apoc.refactor.mergeNodes with
property strategy 'discard' (entity_merger.py:348-360) — the FIRST
node's properties win, but "first" is Neo4j-internal order. We pin a
deterministic equivalent: min by (length, lexicographic) of the member
ids (documented tie-break, SURVEY.md §7 "Merge semantics").
"""

from __future__ import annotations

import re

from .vocab import ALIAS_TO_CANONICAL

_NORM_RE = re.compile(r"[\W_]+", re.UNICODE)


def normalize_entity_id(entity_id: str) -> str:
    return _NORM_RE.sub(" ", (entity_id or "").casefold()).strip()


def merge_key(entity_id: str) -> str:
    """Key under which candidates are considered the same entity."""
    canonical = ALIAS_TO_CANONICAL.get(entity_id)
    if canonical is not None:
        return f"cluster:{canonical}"
    return f"norm:{normalize_entity_id(entity_id)}"


def judge_group(candidates: list[str]) -> list[list[str]]:
    """Candidate group → list of mergeable subgroups (≥2 members each),
    mirroring the shape of _convert_to_list output
    (entity_merger.py:89-163: only groups with ≥2 distinct members
    survive)."""
    by_key: dict[str, list[str]] = {}
    for c in dict.fromkeys(candidates):  # de-dup, keep order
        by_key.setdefault(merge_key(c), []).append(c)
    return [group for group in by_key.values() if len(group) > 1]


def survivor(members: list[str]) -> str:
    """Deterministic 'discard'-strategy survivor."""
    return min(members, key=lambda s: (len(s), s))
