"""Closed entity vocabulary for the deterministic fixtures.

The synthetic transcript generator plants mentions from these clusters
(FIXTURES.md §1); the stub extractor recognizes exactly these surface
forms; the stub embedder/judge know the cluster structure (standing in
for the real embedding model / LLM judge the reference uses).

Alias-cluster design constraint: the reference only ever merges
entities whose ids are within Levenshtein distance < 3 of each other
(transitively) inside one similarity component
(/root/reference/graph/processing/similar_entity.py:315-352, distance
const :18) — so every cluster's aliases form a lev<3 chain. Variants
beyond that (e.g. "Sony Inc" vs "Sony") are deliberately separate
clusters: the reference would not merge them either, and they serve as
negative fixtures.
"""

from __future__ import annotations

# (canonical_name, aliases (lev<3 chain, canonical first), entity_type)
ENTITY_CLUSTERS: list[tuple[str, list[str], str]] = [
    ("Acme Corp", ["Acme Corp", "acme corp", "Acme Corp.", "Acme  Corp"], "Organization"),
    ("Sony", ["Sony", "sony", "Sonny", "Sony."], "Organization"),
    ("Sony Inc", ["Sony Inc", "sony inc"], "Organization"),  # NOT mergeable with Sony
    ("Alice Zhang", ["Alice Zhang", "alice zhang", "Alice Zhang."], "Person"),
    ("Bob Li", ["Bob Li", "bob li", "Bob  Li"], "Person"),
    ("Carol Wu", ["Carol Wu", "carol wu"], "Person"),
    ("David Chen", ["David Chen", "david chen", "David Chen."], "Person"),
    ("Widget X", ["Widget X", "widget x"], "Product"),
    ("Gizmo 9", ["Gizmo 9", "gizmo 9"], "Product"),
    ("Shanghai", ["Shanghai", "shanghai", "ShangHai"], "Location"),
    ("Beijing", ["Beijing", "beijing"], "Location"),
    ("Hangzhou", ["Hangzhou", "hangzhou"], "Location"),
    ("华东大学", ["华东大学", "华东大学。"], "组织"),
    ("张伟", ["张伟"], "人物"),
    ("李娜", ["李娜"], "人物"),
    ("奖学金管理规定", ["奖学金管理规定"], "管理规定"),
]

# Pattern-derived entities ---------------------------------------------------
#
# Regex-recognizable ids ("EMP-00123") whose id space scales with the
# corpus, so the entity catalog — and therefore the distributed
# LSH → CC → judge linking chain — grows with data size instead of
# being bounded by the closed vocabulary above. Three surface variants
# per canonical id, pairwise Levenshtein < 3 (a clique, so ANY
# co-occurring subset is transitively mergeable under the reference's
# lev<3 rule, similar_entity.py:315-352):
#     v0  EMP-00123      (canonical)
#     v1  EMP 00123      (dist 1 from v0)
#     v2  EMP-00123.     (dist 1 from v0, dist 2 from v1)
# Distinct ids are never mergeable: the judge's normalization key
# ("emp 00123") differs whenever the digits differ.

PATTERN_TYPES: dict[str, str] = {
    "EMP": "Person",
    "PRJ": "Project",
    "TKT": "Ticket",
}
PATTERN_PREFIXES: list[str] = ["EMP", "PRJ", "TKT"]
PATTERN_REGEX = r"(?:EMP|PRJ|TKT)[- ][0-9]{5}\.?"
N_PATTERN_VARIANTS = 3

_PATTERN_RE = None  # compiled lazily to avoid import-order cycles


def pattern_form(ent_index: int, variant: int) -> str:
    """Surface form for pattern entity ``ent_index`` (0..99999)."""
    prefix = PATTERN_PREFIXES[ent_index % len(PATTERN_PREFIXES)]
    num = f"{ent_index:05d}"
    v = variant % N_PATTERN_VARIANTS
    if v == 0:
        return f"{prefix}-{num}"
    if v == 1:
        return f"{prefix} {num}"
    return f"{prefix}-{num}."


def is_pattern_entity(entity_id: str) -> bool:
    global _PATTERN_RE
    if _PATTERN_RE is None:
        import re

        _PATTERN_RE = re.compile(f"^{PATTERN_REGEX}$")
    return bool(_PATTERN_RE.match(entity_id or ""))


def pattern_canonical(entity_id: str) -> str:
    """Canonical (v0) form of any pattern variant."""
    return f"{entity_id[:3]}-{entity_id[4:9]}"


def canonical_for(entity_id: str) -> str | None:
    """Cluster canonical for a known alias or pattern variant; None for
    out-of-vocabulary ids (the embedding stub's knowledge source)."""
    canon = ALIAS_TO_CANONICAL.get(entity_id)
    if canon is not None:
        return canon
    if is_pattern_entity(entity_id):
        return pattern_canonical(entity_id)
    return None


def type_for(entity_id: str) -> str | None:
    etype = ALIAS_TO_TYPE.get(entity_id)
    if etype is not None:
        return etype
    if is_pattern_entity(entity_id):
        return PATTERN_TYPES[entity_id[:3]]
    return None


RELATIONSHIP_TYPES: list[str] = [
    "WORKS_AT",
    "PARTNERS_WITH",
    "LOCATED_IN",
    "MAKES",
    "MANAGES",
    "申请",
    "管理",
]

# Derived lookups -----------------------------------------------------------

ALIAS_TO_CANONICAL: dict[str, str] = {}
ALIAS_TO_TYPE: dict[str, str] = {}
for _canon, _aliases, _etype in ENTITY_CLUSTERS:
    for _a in _aliases:
        ALIAS_TO_CANONICAL[_a] = _canon
        ALIAS_TO_TYPE[_a] = _etype

# Longest-first so "Sony Inc" wins over "Sony" during scanning.
ALL_ALIASES: list[str] = sorted(ALIAS_TO_CANONICAL, key=len, reverse=True)

FILLER_SENTENCES: list[str] = [
    "让我查一下相关资料。",
    "Sure, let me check that for you.",
    "这个问题比较复杂，需要进一步分析。",
    "That is an interesting question.",
    "根据现有记录可以确认这一点。",
    "I will summarize the findings below.",
    "请稍等，正在处理。",
    "Here is what I found so far.",
]
