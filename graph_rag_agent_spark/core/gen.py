"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Every field is a pure function of (conv_id, turn_idx) via sha1-based
hashing — no RNG state — so the distributed Spark generator
(spark.range → pandas UDF) and the pure-Python oracle produce
identical rows without any coordination.

Shape: K conversations; turn counts heavy-tailed; conversation 0 is a
"mega-conversation" holding ~10% of all turns (skew fixture for the
salting/adaptive-repartition path of the north rule).
"""

from __future__ import annotations

import datetime as _dt

from .hashing import stable_int
from .vocab import (
    ALIAS_TO_CANONICAL,
    ALL_ALIASES,
    FILLER_SENTENCES,
    pattern_form,
)

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

_ROLES = ("user", "assistant")
_TOOLS = ("search", "calculator", "retrieval", "sql")

_TEMPLATES = [
    "{a} works closely with {b} these days.",
    "我们认为{a}与{b}有合作关系。",
    "{a} announced a partnership with {b}。",
    "据报道，{a}正在管理{b}的相关事务。",
    "{a} is based in {b} according to the filing.",
    "{a}申请了{b}。",
]


def conv_id_for(conv_index: int) -> str:
    return f"conv-{conv_index:06d}"


def turns_in_conversation(conv_index: int, n_convs: int, mega_factor: float = 0.1) -> int:
    """Heavy-tailed turn count; conversation 0 gets ~mega_factor of the
    total turn mass."""
    base = 4 + stable_int("turns", conv_index) % 14  # 4..17
    if conv_index == 0 and n_convs > 1:
        avg = 4 + 13 / 2
        return max(base, int(avg * (n_convs - 1) * mega_factor / (1 - mega_factor)))
    return base


def _pick_alias(h: int) -> str:
    return ALL_ALIASES[h % len(ALL_ALIASES)]


def pattern_id_space(n_convs: int) -> int:
    """Pattern-entity id space ∝ corpus size (capped by the 5-digit
    grammar) — the catalog grows with data, so bench-scale corpora
    exercise the distributed LSH→CC→judge chain instead of the
    driver fast path."""
    return max(16, min(100_000, n_convs))


def turn_row(conv_index: int, turn_idx: int, n_convs: int = 0) -> dict:
    """One transcript row; pure function of (conv_index, turn_idx,
    n_convs). ``n_convs`` sizes the pattern-entity id space (0 keeps
    the legacy vocabulary-only corpus)."""
    conv_id = conv_id_for(conv_index)
    h = stable_int(conv_id, turn_idx)
    role = _ROLES[turn_idx % 2]
    tool = None
    if turn_idx % 7 == 3:
        role = "tool"
        tool = _TOOLS[h % len(_TOOLS)]

    id_space = pattern_id_space(n_convs) if n_convs else 0
    sentences: list[str] = []
    n_sentences = 1 + h % 3
    for s in range(n_sentences):
        hs = stable_int(conv_id, turn_idx, s)
        branch = hs % 5
        if branch < 2:  # 40%: filler, no entities
            sentences.append(FILLER_SENTENCES[hs % len(FILLER_SENTENCES)])
        elif branch == 4 and id_space:  # 20%: pattern-entity pair
            ent_a = hs % id_space
            ent_b = (ent_a + 1 + (hs >> 17) % (id_space - 1)) % id_space
            a = pattern_form(ent_a, (hs >> 7) % 3)
            b = pattern_form(ent_b, (hs >> 11) % 3)
            template = _TEMPLATES[hs % len(_TEMPLATES)]
            sentences.append(template.format(a=a, b=b))
        else:  # vocabulary mention sentence with two entities
            a = _pick_alias(hs)
            b = _pick_alias(hs >> 13)
            if ALIAS_TO_CANONICAL[a] == ALIAS_TO_CANONICAL[b]:
                b = _pick_alias((hs >> 13) + 1)
            template = _TEMPLATES[hs % len(_TEMPLATES)]
            sentences.append(template.format(a=a, b=b))
    text = " ".join(sentences)

    ts = _EPOCH + _dt.timedelta(seconds=conv_index * 3600 + turn_idx * 30)
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
    }


def generate_conversation(conv_index: int, n_convs: int) -> list[dict]:
    return [
        turn_row(conv_index, t, n_convs)
        for t in range(turns_in_conversation(conv_index, n_convs))
    ]


def generate_transcripts(n_convs: int) -> list[dict]:
    """Full corpus, driver-side (tests / oracle only — the Spark path
    generates the same rows distributed, see sources/transcripts.py)."""
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(generate_conversation(c, n_convs))
    return rows
