"""Deterministic entity/relation extractor stub.

Stands in for the reference's LLM extraction chain
(/root/reference/graph/extraction/entity_extractor.py:334-369, prompt
config/prompt.py:1-101). Emits EXACTLY the reference record grammar
(see core/records.py) so the downstream parser is exercised on real
input. In production the same mapInPandas slot holds a batched model
client; tests/CI always pin this stub (SURVEY.md §4 "LLM-boundary
determinism").

Recognition rule: scan the chunk text for vocabulary aliases
(longest-first so "Sony Inc" beats "Sony"), in first-occurrence order;
non-overlapping matches. Entities keep their SURFACE form as id —
alias resolution is the linking stage's job, exactly as with a real
LLM. Relationships connect consecutive distinct mentions; rel type and
weight are hash-derived from the endpoint pair, so the same pair in a
different chunk yields the same relationship (stable for P/R sets).
"""

from __future__ import annotations

import re

from .hashing import stable_int, stable_u64
from .records import (
    BATCH_SEPARATOR,
    format_entity_record,
    format_relationship_record,
)
from .vocab import ALL_ALIASES, PATTERN_REGEX, RELATIONSHIP_TYPES, type_for

# Vocabulary aliases (longest-first) plus the scaling pattern-entity
# grammar (vocab.PATTERN_REGEX). Leftmost match wins; at equal start
# positions the earlier alternative wins, and the pattern's optional
# trailing dot is greedy so "EMP-00123." is one mention.
_ALIAS_RE = re.compile(
    "|".join([re.escape(a) for a in ALL_ALIASES] + [PATTERN_REGEX])
)


def extract_mentions(text: str) -> list[str]:
    """Non-overlapping vocabulary matches in occurrence order."""
    if not text:
        return []
    return _ALIAS_RE.findall(text)


def stub_extract(chunk_text: str) -> str:
    """Chunk text → extractor result string in the record grammar."""
    mentions = extract_mentions(chunk_text)
    if not mentions:
        return ""

    records: list[str] = []
    seen: set[str] = set()
    ordered: list[str] = []
    for m in mentions:
        if m not in seen:
            seen.add(m)
            ordered.append(m)
            etype = type_for(m)
            records.append(format_entity_record(m, etype, f"{m} is a {etype}"))

    for a, b in zip(ordered, ordered[1:]):
        # md5-based (stable_u64) so the DuckDB oracle can recompute the
        # rel type/weight with md5_number_lower — see __spark_entry__
        h = stable_u64("rel", a, b)
        rel_type = RELATIONSHIP_TYPES[h % len(RELATIONSHIP_TYPES)]
        weight = (h >> 8) % 20 / 2 + 1.0  # 1.0 .. 10.5 in 0.5 steps
        records.append(
            format_relationship_record(a, b, rel_type, f"{a} {rel_type} {b}", weight)
        )

    return "\n".join(records) + "\n\n"  # completion delimiter


def stub_extract_batch(batch_text: str) -> str:
    """Batch-mode extractor stub: the reference joins ≤5 chunk texts
    with BATCH_SEPARATOR into ONE LLM call and splits the response on
    the same separator (entity_extractor.py:220-332). This stub
    simulates a mostly-well-behaved model — per-section results joined
    back with the separator — but deterministically drops a section
    for ~1/7 of batches, reproducing the "result count mismatch →
    fall back to per-chunk calls" path (:286-300)."""
    parts = batch_text.split(BATCH_SEPARATOR)
    results = [stub_extract(p) for p in parts]
    if len(parts) > 1 and stable_int("batchfail", batch_text) % 7 == 0:
        results = results[:-1]  # simulated miscounted response
    return BATCH_SEPARATOR.join(results)
