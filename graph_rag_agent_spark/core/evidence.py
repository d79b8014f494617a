"""Evidence-chain rule core — the deterministic data operations inside
the reference's deep-research EvidenceChainTracker
(/root/reference/search/tool/reasoning/evidence.py), transcribed as
pure functions so the Spark operators (operators/evidence.py), the
pytest oracle and the driver SQL oracle all share one spec.

Transcribed semantics (reference file:line):
  - evidence ids: md5(f"{source_id}:{content[:50]}")[:10]  (:104)
  - key-phrase extraction: sentence split on [.!?。！？], the number
    regex, the English noun-phrase regex, AND the 4-char sliding
    window over any sentence longer than 3 chars (:185-227) — the
    window applies to every script, not only Chinese, exactly as the
    reference wrote it;
  - numeric claims with ±20-char context (:297-338) — including the
    ``replace(',', '.')`` quirk that reads "1,234" as 1.234;
  - context similarity: Jaccard over lowercased whitespace-split word
    sets (:340-362);
  - numeric contradiction: pairwise over the evidence list order,
    claim cross product per pair, context Jaccard > 0.7 AND relative
    difference > 0.001 (:245-271);
  - the LLM semantic rung (:273-288) is a pluggable judge slot — the
    reference skips it when ``self.llm`` is falsy, and these cores
    take ``semantic_judge=None`` with the same meaning;
  - citations: key statements (sentence-split keeping terminators,
    length > 10, :444-473), candidate lookup through the phrase index
    with frequency × confidence scoring (:475-515), marks substituted
    longest-statement-first while the listing numbers by original
    order (:517-548 — the reference's mark/listing numbering mismatch
    is preserved verbatim).

Documented deterministic pins (the reference iterates Python sets /
dict insertion order — nondeterministic across processes):
  - extract_key_phrases returns a SORTED unique list (:227 is
    ``list(set(...))``);
  - find_matching_evidence breaks score ties by evidence_id ASC
    (:512 ``max(dict, key=...)`` takes set-iteration-order first).
"""

from __future__ import annotations

import hashlib
import re

#: evidence.py:204,310 — value with optional decimal and unit suffix
NUMBER_RE = re.compile(r"\d+(?:[.,]\d+)?(?:\s*%|\s*元|\s*美元|\s*人民币)?")
#: evidence.py:310 — the claim variant captures the whole value
NUMBER_CAPTURE_RE = re.compile(r"(\d+(?:[.,]\d+)?(?:\s*%|\s*元|\s*美元|\s*人民币)?)")
#: evidence.py:207 — simplified English noun phrase
NOUN_PHRASE_RE = re.compile(r"[A-Z][a-z]+\s+(?:[a-z]+\s+){0,2}[a-z]+")
#: evidence.py:198,457 — CJK + ASCII sentence terminators
SENTENCE_SPLIT_RE = re.compile(r"[.!?。！？]")
STATEMENT_SPLIT_RE = re.compile(r"([.!?。！？]\s*)")

#: evidence.py:261 — context Jaccard gate for numeric contradictions
CONTEXT_SIMILARITY_GATE = 0.7
#: evidence.py:263 — relative difference gate
RELATIVE_DIFF_GATE = 0.001
#: evidence.py:328 — context chars kept on each side of a claim
CONTEXT_WINDOW = 20


def evidence_id(source_id: str, content: str) -> str:
    """md5(source_id:content[:50])[:10] (evidence.py:104)."""
    return hashlib.md5(
        f"{source_id}:{content[:50]}".encode()
    ).hexdigest()[:10]


def extract_key_phrases(content: str) -> list[str]:
    """evidence.py:185-227 with the sorted-unique pin (the reference
    returns ``list(set(...))``)."""
    key_phrases: list[str] = []
    for sentence in SENTENCE_SPLIT_RE.split(content):
        key_phrases.extend(NUMBER_RE.findall(sentence))
        key_phrases.extend(NOUN_PHRASE_RE.findall(sentence))
        if len(sentence) > 3:
            # sliding 4-char window — applied to EVERY sentence longer
            # than 3 chars, any script (:219-224)
            for i in range(len(sentence) - 3):
                phrase = sentence[i : i + 4]
                if len(phrase.strip()) >= 2:
                    key_phrases.append(phrase.strip())
    return sorted({p for p in key_phrases if len(p) > 1})


def extract_numbers_with_context(text: str) -> list[dict]:
    """evidence.py:297-338: every regex match becomes a claim with the
    float value (comma read as decimal point — the reference quirk)
    and a ±20-char context window."""
    results: list[dict] = []
    for match in NUMBER_CAPTURE_RE.finditer(text):
        value_str = match.group(1)
        clean_value = re.sub(r"[^\d.,]", "", value_str).replace(",", ".")
        try:
            value = float(clean_value)
        except ValueError:
            continue
        start = max(0, match.start() - CONTEXT_WINDOW)
        end = min(len(text), match.end() + CONTEXT_WINDOW)
        results.append(
            {"value": value, "original": value_str, "context": text[start:end]}
        )
    return results


def context_similarity(context1: str, context2: str) -> float:
    """Jaccard over lowercased whitespace-split word sets
    (evidence.py:340-362)."""
    words1 = set(context1.lower().split())
    words2 = set(context2.lower().split())
    if not words1 or not words2:
        return 0.0
    union = len(words1 | words2)
    return len(words1 & words2) / union if union > 0 else 0.0


def numeric_contradictions(
    evidences: list[tuple[str, str]],
    similarity_gate: float = CONTEXT_SIMILARITY_GATE,
    diff_gate: float = RELATIVE_DIFF_GATE,
) -> list[dict]:
    """detect_contradictions' numeric rung (evidence.py:239-271):
    pairwise in LIST ORDER (i < j), claim cross product per pair,
    emit one contradiction per claim pair whose contexts are similar
    (Jaccard > gate) but values differ by more than ``diff_gate``
    relative. ``evidences`` is [(evidence_id, content), ...]."""
    if len(evidences) < 2:
        return []
    claims = [
        (eid, extract_numbers_with_context(content))
        for eid, content in evidences
    ]
    out: list[dict] = []
    for i in range(len(claims)):
        for j in range(i + 1, len(claims)):
            eid1, nums1 = claims[i]
            eid2, nums2 = claims[j]
            for n1 in nums1:
                for n2 in nums2:
                    if (
                        context_similarity(n1["context"], n2["context"])
                        > similarity_gate
                        and abs(n1["value"] - n2["value"])
                        > diff_gate * max(n1["value"], n2["value"])
                    ):
                        out.append(
                            {
                                "type": "numerical",
                                "evidence1": eid1,
                                "evidence2": eid2,
                                "context": n1["context"],
                                "value1": n1["value"],
                                "value2": n2["value"],
                            }
                        )
    return out


def semantic_contradictions(
    evidences: list[tuple[str, str]],
    numeric: list[dict],
    semantic_judge=None,
) -> list[dict]:
    """detect_contradictions' second rung (evidence.py:273-288): every
    pair NOT already numerically contradicted goes to the judge.
    ``semantic_judge(content1, content2) -> str | None`` is the LLM
    slot (prod drops a model client in; ``None`` skips the rung, the
    reference's ``if self.llm`` gate)."""
    if semantic_judge is None or len(evidences) < 2:
        return []
    numeric_pairs = {(c["evidence1"], c["evidence2"]) for c in numeric}
    out: list[dict] = []
    for i in range(len(evidences)):
        for j in range(i + 1, len(evidences)):
            eid1, c1 = evidences[i]
            eid2, c2 = evidences[j]
            if (eid1, eid2) in numeric_pairs:
                continue
            analysis = semantic_judge(c1, c2)
            if analysis is None:
                continue
            # evidence.py:398-400 — strip the label, cap at 300 chars
            point = analysis.replace("矛盾点：", "").strip()
            if len(point) > 300:
                point = point[:300] + "..."
            out.append(
                {
                    "type": "semantic",
                    "evidence1": eid1,
                    "evidence2": eid2,
                    "analysis": point,
                }
            )
    return out


def build_citation_index(
    evidences: list[tuple[str, str]]
) -> dict[str, list[str]]:
    """_update_citation_index over a batch (evidence.py:166-183):
    phrase → evidence_id list, ids appended once per phrase in input
    order."""
    index: dict[str, list[str]] = {}
    for eid, content in evidences:
        for phrase in extract_key_phrases(content):
            bucket = index.setdefault(phrase, [])
            if eid not in bucket:
                bucket.append(eid)
    return index


def key_statements(text: str) -> list[str]:
    """_extract_key_statements (evidence.py:444-473): split keeping
    terminators, re-merge, keep statements longer than 10 chars."""
    sentences = STATEMENT_SPLIT_RE.split(text)
    merged: list[str] = []
    i = 0
    while i < len(sentences):
        if i + 1 < len(sentences):
            merged.append(sentences[i] + sentences[i + 1])
            i += 2
        else:
            merged.append(sentences[i])
            i += 1
    return [s.strip() for s in merged if len(s.strip()) > 10]


def find_matching_evidence(
    statement: str,
    citation_index: dict[str, list[str]],
    confidences: dict[str, float],
) -> str | None:
    """_find_matching_evidence (evidence.py:475-515): candidates from
    the phrase index, scored (phrase-hit count × confidence, default
    0.5), winner by score with the evidence_id-ASC tie pin."""
    candidate_ids: list[str] = []
    for phrase in extract_key_phrases(statement):
        candidate_ids.extend(citation_index.get(phrase, []))
    if not candidate_ids:
        return None
    scores = {
        eid: candidate_ids.count(eid) * confidences.get(eid, 0.5)
        for eid in set(candidate_ids)
    }
    return min(scores, key=lambda eid: (-scores[eid], eid))


def generate_citations(
    answer: str,
    citation_index: dict[str, list[str]],
    evidence_sources: dict[str, str],
    confidences: dict[str, float],
) -> dict:
    """generate_citations (evidence.py:409-442):
    ``evidence_sources`` maps evidence_id → source_id. Returns
    {"cited_answer": ..., "citations": [...]} with the reference's
    numbering behavior preserved (marks assigned longest-statement-
    first, listing numbered by original statement order)."""
    citations = []
    for statement in key_statements(answer):
        eid = find_matching_evidence(statement, citation_index, confidences)
        if eid is not None and eid in evidence_sources:
            citations.append(
                {
                    "statement": statement,
                    "evidence_id": eid,
                    "source_id": evidence_sources[eid],
                    "confidence": confidences.get(eid, 0.5),
                }
            )
    return {
        "cited_answer": add_citations_to_answer(answer, citations),
        "citations": citations,
    }


def add_citations_to_answer(answer: str, citations: list[dict]) -> str:
    """_add_citations_to_answer (evidence.py:517-548) verbatim: marks
    substituted longest-statement-first and numbered in THAT order;
    the appended listing re-numbers by original citation order — the
    reference's mismatch, preserved."""
    cited_answer = answer
    sorted_citations = sorted(
        citations, key=lambda c: len(c["statement"]), reverse=True
    )
    for i, citation in enumerate(sorted_citations):
        statement = citation["statement"]
        if statement in cited_answer:
            cited_answer = cited_answer.replace(
                statement, f"{statement}[{i + 1}]"
            )
    if citations:
        cited_answer += "\n\n#### 引用\n"
        for i, citation in enumerate(citations):
            cited_answer += f"[{i + 1}] {citation['source_id']}\n"
    return cited_answer
