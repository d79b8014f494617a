"""Community-aware search enhancement rule core — the deterministic
scoring and extraction rules inside the reference's
CommunityAwareSearchEnhancer (/root/reference/search/tool/reasoning/
community_enhance.py), shared by the batched operators
(operators/community_enhance.py), pytest and the SQL oracle.

Transcribed semantics (file:line):
  - candidate pool: communities with a summary, ORDER BY
    community_rank DESC LIMIT 20 (:85-92);
  - relevance score: 0.6 × cosine(query, summary) + 0.3 ×
    min(kw_score, 5)/5 + 0.1 × min(importance/10, 1), where kw_score
    = 2.0 per high-level + 0.5 per low-level keyword present
    (case-insensitive substring), importance = rank or 1 (:102-143);
  - top-3 by score (:151-153);
  - temporal info: five date regexes, matches concatenated in pattern
    order (:236-252).

Deterministic pins (documented deviations — the reference relies on
Neo4j's unordered LIMIT and Python's stable sort): candidate and
winner ties break community_id ASC; the knowledge extraction's
unordered LIMIT 50/100 ties break entity_id / (source, target) ASC.
"""

from __future__ import annotations

import re

#: community_enhance.py:85-92
CANDIDATE_LIMIT = 20
#: community_enhance.py:151-153
DEFAULT_TOP_K = 3
#: community_enhance.py:186-187 / 208-210
ENTITY_LIMIT = 50
RELATIONSHIP_LIMIT = 100

#: community_enhance.py:239-245 — matched in this order
TEMPORAL_PATTERNS = (
    r"\d{4}年\d{1,2}月\d{1,2}日",
    r"\d{4}-\d{1,2}-\d{1,2}",
    r"\d{4}年\d{1,2}月",
    r"\d{4}-\d{1,2}",
    r"\d{4}年",
)


def keyword_score(
    summary: str, high_level: list[str], low_level: list[str]
) -> float:
    """2.0 per present high-level keyword + 0.5 per present low-level
    keyword, case-insensitive substring (:115-120)."""
    low_summary = summary.lower()
    score = sum(2.0 for kw in high_level if kw.lower() in low_summary)
    score += sum(0.5 for kw in low_level if kw.lower() in low_summary)
    return score


def importance_norm(rank) -> float:
    """rank → min(rank/10, 1) with the reference's exact coercion
    (:123-133): falsy rank (None/0/'') → 1 FIRST, then string parse
    (unparseable → 1.0) — so numeric 0 reads as 1 but string '0'
    parses to 0.0, faithfully."""
    importance = rank or 1
    if isinstance(importance, str):
        try:
            importance = float(importance)
        except ValueError:
            importance = 1.0
    return min(importance / 10.0, 1.0)


def relevance_score(
    similarity: float,
    summary: str,
    high_level: list[str],
    low_level: list[str],
    rank,
) -> float:
    """The combined 0.6/0.3/0.1 formula (:136-139)."""
    kw = keyword_score(summary, high_level, low_level)
    return (
        similarity * 0.6
        + (min(kw, 5.0) / 5.0) * 0.3
        + importance_norm(rank) * 0.1
    )


def parse_search_strategy(
    content: str, keywords: list[str] | None = None
) -> dict:
    """generate_search_strategy's post-LLM parse ladder
    (community_enhance.py:296-330): quoted spans as follow-up queries,
    else sentence-shaped spans (10+ chars between terminators, first
    3); entities from 'label: value' lines (first 5), falling back to
    the caller's extracted ``keywords`` (the jieba slot — import-gated
    in prod, injected here). Returns the reference's strategy dict
    shape."""
    queries = re.findall(r'"([^"]+)"', content)
    if not queries:
        sentences = re.findall(
            r"[？?!！。；;][^？?!！。；;]{5,50}[？?!！。；;]", content
        )
        queries = [s.strip() for s in sentences if len(s.strip()) > 10][:3]
    entities: list[str] = []
    for line in content.split("\n"):
        if ":" in line or "：" in line:
            parts = re.split(r"[：:]", line, maxsplit=1)
            if len(parts) == 2 and len(parts[1].strip()) > 0:
                entities.append(parts[1].strip())
    kw = list(keywords or [])
    return {
        "strategy_type": "jieba_extracted",
        "follow_up_queries": queries[:3] if queries else [],
        "focus_entities": entities[:5] if entities else kw[:5],
        "keywords": kw,
    }


def basic_strategy(entities: list[dict]) -> dict:
    """The <3-entities early return (community_enhance.py:269-275)."""
    return {
        "strategy_type": "basic",
        "follow_up_queries": [],
        "focus_entities": [],
    }


def extract_temporal_info(text: str) -> list[str]:
    """_extract_temporal_info (:236-252): findall per pattern,
    concatenated in pattern order (overlapping patterns re-report —
    e.g. '2024年3月' also yields '2024年' — exactly as the reference)."""
    matches: list[str] = []
    for pattern in TEMPORAL_PATTERNS:
        matches.extend(re.findall(pattern, text))
    return matches
