"""Answer-validation rule core — the deep-research AnswerValidator and
query-complexity heuristic (/root/reference/search/tool/reasoning/
validator.py), transcribed as pure functions shared by the batched
operator (operators/validator.py), pytest and the SQL oracle.
"""

from __future__ import annotations

#: validator.py:16-23 — canned failure phrases that mark an answer bad
ERROR_PATTERNS = (
    "抱歉，处理您的问题时遇到了错误",
    "技术原因:",
    "无法获取",
    "无法回答这个问题",
    "没有找到相关信息",
    "对不起，我不能",
)

#: validator.py:40 — minimum answer length
MIN_ANSWER_LENGTH = 50

#: validator.py:126-130 — complexity indicator keywords
COMPLEXITY_INDICATORS = (
    "为什么", "如何", "机制", "原因", "关系", "比较", "区别",
    "影响", "分析", "评估", "预测", "如果", "假设", "还是",
    "多少", "怎样", "多大", "是否", "哪些", "优缺点",
)


def keyword_relevance(
    answer: str, high_level: list[str], low_level: list[str]
) -> bool:
    """_check_keyword_relevance's rule (validator.py:58-97): at least
    one high-level keyword present (case-insensitive), and — when
    there are ≥2 low-level keywords — at least half of them present.
    Empty keyword sets pass their rung."""
    low_answer = answer.lower()
    if high_level and not any(kw.lower() in low_answer for kw in high_level):
        return False
    if low_level and len(low_level) > 1:
        matches = sum(1 for kw in low_level if kw.lower() in low_answer)
        if matches < len(low_level) / 2:
            return False
    return True


def validate_answer(
    query: str,
    answer: str,
    high_level: list[str] | None = None,
    low_level: list[str] | None = None,
) -> dict[str, bool]:
    """AnswerValidator.validate (validator.py:25-56): length ≥ 50,
    no error patterns, keyword relevance; passed = all three.
    ``query`` is unused by the rules themselves (the reference derives
    keywords from it via the extractor the caller wired in; here the
    extracted keyword lists come in directly)."""
    results = {
        "length": len(answer) >= MIN_ANSWER_LENGTH,
        "no_error_patterns": not any(p in answer for p in ERROR_PATTERNS),
        "keyword_relevance": keyword_relevance(
            answer, high_level or [], low_level or []
        ),
    }
    results["passed"] = all(results.values())
    return results


def complexity_estimate(query) -> float:
    """validator.py:99-148: 0.3×length-factor + 0.3×question-mark
    factor + 0.4×indicator factor, clamped to [0, 1]; None/empty → 0."""
    if query is None:
        return 0.0
    if not isinstance(query, str):
        query = str(query)
    if not query.strip():
        return 0.0
    length_factor = min(1.0, len(query) / 100)
    question_marks = query.count("?") + query.count("？")
    question_factor = min(1.0, question_marks * 0.2)
    indicator_count = sum(
        1 for indicator in COMPLEXITY_INDICATORS if indicator in query
    )
    indicator_factor = min(1.0, indicator_count * 0.15)
    complexity = (
        length_factor * 0.3 + question_factor * 0.3 + indicator_factor * 0.4
    )
    return min(1.0, max(0.0, complexity))
