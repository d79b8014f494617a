"""Batched answer validation + query-complexity scoring — the
deep-research AnswerValidator (reference search/tool/reasoning/
validator.py) over TABLES of (query, answer, keywords) rows, entirely
JVM-side: length/contains ladders and array-lambda keyword rules, no
Python in the row path. The reference validates one answer per agent
turn; the engine analogue scores a whole evaluation corpus in one
plan (the shape the evaluator pipeline consumes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.validator import (
    COMPLEXITY_INDICATORS,
    ERROR_PATTERNS,
    MIN_ANSWER_LENGTH,
)


def validate_answers(
    df: DataFrame,
    answer_col: str = "answer",
    high_col: str | None = "high_level",
    low_col: str | None = "low_level",
) -> DataFrame:
    """AnswerValidator.validate batched (validator.py:25-97): adds
    ``length_ok``, ``no_error_patterns``, ``keyword_relevance`` and
    ``passed``. ``high_col``/``low_col`` are array<string> keyword
    columns (pass None to skip the relevance rung — the reference's
    no-extractor default of True)."""
    answer = F.col(answer_col)
    low_answer = F.lower(answer)
    length_ok = F.length(answer) >= MIN_ANSWER_LENGTH
    no_errors = ~(
        F.array_contains(
            F.array(
                *[answer.contains(p) for p in ERROR_PATTERNS]
            ),
            True,
        )
    )
    if high_col is None and low_col is None:
        relevance = F.lit(True)
    else:
        hi = (
            F.coalesce(F.col(high_col), F.array().cast("array<string>"))
            if high_col
            else F.array().cast("array<string>")
        )
        lo = (
            F.coalesce(F.col(low_col), F.array().cast("array<string>"))
            if low_col
            else F.array().cast("array<string>")
        )
        hi_ok = (F.size(hi) == 0) | F.exists(
            hi, lambda kw: low_answer.contains(F.lower(kw))
        )
        lo_matches = F.size(
            F.filter(lo, lambda kw: low_answer.contains(F.lower(kw)))
        )
        lo_ok = (F.size(lo) <= 1) | (
            lo_matches >= F.size(lo) / F.lit(2.0)
        )
        relevance = hi_ok & lo_ok
    return (
        df.withColumn("length_ok", length_ok)
        .withColumn("no_error_patterns", no_errors)
        .withColumn("keyword_relevance", relevance)
        .withColumn(
            "passed",
            F.col("length_ok")
            & F.col("no_error_patterns")
            & F.col("keyword_relevance"),
        )
    )


def _count_occurrences(col, needle: str):
    """Occurrences of a literal in a string column — the JVM replay of
    Python str.count for single-char needles."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / len(needle)


def with_query_complexity(
    df: DataFrame, query_col: str = "query", out_col: str = "complexity"
) -> DataFrame:
    """complexity_estimate batched (validator.py:99-148): 0.3×length
    factor + 0.3×question-mark factor + 0.4×indicator factor, clamped;
    NULL/blank queries score 0."""
    q = F.col(query_col)
    length_factor = F.least(F.lit(1.0), F.length(q) / F.lit(100.0))
    marks = _count_occurrences(q, "?") + _count_occurrences(q, "？")
    question_factor = F.least(F.lit(1.0), marks * 0.2)
    indicator_count = sum(
        (
            F.when(q.contains(ind), 1).otherwise(0)
            for ind in COMPLEXITY_INDICATORS
        ),
        F.lit(0),
    )
    indicator_factor = F.least(F.lit(1.0), indicator_count * 0.15)
    complexity = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            length_factor * 0.3 + question_factor * 0.3
            + indicator_factor * 0.4,
        ),
    )
    # blank test via (?U)\s removal: str.strip() treats Unicode
    # whitespace (tab/newline/U+3000) as blank; Spark trim only 0x20
    blank = F.regexp_replace(q, r"(?U)\s", "") == ""
    return df.withColumn(
        out_col,
        F.when(q.isNull() | blank, F.lit(0.0)).otherwise(complexity),
    )
