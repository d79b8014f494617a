"""Text-analysis column functions (training-pipeline extensions).

All JVM-side pyspark.sql.functions expressions — no UDFs — so they
run inside whole-stage codegen and push down through Catalyst.
Each has a matching ANSI-SQL formulation used in __spark_entry__
oracle pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def char_count(col: str | Column) -> Column:
    return F.length(col)


def punct_count(col: str | Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^\.,;:!\?]", ""))


def cjk_count(col: str | Column) -> Column:
    return F.length(F.regexp_replace(col, "[^一-鿿]", ""))


def lang_id(col: str | Column) -> Column:
    """'zh' when >1/3 of chars are CJK, else 'en' — the n-gram-free
    heuristic tier; a real model slots into the same column."""
    return F.when(cjk_count(col) * 3 > char_count(col), F.lit("zh")).otherwise(
        F.lit("en")
    )


def stopword_ratio_x1000(col: str | Column) -> Column:
    """Per-mille of token OCCURRENCES that are English stopwords,
    floored to an integer so cross-engine value hashes are exact."""
    stop = ["the", "a", "an", "of", "and", "or", "to", "in", "is", "are"]
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(stop)))
    return F.floor((n_stop * 1000) / F.greatest(F.size(toks), F.lit(1))).cast(
        "long"
    )


def quality_score_x100(col: str | Column) -> Column:
    """Integer 0-100 heuristic quality score: length band + punct
    presence + not-all-caps + word band. Integer arithmetic only."""
    c = F.col(col) if isinstance(col, str) else col
    length_pts = F.least(F.floor(char_count(c) / 10), F.lit(40)).cast("int")
    punct_pts = F.when(punct_count(c) > 0, 20).otherwise(0)
    case_pts = F.when(F.upper(c) != c, 20).otherwise(0)
    word_pts = F.least(F.floor(token_count(c) / 5), F.lit(20)).cast("int")
    return (length_pts + punct_pts + case_pts + word_pts).cast("int")


def doc_fingerprint(col: str | Column) -> Column:
    """md5 of whitespace-normalized lowercase text."""
    return F.md5(
        F.regexp_replace(F.lower(col), r"\s+", " ").cast("binary")
    )
