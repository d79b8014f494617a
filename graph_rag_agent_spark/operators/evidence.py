"""Evidence-chain operators — the deep-research tracker's data
operations (reference search/tool/reasoning/evidence.py) as batched
table programs: numeric-claim extraction, cross-evidence contradiction
pairs, the key-phrase citation index, statement→evidence citation
matching, and the per-query reasoning-chain aggregates.

The reference runs these inside one in-memory tracker per query; here
a TABLE of evidence rows (query/group id, evidence_id, source_id,
content, confidence) is processed for every query at once:

  - claim extraction is an Arrow-batched pandas UDF over the shared
    rule core (core/evidence.py), exploded into a claims table;
  - contradiction detection is a pair JOIN within each evidence group
    — the quadratic pair volume is bounded per group (an evidence
    group is one query's retrieved evidence, tens of rows by
    construction, reference evidence.py:239-247), so the shuffle key
    is the group id and no group can explode the stage;
  - the context-similarity gate (Jaccard > 0.7) and the numeric-diff
    gate run entirely JVM-side (split / array_intersect /
    array_union) — no Python in the pair loop;
  - the citation index is (phrase, evidence_id) rows — the phrase
    equi-join replaces the reference's in-memory dict, so matching
    statements against a corpus-scale evidence store is a distributed
    join, not a driver lookup (hot phrases are naturally spread by
    the join's hash partitioning; pathological stop-phrase skew can
    be salted, but phrase buckets here are bounded by the evidence
    group contract);
  - per-answer citation assembly (string substitution + the listing)
    is applyInPandas over the matched rows, running the verbatim core
    assembly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.evidence import (
    CONTEXT_SIMILARITY_GATE,
    RELATIVE_DIFF_GATE,
    add_citations_to_answer,
    extract_key_phrases,
    extract_numbers_with_context,
    key_statements,
    numeric_contradictions,
    semantic_contradictions,
)

_CLAIMS_TYPE = "array<struct<value:double,original:string,context:string>>"


@F.pandas_udf(_CLAIMS_TYPE)
def _claims_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for contents in it:
        yield pd.Series(
            [extract_numbers_with_context(c or "") for c in contents]
        )


@F.pandas_udf("array<string>")
def _phrases_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for texts in it:
        yield pd.Series([extract_key_phrases(t or "") for t in texts])


@F.pandas_udf("array<string>")
def _statements_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for texts in it:
        yield pd.Series([key_statements(t or "") for t in texts])


def with_evidence_ids(
    df: DataFrame,
    source_col: str = "source_id",
    content_col: str = "content",
    out_col: str = "evidence_id",
) -> DataFrame:
    """md5(source_id:content[:50])[:10] (evidence.py:104) as a pure
    JVM expression — bit-identical hex to the reference and to the
    DuckDB oracle's md5()."""
    return df.withColumn(
        out_col,
        F.substring(
            F.md5(
                F.encode(
                    F.concat(
                        F.col(source_col),
                        F.lit(":"),
                        F.substring(F.col(content_col), 1, 50),
                    ),
                    "utf-8",
                )
            ),
            1,
            10,
        ),
    )


def evidence_claims(
    evidence: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Numeric claims (evidence.py:297-338) exploded one row per
    claim: every input column except the content, plus (claim_idx,
    value, original, context). Evidence rows with no claims drop
    out (they cannot contradict anything)."""
    keep = [c for c in evidence.columns if c != content_col]
    return (
        evidence.withColumn("__claims", _claims_udf(F.col(content_col)))
        .select(*keep, F.posexplode("__claims").alias("claim_idx", "__c"))
        .select(
            *keep,
            "claim_idx",
            F.col("__c.value").alias("value"),
            F.col("__c.original").alias("original"),
            F.col("__c.context").alias("context"),
        )
    )


def _word_set(col: str):
    """Lowercased whitespace-split word SET (evidence.py:352-353) —
    Python str.split() semantics: any whitespace run splits, no empty
    tokens. (?U) turns on Java's UNICODE_CHARACTER_CLASS so \\s
    matches the same Unicode whitespace (U+3000 ideographic space,
    NBSP, …) Python's split sees — without it the JVM gate and the
    rule core disagree on CJK text."""
    return F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(col)), r"(?U)\s+"), lambda x: x != ""
        )
    )


def evidence_contradictions(
    evidence: DataFrame,
    group_col: str = "query_id",
    id_col: str = "evidence_id",
    content_col: str = "content",
    order_col: str | None = None,
    similarity_gate: float = CONTEXT_SIMILARITY_GATE,
    diff_gate: float = RELATIVE_DIFF_GATE,
    semantic_judge=None,
) -> DataFrame:
    """detect_contradictions (evidence.py:229-295) over every evidence
    group at once → (group, type, evidence1, evidence2, context,
    value1, value2, analysis).

    The reference iterates pairs in evidence-LIST order; the table
    analogue orders by ``order_col`` (default: the evidence id) and
    keeps pairs with ord1 < ord2, so each unordered pair is examined
    exactly once with a deterministic orientation. The numeric rung
    is a within-group claims self-join with JVM Jaccard + diff gates;
    the optional ``semantic_judge`` rung (the reference's LLM slot,
    skipped when None exactly like its ``if self.llm`` gate) runs
    per-group through the rule core."""
    ord_col = order_col or id_col
    cols = [group_col, id_col, content_col]
    if ord_col not in cols:
        cols.append(ord_col)
    base = evidence.select(*dict.fromkeys(cols))
    # materialize the claims ONCE: both sides of the pair self-join
    # reference them, and diverging before the exchange would re-run
    # the extraction UDF per branch (alias-divergent subtrees defeat
    # exchange reuse)
    claims = (
        evidence_claims(base, content_col=content_col)
        .withColumn("__words", _word_set("context"))
        .localCheckpoint()
    )
    left = claims.select(
        F.col(group_col),
        F.col(id_col).alias("evidence1"),
        F.col(ord_col).alias("__o1"),
        F.col("value").alias("value1"),
        F.col("context").alias("context"),
        F.col("__words").alias("__w1"),
    )
    right = claims.select(
        F.col(group_col),
        F.col(id_col).alias("evidence2"),
        F.col(ord_col).alias("__o2"),
        F.col("value").alias("value2"),
        F.col("__words").alias("__w2"),
    )
    inter = F.size(F.array_intersect("__w1", "__w2"))
    union = F.size(F.array_union("__w1", "__w2"))
    jaccard = (
        F.when((F.size("__w1") == 0) | (F.size("__w2") == 0), F.lit(0.0))
        .otherwise(inter / union)
    )
    numeric = (
        left.join(right, group_col)
        .where(F.col("__o1") < F.col("__o2"))
        .where(jaccard > similarity_gate)
        .where(
            F.abs(F.col("value1") - F.col("value2"))
            > diff_gate * F.greatest("value1", "value2")
        )
        .select(
            group_col,
            F.lit("numerical").alias("type"),
            "evidence1",
            "evidence2",
            "context",
            "value1",
            "value2",
            F.lit(None).cast("string").alias("analysis"),
        )
    )
    if semantic_judge is None:
        return numeric

    grp_type = evidence.schema[group_col].dataType.simpleString()
    schema = (
        f"{group_col} {grp_type}, type string, evidence1 string, "
        "evidence2 string, context string, value1 double, "
        "value2 double, analysis string"
    )

    def _judge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord", kind="mergesort")
        evs = list(zip(pdf["__id"], pdf["__content"]))
        numeric_rows = numeric_contradictions(
            evs, similarity_gate=similarity_gate, diff_gate=diff_gate
        )
        rows = [
            (
                pdf["__grp"].iloc[0],
                "semantic",
                c["evidence1"],
                c["evidence2"],
                None,
                None,
                None,
                c["analysis"],
            )
            for c in semantic_contradictions(evs, numeric_rows, semantic_judge)
        ]
        return pd.DataFrame(
            rows,
            columns=[
                group_col,
                "type",
                "evidence1",
                "evidence2",
                "context",
                "value1",
                "value2",
                "analysis",
            ],
        )

    semantic = (
        base.select(
            F.col(group_col).alias("__grp"),
            F.col(id_col).alias("__id"),
            F.col(content_col).alias("__content"),
            F.col(ord_col).alias("__ord"),
        )
        .groupBy("__grp")
        .applyInPandas(_judge_group, schema=schema)
    )
    return numeric.unionByName(semantic)


def citation_index(
    evidence: DataFrame,
    id_col: str = "evidence_id",
    content_col: str = "content",
) -> DataFrame:
    """_update_citation_index over the whole store (evidence.py:
    166-183) → distinct (phrase, evidence_id) rows. The reference's
    per-phrase id LISTS carry no meaningful order downstream (scores
    are counts), so the set form is exact."""
    return (
        evidence.select(
            F.col(id_col).alias("evidence_id"),
            F.explode(_phrases_udf(F.col(content_col))).alias("phrase"),
        )
        .distinct()
    )


def statement_matches(
    answers: DataFrame,
    evidence: DataFrame,
    answer_id_col: str = "answer_id",
    answer_col: str = "answer",
    id_col: str = "evidence_id",
    source_col: str = "source_id",
    content_col: str = "content",
    confidence_col: str | None = "confidence",
) -> DataFrame:
    """_find_matching_evidence batched (evidence.py:475-515): explode
    answers → key statements → key phrases, equi-join the phrase
    index, score candidates (distinct-phrase hit count × confidence,
    default 0.5), keep the winner per statement with the (score DESC,
    evidence_id ASC) pin → (answer_id, stmt_idx, statement,
    evidence_id, source_id, confidence). Statements with no candidate
    simply don't appear (the reference returns None for them)."""
    stmts = answers.select(
        F.col(answer_id_col).alias("answer_id"),
        F.posexplode(_statements_udf(F.col(answer_col))).alias(
            "stmt_idx", "statement"
        ),
    ).localCheckpoint()
    # the statement TEXT stays out of the phrase join and the score
    # shuffle (it is functionally dependent on (answer_id, stmt_idx)
    # and would ride every candidate row); it re-attaches to the
    # winner rows only
    phrases = stmts.select(
        "answer_id",
        "stmt_idx",
        F.explode(_phrases_udf(F.col("statement"))).alias("phrase"),
    )
    index = citation_index(evidence, id_col=id_col, content_col=content_col)
    conf_expr = (
        F.coalesce(F.col(confidence_col), F.lit(0.5))
        if confidence_col and confidence_col in evidence.columns
        else F.lit(0.5)
    )
    payload = evidence.select(
        F.col(id_col).alias("evidence_id"),
        F.col(source_col).alias("source_id"),
        conf_expr.alias("confidence"),
    )
    hits = (
        phrases.join(index, "phrase")
        .groupBy("answer_id", "stmt_idx", "evidence_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
        .join(payload, "evidence_id")
        .withColumn("__score", F.col("__hits") * F.col("confidence"))
    )
    w = Window.partitionBy("answer_id", "stmt_idx").orderBy(
        F.desc("__score"), F.asc("evidence_id")
    )
    return (
        hits.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .join(stmts, ["answer_id", "stmt_idx"])
        .select(
            "answer_id",
            "stmt_idx",
            "statement",
            "evidence_id",
            "source_id",
            "confidence",
        )
    )


def cited_answers(
    answers: DataFrame,
    matches: DataFrame,
    answer_id_col: str = "answer_id",
    answer_col: str = "answer",
) -> DataFrame:
    """generate_citations' assembly (evidence.py:409-442,517-548) per
    answer: citations ordered by statement position, marks substituted
    longest-first, the listing numbered in original order — the
    verbatim core. → (answer_id, cited_answer, n_citations)."""
    joined = answers.select(
        F.col(answer_id_col).alias("answer_id"), F.col(answer_col).alias("answer")
    ).join(matches, "answer_id", "left")
    id_type = answers.schema[answer_id_col].dataType.simpleString()
    schema = f"answer_id {id_type}, cited_answer string, n_citations int"

    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        answer = pdf["answer"].iloc[0]
        with_stmt = pdf[pdf["stmt_idx"].notna()].sort_values(
            "stmt_idx", kind="mergesort"
        )
        citations = [
            {
                "statement": r.statement,
                "evidence_id": r.evidence_id,
                "source_id": r.source_id,
                "confidence": r.confidence,
            }
            for r in with_stmt.itertuples()
        ]
        return pd.DataFrame(
            [
                (
                    pdf["answer_id"].iloc[0],
                    add_citations_to_answer(answer, citations),
                    len(citations),
                )
            ],
            columns=["answer_id", "cited_answer", "n_citations"],
        )

    return joined.groupBy("answer_id").applyInPandas(_assemble, schema=schema)


def evidence_source_stats(
    evidence: DataFrame,
    group_col: str = "query_id",
    source_type_col: str = "source_type",
) -> DataFrame:
    """get_evidence_source_stats (evidence.py:684-711): per-query
    evidence counts by source type."""
    return evidence.groupBy(group_col, source_type_col).agg(
        F.count(F.lit(1)).alias("n")
    )


def reasoning_summaries(
    steps: DataFrame,
    evidence: DataFrame,
    query_col: str = "query_id",
    step_col: str = "step_id",
    ord_col: str = "step_ord",
    top_k: int = 3,
) -> DataFrame:
    """summarize_reasoning's aggregates (evidence.py:630-682): per
    query, the step count, total evidence count, and the top-3 key
    steps by evidence count (the reference's stable sort keeps chain
    order on ties → pin: evidence count DESC, step ordinal ASC).
    → (query, steps_count, evidence_count, key_steps array<string>)."""
    ev_counts = evidence.groupBy(step_col).agg(
        F.count(F.lit(1)).alias("__n_ev")
    )
    per_step = steps.select(query_col, step_col, ord_col).join(
        ev_counts, step_col, "left"
    ).withColumn("__n_ev", F.coalesce("__n_ev", F.lit(0)))
    w = Window.partitionBy(query_col).orderBy(
        F.desc("__n_ev"), F.asc(ord_col)
    )
    ranked = per_step.withColumn("__rk", F.row_number().over(w))
    return ranked.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("steps_count"),
        F.sum("__n_ev").alias("evidence_count"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__rk") <= top_k,
                    F.struct("__rk", F.col(step_col).alias("step")),
                )
            )
        )["step"].alias("key_steps"),
    )
