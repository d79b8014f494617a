"""Thinking-trace / query-decomposition operators — the deep-research
ThinkingEngine's deterministic text rules (reference
search/tool/reasoning/thinking.py, search.py) batched over TABLES of
model-emitted traces. In the reference each trace is parsed one at a
time inside the agent loop; the engine analogue classifies / parses
every trace of a corpus in one job — the shape needed to replay or
audit millions of archived deep-research traces.

JVM-first: tag extraction, status classification, verification-status
normalization and dual-path query construction are pure Spark SQL
expressions (regexp_extract_all / contains / replace) with no Python
in the row path; only the ladders that need ast.literal_eval / json
(sub-query lists, hypothesis JSON) and the per-trace string assembly
(truncated reasoning) drop to Arrow-batched pandas UDFs over the rule
core (core/thinking.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.thinking import (
    BEGIN_SEARCH_QUERY,
    BEGIN_SEARCH_RESULT,
    END_SEARCH_QUERY,
    END_SEARCH_RESULT,
    extract_conclusion,
    parse_followup_queries,
    parse_hypotheses,
    parse_sub_queries,
    truncate_reasoning,
)


def _java_quote(literal: str) -> str:
    """Quote a tag literal for the JVM regex engine (none of the tags
    contain the \\E terminator)."""
    return "\\Q" + literal + "\\E"


#: (?s) because the reference compiles with re.DOTALL
QUERY_TAG_PATTERN = (
    "(?s)"
    + _java_quote(BEGIN_SEARCH_QUERY)
    + "(.*?)"
    + _java_quote(END_SEARCH_QUERY)
)
RESULT_TAG_PATTERN = (
    "(?s)"
    + _java_quote(BEGIN_SEARCH_RESULT)
    + "(.*?)"
    + _java_quote(END_SEARCH_RESULT)
)
THINK_SPAN_PATTERN = "(?s)<think>.*</think>"


def classify_traces(
    df: DataFrame, text_col: str = "raw"
) -> DataFrame:
    """generate_next_query's post-LLM ladder (thinking.py:626-680)
    over a trace table, entirely JVM-side: adds
      - ``status``: 'empty' | 'has_query' | 'answer_ready' | 'no_query'
      - ``content``: the trace with <think> spans stripped (NULL when
        empty — the reference returns content=None for that status)
      - ``queries``: array of tagged search queries, document order.
    """
    stripped = F.regexp_replace(F.col(text_col), THINK_SPAN_PATTERN, "")
    queries = F.regexp_extract_all(
        stripped, F.lit(QUERY_TAG_PATTERN), 1
    )
    df = df.withColumn("__stripped", stripped).withColumn(
        "queries", queries
    )
    is_empty = F.col("__stripped") == ""
    has_answer_marker = F.col("__stripped").contains("**回答**") | F.col(
        "__stripped"
    ).contains("足够的信息")
    return (
        df.withColumn(
            "status",
            F.when(is_empty, F.lit("empty"))
            .when(F.size("queries") > 0, F.lit("has_query"))
            .when(has_answer_marker, F.lit("answer_ready"))
            .otherwise(F.lit("no_query")),
        )
        .withColumn(
            "content",
            F.when(is_empty, F.lit(None).cast("string")).otherwise(
                F.col("__stripped")
            ),
        )
        .withColumn(
            "queries",
            F.when(is_empty, F.array().cast("array<string>")).otherwise(
                F.col("queries")
            ),
        )
        .drop("__stripped")
    )


def sub_query_plans(
    df: DataFrame, text_col: str = "raw", query_col: str = "query"
) -> DataFrame:
    """generate_sub_queries' parse ladder (search.py:218-246) batched:
    adds ``sub_queries`` (array; [original query] on parse failure —
    the reference's fallback) and ``n_sub_queries``. Non-string list
    elements (a trace emitting ``[1, 2]``) are stringified at the
    column boundary — the reference hands them on untyped; an
    array<string> column cannot, and one bad trace must not abort the
    corpus job."""

    @F.pandas_udf("array<string>")
    def parse_udf(
        it: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        for raw, query in it:
            yield pd.Series(
                [
                    [
                        q2 if isinstance(q2, str) else str(q2)
                        for q2 in parse_sub_queries(r or "", q or "")
                    ]
                    for r, q in zip(raw, query)
                ]
            )

    return df.withColumn(
        "sub_queries", parse_udf(F.col(text_col), F.col(query_col))
    ).withColumn("n_sub_queries", F.size("sub_queries"))


def followup_query_plans(
    df: DataFrame, text_col: str = "raw"
) -> DataFrame:
    """generate_followup_queries' parse ladder (search.py:283-345):
    adds ``followup_queries`` (order-preserving dedup; [] on parse
    failure). Non-string elements stringify at the column boundary
    (see sub_query_plans)."""

    @F.pandas_udf("array<string>")
    def parse_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for raw in it:
            yield pd.Series(
                [
                    [
                        q if isinstance(q, str) else str(q)
                        for q in parse_followup_queries(r or "")
                    ]
                    for r in raw
                ]
            )

    return df.withColumn("followup_queries", parse_udf(F.col(text_col)))


def hypothesis_plans(df: DataFrame, text_col: str = "raw") -> DataFrame:
    """generate_hypotheses' parse ladder (thinking.py:66-167): adds
    ``hypotheses`` array<struct<hypothesis,reasoning>> (JSON rung →
    regex fallback → default hypothesis)."""

    @F.pandas_udf("array<struct<hypothesis:string,reasoning:string>>")
    def parse_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for raw in it:
            yield pd.Series(
                [
                    [
                        (
                            str(h.get("hypothesis", "")),
                            str(h.get("reasoning", "")),
                        )
                        for h in parse_hypotheses(r or "")
                        if isinstance(h, dict)
                    ]
                    for r in raw
                ]
            )

    return df.withColumn("hypotheses", parse_udf(F.col(text_col)))


def verification_statuses(
    df: DataFrame, text_col: str = "raw", out_col: str = "status"
) -> DataFrame:
    """_assess_verification_status' normalization (thinking.py:
    240-250), JVM-side: support→supported, reject→rejected, else
    uncertain."""
    low = F.lower(F.trim(F.col(text_col)))
    return df.withColumn(
        out_col,
        F.when(low.contains("support"), F.lit("supported"))
        .when(low.contains("reject"), F.lit("rejected"))
        .otherwise(F.lit("uncertain")),
    )


def conclusions(df: DataFrame, text_col: str = "raw") -> DataFrame:
    """_extract_conclusion's marker ladder (thinking.py:553-586):
    adds ``conclusion``."""

    @F.pandas_udf("string")
    def conclusion_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for raw in it:
            yield pd.Series([extract_conclusion(r or "") for r in raw])

    return df.withColumn("conclusion", conclusion_udf(F.col(text_col)))


def truncated_reasonings(
    steps: DataFrame,
    query_col: str = "query_id",
    ord_col: str = "step_ord",
    step_col: str = "step",
) -> DataFrame:
    """prepare_truncated_reasoning (thinking.py:723-773) per query
    over a (query, step_ord, step) table → (query, truncated). One
    shuffle on the query id; each group is one trace's steps (bounded
    by the reference's iteration caps)."""
    q_type = steps.schema[query_col].dataType.simpleString()
    schema = f"{query_col} {q_type}, truncated string"

    def _truncate(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values(ord_col, kind="mergesort")
        return pd.DataFrame(
            [
                (
                    pdf[query_col].iloc[0],
                    truncate_reasoning(list(ordered[step_col])),
                )
            ],
            columns=[query_col, "truncated"],
        )

    return steps.groupBy(query_col).applyInPandas(_truncate, schema=schema)


def merge_dual_results(
    primary: DataFrame,
    secondary: DataFrame,
    query_col: str = "query_id",
    id_col: str = "chunk_id",
    text_col: str = "text",
) -> DataFrame:
    """_merge_results' chunk merge batched (search.py:145-180) over
    per-query chunk tables: primary rows win; a query with NO primary
    rows takes its secondary rows verbatim (the reference's
    empty-chunks early return); otherwise secondary rows join when
    their chunk_id — or, for NULL ids, their text — is not already
    present. Adds ``from_path`` ('primary'|'secondary').

    Deterministic pin (documented): the reference appends result2's
    chunks in list order, so a NULL-id chunk can dedup against an
    id-bearing chunk appended just before it; the table analogue
    dedups NULL-id rows against primary texts and drops NULL-id text
    duplicates within the secondary side — order-free, same row set
    for every shape that has ids on id-bearing rows."""
    q = query_col
    have = primary.select(q).distinct()
    verbatim = secondary.join(have, q, "left_anti")
    rest = secondary.join(have, q, "left_semi")
    new_by_id = rest.where(F.col(id_col).isNotNull()).join(
        primary.where(F.col(id_col).isNotNull())
        .select(q, id_col)
        .distinct(),
        [q, id_col],
        "left_anti",
    )
    new_by_text = (
        rest.where(F.col(id_col).isNull())
        .dropDuplicates([q, text_col])
        .join(primary.select(q, text_col).distinct(), [q, text_col], "left_anti")
    )
    return (
        primary.withColumn("from_path", F.lit("primary"))
        .unionByName(verbatim.withColumn("from_path", F.lit("secondary")))
        .unionByName(new_by_id.withColumn("from_path", F.lit("secondary")))
        .unionByName(new_by_text.withColumn("from_path", F.lit("secondary")))
    )


def route_dual_searches(
    df: DataFrame,
    precise_len_col: str = "precise_len",
    kb_len_col: str = "kb_len",
    eval_col: str | None = "evaluation",
) -> DataFrame:
    """The dual-path routing ladder batched (search.py:45-73): adds
    ``route`` ('precise'|'kb'|'merge') from the per-side joined-text
    lengths (> 50 stripped chars = has content) and the normalized
    evaluation verdict."""
    p_has = F.col(precise_len_col) > F.lit(50)
    k_has = F.col(kb_len_col) > F.lit(50)
    ev = (
        F.lower(F.trim(F.col(eval_col)))
        if eval_col
        else F.lit("both")
    )
    verdict = (
        F.when(ev.contains("precise"), F.lit("precise"))
        .when(ev.contains("kb"), F.lit("kb"))
        .otherwise(F.lit("both"))
    )
    return df.withColumn(
        "route",
        F.when(p_has & ~k_has, F.lit("precise"))
        .when(k_has & ~p_has, F.lit("kb"))
        .when(~p_has & ~k_has, F.lit("merge"))
        .when(verdict == "precise", F.lit("precise"))
        .when(verdict == "kb", F.lit("kb"))
        .otherwise(F.lit("merge")),
    )


def with_dual_path_queries(
    df: DataFrame, query_col: str = "query", kb_name_col: str = "kb_name"
) -> DataFrame:
    """DualPathSearcher's query construction (search.py:31-36),
    JVM-side: adds ``precise_query`` (KB name stripped) and
    ``kb_query`` (name prefixed unless already present,
    case-insensitive)."""
    q, k = F.col(query_col), F.col(kb_name_col)
    # str.strip() strips UNICODE whitespace; Spark trim only 0x20 —
    # the (?U) regex replace keeps operator == core when the KB name
    # is separated by a tab/newline/full-width space
    stripped = F.regexp_replace(
        F.replace(q, k, F.lit("")), r"(?U)^\s+|(?U)\s+$", ""
    )
    return df.withColumn("precise_query", stripped).withColumn(
        "kb_query",
        F.when(
            F.lower(q).contains(F.lower(k)), q
        ).otherwise(F.concat(k, F.lit(" "), q)),
    )
