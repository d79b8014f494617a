"""Citation-block extraction (reference evaluator/preprocessing/
reference_extractor.py): section regex ladder, JSON repair rungs,
keyed-family walks, text fallback, id cleanup — plus the Spark
operator column parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_rag_agent_spark.core.citations import (
    extract_references_from_answer,
    parse_json_data,
    validate_and_format_ids,
)


def test_gate_requires_citation_marker():
    assert extract_references_from_answer("answer with {'data': {'Entities': [1]}}") == {
        "entities": [],
        "relationships": [],
        "chunks": [],
        "reports": [],
    }
    assert extract_references_from_answer("") == {
        "entities": [],
        "relationships": [],
        "chunks": [],
        "reports": [],
    }


def test_well_formed_json_block():
    ans = (
        "身体的答案。\n\n#### 引用数据\n"
        '{"data": {"Entities": [12, 7], "Relationships": [3], '
        '"Chunks": ["cb", "ca"], "Reports": [9]}}'
    )
    got = extract_references_from_answer(ans)
    assert got["entities"] == ["12", "7"]
    # reference quirk: Reports keys feed relationships too
    assert got["relationships"] == ["3", "9"]
    assert got["chunks"] == ["ca", "cb"]
    assert got["reports"] == ["9"]


def test_single_quote_repair_rung():
    ans = "回答。\n引用数据: {'data': {'Entities': [5], 'Chunks': ['x']}}"
    got = extract_references_from_answer(ans)
    assert got["entities"] == ["5"]
    assert got["chunks"] == ["x"]


def test_comma_string_and_id_dict_shapes():
    ans = (
        "回答。\n#### 引用数据\n"
        '{"data": {"Entities": "10, 11", "Relationships": [{"id": 4}]}}'
    )
    got = extract_references_from_answer(ans)
    assert got["entities"] == ["10", "11"]
    assert got["relationships"] == ["4"]


def test_key_quoting_rung():
    # unquoted keys fail rungs 1-3; the ASCII-clean + key-quote rung
    # repairs them (reference :152-166)
    assert parse_json_data('{data: {Entities: [5]}}') == {
        "data": {"Entities": [5]}
    }


def test_text_fallback_rung():
    ans = (
        "回答。\n### 引用数据 "
        "{Entities=[7, 8], Chunks=['c1', 'c2'], Reports=[9]}"
    )
    got = extract_references_from_answer(ans)
    assert got["entities"] == ["7", "8"]
    # no Relationships field → the Reports fallback pattern fires
    assert got["relationships"] == ["9"]
    assert got["chunks"] == ["c1", "c2"]
    assert got["reports"] == ["9"]


def test_marker_without_braces_is_empty():
    got = extract_references_from_answer("回答提到引用数据但没有块")
    assert got == {
        "entities": [],
        "relationships": [],
        "chunks": [],
        "reports": [],
    }


def test_dedup_and_sort_deviation():
    ans = (
        "x\n#### 引用数据\n"
        '{"data": {"Entities": [2, 10, 2], "entities": [10]}}'
    )
    got = extract_references_from_answer(ans)
    # sorted(set(...)) — lexicographic on strings
    assert got["entities"] == ["10", "2"]


def test_validate_and_format_ids():
    # reference :73-102
    assert validate_and_format_ids(
        [None, "", 3, 3.9, "-7", "x" * 11, "  ", "short"]
    ) == ["3", "3", "-7", "x" * 11, "short"]


def test_never_throws_on_hostile_input():
    hostiles = [
        "引用数据 {{{{",
        "引用数据: {broken",
        "引用数据\n" + "{" * 500 + "}" * 499,
        "引用数据 {\"data\": 123}",
        "引用数据 {'data': ['not', 'a', 'dict']}",
        "引用数据" + "\x00\x01" * 50 + "{}",
    ]
    for h in hostiles:
        got = extract_references_from_answer(h)
        assert set(got) == {"entities", "relationships", "chunks", "reports"}


def test_spark_operator_matches_core(spark):
    from graph_rag_agent_spark.operators.evaluator import (
        with_answer_references,
    )

    answers = [
        "no citations here",
        '正文。\n#### 引用数据\n{"data": {"Entities": [1, 2], "Chunks": ["a"]}}',
        "正文。\n引用数据: {'data': {'Reports': [6]}}",
        "正文。\n### 引用数据 {Entities=[3], Chunks=['c']}",
        None,
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(answers)], "sample_id long, answer string"
    )
    got = {
        r["sample_id"]: r
        for r in with_answer_references(df).collect()
    }
    for i, a in enumerate(answers):
        want = extract_references_from_answer(a or "")
        assert got[i]["ref_entities"] == want["entities"], i
        assert got[i]["ref_relationships"] == want["relationships"], i
        assert got[i]["ref_chunks"] == want["chunks"], i
        assert got[i]["ref_reports"] == want["reports"], i


def test_references_feed_retrieval_precision(spark):
    """End-to-end composition the reference's eval pipeline performs
    (eval_utils: answer → extract_references → retrieval metrics):
    the extracted ref_chunks slot straight into
    retrieval_precision_scores' referenced side."""
    from graph_rag_agent_spark.operators.evaluator import (
        retrieval_precision_scores,
        with_answer_references,
    )

    ans = (
        '正文。\n#### 引用数据\n{"data": {"Chunks": ["abc123", "zzz"]}}'
    )
    df = spark.createDataFrame(
        [(0, ans, ["chunk abc123 text", "other"])],
        "sample_id long, answer string, retrieved array<string>",
    )
    samples = with_answer_references(df).select(
        "sample_id", "retrieved", F.col("ref_chunks").alias("referenced")
    )
    row = retrieval_precision_scores(samples).first()
    # referenced = [abc123, zzz]; 'abc123' substring-matches one
    # retrieved chunk → matched 1 of 2 → 0.3 + 0.7·(1/2) = 0.65
    assert row["n_referenced"] == 2
    assert row["matched"] == 1
    assert row["score_x10000"] == 6500
