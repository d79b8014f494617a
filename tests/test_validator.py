"""Answer validator + complexity heuristic: core vs reference
semantics, operator vs core. Reference:
/root/reference/search/tool/reasoning/validator.py."""

from __future__ import annotations

from graph_rag_agent_spark.core import validator as V


def test_validate_answer_rules():
    long_ok = "this answer is comfortably longer than fifty characters in total"
    assert V.validate_answer("q", long_ok) == {
        "length": True,
        "no_error_patterns": True,
        "keyword_relevance": True,
        "passed": True,
    }
    short = V.validate_answer("q", "too short")
    assert not short["length"] and not short["passed"]
    err = V.validate_answer("q", "没有找到相关信息 " + long_ok)
    assert not err["no_error_patterns"] and not err["passed"]


def test_keyword_relevance_rungs():
    ans = "the table holds fast values and parts"
    # high rung: at least ONE high keyword, case-insensitive
    assert V.keyword_relevance(ans, ["TABLE", "zzz"], [])
    assert not V.keyword_relevance(ans, ["zzz"], [])
    # low rung: ≥ half present when more than one given
    assert V.keyword_relevance(ans, [], ["table", "fast", "zzz"])  # 2/3
    assert not V.keyword_relevance(ans, [], ["aa", "bb", "fast"])  # 1/3
    # single low keyword is never checked (reference: len > 1 gate)
    assert V.keyword_relevance(ans, [], ["zzz"])
    # empty keyword sets pass
    assert V.keyword_relevance(ans, [], [])


def test_complexity_estimate_reference_formula():
    assert V.complexity_estimate(None) == 0.0
    assert V.complexity_estimate("   ") == 0.0
    assert V.complexity_estimate(12345) >= 0.0  # non-str coerced
    q = "为什么这个机制如此复杂?"
    # length 12 → 0.12·0.3; one '?' → 0.2·0.3; indicators 为什么+机制+如何?
    want = (
        min(1.0, len(q) / 100) * 0.3
        + min(1.0, 1 * 0.2) * 0.3
        + min(1.0, 2 * 0.15) * 0.4
    )
    assert abs(V.complexity_estimate(q) - want) < 1e-12
    # clamp at 1.0
    big = "为什么如何机制原因关系比较区别影响分析评估预测假设" * 10 + "????????"
    assert V.complexity_estimate(big) == 1.0


def test_operator_matches_core(spark):
    from graph_rag_agent_spark.operators.validator import (
        validate_answers,
        with_query_complexity,
    )

    rows = [
        ("r0", "为什么这个机制如此复杂?",
         "the table holds fast values and parts " * 3,
         ["TABLE", "zzz"], ["table", "fast", "zzz"]),
        ("r1", "short?", "too short", [], []),
        ("r2", "怎样评估影响？？",
         "没有找到相关信息 padding padding padding padding padding padding",
         None, None),
        ("r3", None, "x" * 60, ["zzz"], ["solo"]),
        ("r4", "", "y" * 60, [], ["a", "b"]),
        # unicode-whitespace-only queries are blank → complexity 0
        ("r5", "\t　\n", "z" * 60, [], []),
    ]
    df = spark.createDataFrame(
        rows,
        "id string, query string, answer string, "
        "high_level array<string>, low_level array<string>",
    )
    got = {
        r["id"]: r
        for r in with_query_complexity(validate_answers(df)).collect()
    }
    for rid, query, answer, hi, lo in rows:
        want = V.validate_answer(query or "", answer, hi, lo)
        g = got[rid]
        assert g["length_ok"] == want["length"], rid
        assert g["no_error_patterns"] == want["no_error_patterns"], rid
        assert g["keyword_relevance"] == want["keyword_relevance"], rid
        assert g["passed"] == want["passed"], rid
        assert abs(g["complexity"] - V.complexity_estimate(query)) < 1e-12, rid
