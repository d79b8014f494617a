"""Thinking/decomposition family: rule core rung-by-rung vs reference
semantics, and the batched operators vs the core.

Reference: /root/reference/search/tool/reasoning/thinking.py,
search.py, nlp.py.
"""

from __future__ import annotations

from graph_rag_agent_spark.core import thinking as T


# ---------------------------------------------------------------- core

def test_classify_next_query_ladder():
    q = f"{T.BEGIN_SEARCH_QUERY}who founded Acme?{T.END_SEARCH_QUERY}"
    got = T.classify_next_query(f"<think>hmm</think>need more. {q}")
    assert got["status"] == "has_query"
    assert got["queries"] == ["who founded Acme?"]
    assert "<think>" not in got["content"]

    assert T.classify_next_query("<think>all of it</think>") == {
        "status": "empty", "content": None, "queries": []
    }
    assert (
        T.classify_next_query("我已经有足够的信息了")["status"]
        == "answer_ready"
    )
    assert T.classify_next_query("**回答**: 42")["status"] == "answer_ready"
    assert T.classify_next_query("still pondering")["status"] == "no_query"


def test_parse_sub_queries_ladder():
    content = "这是分解:\n['q one', 'q two', 'q three']\n完毕"
    assert T.parse_sub_queries(content, "orig") == ["q one", "q two", "q three"]
    # unparseable bracket span and no list both fall back to [original]
    assert T.parse_sub_queries("[not, a, +valid, list", "orig") == ["orig"]
    assert T.parse_sub_queries("[f(x) for x in y]", "orig") == ["orig"]
    assert T.parse_sub_queries("no list at all", "orig") == ["orig"]


def test_parse_sub_queries_hostile_literals():
    # non-string elements pass through the core (reference returns
    # eval's result verbatim)…
    assert T.parse_sub_queries("[1, 2]", "orig") == [1, 2]
    # …and adversarial literals that raise beyond ValueError/
    # SyntaxError still take the reference's broad-except fallback
    deep = "[" * 400 + "]" * 400
    assert T.parse_sub_queries(deep, "orig") == ["orig"]


def test_parse_hypotheses_non_dict_items_fall_back():
    # a parsed list of strings (or key-less dicts) crashes the
    # reference's formatting loop inside the same try → fallback
    dflt = {
        "hypothesis": "问题可能需要更多背景信息",
        "reasoning": "初步思考中没有明确的答案方向",
    }
    assert T.parse_hypotheses('["hyp one", "hyp two"]') == [dflt]
    assert T.parse_hypotheses('[{"hypothesis": "only-h"}]') == [dflt]


def test_parse_followup_queries_dedup():
    assert T.parse_followup_queries("['a', 'b', 'a']") == ["a", "b"]
    assert T.parse_followup_queries("gibberish") == []


def test_parse_hypotheses_ladders():
    js = 'text [{"hypothesis": "h1", "reasoning": "r1"}] tail'
    assert T.parse_hypotheses(js) == [{"hypothesis": "h1", "reasoning": "r1"}]
    # regex fallback
    fb = "假设 1: 天在下雨 理由：地面湿了 假设 2: 有人洒水"
    got = T.extract_hypotheses_fallback(fb)
    assert got[0]["hypothesis"] == "天在下雨" and got[0]["reasoning"] == "地面湿了"
    assert got[1]["hypothesis"] == "有人洒水" and got[1]["reasoning"] == ""
    # default hypothesis when nothing matches
    dflt = T.extract_hypotheses_fallback("nothing here")
    assert dflt == [
        {
            "hypothesis": "问题可能需要更多背景信息",
            "reasoning": "初步思考中没有明确的答案方向",
        }
    ]
    # numbered / dash / line ladder
    assert T.parse_hypothesis_list("1. first idea 2. second idea") == [
        "first idea", "second idea"
    ]
    assert T.parse_hypothesis_list("- alpha\n- beta") == ["alpha", "beta"]
    lines = T.parse_hypothesis_list(
        "以下是假设\na genuinely long free line of text\nshort"
    )
    assert lines == ["a genuinely long free line of text"]


def test_verification_status_normalization():
    assert T.verification_status("  Supported!\n") == "supported"
    assert T.verification_status("REJECTED because…") == "rejected"
    assert T.verification_status("unclear") == "uncertain"


def test_extract_conclusion_ladder():
    # "结论"/"总结" outrank "因此" in the marker ladder — keep them
    # out of the fixture so the 因此 rung is the one exercised
    text = "分析了很多。\n因此结果是四十二，这就是推理得到的数值。\n附注"
    got = T.extract_conclusion(text)
    assert got == "因此结果是四十二，这就是推理得到的数值。"
    # marker line capped at 100 chars
    long = "结论" + "x" * 200
    assert T.extract_conclusion(long) == ("结论" + "x" * 98) + "..."
    # no marker → last paragraph
    assert T.extract_conclusion("para one\n\nthe last paragraph") == (
        "the last paragraph"
    )


def test_truncate_reasoning_shapes():
    few = [f"s{i}" for i in range(4)]
    assert T.truncate_reasoning(few) == (
        "Step 1: s0\n\nStep 2: s1\n\nStep 3: s2\n\nStep 4: s3"
    )
    steps = [f"step body {i}" for i in range(10)]
    steps[3] = f"mid {T.BEGIN_SEARCH_QUERY}q{T.END_SEARCH_QUERY}"
    out = T.truncate_reasoning(steps)
    # first, the tagged middle step, the last 4 — gaps ellipsized
    assert out.startswith("Step 1: step body 0")
    assert "Step 4: mid" in out
    assert "Step 10: step body 9" in out
    assert "Step 3:" not in out and "...\n\n" in out


def test_full_thinking_strips_tags():
    steps = [
        f"a {T.BEGIN_SEARCH_QUERY}q{T.END_SEARCH_QUERY} b",
        f"c {T.BEGIN_SEARCH_RESULT}r{T.END_SEARCH_RESULT} d",
    ]
    out = T.full_thinking(steps)
    assert out.startswith("<think>\n") and out.endswith("</think>")
    assert "q" not in out.replace("…", "") or T.BEGIN_SEARCH_QUERY not in out
    assert T.BEGIN_SEARCH_RESULT not in out


def test_verification_summary_and_integration():
    vers = [
        {"hypothesis": "h1", "status": "supported", "verification": "v1"},
        {"hypothesis": "h2", "status": "rejected", "verification": "v2"},
        {"hypothesis": "h3", "status": "uncertain", "verification": "v3"},
    ]
    summary = T.verification_summary(vers)
    assert "- 被支持的假设: 1\n  h1\n" in summary
    assert "- 被拒绝的假设: 1\n  h2\n" in summary
    integrated = T.integrate_thinking(
        "init", [{"hypothesis": "h1", "reasoning": "r1"}], vers, "final"
    )
    assert "### 假设 1: h1" in integrated
    assert "[✅ 支持]" in integrated and "[❌ 拒绝]" in integrated
    assert integrated.endswith("## 最终思考\n\nfinal")


def test_dual_path_queries():
    assert T.dual_path_queries("人事制度 产假规定", "人事制度") == (
        "产假规定", "人事制度 产假规定"
    )
    assert T.dual_path_queries("产假规定", "人事制度") == (
        "产假规定", "人事制度 产假规定"
    )


def test_extract_sentences():
    got = T.extract_sentences("First rule. Second rule! third stays. Yes?")
    # boundary needs terminator + space + capital
    assert got == ["First rule.", "Second rule! third stays.", "Yes?"]
    assert T.extract_sentences("", 3) == []
    assert T.extract_sentences("A one. B two. C three.", 2) == [
        "A one.", "B two."
    ]


def test_branch_tree_semantics():
    bt = T.BranchTree()
    bt.add_step("s1")
    bt.branch("b1")  # copies main + creation marker, becomes current
    assert bt.current == "b1"
    assert [s["content"] for s in bt.tree["b1"]] == [
        "s1", "创建推理分支: b1，基于: main"
    ]
    bt.add_step("b1-only")
    assert not bt.switch("nope")
    assert bt.switch("main") and bt.current == "main"
    bt.add_step("s2")
    assert bt.merge("b1", "main")
    # content-novel steps appended in source order + merge marker
    assert [s["content"] for s in bt.tree["main"]] == [
        "s1", "s2", "创建推理分支: b1，基于: main", "b1-only",
        "合并分支: b1 → main",
    ]
    assert bt.current == "main"
    # unknown base falls back to main
    bt.branch("b2", base_branch="ghost")
    assert bt.tree["b2"][0]["content"] == "s1"
    # self-base branch: the reference empties the branch BEFORE
    # copying, so only the creation step survives
    bt2 = T.BranchTree()
    bt2.add_step("gone")
    bt2.branch("main", "main")
    assert [s["content"] for s in bt2.tree["main"]] == [
        "创建推理分支: main，基于: main"
    ]


def test_contradiction_text_and_branch_merge_assembly():
    num = {
        "type": "numerical", "context": "ctx words", "value1": 42.0,
        "value2": 87.0,
    }
    assert T.contradiction_analysis_text(num) == (
        "数值矛盾: 在 'ctx words' 中, 发现值 42.0 和 87.0"
    )
    sem = {"type": "semantic", "analysis": "冲突点"}
    assert T.contradiction_analysis_text(sem) == "语义矛盾: 冲突点"
    assert T.contradiction_analysis_text({"type": "other"}) == ""

    branches = {
        "branch_1": {
            "hypothesis": "h1", "step_id": "s1",
            "counter_analysis": "c" * 250,
        },
        "branch_2": {"hypothesis": "h2", "step_id": "s2"},
    }
    ev = {"s1": [{"content": "x" * 250}, {"content": "short"},
                 {"content": "e3"}, {"content": "e4-dropped"}]}
    out = T.merge_branch_reasoning(branches, ev)
    assert out.startswith("## 多分支推理结果\n\n### 分支: branch_1\n假设: h1\n\n")
    assert "- " + "x" * 200 + "...\n" in out
    assert "e4-dropped" not in out
    assert "反事实分析: " + "c" * 200 + "..." in out
    assert "### 分支: branch_2\n假设: h2\n\n\n" in out
    assert T.merge_branch_reasoning({}, {}) == ""


def test_merge_search_results_reference_semantics():
    r1 = {
        "chunks": [{"chunk_id": "c1", "text": "t1"}],
        "doc_aggs": [{"doc_id": "d1"}],
        "total": 1,
    }
    r2 = {
        "chunks": [
            {"chunk_id": "c1", "text": "dup"},
            {"chunk_id": "c2", "text": "t2"},
            {"text": "t1"},       # NULL id, text already present
            {"text": "fresh"},    # NULL id, new text
        ],
        "doc_aggs": [{"doc_id": "d1"}, {"doc_id": "d2"}],
        "total": 2,
        "tags": ["a"],
    }
    merged = T.merge_search_results(r1, r2)
    ids = [c.get("chunk_id") for c in merged["chunks"]]
    assert ids == ["c1", "c2", None]
    assert merged["chunks"][2]["text"] == "fresh"
    assert [d["doc_id"] for d in merged["doc_aggs"]] == ["d1", "d2"]
    # the reference REBUILDS the dict from chunks/doc_aggs only, so
    # result1's other keys are dropped and result2's copied (:155-158,
    # 195-205) — faithful, if surprising
    assert merged["total"] == 2 and merged["tags"] == ["a"]
    # empty primary chunks → result2 verbatim
    assert T.merge_search_results({"chunks": []}, r2) is r2


def test_route_dual_results_ladder():
    assert T.route_dual_results(True, False, "both") == "precise"
    assert T.route_dual_results(False, True, "precise") == "kb"
    assert T.route_dual_results(False, False, "precise") == "merge"
    assert T.route_dual_results(True, True, "precise") == "precise"
    assert T.route_dual_results(True, True, "kb") == "kb"
    assert T.route_dual_results(True, True, "both") == "merge"
    assert T.evaluate_route("  The PRECISE one ") == "precise"
    assert T.evaluate_route("kb wins") == "kb"
    assert T.evaluate_route("unclear") == "both"


def test_merge_dual_results_operator(spark):
    from graph_rag_agent_spark.operators.thinking import merge_dual_results

    primary = spark.createDataFrame(
        [("q0", "c1", "t1")],
        "query_id string, chunk_id string, text string",
    )
    secondary = spark.createDataFrame(
        [
            ("q0", "c1", "dup"),     # id already present → dropped
            ("q0", "c2", "t2"),      # new id → kept
            ("q0", None, "t1"),      # NULL id, duplicate text → dropped
            ("q0", None, "fresh"),   # NULL id, new text → kept
            ("q1", "c9", "only-secondary"),  # empty primary → verbatim
        ],
        "query_id string, chunk_id string, text string",
    )
    got = {
        (r["query_id"], r["chunk_id"], r["text"], r["from_path"])
        for r in merge_dual_results(primary, secondary).collect()
    }
    assert got == {
        ("q0", "c1", "t1", "primary"),
        ("q0", "c2", "t2", "secondary"),
        ("q0", None, "fresh", "secondary"),
        ("q1", "c9", "only-secondary", "secondary"),
    }


def test_route_dual_searches_operator(spark):
    from graph_rag_agent_spark.operators.thinking import route_dual_searches

    rows = [
        ("a", 100, 10, "anything"),
        ("b", 10, 100, "precise"),
        ("c", 10, 10, "precise"),
        ("d", 100, 100, "Precise!"),
        ("e", 100, 100, "the kb side"),
        ("f", 100, 100, "both are fine"),
    ]
    df = spark.createDataFrame(
        rows, "id string, precise_len int, kb_len int, evaluation string"
    )
    got = {r["id"]: r["route"] for r in route_dual_searches(df).collect()}
    for rid, pl, kl, ev in rows:
        want = T.route_dual_results(pl > 50, kl > 50, T.evaluate_route(ev))
        assert got[rid] == want, rid


# ---------------------------------------------------- operators vs core

def _traces_df(spark):
    rows = [
        (
            "t0",
            "需要检索。"
            f"{T.BEGIN_SEARCH_QUERY}alpha question{T.END_SEARCH_QUERY}"
            f"{T.BEGIN_SEARCH_QUERY}beta question{T.END_SEARCH_QUERY}",
            "root q0",
        ),
        ("t1", "<think>internal</think>", "root q1"),
        ("t2", "我已经有足够的信息来回答。", "root q2"),
        ("t3", "继续思考中", "root q3"),
        ("t4", "拆分：['sub a', 'sub b']", "root q4"),
        ("t5", "no list here", "root q5"),
    ]
    return spark.createDataFrame(rows, "trace_id string, raw string, query string")


def test_classify_traces_matches_core(spark):
    from graph_rag_agent_spark.operators.thinking import classify_traces

    df = _traces_df(spark)
    got = {r["trace_id"]: r for r in classify_traces(df).collect()}
    for r in df.collect():
        want = T.classify_next_query(r["raw"])
        g = got[r["trace_id"]]
        assert g["status"] == want["status"], r["trace_id"]
        assert g["content"] == want["content"], r["trace_id"]
        assert list(g["queries"]) == want["queries"], r["trace_id"]


def test_sub_query_plans_match_core(spark):
    from graph_rag_agent_spark.operators.thinking import sub_query_plans

    df = _traces_df(spark)
    got = {r["trace_id"]: r for r in sub_query_plans(df).collect()}
    for r in df.collect():
        want = T.parse_sub_queries(r["raw"], r["query"])
        assert list(got[r["trace_id"]]["sub_queries"]) == want
        assert got[r["trace_id"]]["n_sub_queries"] == len(want)

    # a trace emitting a NON-STRING list must not abort the job: the
    # operator stringifies at the array<string> boundary
    hostile = spark.createDataFrame(
        [("h0", "拆分: [1, 2]", "root")],
        "trace_id string, raw string, query string",
    )
    [row] = sub_query_plans(hostile).collect()
    assert list(row["sub_queries"]) == ["1", "2"]


def test_hypothesis_and_status_operators(spark):
    from graph_rag_agent_spark.operators.thinking import (
        conclusions,
        hypothesis_plans,
        verification_statuses,
    )

    df = spark.createDataFrame(
        [
            ("h0", '[{"hypothesis": "hx", "reasoning": "rx"}]'),
            ("h1", "假设 1: 甲 理由：乙"),
            ("h2", "nothing"),
        ],
        "id string, raw string",
    )
    got = {r["id"]: r["hypotheses"] for r in hypothesis_plans(df).collect()}
    for r in df.collect():
        want = [
            (h["hypothesis"], h["reasoning"])
            for h in T.parse_hypotheses(r["raw"])
        ]
        assert [(h["hypothesis"], h["reasoning"]) for h in got[r["id"]]] == want

    st = spark.createDataFrame(
        [("a", " SUPPORTED "), ("b", "rejected."), ("c", "???")],
        "id string, raw string",
    )
    sgot = {r["id"]: r["status"] for r in verification_statuses(st).collect()}
    assert sgot == {"a": "supported", "b": "rejected", "c": "uncertain"}

    cdf = spark.createDataFrame(
        [("x", "blah\n\n所以就是这样的结果了")], "id string, raw string"
    )
    [crow] = conclusions(cdf).collect()
    assert crow["conclusion"] == T.extract_conclusion("blah\n\n所以就是这样的结果了")


def test_truncated_reasonings_match_core(spark):
    from graph_rag_agent_spark.operators.thinking import truncated_reasonings

    rows = []
    for q in ("qa", "qb"):
        n = 10 if q == "qa" else 3
        for i in range(n):
            step = (
                f"mid {T.BEGIN_SEARCH_RESULT}r{T.END_SEARCH_RESULT}"
                if q == "qa" and i == 4
                else f"{q} body {i}"
            )
            rows.append((q, i, step))
    steps = spark.createDataFrame(rows, "query_id string, step_ord int, step string")
    got = {r["query_id"]: r["truncated"] for r in truncated_reasonings(steps).collect()}
    for q in ("qa", "qb"):
        want = T.truncate_reasoning([r[2] for r in rows if r[0] == q])
        assert got[q] == want, q


def test_dual_path_operator_matches_core(spark):
    from graph_rag_agent_spark.operators.thinking import with_dual_path_queries

    df = spark.createDataFrame(
        [
            ("人事制度 产假规定", "人事制度"),
            ("产假规定", "人事制度"),
            # unicode whitespace left by the replace must strip like
            # str.strip(): newline, tab, ideographic space
            ("人事制度\n产假规定", "人事制度"),
            ("人事制度　产假规定\t", "人事制度"),
        ],
        "query string, kb_name string",
    )
    for r in with_dual_path_queries(df).collect():
        precise, kb = T.dual_path_queries(r["query"], r["kb_name"])
        assert r["precise_query"] == precise, r["query"]
        assert r["kb_query"] == kb, r["query"]


def test_extract_from_templates_quirk_preserved():
    """nlp.py:19-45 parity: the regex branch is live; the non-regex
    placeholder branch is DEAD by a reference bug (re.escape emits
    `\\(\\.\\*\\?\\)` but the un-escape looks for `\\(\\*\\*\\?\\)`),
    so `{}` templates only match a literal `(.*?)` in the input —
    transcribed bug-for-bug."""
    from graph_rag_agent_spark.core.thinking import extract_from_templates

    text = "answer: 42 units. question: why?"
    # live path: template used directly as a regex
    assert extract_from_templates(
        text, [r"answer: (\d+)"], regex=True
    ) == ["42"]
    # dead path: the placeholder never becomes a capture group…
    assert extract_from_templates(text, ["answer: {}"]) == []
    # …because the pattern matches the LITERAL "(.*?)" text
    assert extract_from_templates(
        "oops answer: (.*?) here", ["answer: {}"]
    ) == ["answer: (.*?)"]
    # a template without a placeholder matches itself literally
    assert extract_from_templates(text, ["question:"]) == ["question:"]
    # multiple templates accumulate in order
    assert extract_from_templates(
        text, [r"answer: (\d+)", r"question: (\w+)"], regex=True
    ) == ["42", "why"]
