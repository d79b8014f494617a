"""Community-aware search enhancement: core rules vs reference
semantics, batched operators vs python replay. Reference:
/root/reference/search/tool/reasoning/community_enhance.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph_rag_agent_spark.core import community_enhance as C


def test_keyword_score_and_importance():
    assert C.keyword_score("Alpha value table", ["VALUE"], ["table", "zz"]) == 2.5
    assert C.keyword_score("nothing", ["a"], ["b"]) == 0.0
    assert C.importance_norm(None) == 0.1
    assert C.importance_norm(0) == 0.1       # numeric 0 → `or 1`
    assert C.importance_norm("0") == 0.0     # string '0' parses to 0.0
    assert C.importance_norm("bogus") == 0.1
    assert C.importance_norm(25) == 1.0      # capped at rank 10


def test_relevance_score_formula():
    got = C.relevance_score(0.5, "has value here", ["value"], [], 5)
    want = 0.5 * 0.6 + (min(2.0, 5.0) / 5.0) * 0.3 + 0.5 * 0.1
    assert abs(got - want) < 1e-12


def test_temporal_info_pattern_order_and_overlap():
    text = "早在2024年3月5日与2023-07-01之间，又见2021年。"
    got = C.extract_temporal_info(text)
    # pattern order: full dates first, then coarser ones re-reporting
    assert got[0] == "2024年3月5日" and got[1] == "2023-07-01"
    assert "2024年3月" in got and "2023-07" in got
    assert got.count("2021年") == 1 and "2024年" in got


def test_parse_search_strategy_ladder():
    # quoted spans win
    got = C.parse_search_strategy('先查 "q one" 再查 "q two"', ["k1"])
    assert got["follow_up_queries"] == ["q one", "q two"]
    assert got["focus_entities"] == ["k1"] and got["keywords"] == ["k1"]
    # sentence fallback: 10+ chars between terminators, first 3
    text = "。这里是一个足够长的候选句子！短。另一个也是足够长的查询句子？"
    got2 = C.parse_search_strategy(text)
    assert got2["follow_up_queries"]
    assert all(len(q) > 10 for q in got2["follow_up_queries"])
    # entity lines: 'label: value', first 5
    got3 = C.parse_search_strategy("重点：阿尔法\nfocus: beta\nplain line")
    assert got3["focus_entities"] == ["阿尔法", "beta"]
    assert C.basic_strategy([])["strategy_type"] == "basic"


def _letters(text: str) -> list[int]:
    return [text.lower().count(c) for c in "abcde"]


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return 0.0 if na == 0 or nb == 0 else dot / (na * nb)


def test_relevant_communities_matches_core(spark):
    from graph_rag_agent_spark.operators.community_enhance import (
        relevant_communities,
    )

    comm_rows = [
        (f"0-{i}", f"summary {'value' if i % 2 else 'plain'} abc{'d' * i}",
         100 - i)
        for i in range(30)
    ] + [("0-99", None, 999)]  # NULL summary excluded
    comms = spark.createDataFrame(
        comm_rows, "community_id string, summary string, community_rank long"
    ).withColumn(
        "embedding",
        F.array(
            *[
                (
                    F.length(F.lower("summary"))
                    - F.length(F.regexp_replace(F.lower("summary"), c, ""))
                ).cast("long")
                for c in "abcde"
            ]
        ),
    )
    q_rows = [
        ("q0", "value abc", ["VALUE"], ["abc", "zz"]),
        ("q1", "ddddd", [], []),
    ]
    queries = spark.createDataFrame(
        [
            (qid, _letters(text), hi, lo)
            for qid, text, hi, lo in q_rows
        ],
        "query_id string, qvec array<long>, high_level array<string>, "
        "low_level array<string>",
    )
    got = relevant_communities(comms, queries, top_k=3).collect()

    # python replay: top-20 candidates by (rank desc, id asc), score
    # via the core formula, top-3 per query by (score desc, id asc)
    cand = sorted(
        [r for r in comm_rows if r[1] is not None],
        key=lambda r: (-r[2], r[0]),
    )[:20]
    want = {}
    for qid, text, hi, lo in q_rows:
        qv = _letters(text)
        scored = []
        for cid, summary, rank in cand:
            sim = _cosine(_letters(summary), qv)
            scored.append(
                (cid, C.relevance_score(sim, summary, hi, lo, rank))
            )
        scored.sort(key=lambda t: (-t[1], t[0]))
        want[qid] = scored[:3]
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["community_id"], r["score"])
        )
    for qid, pairs in want.items():
        got_pairs = by_q[qid]
        assert [p[0] for p in got_pairs] == [p[0] for p in pairs], qid
        for (gc, gs), (wc, ws) in zip(got_pairs, pairs):
            assert abs(gs - ws) < 1e-12, (qid, gc)


def test_community_knowledge_matches_replay(spark):
    from graph_rag_agent_spark.operators.community_enhance import (
        community_knowledge_entities,
        community_knowledge_relationships,
    )

    selected = spark.createDataFrame(
        [("q0", "c0"), ("q0", "c1"), ("q1", "c1")],
        "query_id string, community_id string",
    )
    membership = spark.createDataFrame(
        [("e1", "c0"), ("e2", "c0"), ("e3", "c1"), ("e4", "c2")],
        "entity_id string, community_id string",
    )
    mentions = spark.createDataFrame(
        [("ch1", "e1"), ("ch2", "e1"), ("ch3", "e2"), ("ch4", "e3")],
        "chunk_id string, entity_id string",
    )
    ents = community_knowledge_entities(
        selected, membership, mentions, limit=2
    ).collect()
    by_q = {}
    for r in ents:
        by_q.setdefault(r["query_id"], []).append(
            (r["entity_id"], r["mention_count"])
        )
    # q0: e1 (2 mentions), e2 (1), e3 (1) → limit 2 keeps e1 then e2
    # (ties break entity_id ASC); e4 not in selected communities
    assert by_q["q0"] == [("e1", 2), ("e2", 1)]
    # q1: only c1 → e3
    assert by_q["q1"] == [("e3", 1)]

    triples = spark.createDataFrame(
        [
            ("e1", "R", "e2", 1.0),
            ("e1", "R", "e3", 1.0),
            ("e2", "R", "e4", 1.0),  # e4 outside q0's entity set
            ("e5", "R", "e6", 1.0),
        ],
        "subj string, pred string, obj string, weight double",
    )
    ent_sel = spark.createDataFrame(
        [("q0", "e1"), ("q0", "e2"), ("q0", "e3")],
        "query_id string, entity_id string",
    )
    rels = community_knowledge_relationships(
        ent_sel, triples, mentions
    ).collect()
    got = [
        (r["subj"], r["obj"], r["path_importance"])
        for r in sorted(rels, key=lambda r: (r["subj"], r["obj"]))
    ]
    # e1-e2: 2+1=3; e1-e3: 2+1=3; e2-e4 dropped (e4 not selected)
    assert got == [("e1", "e2", 3), ("e1", "e3", 3)]


def test_with_temporal_info_matches_core(spark):
    from graph_rag_agent_spark.operators.community_enhance import (
        with_temporal_info,
    )

    rows = [
        ("t0", "早在2024年3月5日与2023-07-01之间，又见2021年。"),
        ("t1", "no dates at all"),
        ("t2", "边界2020-1-2与2020年1月"),
    ]
    df = spark.createDataFrame(rows, "id string, summary string")
    got = {r["id"]: list(r["temporal_info"]) for r in with_temporal_info(df).collect()}
    for rid, text in rows:
        assert got[rid] == C.extract_temporal_info(text), rid
