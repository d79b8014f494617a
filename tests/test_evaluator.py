"""Evaluator metrics (A11): entity_coverage / graph_coverage vs a
pure-Python transcription of the reference formulas
(evaluator/metrics/graph_metrics.py:635-1259)."""

from __future__ import annotations

import re
from itertools import permutations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.evaluator import (
    entity_coverage,
    graph_coverage,
    referenced_path_counts,
)

ENTITIES = [
    ("Acme Corp", "Acme Corp is a Organization"),
    ("Sony", "Sony is a Organization"),
    ("Alice Zhang", "Alice Zhang is a Person"),
    ("Widget X", ""),  # undescribed entity for the structure term
]
TRIPLES = [
    ("Acme Corp", "PARTNERS_WITH", "Sony", "Acme Corp PARTNERS_WITH Sony"),
    ("Alice Zhang", "WORKS_AT", "Acme Corp", "Alice Zhang WORKS_AT Acme Corp"),
    ("Sony", "MAKES", "Widget X", ""),
]
SAMPLES = [
    ("s1", "does acme corp partner with sony today", ["Acme Corp", "Sony"]),
    ("s2", "who is alice zhang", ["Alice Zhang", "Acme Corp", "Sony", "Widget X"]),
    ("s3", "unrelated question words", []),
]


def _keywords(q):
    return [
        k
        for k in re.findall(r"[a-z0-9一-鿿]{2,}", q.lower())
        if len(k) < 15
    ]


def _py_entity_coverage(question, entity_ids):
    desc = dict(ENTITIES)
    kws = _keywords(question)
    if not kws or not entity_ids:
        return 0.4
    etext = " ".join(
        sorted(f"{e} {desc.get(e, '')}" for e in entity_ids)
    ).lower()
    matched = sum(1 for k in kws if k in etext)
    return min(1.0, 0.4 + 0.6 * (matched / len(kws)) * min(1.0, len(entity_ids) / 5))


def _py_paths(ids):
    # Cypher -[*1..3]- : undirected, pairwise-distinct relationships,
    # both traversal directions
    edges = []
    for s, p, o, _ in TRIPLES:
        edges.append((s, o, (s, p, o)))
        edges.append((o, s, (s, p, o)))
    count = 0
    idset = set(ids)
    for l in (1, 2, 3):
        for combo in permutations(edges, l):
            ok = True
            used = set()
            for i in range(l):
                if combo[i][2] in used:
                    ok = False
                    break
                used.add(combo[i][2])
                if i > 0 and combo[i - 1][1] != combo[i][0]:
                    ok = False
                    break
            if not ok:
                continue
            a, b = combo[0][0], combo[-1][1]
            if a in idset and b in idset and a != b:
                count += 1
    return count


def _py_graph_coverage(question, entity_ids):
    desc = dict(ENTITIES)
    kws = _keywords(question)
    n_e = len(entity_ids)
    rels = [
        t
        for t in TRIPLES
        if t[0] in set(entity_ids) and t[2] in set(entity_ids)
    ]
    n_r = len(rels)
    structure = min(0.6, 0.05 * n_e + 0.05 * n_r)
    if n_e:
        structure += 0.2 * sum(1 for e in entity_ids if desc.get(e, "").strip()) / n_e
    if n_r:
        structure += 0.2 * sum(1 for t in rels if t[3].strip()) / n_r
    ent_text = " ".join(sorted(f"{e} {desc.get(e, '')}" for e in entity_ids))
    rel_text = " ".join(sorted(f"{s} {p} {o} {d}" for s, p, o, d in rels))
    combined = (ent_text + " " + rel_text).lower().strip()
    if kws:
        relevance = min(1.0, 1.2 * sum(1 for k in kws if k in combined) / len(kws))
    else:
        relevance = 0.5
    potential = n_e * (n_e - 1) / 2
    ratio = min(1.0, _py_paths(entity_ids) / potential) if potential > 0 else 0.0
    connectedness = 0.4 + 0.6 * ratio
    return (
        structure,
        relevance,
        connectedness,
        min(1.0, 0.3 + 0.7 * (0.3 * structure + 0.4 * relevance + 0.3 * connectedness)),
    )


@pytest.fixture(scope="module")
def dfs(spark):
    entities = spark.createDataFrame(ENTITIES, "entity_id string, description string")
    triples = spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, description string"
    )
    samples = spark.createDataFrame(
        SAMPLES, "sample_id string, question string, entity_ids array<string>"
    )
    return entities, triples, samples


def test_entity_coverage_matches_formula(dfs):
    entities, _, samples = dfs
    got = {
        r["sample_id"]: r["score_x10000"]
        for r in entity_coverage(samples, entities).collect()
    }
    for sid, q, ids in SAMPLES:
        assert got[sid] == round(_py_entity_coverage(q, ids) * 10000), sid


def test_path_counts_match_cypher_semantics(dfs):
    _, triples, _ = dfs
    se = [(s, e) for s, q, ids in SAMPLES for e in ids]
    sample_entities = (
        triples.sparkSession.createDataFrame(
            se or [("s0", "none")], "sample_id string, entity_id string"
        )
    )
    got = {
        r["sample_id"]: r["path_count"]
        for r in referenced_path_counts(sample_entities, triples).collect()
    }
    for sid, _, ids in SAMPLES:
        if ids:
            assert got[sid] == _py_paths(ids), sid


ANSWER_SAMPLES = [
    # (sample_id, system_answer, golden_answer)
    ("a1", "### Summary\n\nThe cat sat on the mat!", "cat sat on mat"),  # em via clean+normalize
    ("a2", "alpha beta gamma delta", "alpha beta gamma delta"),
    ("a3", "alpha beta gamma delta epsilon", "alpha beta zeta"),  # partial
    ("a4", "", "something"),  # empty pred
    ("a5", "the a an", ""),  # both normalize to empty
    ("a6", "订单 编号 12345 已经 发货", "订单 编号 12345 没有 发货"),  # CJK tokens
    ("a7", "### h1\n### h2\n\nbody text here\n\n\nmore body", "body text here more body"),
]

RETR_SAMPLES = [
    # (sample_id, retrieved, referenced)
    ("r1", ["Acme Corp office", "Sony HQ"], ["acme corp", "sony"]),  # direct
    ("r2", ["ticket 123 open", "order 55"], ["TKT-123", "ORD-55"]),  # numeric
    ("r3", ["alpha", "beta"], ["gamma"]),  # no match
    ("r4", [], ["x"]),  # empty retrieved
    ("r5", ["x"], []),  # empty referenced
    ("r6", ["EMP-00123 profile"], ["emp-00123", "unknown", "EMP-99"]),  # mixed
]


def _norm_answer(s):
    from graph_rag_agent_spark.operators.evaluator import PUNCT_CHARS

    s = s.lower()
    s = "".join(ch for ch in s if ch not in PUNCT_CHARS)
    # ASCII \b (documented engine deviation from Python's unicode \b)
    s = re.sub(r"\b(a|an|the|一个|一种|这个|那个)\b", " ", s, flags=re.ASCII)
    return " ".join(s.split())


def _clean_pred(p):
    p = re.sub(r"^###.*\n+", "", p, flags=re.MULTILINE)
    p = re.sub(r"\n\s*\n", "\n", p)
    return p.strip()


def _x10000(v):
    import math

    return int(math.floor(v * 10000 + 0.5))


def _py_em(pred, golden):
    pn, gn = _norm_answer(_clean_pred(pred)), _norm_answer(golden)
    if pn == gn:
        return 1.0
    p_list, g_list = pn.split(), gn.split()
    if not p_list or not g_list:
        return 0.0
    ps, gs = set(p_list), set(g_list)
    common = ps & gs
    return (
        0.4 * len(common) / len(ps | gs)
        + 0.3 * len(common) / len(ps)
        + 0.3 * len(common) / len(gs)
    )


_F1_STOP = {"的", "了", "和", "在", "是", "为", "以", "与", "或", "且"}


def _py_f1(pred, golden):
    pn, gn = _norm_answer(_clean_pred(pred)), _norm_answer(golden)
    p = [t for t in pn.split() if len(t) > 1 and t not in _F1_STOP]
    g = [t for t in gn.split() if len(t) > 1 and t not in _F1_STOP]
    if not p and not g:
        return 1.0
    if not p or not g:
        return 0.0
    common = set(p) & set(g)
    precision, recall = len(common) / len(p), len(common) / len(g)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def _py_retr_precision(retrieved, referenced):
    retr = [s.lower() for s in retrieved]
    ref = [s.lower() for s in referenced]
    if not retr or not ref:
        return 0, 0.3
    direct = sum(1 for r in ref if any(r in t for t in retr))
    nums = 0
    for r in ref:
        m = re.search(r"[0-9]+", r)
        if m and any(m.group() in t for t in retr):
            nums += 1
    matched = max(direct, nums)
    if matched > 0:
        return matched, max(0.3, 0.3 + 0.7 * matched / len(ref))
    return 0, 0.3


def test_exact_match_scores_match_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import exact_match_scores

    df = spark.createDataFrame(
        ANSWER_SAMPLES, "sample_id string, system_answer string, golden_answer string"
    )
    got = {r["sample_id"]: r["em_x10000"] for r in exact_match_scores(df).collect()}
    for sid, p, g in ANSWER_SAMPLES:
        assert got[sid] == _x10000(_py_em(p, g)), sid
    assert got["a1"] == 10000  # markdown cleaning + article/punct removal
    assert got["a4"] == 0


def test_answer_f1_scores_match_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import answer_f1_scores

    df = spark.createDataFrame(
        ANSWER_SAMPLES, "sample_id string, system_answer string, golden_answer string"
    )
    got = {r["sample_id"]: r["f1_x10000"] for r in answer_f1_scores(df).collect()}
    for sid, p, g in ANSWER_SAMPLES:
        assert got[sid] == _x10000(_py_f1(p, g)), sid
    assert got["a2"] == 10000
    assert got["a5"] == 10000  # both token-empty → 1.0


def test_retrieval_precision_matches_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import (
        retrieval_precision_scores,
    )

    df = spark.createDataFrame(
        RETR_SAMPLES,
        "sample_id string, retrieved array<string>, referenced array<string>",
    )
    got = {r["sample_id"]: r for r in retrieval_precision_scores(df).collect()}
    for sid, retr, ref in RETR_SAMPLES:
        m, score = _py_retr_precision(retr, ref)
        assert got[sid]["matched"] == m, sid
        assert got[sid]["score_x10000"] == _x10000(score), sid
    assert got["r1"]["score_x10000"] == 10000
    assert got["r4"]["score_x10000"] == 3000


def test_graph_coverage_matches_formula(dfs):
    entities, triples, samples = dfs
    got = {
        r["sample_id"]: r
        for r in graph_coverage(samples, entities, triples).collect()
    }
    for sid, q, ids in SAMPLES:
        st, rel, con, sc = _py_graph_coverage(q, ids)
        row = got[sid]
        assert row["structure_x10000"] == round(st * 10000), sid
        assert row["relevance_x10000"] == round(rel * 10000), sid
        assert row["connectedness_x10000"] == round(con * 10000), sid
        assert row["score_x10000"] == round(sc * 10000), sid


# --- community_relevance / subgraph_quality (graph_metrics.py:6-378) ---

MENTIONS = [("ch1", "Acme Corp"), ("ch1", "Sony"), ("ch2", "Alice Zhang")]
MEMBERSHIP = [("Acme Corp", "c-0"), ("Sony", "c-0"), ("Alice Zhang", "c-1")]
COMMUNITIES = [
    ("c-0", "acme corp partners with sony", "full: partnership details"),
    ("c-1", "alice zhang works at acme", "full: employment history"),
    ("c-2", "unrelated widgets cluster", ""),
]
CR_SAMPLES = [
    # (sample_id, question, agent_type, chunk_ids, entity_ids)
    ("n1", "does acme corp partner with sony", "naive", ["ch1"], []),
    ("n2", "unmatched words zzz qqq", "naive", [], []),  # no chunks → count path
    ("g1", "acme corp and sony partnership", "graph", [], ["Acme Corp"]),
    ("h1", "alice zhang employment", "hybrid", [], ["Alice Zhang"]),
    ("o1", "anything at all here", "local", [], []),  # fallback info10
]


def _py_community_relevance(question, agent_type, chunk_ids, entity_ids):
    kws = [
        k for k in re.findall(r"[a-z0-9一-鿿]{2,}", _norm_answer(question)) if len(k) < 15
    ]
    comm = {c: (s, f) for c, s, f in COMMUNITIES}
    if agent_type == "naive":
        ents = {e for ch, e in MENTIONS if ch in set(chunk_ids)}
        cids = sorted({c for e, c in MEMBERSHIP if e in ents})[:3]
        info = " ".join(x for c in cids for x in comm[c])
        if info.strip() and kws:
            matched = sum(1 for k in kws if k in info.lower())
            return 0.3 + 0.4 * matched / len(kws)
        return min(0.4, 0.3 + 0.1 * len(chunk_ids) / 3)
    if entity_ids:
        cids = sorted(comm)[:5]
        info = " ".join(x for c in cids for x in comm[c])
    else:
        cids = sorted(c for c in comm if comm[c][0])[:10]
        info = " ".join(comm[c][0] for c in cids)
    base = {"graph": 0.4, "hybrid": 0.35}.get(agent_type, 0.3)
    mult = {"graph": 1.2, "hybrid": 1.1}.get(agent_type, 1.0)
    if info.strip() and kws:
        matched = sum(1 for k in kws if k in info.lower())
        return min(1.0, base + 0.5 * (matched / len(kws) * mult))
    return base


def test_community_relevance_matches_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import community_relevance

    samples = spark.createDataFrame(
        CR_SAMPLES,
        "sample_id string, question string, agent_type string, "
        "chunk_ids array<string>, entity_ids array<string>",
    )
    mentions = spark.createDataFrame(MENTIONS, "chunk_id string, entity_id string")
    membership = spark.createDataFrame(
        MEMBERSHIP, "entity_id string, community_id string"
    )
    communities = spark.createDataFrame(
        COMMUNITIES, "community_id string, summary string, full_content string"
    )
    got = {
        r["sample_id"]: r["score_x10000"]
        for r in community_relevance(
            samples, mentions, membership, communities
        ).collect()
    }
    for sid, q, at, ch, en in CR_SAMPLES:
        assert got[sid] == _x10000(_py_community_relevance(q, at, ch, en)), sid
    # naive with matching community text must beat the no-info floor
    assert got["n1"] > 4000


SQ_SAMPLES = [
    # (sample_id, agent_type, entity_ids)
    ("s1", "graph", ["A", "B", "C"]),
    ("s2", "local", ["A", "B"]),
    ("s3", "local", ["A"]),  # entities only
    ("s4", "local", []),  # nothing
]
SQ_RELS = [
    ("s1", "A", "KNOWS", "B"),
    ("s1", "B", "KNOWS", "C"),
    ("s2", "A", "KNOWS", "B"),
]


def _py_subgraph_quality(agent_type, entity_ids, rels):
    n_e, n_r = len(entity_ids), len(rels)
    if n_e == 0 and n_r == 0:
        return 0.3
    if n_e > 0 and n_r == 0:
        return 0.3 + min(0.2, 0.01 * n_e)
    max_edges = n_e * (n_e - 1) / 2 if n_e > 1 else 1
    density = n_r / max_edges if max_edges > 0 else 0
    endpoints = {s for s, _, o in rels} | {o for _, _, o in rels}
    connectivity = len(endpoints) / n_e if n_e > 0 else 0
    q = 0.5 * density + 0.5 * connectivity
    if agent_type == "graph":
        q = min(1.0, q * 1.05)
    return max(0.3, q)


RS_SAMPLES = [
    ("t1", "plain answer, no thinking block"),
    (
        "t2",
        "<think>first I search\n> 1. query one\n> 2. query two\n\n"
        "analysis paragraph\n\n**Final Information** found facts\n\n"
        "more reasoning\n\nconclusion</think>\nThe answer is X.",
    ),
    (
        "t3",
        "<think>> 1. a\n> 2. b\n> 3. c\n> 4. d\n\npara</think>ans",
    ),
    ("t4", "<think>single paragraph only</think>done"),
]


def _py_reasoning(answer):
    m = re.search(r"<think>(.*?)</think>", answer, re.DOTALL)
    if not m:
        return 0.6, 0.6
    thinking = m.group(1).strip()
    n_q = len(re.findall(r">\s*\d+\.\s*(.*?)\n", thinking))
    n_para = len(re.split(r"\n\n+", thinking))
    n_info = len(
        re.findall(r"\*\*Final Information\*\*(.*?)(?=\n\n|\Z)", thinking, re.DOTALL)
    )
    coherence = min(
        1.0, 0.6 + 0.1 * min(3, n_q) + (0.1 if n_para > 3 else 0.0)
    )
    depth = (
        0.6
        + min(0.2, 0.05 * n_q)
        + min(0.1, 0.02 * n_para)
        + min(0.1, 0.05 * n_info)
    )
    return coherence, depth


def test_reasoning_scores_match_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import reasoning_scores

    df = spark.createDataFrame(RS_SAMPLES, "sample_id string, system_answer string")
    got = {r["sample_id"]: r for r in reasoning_scores(df).collect()}
    for sid, ans in RS_SAMPLES:
        c, d = _py_reasoning(ans)
        assert got[sid]["coherence_x10000"] == _x10000(c), sid
        assert got[sid]["depth_x10000"] == _x10000(d), sid
    assert got["t1"]["coherence_x10000"] == 6000
    assert got["t2"]["n_info"] == 1


def test_subgraph_quality_matches_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import subgraph_quality

    samples = spark.createDataFrame(
        SQ_SAMPLES, "sample_id string, agent_type string, entity_ids array<string>"
    )
    rels = spark.createDataFrame(
        SQ_RELS, "sample_id string, subj string, pred string, obj string"
    )
    got = {
        r["sample_id"]: r["score_x10000"]
        for r in subgraph_quality(samples, rels).collect()
    }
    for sid, at, en in SQ_SAMPLES:
        srels = [(s, p, o) for x, s, p, o in SQ_RELS if x == sid]
        assert got[sid] == _x10000(_py_subgraph_quality(at, en, srels)), sid
    assert got["s4"] == 3000


# ---------------------------------------------------------------------------
# retrieval_utilization / chunk_utilization / relationship_utilization /
# iterative_improvement / kg_utilization — vs pure-Python transcriptions
# of the reference rule paths (retrieval_metrics.py:174-560,
# graph_metrics.py:1302-1699, deep_search_metrics.py:335-680).
# ---------------------------------------------------------------------------

RU_SAMPLES = [
    ("u1", ["acme corp office", "sony hq"], ["acme corp", "sony"]),
    ("u2", ["entity e-42 record", "other"], ["id-42"]),  # number path
    ("u3", ["longword context here"], ["missing longword token"]),  # partial 0.4
    ("u4", ["aaa bbb"], ["zzz yyy xxx"]),  # short tokens only -> 0.3
    ("u5", [], ["x"]),
    ("u6", ["x"], []),
]


def _py_retr_utilization(retrieved, referenced):
    retr = [s.lower() for s in retrieved]
    ref = [s.lower() for s in referenced]
    if not retr or not ref:
        return 0.3
    direct = sum(1 for r in ref if any(r in t for t in retr))
    nums = 0
    for r in ref:
        m = re.search(r"\d+", r)
        if m and any(m.group() in t for t in retr):
            nums += 1
    matched = max(direct, nums)
    if matched > 0:
        return max(0.3, 0.3 + 0.7 * matched / len(ref))
    combined = " ".join(retr)
    for r in ref:
        if any(tok in combined for tok in r.split() if len(tok) > 3):
            return 0.4
    return 0.3


def test_retrieval_utilization_matches_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import (
        retrieval_utilization_scores,
    )

    df = spark.createDataFrame(
        RU_SAMPLES,
        "sample_id string, retrieved array<string>, referenced array<string>",
    )
    got = {
        r["sample_id"]: r["score_x10000"]
        for r in retrieval_utilization_scores(df).collect()
    }
    for sid, retr, ref in RU_SAMPLES:
        assert got[sid] == _x10000(_py_retr_utilization(retr, ref)), sid
    assert got["u3"] == 4000
    assert got["u4"] == 3000


CHUNKS = [
    ("c1", "alpha beta gamma deltaword epsilon"),
    ("c2", "totally unrelated phrases nothing shared"),
    ("c3", ""),
]
CU_SAMPLES = [
    # full overlap with c1's >=4-char phrases
    ("k1", "alpha beta gamma deltaword epsilon appear here", ["c1"]),
    # half overlap + one empty-text chunk (skipped from denominator)
    ("k2", "alpha beta unrelated", ["c1", "c2", "c3"]),
    ("k3", "answer with no referenced chunks", []),
    ("k4", "only missing ids", ["nope"]),
    # thinking block stripped before matching
    ("k5", "<think>alpha beta gamma deltaword epsilon</think>none", ["c1"]),
]


def _py_chunk_util(answer, chunk_ids):
    texts = dict(CHUNKS)
    a = re.sub(
        r"###\s*引用数据[\s\S]*?\{\s*['\"]data['\"][\s\S]*?\}\s*", "", answer
    )
    if a == answer:
        a = re.sub(
            r"#### 引用数据[\s\S]*?\{\s*['\"]data['\"][\s\S]*?\}\s*", "", answer
        )
    a = a.rstrip()
    a = re.sub(r"<think>[\s\S]*?</think>\s*", "", a)
    a = re.sub(r"\n{3,}", "\n\n", a).strip().lower()
    if not chunk_ids:
        return 0.3
    total, n = 0.0, 0
    for cid in chunk_ids:
        text = texts.get(cid, "")
        if not text:
            continue
        n += 1
        phrases = set(re.findall(r"[a-z0-9_一-鿿]{4,}", text.lower()))
        if phrases:
            total += sum(1 for p in phrases if p in a) / len(phrases)
    return total / n if n else 0.3


def test_chunk_utilization_matches_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import (
        chunk_utilization_scores,
    )

    samples = spark.createDataFrame(
        CU_SAMPLES,
        "sample_id string, system_answer string, chunk_ids array<string>",
    )
    chunks = spark.createDataFrame(CHUNKS, "chunk_id string, text string")
    got = {
        r["sample_id"]: r["score_x10000"]
        for r in chunk_utilization_scores(samples, chunks).collect()
    }
    for sid, ans, ids in CU_SAMPLES:
        assert got[sid] == _x10000(_py_chunk_util(ans, ids)), sid
    assert got["k1"] == 10000
    assert got["k5"] == 0  # think block stripped before matching → 0/5 phrases


REL_SAMPLES = [
    ("v1", ["123"], ["Acme Corp", "Sony"]),  # numeric id -> full blend
    ("v2", ["rel-abc", "rel-def"], ["Acme Corp"]),  # id-based 0.34
    ("v3", [], ["Acme Corp", "Sony"]),  # implicit path branch
    ("v4", [], []),  # base 0.3
    ("v5", ["7"], []),  # blend with zero relevance
]


def _py_rel_utilization(rel_ids, entity_ids):
    rels = sorted(TRIPLES)[:50]
    if not rel_ids and not entity_ids:
        return 0.3
    fetched = any(re.fullmatch(r"-?\d+", r) for r in rel_ids) and rels
    if not fetched and rel_ids:
        return min(0.4, 0.3 + 0.02 * len(rel_ids))
    if not fetched:
        n = len(entity_ids)
        potential = n * (n - 1) / 2
        paths = _py_paths(entity_ids)
        implicit = (
            min(1.0, 1.2 * min(1.0, paths / potential)) if potential > 0 else 0.0
        )
        return 0.3 + 0.4 * implicit
    quantity = min(1.0, 0.1 * len(rels))
    desc = sum(1 for s, p, o, d in rels if (d and d.strip()) or (p and p.strip()))
    types = {p for s, p, o, d in rels if p and p.strip()}
    valid = sum(
        1 for s, p, o, d in rels if s and s != "unknown" and o and o != "unknown"
    )
    quality = (
        0.4 * desc / len(rels)
        + 0.3 * min(1.0, len(types) / 5)
        + 0.3 * valid / len(rels)
    )
    rel_entities = {s for s, p, o, d in rels} | {o for s, p, o, d in rels}
    ent_set = set(entity_ids)
    relevance = (
        min(1.0, 1.2 * len(rel_entities & ent_set) / len(ent_set))
        if ent_set
        else 0.0
    )
    return min(
        1.0, 0.3 + 0.7 * (0.3 * quantity + 0.4 * quality + 0.3 * relevance)
    )


def test_relationship_utilization_matches_formula(dfs):
    from graph_rag_agent_spark.operators.evaluator import (
        relationship_utilization_scores,
    )

    _, triples, _ = dfs
    samples = triples.sparkSession.createDataFrame(
        REL_SAMPLES,
        "sample_id string, rel_ids array<string>, entity_ids array<string>",
    )
    got = {
        r["sample_id"]: r["score_x10000"]
        for r in relationship_utilization_scores(samples, triples).collect()
    }
    for sid, rids, eids in REL_SAMPLES:
        assert got[sid] == _x10000(_py_rel_utilization(rids, eids)), sid
    assert got["v4"] == 3000
    assert got["v2"] == 3400


DS_SAMPLES = [
    ("d1", "<think>> 1. first query\n> 2. refined query\ntext</think>answer"),
    ("d2", "plain answer, no thinking"),
    ("d3", "<think>no numbered queries here</think>done"),
    (
        "d4",
        "<think>> 1. a\n> 2. b\n> 3. c\n> 4. d\n</think>核心相关实体: Acme\n相关知识社区: C7\n",
    ),
    ("d5", "答案提到实体 and entity relations 关系 here"),
]


def _py_iter_improvement(answer):
    m = re.search(r"<think>(.*?)</think>", answer, re.DOTALL)
    if not m:
        return 0.5
    thinking = m.group(1).strip()
    n = len(re.findall(r">\s*(\d+)\.\s*(.*?)\n", thinking))
    score = 0.5
    if n >= 1:
        score += min(0.3, 0.1 * n)
    return score


def _py_kg_utilization(answer):
    m = re.search(r"<think>(.*?)</think>", answer, re.DOTALL)
    has_e = bool(re.search(r"核心相关实体[：:]", answer, re.IGNORECASE))
    has_c = bool(re.search(r"相关知识社区[：:]", answer, re.IGNORECASE))
    bonus = (0.25 if has_e else 0.0) + (0.25 if has_c else 0.0)
    if m and m.group(1).strip():
        n = len(re.findall(r"知识图谱|实体|关系|社区", m.group(1).strip(), re.IGNORECASE))
        return 0.2 + min(0.3, 0.03 * n) + bonus
    n = len(re.findall(r"实体|entity", answer, re.IGNORECASE)) + len(
        re.findall(r"关系|relation", answer, re.IGNORECASE)
    )
    return 0.2 + bonus + min(0.3, 0.05 * n)


def test_deep_search_utilization_matches_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import (
        iterative_improvement_scores,
        kg_utilization_scores,
    )

    df = spark.createDataFrame(DS_SAMPLES, "sample_id string, system_answer string")
    it = {
        r["sample_id"]: r["score_x10000"]
        for r in iterative_improvement_scores(df).collect()
    }
    kg = {
        r["sample_id"]: r["score_x10000"]
        for r in kg_utilization_scores(df).collect()
    }
    for sid, ans in DS_SAMPLES:
        assert it[sid] == _x10000(_py_iter_improvement(ans)), sid
        assert kg[sid] == _x10000(_py_kg_utilization(ans)), sid
    assert it["d1"] == 7000
    assert it["d2"] == 5000
    assert kg["d4"] > kg["d3"]


def test_retrieval_latency_passthrough(spark):
    from graph_rag_agent_spark.operators.evaluator import (
        retrieval_latency_scores,
    )

    df = spark.createDataFrame(
        [("s1", 0.25), ("s2", 1.5)], "sample_id string, retrieval_time double"
    )
    got = {
        r["sample_id"]: r["latency_x10000"]
        for r in retrieval_latency_scores(df).collect()
    }
    assert got == {"s1": 2500, "s2": 15000}


def _py_llm_judge(question: str, answer: str) -> dict:
    """Pure-Python transcription of the llm_metrics feature extraction
    (reference llm_metrics.py:52-57,164-172,471-482) + the stub-judge
    rubric, for oracle equality against llm_judge_scores."""
    cleaned = re.sub(
        r"#{1,4}\s*引用数据[\s\S]*?(\{[\s\S]*?\})\s*$", "", answer
    ).rstrip()
    n_para = len(answer.split("\n\n"))
    hdr = 1 if re.search(r"#{1,3}\s+[A-Za-z0-9_]", answer) else 0
    n_sent = len(re.findall(r"[.!?。！？]\s*", answer))
    facts = []
    for line in answer.split("\n"):
        if line.strip() and not line.startswith("#"):
            stripped = line.strip("- *")
            if len(stripped) > 10:
                facts.append(stripped)
    n_facts = len(facts)
    q_toks = list(dict.fromkeys(t for t in question.lower().split(" ") if len(t) >= 4))
    low_clean = cleaned.lower()
    matched = sum(1 for t in q_toks if t in low_clean)
    coherence = min(
        10000,
        5000 + 2000 * hdr + (1500 if n_para >= 3 else 0) + (1500 if n_sent >= 5 else 0),
    )
    consistency = min(10000, 6000 + 500 * min(n_facts, 8))
    comp = min(10000, 5000 + min(3000, len(answer) * 5) + 1000 * hdr)
    rel = 3000 + int(matched * 7000 // len(q_toks)) if q_toks else 5000
    emp = min(10000, 4000 + 500 * min(n_sent, 10) + 1000 * hdr)
    direct = max(2000, 10000 - min(8000, len(cleaned) * 2))
    total = (30 * comp + 25 * rel + 25 * emp + 20 * direct) // 100
    return dict(
        n_paragraphs=n_para,
        has_headers=hdr,
        n_sentences=n_sent,
        n_key_facts=n_facts,
        coherence_x10000=coherence,
        consistency_x10000=consistency,
        comprehensiveness_x10000=comp,
        relativeness_x10000=rel,
        empowerment_x10000=emp,
        directness_x10000=direct,
        llm_total_x10000=total,
    )


def test_llm_judge_scores_match_formula(spark):
    from graph_rag_agent_spark.operators.evaluator import llm_judge_scores

    long_body = "word " * 300  # saturates the comprehensiveness bonus
    cases = [
        # structured answer: headers, paragraphs, sentences, bullets
        (
            "s1",
            "what does acme corporation manufacture today?",
            "### Summary\n\nacme corporation builds widgets. It ships "
            "them worldwide! Really? Yes. Indeed.\n\n- a bullet fact "
            "about acme corporation\n* starred fact line number two\n"
            "short\nplain unbulleted fact line here",
        ),
        # trailing reference block must be cleaned before directness
        (
            "s2",
            "question words only here?",
            "plain answer body with enough length to count as a fact"
            "\n\n### 引用数据\n{'data': [1, 2]}",
        ),
        # no >=4-char question tokens → relativeness default branch
        ("s3", "a of to?", "tiny"),
        # empty-ish answer: no facts, no sentences, one paragraph
        ("s4", "anything relevant at all", " "),
        # mega answer: directness floor, comprehensiveness cap
        ("s5", "find the word needle here", long_body + "needle"),
    ]
    df = spark.createDataFrame(
        cases, "sample_id string, question string, system_answer string"
    )
    got = {r["sample_id"]: r.asDict() for r in llm_judge_scores(df).collect()}
    assert set(got) == {c[0] for c in cases}
    for sid, q, a in cases:
        want = _py_llm_judge(q, a)
        row = got[sid]
        for k, v in want.items():
            assert row[k] == v, f"{sid}.{k}: spark={row[k]} py={v}"


def test_grouped_path_counts_equal_global(dfs):
    """referenced_path_counts_grouped (per-sample neighborhood DFS)
    must count exactly what the corpus-global walk joins count."""
    from graph_rag_agent_spark.operators.evaluator import (
        referenced_path_counts,
        referenced_path_counts_grouped,
    )

    _, triples, _ = dfs
    se = [(s, e) for s, q, ids in SAMPLES for e in ids]
    sample_entities = triples.sparkSession.createDataFrame(
        se or [("s0", "none")], "sample_id string, entity_id string"
    )
    want = {
        (r["sample_id"], r["path_count"])
        for r in referenced_path_counts(sample_entities, triples).collect()
    }
    got = {
        (r["sample_id"], r["path_count"])
        for r in referenced_path_counts_grouped(
            sample_entities, triples
        ).collect()
    }
    assert got == want


def test_path_counts_dedupe_duplicate_ids(dfs):
    """Cypher ``IN $ids`` set semantics: a duplicated sample id must
    not multiply matched paths, in EITHER variant — the global joins
    dedupe the id frame for exactly this reason."""
    from graph_rag_agent_spark.operators.evaluator import (
        referenced_path_counts,
        referenced_path_counts_grouped,
    )

    _, triples, _ = dfs
    spark = triples.sparkSession
    base = [("sdup", e) for s, q, ids in SAMPLES[:1] for e in ids]
    dup = spark.createDataFrame(
        base + base, "sample_id string, entity_id string"
    )
    nodup = spark.createDataFrame(
        base, "sample_id string, entity_id string"
    )
    ref = {
        (r["sample_id"], r["path_count"])
        for r in referenced_path_counts(nodup, triples).collect()
    }
    assert ref == {
        (r["sample_id"], r["path_count"])
        for r in referenced_path_counts(dup, triples).collect()
    }
    assert ref == {
        (r["sample_id"], r["path_count"])
        for r in referenced_path_counts_grouped(dup, triples).collect()
    }


def test_graph_coverage_per_sample_equals_global(dfs):
    from graph_rag_agent_spark.operators.evaluator import (
        graph_coverage,
        graph_coverage_per_sample,
    )

    entities, triples, samples = dfs
    want = {tuple(r) for r in graph_coverage(samples, entities, triples).collect()}
    got = {
        tuple(r)
        for r in graph_coverage_per_sample(samples, entities, triples).collect()
    }
    assert got == want
