"""Pure-Python end-to-end reference implementation (the P/R oracle).

Single-threaded composition of the core semantics modules — the same
functions the Spark operators wrap — mirroring the reference's
build/main.py lifecycle (SURVEY.md §3.1):

    transcripts → per-conv text → chunk → extract → parse →
    entities/triples/mentions → embed → KNN → WCC → lev<3 candidates →
    judge+union → canonical map → rewrite/dedup → leveled LPA →
    community catalog + summaries.

pytest compares every Spark table against these (triple-level
P/R ≥ 0.95 is the north-rule gate; deterministic fixtures target 1.0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..core.hashing import sha1_hex
from ..core.linkage import (
    duplicate_candidate_groups,
    knn_pairs,
    resolve_canonical_map,
    wcc_ids,
)
from ..core.lpa import communities_array, detect_hierarchy
from ..core.records import parse_extraction
from ..core.stub_embed import embed_entity
from ..core.stub_extract import stub_extract
from ..core.stub_summary import prepare_string, stub_summarize
from ..core.textchunk import chunk_text, conversation_text


@dataclass
class OracleResult:
    chunks: list[dict] = field(default_factory=list)
    extractions: list[dict] = field(default_factory=list)
    entities_raw: list[dict] = field(default_factory=list)
    triples_raw: list[dict] = field(default_factory=list)
    mentions_raw: list[dict] = field(default_factory=list)
    entities: list[dict] = field(default_factory=list)  # post-link catalog
    similar: list[dict] = field(default_factory=list)
    canonical_map: dict[str, str] = field(default_factory=dict)
    triples: list[dict] = field(default_factory=list)  # canonical + deduped
    mentions: list[dict] = field(default_factory=list)
    membership: list[dict] = field(default_factory=list)
    hierarchy: list[dict] = field(default_factory=list)
    communities: list[dict] = field(default_factory=list)

    def triple_set(self) -> set[tuple[str, str, str]]:
        return {(t["subj"], t["pred"], t["obj"]) for t in self.triples}

    def raw_triple_set(self) -> set[tuple[str, str, str]]:
        return {(t["subj"], t["pred"], t["obj"]) for t in self.triples_raw}


def _chunk_conversations(transcripts: list[dict]) -> list[dict]:
    by_conv: dict[str, list[dict]] = {}
    for row in transcripts:
        by_conv.setdefault(row["conv_id"], []).append(row)

    chunks: list[dict] = []
    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
        text = conversation_text([t["text"] for t in turns])
        offset = 0
        for i, ch in enumerate(chunk_text(text)):
            # content_offset accumulates FULL previous chunk lengths,
            # overlap double-counted — reference struct_builder.py:86-88.
            chunks.append(
                {
                    "chunk_id": sha1_hex(ch["text"]),
                    "conv_id": conv_id,
                    "seg_id": ch["seg_id"],
                    "text": ch["text"],
                    "position": i + 1,
                    "length": len(ch["text"]),
                    "content_offset": offset,
                    "tokens": ch["tokens"],
                    "token_start": ch["token_start"],
                    "token_end": ch["token_end"],
                }
            )
            offset += len(ch["text"])
    return chunks


def oracle_build(transcripts: list[dict], max_levels: int = 3) -> OracleResult:
    res = OracleResult()
    res.chunks = _chunk_conversations(transcripts)

    # extract + parse (graph_writer.py:36-131 semantics)
    first_entity: dict[str, dict] = {}
    for ch in res.chunks:
        result = stub_extract(ch["text"])
        res.extractions.append(
            {"chunk_id": ch["chunk_id"], "conv_id": ch["conv_id"], "result": result}
        )
        nodes, rels = parse_extraction(result)
        for eid, etype, desc in nodes:
            row = {
                "chunk_id": ch["chunk_id"],
                "conv_id": ch["conv_id"],
                "entity_id": eid,
                "entity_type": etype,
                "description": desc,
            }
            res.entities_raw.append(row)
            res.mentions_raw.append(
                {"chunk_id": ch["chunk_id"], "conv_id": ch["conv_id"], "entity_id": eid}
            )
            if eid not in first_entity:
                first_entity[eid] = row
        for src, tgt, rtype, desc, weight in rels:
            res.triples_raw.append(
                {
                    "chunk_id": ch["chunk_id"],
                    "conv_id": ch["conv_id"],
                    "subj": src,
                    "pred": rtype,
                    "obj": tgt,
                    "description": desc,
                    "weight": weight,
                }
            )

    # linking
    embeddings = {
        eid: embed_entity(eid, row["description"]) for eid, row in first_entity.items()
    }
    similar = knn_pairs(embeddings)
    res.similar = [{"src": s, "dst": d, "score": sc} for s, d, sc in similar]
    wcc = wcc_ids(sorted(first_entity), [(s, d) for s, d, _ in similar])
    groups = duplicate_candidate_groups(sorted(first_entity), wcc)
    res.canonical_map = resolve_canonical_map(groups)

    def canon(eid: str) -> str:
        return res.canonical_map.get(eid, eid)

    # canonical entity catalog — survivor's props win ('discard',
    # entity_merger.py:348-360)
    seen_canon: set[str] = set()
    for eid in sorted(first_entity):
        c = canon(eid)
        if c in seen_canon:
            continue
        seen_canon.add(c)
        src = first_entity[c] if c in first_entity else first_entity[eid]
        res.entities.append(
            {
                "entity_id": c,
                "entity_type": src["entity_type"],
                "description": src["description"],
                "wcc": wcc.get(c, wcc.get(eid)),
            }
        )

    # rewrite + dedup triples: keep first by (description, weight,
    # conv_id, chunk_id) per (subj,pred,obj) — entity_merger.py:418-429
    # with a deterministic pin for "first" (properties-first so the
    # surviving description/weight is a pure function of the key).
    best: dict[tuple[str, str, str], dict] = {}
    for t in res.triples_raw:
        key = (canon(t["subj"]), t["pred"], canon(t["obj"]))
        cand = dict(t, subj=key[0], obj=key[2])
        prev = best.get(key)
        rank = (cand["description"], cand["weight"], cand["conv_id"], cand["chunk_id"])
        if prev is None or rank < (
            prev["description"],
            prev["weight"],
            prev["conv_id"],
            prev["chunk_id"],
        ):
            best[key] = cand
    res.triples = [best[k] for k in sorted(best)]

    seen_m: set[tuple[str, str]] = set()
    for m in res.mentions_raw:
        key = (m["chunk_id"], canon(m["entity_id"]))
        if key not in seen_m:
            seen_m.add(key)
            res.mentions.append(
                {"chunk_id": m["chunk_id"], "conv_id": m["conv_id"], "entity_id": key[1]}
            )

    # communities: undirected weight=COUNT projection (projections.py:24-34)
    pair_count: dict[tuple[str, str], float] = {}
    for t in res.triples:
        if t["subj"] == t["obj"]:
            continue
        key = (min(t["subj"], t["obj"]), max(t["subj"], t["obj"]))
        pair_count[key] = pair_count.get(key, 0.0) + 1.0
    nodes = sorted(e["entity_id"] for e in res.entities)
    edges = [(a, b, w) for (a, b), w in sorted(pair_count.items())]
    levels = detect_hierarchy(nodes, edges, max_levels)

    for node in nodes:
        arr = communities_array(levels, node)
        for level, num in enumerate(arr):
            res.membership.append(
                {"entity_id": node, "community_id": f"{level}-{num}", "level": level}
            )
        for level in range(1, len(arr)):
            res.hierarchy.append(
                {
                    "child_community": f"{level - 1}-{arr[level - 1]}",
                    "parent_community": f"{level}-{arr[level]}",
                }
            )
    res.hierarchy = [dict(t) for t in {tuple(h.items()) for h in res.hierarchy}]
    res.hierarchy.sort(key=lambda h: (h["child_community"], h["parent_community"]))

    # community catalog: rank = countDistinct chunks over transitive
    # members (summary/base.py:59-64, IN_COMMUNITY*), stub summaries.
    entity_info = {e["entity_id"]: e for e in res.entities}
    chunks_by_entity: dict[str, set[str]] = {}
    for m in res.mentions:
        chunks_by_entity.setdefault(m["entity_id"], set()).add(m["chunk_id"])

    by_comm: dict[tuple[int, int], list[str]] = {}
    for level, lvl_map in enumerate(levels):
        for node, num in lvl_map.items():
            by_comm.setdefault((level, num), []).append(node)

    for (level, num), members in sorted(by_comm.items()):
        cid = f"{level}-{num}"
        members = sorted(set(members))
        chunk_ids: set[str] = set()
        for mmb in members:
            chunk_ids |= chunks_by_entity.get(mmb, set())
        node_dicts = [
            {
                "id": m,
                "type": entity_info[m]["entity_type"],
                "description": entity_info[m]["description"],
            }
            for m in members
        ]
        member_set = set(members)
        rel_dicts = [
            {
                "start": t["subj"],
                "end": t["obj"],
                "type": t["pred"],
                "description": t["description"],
            }
            for t in res.triples
            if t["subj"] in member_set and t["obj"] in member_set and t["subj"] != t["obj"]
        ]
        res.communities.append(
            {
                "community_id": cid,
                "level": level,
                "community_rank": len(chunk_ids),
                "weight": len(members),
                "summary": stub_summarize(cid, node_dicts, rel_dicts),
                "full_content": prepare_string(node_dicts, rel_dicts),
            }
        )
    return res


def precision_recall(
    ours: set[tuple[str, str, str]], reference: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not ours and not reference:
        return 1.0, 1.0
    tp = len(ours & reference)
    precision = tp / len(ours) if ours else 0.0
    recall = tp / len(reference) if reference else 0.0
    return precision, recall
