"""Query-side retrieval (J8/W6/L6/L7) + batched extraction mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.core.records import BATCH_SEPARATOR, parse_extraction
from graph_rag_agent_spark.core.stub_extract import stub_extract, stub_extract_batch
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.parsing import parse_extractions, triples_raw
from graph_rag_agent_spark.operators.chunking import chunk_conversations
from graph_rag_agent_spark.plans.inmem import build_kg_tables


@pytest.fixture(scope="module")
def kg(transcripts_df):
    return build_kg_tables(transcripts_df, with_communities=True)


def test_batch_stub_roundtrip():
    texts = ["Sony works with Alice Zhang.", "华东大学与张伟有合作。", "no entities"]
    response = stub_extract_batch(BATCH_SEPARATOR.join(texts))
    parts = response.split(BATCH_SEPARATOR)
    # either well-formed (3 sections) or simulated miscount (2)
    assert len(parts) in (2, 3)


def test_batched_extraction_same_triples(transcripts_df, oracle_small):
    chunks = chunk_conversations(transcripts_df)
    batched = extract_chunks(chunks, batched=True)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in triples_raw(parse_extractions(batched)).collect()
    }
    assert got == oracle_small.raw_triple_set()


def test_local_search_fanout(kg):
    from graph_rag_agent_spark.operators.search import local_search

    out = local_search(
        kg["entities"],
        kg["mentions"],
        kg["triples"],
        kg["membership"],
        kg["communities"],
        kg["chunks"],
        query="Tell me about Sony and Alice Zhang",
    )
    seeds = {r["entity_id"] for r in out["seeds"].collect()}
    assert "Sony" in seeds or "Alice Zhang" in seeds
    chunks = out["chunks"].collect()
    assert 0 < len(chunks) <= 3
    assert all(r["freq"] >= 1 for r in chunks)
    rels = out["inside_rels"].collect()
    assert all(r["subj"] != r["obj"] or True for r in rels)
    # outside rels have exactly one endpoint outside the seed set
    for r in out["outside_rels"].collect():
        assert (r["subj"] in seeds) != (r["obj"] in seeds)


def test_global_search(kg):
    from graph_rag_agent_spark.operators.search import (
        global_search_map,
        global_search_reduce,
    )

    mapped = global_search_map(kg["communities"], "Sony 合作", level=0)
    rows = mapped.collect()
    assert all(r["points"] > 0 for r in rows)
    answer = global_search_reduce(mapped)
    assert isinstance(answer, str) and len(answer) > 10


def test_keyword_extractor_stub():
    from graph_rag_agent_spark.operators.search import extract_query_keywords

    kw = extract_query_keywords("What does Sony Inc produce in Shanghai factories")
    assert "Sony Inc" in kw["low_level"]
    assert "Shanghai" in kw["low_level"]
    assert all(len(t) > 3 for t in kw["high_level"])


def test_local_search_batch_equals_per_query_loop(spark, kg):
    """J8 batched: N queries through ONE plan must reproduce the
    single-query local_search fan-out (same tie-breaks) per query."""
    from graph_rag_agent_spark.operators.search import (
        embed_query_batch,
        local_search,
        local_search_batch,
    )

    qtexts = [
        "Tell me about Sony and Alice Zhang",
        "华东大学与张伟有合作。",
        "What happened in Shanghai",
    ]
    qdf = embed_query_batch(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(qtexts)],
            "query_id int, query_text string",
        )
    ).localCheckpoint()
    batch = local_search_batch(
        qdf,
        kg["entities"],
        mentions=kg["mentions"],
        chunks=kg["chunks"],
        triples=kg["triples"],
        membership=kg["membership"],
        communities=kg["communities"],
    )
    for facet in ("seeds", "chunks", "communities", "inside_rels", "outside_rels"):
        assert facet in batch

    for i, text in enumerate(qtexts):
        single = local_search(
            kg["entities"],
            kg["mentions"],
            kg["triples"],
            kg["membership"],
            kg["communities"],
            kg["chunks"],
            query=text,
        )
        b_seeds = [
            r["entity_id"]
            for r in batch["seeds"]
            .where(F.col("query_id") == i)
            .orderBy("rank")
            .collect()
        ]
        s_seeds = [r["entity_id"] for r in single["seeds"].collect()]
        assert b_seeds == s_seeds

        b_chunks = [
            (r["chunk_id"], r["freq"])
            for r in batch["chunks"]
            .where(F.col("query_id") == i)
            .orderBy("rank")
            .collect()
        ]
        s_chunks = [
            (r["chunk_id"], r["freq"]) for r in single["chunks"].collect()
        ]
        assert b_chunks == s_chunks

        b_comms = {
            r["community_id"]
            for r in batch["communities"]
            .where(F.col("query_id") == i)
            .collect()
        }
        s_comms = {
            r["community_id"] for r in single["communities"].collect()
        }
        assert b_comms == s_comms

        for facet in ("inside_rels", "outside_rels"):
            b_rels = {
                (r["subj"], r["pred"], r["obj"])
                for r in batch[facet].where(F.col("query_id") == i).collect()
            }
            s_rels = {
                (r["subj"], r["pred"], r["obj"])
                for r in single[facet].collect()
            }
            assert b_rels == s_rels
