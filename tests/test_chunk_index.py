"""Chunk embedding + vector index stage (reference build stage 3 —
build/build_chunk_index.py:101-172): stub-embedding parity, top-k
retrieval vs a pure-Python oracle, and local_search integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.core.stub_embed import cosine, embed_text
from graph_rag_agent_spark.operators.chunk_index import (
    chunk_topk,
    top_chunks_for_query,
    with_chunk_embeddings,
)
from graph_rag_agent_spark.operators.chunking import chunk_conversations


@pytest.fixture(scope="module")
def chunks_emb(transcripts_df):
    return with_chunk_embeddings(chunk_conversations(transcripts_df)).cache()


def test_chunk_embeddings_match_stub(chunks_emb):
    rows = chunks_emb.select("text", "embedding").limit(20).collect()
    assert rows
    for r in rows:
        assert r["embedding"] == pytest.approx(embed_text(r["text"]))


def test_chunk_topk_matches_python_oracle(chunks_emb):
    query = "谁在管理 Acme Corp 的合作关系?"
    got = top_chunks_for_query(chunks_emb, query, k=5).collect()
    assert len(got) == 5 and [r["rank"] for r in got] == [1, 2, 3, 4, 5]

    qvec = embed_text(query)
    scored = sorted(
        (
            (-cosine(r["embedding"], qvec), r["chunk_id"])
            for r in chunks_emb.select("chunk_id", "embedding").collect()
        ),
    )[:5]
    assert [r["chunk_id"] for r in got] == [cid for _, cid in scored]
    for r, (neg_score, _) in zip(got, scored):
        assert r["score"] == pytest.approx(-neg_score)


def test_chunk_topk_multi_query_integer_dot(spark):
    # integer vectors stay in exact long arithmetic (metric='dot')
    chunks = spark.createDataFrame(
        [("c1", [1, 0, 2]), ("c2", [3, 1, 0]), ("c3", [0, 5, 1])],
        "chunk_id string, embedding array<long>",
    )
    queries = spark.createDataFrame(
        [("q1", [1, 1, 1]), ("q2", [0, 2, 0])],
        "query_id string, qvec array<long>",
    )
    got = {
        (r["query_id"], r["chunk_id"]): (r["rank"], r["score"])
        for r in chunk_topk(chunks, queries, k=2, metric="dot").collect()
    }
    # q1 dots: c1=3, c2=4, c3=6 → top2 = c3, c2
    assert got[("q1", "c3")] == (1, 6) and got[("q1", "c2")] == (2, 4)
    # q2 dots: c1=0, c2=2, c3=10 → top2 = c3, c2
    assert got[("q2", "c3")] == (1, 10) and got[("q2", "c2")] == (2, 2)


def test_local_search_includes_vector_chunks(transcripts_df):
    from graph_rag_agent_spark.operators.search import local_search
    from graph_rag_agent_spark.plans.inmem import build_kg_tables

    tables = build_kg_tables(
        transcripts_df, with_communities=True, with_chunk_index=True
    )
    out = local_search(
        tables["entities"],
        tables["mentions"],
        tables["triples"],
        tables["membership"],
        tables["communities"],
        tables["chunks"],
        query="Acme Corp 与 Sony 的关系",
    )
    assert "vector_chunks" in out
    rows = out["vector_chunks"].collect()
    assert 0 < len(rows) <= 3
    assert {r["rank"] for r in rows} == set(range(1, len(rows) + 1))


def test_build_all_materializes_chunk_embeddings(spark, transcripts_df, tmp_path):
    from graph_rag_agent_spark.plans.build import BuildConfig, build_all

    cfg = BuildConfig(warehouse=str(tmp_path / "wh"), resume=False, max_levels=1)
    res = build_all(spark, transcripts_df, cfg)
    ce = res.tables["chunk_embeddings"]
    assert ce.columns == ["chunk_id", "embedding"]
    n_chunks = res.tables["chunks"].select("chunk_id").distinct().count()
    assert ce.select("chunk_id").distinct().count() == n_chunks
    row = ce.join(
        res.tables["chunks"].select("chunk_id", "text").dropDuplicates(["chunk_id"]),
        "chunk_id",
    ).first()
    assert row["embedding"] == pytest.approx(embed_text(row["text"]))


def test_chunk_topk_double_query_on_integral_store_is_not_truncated(spark):
    """A double-typed query vector against an integral stored table must
    take the float path, not the int64 fast path — casting 0.75 to int64
    floors it to 0 and silently reorders the top-k."""
    chunks = spark.createDataFrame(
        [("c1", [1, 0, 0]), ("c2", [0, 1, 0])],
        "chunk_id string, embedding array<long>",
    )
    # under int64 truncation this query becomes [0, 0, 0]: every score 0
    # and the id tie-break would rank c1 first; the true dot ranks c2
    queries = spark.createDataFrame(
        [("q1", [0.25, 0.75, 0.0])], "query_id string, qvec array<double>"
    )
    got = {
        r["chunk_id"]: (r["rank"], r["score"])
        for r in chunk_topk(chunks, queries, k=2, metric="dot").collect()
    }
    assert got["c2"][0] == 1 and got["c2"][1] == pytest.approx(0.75)
    assert got["c1"][0] == 2 and got["c1"][1] == pytest.approx(0.25)
