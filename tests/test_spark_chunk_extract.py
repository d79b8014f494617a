"""Spark chunk → extract → parse slice vs the pure-Python oracle,
plus the per-turn text-equality invariant (BASELINE.json row-level
invariant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.core.textchunk import tokenize
from graph_rag_agent_spark.operators.chunking import chunk_conversations
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.parsing import (
    entities_raw,
    mentions_raw,
    parse_extractions,
    triples_raw,
)
from graph_rag_agent_spark.oracle.pipeline_oracle import precision_recall
from graph_rag_agent_spark.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def chunks_df(transcripts_df):
    return chunk_conversations(transcripts_df).cache()


@pytest.fixture(scope="module")
def parsed_df(chunks_df):
    return parse_extractions(extract_chunks(chunks_df)).cache()


def test_distributed_generator_matches_oracle(spark, small_corpus):
    df = synthesize_transcripts(spark, 12, partitions=6)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in df.collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in small_corpus
    }
    assert got == want


def test_chunks_match_oracle(chunks_df, oracle_small):
    got = {
        r["chunk_id"]: (
            r["conv_id"],
            r["position"],
            r["text"],
            r["length"],
            r["content_offset"],
            r["tokens"],
        )
        for r in chunks_df.collect()
    }
    want = {
        c["chunk_id"]: (
            c["conv_id"],
            c["position"],
            c["text"],
            c["length"],
            c["content_offset"],
            c["tokens"],
        )
        for c in oracle_small.chunks
    }
    assert got == want


def test_chunk_chain_columns(chunks_df):
    rows = sorted(
        chunks_df.select(
            "conv_id", "position", "chunk_id", "previous_chunk_id", "first_chunk"
        ).collect(),
        key=lambda r: (r["conv_id"], r["position"]),
    )
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv_rows in by_conv.values():
        assert conv_rows[0]["first_chunk"] is True
        # first chunk points at itself (struct_builder.py:84)
        assert conv_rows[0]["previous_chunk_id"] == conv_rows[0]["chunk_id"]
        for prev, cur in zip(conv_rows, conv_rows[1:]):
            assert cur["previous_chunk_id"] == prev["chunk_id"]
            assert cur["first_chunk"] is False


def test_per_turn_text_equality_invariant(chunks_df, small_corpus):
    """Reconstruct each conversation from its chunks (de-overlapped by
    token spans) and verify every turn's text survives bit-exact under
    stable (conv_id, turn_idx) ordering."""
    chunks = sorted(
        chunks_df.collect(), key=lambda r: (r["conv_id"], r["seg_id"], r["position"])
    )
    by_conv: dict[str, list] = {}
    for r in chunks:
        by_conv.setdefault(r["conv_id"], []).append(r)

    want_turns: dict[str, list[str]] = {}
    for row in sorted(small_corpus, key=lambda r: (r["conv_id"], r["turn_idx"])):
        want_turns.setdefault(row["conv_id"], []).append(row["text"])

    for conv_id, conv_chunks in by_conv.items():
        pieces: list[str] = []
        for seg_id in sorted({c["seg_id"] for c in conv_chunks}):
            seg_chunks = [c for c in conv_chunks if c["seg_id"] == seg_id]
            covered = 0
            for ch in seg_chunks:
                toks = tokenize(ch["text"])
                start, end = ch["token_start"], ch["token_end"]
                skip = max(0, covered - start)
                pieces.append("".join(toks[skip:]))
                covered = max(covered, end)
        rebuilt = "".join(pieces)
        assert rebuilt.split("\n\n") == want_turns[conv_id], conv_id


def test_extraction_cache_antijoin(spark, chunks_df):
    full = extract_chunks(chunks_df).cache()
    # feed half the results back as cache with a sentinel: hits must
    # NOT re-run the extractor
    half = full.limit(full.count() // 2).withColumn(
        "result", F.concat(F.lit("CACHED::"), "result")
    )
    rerun = extract_chunks(chunks_df, cache=half)
    cached_ids = {r["chunk_id"] for r in half.collect()}
    for r in rerun.collect():
        if r["chunk_id"] in cached_ids:
            assert r["result"].startswith("CACHED::")
        else:
            assert not r["result"].startswith("CACHED::")


def test_raw_triples_pr_gate(parsed_df, oracle_small):
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in triples_raw(parsed_df).collect()
    }
    want = oracle_small.raw_triple_set()
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0  # deterministic fixtures target exact


def test_entities_and_mentions_match_oracle(parsed_df, oracle_small):
    got_e = {
        (r["chunk_id"], r["entity_id"], r["entity_type"], r["description"])
        for r in entities_raw(parsed_df).collect()
    }
    want_e = {
        (e["chunk_id"], e["entity_id"], e["entity_type"], e["description"])
        for e in oracle_small.entities_raw
    }
    assert got_e == want_e

    got_m = {(r["chunk_id"], r["entity_id"]) for r in mentions_raw(parsed_df).collect()}
    want_m = {(m["chunk_id"], m["entity_id"]) for m in oracle_small.mentions_raw}
    assert got_m == want_m


def test_extraction_stays_parallel_on_tiny_batches(spark):
    """The extraction boundary must be sized by ROWS, not bytes: AQE's
    byte-based coalescing in Spark 4.1 collapses an explicit hash
    repartition(n, col) to ONE task on a small batch, which would
    serialize a seconds-per-chunk LLM extractor (the incremental
    cycle's steady state). The round-robin spread must keep multiple
    workers busy even when the batch is a few KB."""
    import os
    import time

    from graph_rag_agent_spark.operators.chunking import chunk_conversations
    from graph_rag_agent_spark.operators.extraction import extract_chunks
    from graph_rag_agent_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    chunks = chunk_conversations(
        synthesize_transcripts(spark, 40).localCheckpoint()
    ).localCheckpoint()
    n_chunks = chunks.select("chunk_id").distinct().count()
    assert n_chunks >= 30

    def pid_extract(text: str) -> str:
        time.sleep(0.1)  # simulate a latency-bound model call
        return f"pid={os.getpid()}"

    t0 = time.time()
    rows = extract_chunks(chunks, extractor=pid_extract).collect()
    wall = time.time() - t0
    pids = {r["result"] for r in rows}
    # serialized execution costs ≥ n_chunks × 0.1 s on one worker,
    # strictly more than the bound here even on a loaded box — the
    # pid assertion is the primary guard, the wall bound is set at
    # the pure-serial floor to stay flake-free under co-tenant load
    assert len(pids) > 1, "extraction ran on a single Python worker"
    assert wall < n_chunks * 0.1, (
        f"extraction looks serialized: {wall:.1f}s for {n_chunks} chunks"
    )
