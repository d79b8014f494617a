"""Hostile-input robustness at the Spark pipeline surface.

The reference build crashes are the user-visible failure mode of a
corpus cleaner (document_processor handles encodings/garbage before
chunking); at 100 TB every pathological row shape WILL occur, so the
operators must pass them through without a task failure: NULL text,
empty text, whitespace, control characters, unicode soup, text with
no sentence delimiters and no vocabulary mentions. Assertions:
the chunker yields a chunk stream without error, the extractor finds
exactly the planted mentions and nothing in the garbage, and the
per-turn text-equality invariant (north rule) holds for the
well-formed conversation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark import schemas
from graph_rag_agent_spark.operators.chunking import chunk_conversations
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.parsing import (
    entities_raw,
    parse_extractions,
)

TS = dt.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def hostile_df(spark):
    rows = [
        # well-formed conversation with one planted pattern mention
        ("conv-ok", 0, "user", "please check EMP-00042 status today.", None, TS),
        ("conv-ok", 1, "assistant", "EMP-00042 looks healthy. done.", None, TS),
        # NULL text
        ("conv-null", 0, "user", None, None, TS),
        # empty and whitespace-only text
        ("conv-empty", 0, "user", "", None, TS),
        ("conv-empty", 1, "assistant", "   \t  ", None, TS),
        # control characters + unicode soup, no sentence delimiters
        ("conv-ctrl", 0, "user", "\x00\x01\x02garbled\x7f", None, TS),
        ("conv-ctrl", 1, "assistant", "�￾中文🙂​ text", None, TS),
        # long no-vocab no-punctuation word soup
        ("conv-soup", 0, "user", "lorem ipsum dolor " * 200, None, TS),
    ]
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)


def test_chunker_survives_hostile_rows(hostile_df):
    chunks = chunk_conversations(hostile_df)
    got = chunks.collect()  # must not raise
    by_conv = {r["conv_id"] for r in got}
    # well-formed + soup conversations produce chunks; degenerate ones
    # may legitimately produce none, but must not crash the job
    assert "conv-ok" in by_conv
    assert "conv-soup" in by_conv
    assert all(r["chunk_id"] for r in got)


def test_extractor_finds_only_planted_mentions(hostile_df):
    chunks = chunk_conversations(hostile_df)
    parsed = parse_extractions(extract_chunks(chunks))
    ents = entities_raw(parsed).collect()
    ids = {r["entity_id"] for r in ents}
    assert "EMP-00042" in ids
    # nothing extracted from garbage/soup conversations
    soup_chunks = {
        r["chunk_id"]
        for r in chunks.where(F.col("conv_id") != "conv-ok").collect()
    }
    hostile_hits = parsed.where(F.col("chunk_id").isin(list(soup_chunks)))
    assert hostile_hits.where(F.col("kind") == "entity").count() == 0


def test_per_turn_text_equality_invariant_on_wellformed(hostile_df):
    """North-rule row invariant: the chunk stream reassembles each
    well-formed turn's text verbatim under stable turn ordering."""
    chunks = chunk_conversations(
        hostile_df.where(F.col("conv_id") == "conv-ok")
    )
    joined = "\n".join(
        r["text"] for r in chunks.orderBy("position").collect()
    )
    for turn in [
        "please check EMP-00042 status today.",
        "EMP-00042 looks healthy. done.",
    ]:
        assert turn in joined
