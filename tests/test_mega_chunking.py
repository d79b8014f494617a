"""Distributed mega-conversation segmentation: the unit-explode +
greedy-packing path must produce exactly the segments/chunks the core
spec (conversation_text → chunk_text) produces, without ever
assembling the conversation into one row."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark import schemas
from graph_rag_agent_spark.core.textchunk import chunk_text, conversation_text
from graph_rag_agent_spark.operators.chunking import chunk_conversations

MAXLEN = 2_000  # small cap so the "mega" path triggers on a light fixture


def _mk_turn(conv, idx, text):
    return {
        "conv_id": conv,
        "turn_idx": idx,
        "role": "user" if idx % 2 == 0 else "assistant",
        "text": text,
        "tool": None,
        "ts": dt.datetime(2025, 1, 1) + dt.timedelta(minutes=idx),
    }


@pytest.fixture(scope="module")
def corpus():
    rows = []
    # mega conversation: 40 turns, ~100 chars each (> MAXLEN), with an
    # oversized single paragraph (> target) to exercise
    # split_long_paragraph, internal \n\n pieces, and empty turns
    for i in range(40):
        if i == 7:
            text = ""
        elif i == 11:
            text = "第一段。\n\n第二段在同一条消息里！\n\n第三段?"
        elif i == 19:
            # one paragraph longer than the segment target
            text = "超长句子" * 200 + "。" + "另一句 sentence here。" * 60
        else:
            text = f"回合{i:02d}：" + "内容词 " * 12 + f"结束{i:02d}。"
        rows.append(_mk_turn("mega", i, text))
    # normal small conversation
    for i in range(4):
        rows.append(_mk_turn("small", i, f"短对话第{i}句。"))
    # conversation that lands exactly below the cap
    rows.append(_mk_turn("edge", 0, "x" * (MAXLEN - 10) + "。"))
    return rows


def _oracle_chunks(rows, conv):
    turns = sorted((r for r in rows if r["conv_id"] == conv), key=lambda r: r["turn_idx"])
    text = conversation_text([r["text"] for r in turns])
    return chunk_text(text, max_text_length=MAXLEN)


def test_mega_segmentation_matches_core_spec(spark, corpus):
    df = spark.createDataFrame(corpus, schema=schemas.TRANSCRIPTS)
    got = chunk_conversations(df, max_text_length=MAXLEN).collect()
    by_conv = {}
    for r in sorted(got, key=lambda r: (r["conv_id"], r["seg_id"], r["position"])):
        by_conv.setdefault(r["conv_id"], []).append(r)

    for conv in ("mega", "small", "edge"):
        want = _oracle_chunks(corpus, conv)
        have = by_conv[conv]
        assert [c["text"] for c in have] == [c["text"] for c in want], conv
        assert [c["seg_id"] for c in have] == [c["seg_id"] for c in want], conv
        assert [c["tokens"] for c in have] == [c["tokens"] for c in want], conv

    # the mega conversation really went through >1 segment
    assert max(c["seg_id"] for c in by_conv["mega"]) >= 1


def test_mega_path_never_assembles_whole_conversation(spark, corpus):
    # structural check: max stitched row length stays ≤ the segment
    # target (+ joins), far below the full conversation length
    df = spark.createDataFrame(corpus, schema=schemas.TRANSCRIPTS)
    chunks = chunk_conversations(df, max_text_length=MAXLEN)
    mega_total = (
        df.where(F.col("conv_id") == "mega")
        .agg(F.sum(F.length("text")))
        .first()[0]
    )
    max_seg = (
        chunks.where(F.col("conv_id") == "mega")
        .groupBy("seg_id")
        .agg(F.sum(F.length("text")).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert mega_total > MAXLEN
    assert max_seg < mega_total
