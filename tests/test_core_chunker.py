"""Chunker semantics (FIXTURES.md §3; reference
processor/text_chunker.py:185-266)."""

from graph_rag_agent_spark.core.textchunk import (
    CHUNK_SIZE,
    OVERLAP,
    chunk_segment_spans,
    chunk_text,
    conversation_text,
    preprocess_large_text,
    tokenize,
)


def test_tokenizer_lossless():
    samples = [
        "Hello world, this is a test.",
        "今天天气很好。明天呢？",
        "Mixed 中文 and English! With  double  spaces.\n\nAnd paragraphs.",
        "",
        "。！？...",
    ]
    for s in samples:
        assert "".join(tokenize(s)) == s


def test_short_text_single_chunk():
    text = "短文本。"  # < CHUNK_SIZE/10 chars → one chunk (ref :195-198)
    chunks = chunk_text(text)
    assert len(chunks) == 1 and chunks[0]["text"] == text


def test_empty_text():
    assert chunk_text("") == []


def test_window_size_and_overlap():
    # sentence-free token stream → pure windows of CHUNK_SIZE stepping
    # CHUNK_SIZE-OVERLAP
    tokens = [f"w{i} " for i in range(1200)]
    spans = chunk_segment_spans([t for tok in tokens for t in tokenize(tok)])
    assert spans[0][0] == 0
    assert spans[0][1] - spans[0][0] == CHUNK_SIZE
    # consecutive windows overlap by OVERLAP tokens
    assert spans[1][0] == spans[0][1] - OVERLAP


def test_sentence_snapping():
    # a sentence end within +100 tokens after the window edge extends it
    words = ["字"] * (CHUNK_SIZE + 50) + ["。"] + ["字"] * 300
    spans = chunk_segment_spans(words)
    assert spans[0][1] == CHUNK_SIZE + 51  # extended to include 。


def test_sentence_snap_back_on_overlap():
    # next start snaps forward to the sentence boundary inside overlap
    words = ["字"] * 450 + ["。"] + ["字"] * 600
    spans = chunk_segment_spans(words)
    # window 1: no sentence end within +100 of 500 → plain (0, 500);
    # its overlap start is 400, no sentence end before 400 → start 400.
    assert spans[0] == (0, 500)
    assert spans[1] == (400, 900)
    # window 2's overlap start is 800; scanning back finds the 。 at
    # 450 → snapped start 451 (reference :252-260).
    assert spans[2][0] == 451


def test_reconstruction_via_token_spans():
    # de-overlapped reconstruction: concatenating each chunk's
    # non-overlapping token suffix yields the original text
    text = conversation_text([f"Turn {i} with some words. 中文内容。" for i in range(200)])
    chunks = chunk_text(text)
    assert len(chunks) > 1
    toks = tokenize(text)
    rebuilt = []
    covered = 0
    for ch in chunks:
        s, e = ch["token_start"], ch["token_end"]
        rebuilt.append("".join(toks[max(s, covered) : e]))
        covered = max(covered, e)
    assert "".join(rebuilt) == text


def test_large_text_presplit():
    para = "x" * 9000
    text = "\n\n".join([para] * 80)  # 720k chars > 500k
    segments = preprocess_large_text(text)
    assert len(segments) > 1
    assert all(len(s) <= 500_000 for s in segments)
    # nothing lost except the \n\n joins between re-packed paragraphs
    assert sum(len(s.replace("\n\n", "")) for s in segments) == 80 * 9000


def test_chunks_never_cross_segments():
    # 800k chars → pre-split target is max_text_length//2 = 250k
    # (reference :57), each 400k paragraph splits 250k+150k → 4 segs
    para = "y" * 400_000
    text = para + "\n\n" + para
    chunks = chunk_text(text)
    seg_ids = {c["seg_id"] for c in chunks}
    assert seg_ids == {0, 1, 2, 3}
