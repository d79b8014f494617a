"""Chunking semantics, transcribed from the reference chunker.

Behavioral contract (reference /root/reference/processor/text_chunker.py):
  - token windows of CHUNK_SIZE tokens with OVERLAP-token overlap
    (config/settings.py:35-36: 500/100);
  - a window extends to the next sentence end if that lands within
    +100 tokens (text_chunker.py:237-241);
  - the next window start snaps back to the previous sentence end
    inside the overlap region when one exists (text_chunker.py:252-260);
  - texts longer than MAX_TEXT_LENGTH chars (settings.py:37: 500k) are
    pre-split into segments at paragraph boundaries before windowing
    (text_chunker.py:43-102); windows never cross segment boundaries;
  - empty/short texts (< chunk_size/10 chars) become a single chunk
    (text_chunker.py:195-198);
  - sentence enders are 。！？ (text_chunker.py:268-270).

The reference tokenizes with HanLP COARSE_ELECTRA_SMALL_ZH
(text_chunker.py:25) with a char-level fallback; a neural tokenizer is
a non-deterministic external dependency, so this engine uses a
deterministic LOSSLESS tokenizer: CJK chars and sentence punctuation
are single tokens, other non-space runs and whitespace runs are kept
as tokens, so ``''.join(tokens) == text`` always holds (the reference
relies on the same reconstruction at struct_builder.py:81).
"""

from __future__ import annotations

import re

CHUNK_SIZE = 500  # tokens (reference config/settings.py:35)
OVERLAP = 100  # tokens (reference config/settings.py:36)
MAX_TEXT_LENGTH = 500_000  # chars (reference config/settings.py:37)

_SENTENCE_ENDERS = ("。", "！", "？")

_TOKEN_RE = re.compile(
    r"[一-鿿]"  # one CJK ideograph per token
    r"|[。！？!?.]"  # sentence punctuation, isolated
    r"|[^一-鿿。！？!?.\s]+"  # other non-space runs
    r"|\s+"  # whitespace runs (kept: lossless)
)


def tokenize(text: str) -> list[str]:
    """Deterministic lossless tokenizer; ''.join(result) == text."""
    if not text:
        return []
    return _TOKEN_RE.findall(text)


def safe_tokenize(
    text: str,
    tokenizer=None,
    max_text_length: int = MAX_TEXT_LENGTH,
) -> list[str]:
    """The reference's pluggable-tokenizer slot with its safety ladder
    (_safe_tokenize, text_chunker.py:165-183): oversized input and
    tokenizer exceptions fall back to character-level tokens.

    ``tokenizer`` is any ``str -> list[str]`` callable (the reference
    plugs HanLP COARSE_ELECTRA_SMALL_ZH, text_chunker.py:25); chunk
    reconstruction requires ``''.join(tokens) == text`` (the reference
    relies on the same reconstruction at struct_builder.py:81). None →
    the deterministic lossless tokenizer (CI default)."""
    if tokenizer is None:
        return tokenize(text)
    try:
        if len(text) > max_text_length:
            return list(text)
        tokens = tokenizer(text)
        return tokens if tokens else []
    except Exception:
        return list(text)


def _is_sentence_end(token: str) -> bool:
    # reference text_chunker.py:268-270
    return token in _SENTENCE_ENDERS


def _find_next_sentence_end(tokens: list[str], start_pos: int) -> int:
    # reference text_chunker.py:272-277
    for i in range(start_pos, len(tokens)):
        if _is_sentence_end(tokens[i]):
            return i + 1
    return len(tokens)


def _find_previous_sentence_end(tokens: list[str], start_pos: int) -> int:
    # reference text_chunker.py:279-284
    for i in range(start_pos - 1, -1, -1):
        if _is_sentence_end(tokens[i]):
            return i + 1
    return 0


def split_long_paragraph(text: str, max_size: int) -> list[str]:
    """Sentence-bounded split of an oversized paragraph
    (reference text_chunker.py:104-163)."""
    if len(text) <= max_size:
        return [text]

    sentences = re.split(r"([。！？.!?])", text)
    combined: list[str] = []
    for i in range(0, len(sentences) - 1, 2):
        sentence = sentences[i]
        punctuation = sentences[i + 1] if i + 1 < len(sentences) else ""
        if sentence.strip():
            combined.append(sentence + punctuation)

    if not combined:
        return [text[i : i + max_size] for i in range(0, len(text), max_size)]

    segments: list[str] = []
    current = ""
    for sentence in combined:
        if len(sentence) > max_size:
            if current:
                segments.append(current)
                current = ""
            for i in range(0, len(sentence), max_size):
                segments.append(sentence[i : i + max_size])
        else:
            if len(current) + len(sentence) > max_size:
                if current:
                    segments.append(current)
                current = sentence
            else:
                current += sentence
    if current:
        segments.append(current)
    return segments


def preprocess_large_text(text: str, max_text_length: int = MAX_TEXT_LENGTH) -> list[str]:
    """Paragraph-boundary pre-split of oversized texts
    (reference text_chunker.py:43-102)."""
    if len(text) <= max_text_length:
        return [text]

    target = min(max_text_length, max(10_000, max_text_length // 2))
    paragraphs = text.split("\n\n")
    if len(paragraphs) < 5:
        paragraphs = text.split("\n")

    segments: list[str] = []
    current = ""
    for para in paragraphs:
        para = para.strip()
        if not para:
            continue
        if len(para) > target:
            if current:
                segments.append(current)
                current = ""
            segments.extend(split_long_paragraph(para, target))
        else:
            if len(current) + len(para) + 2 > target:
                if current:
                    segments.append(current)
                current = para
            else:
                current = current + "\n\n" + para if current else para
    if current:
        segments.append(current)
    return segments


def chunk_segment_spans(
    tokens: list[str], chunk_size: int = CHUNK_SIZE, overlap: int = OVERLAP
) -> list[tuple[int, int]]:
    """Token-index [start, end) spans for one segment
    (reference text_chunker.py:211-266)."""
    if not tokens:
        return []
    spans: list[tuple[int, int]] = []
    n = len(tokens)
    start_pos = 0
    while start_pos < n:
        end_pos = min(start_pos + chunk_size, n)
        if end_pos < n:
            sentence_end = _find_next_sentence_end(tokens, end_pos)
            if sentence_end <= start_pos + chunk_size + 100:  # slight overrun allowed
                end_pos = sentence_end
        if end_pos > start_pos:
            spans.append((start_pos, end_pos))
        if end_pos >= n:
            break
        overlap_start = max(start_pos, end_pos - overlap)
        next_sentence_start = _find_previous_sentence_end(tokens, overlap_start)
        if start_pos < next_sentence_start < end_pos:
            start_pos = next_sentence_start
        else:
            start_pos = overlap_start
        if start_pos >= end_pos:
            start_pos = end_pos
    return spans


def chunk_text(
    text: str,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = OVERLAP,
    max_text_length: int = MAX_TEXT_LENGTH,
    tokenizer=None,
) -> list[dict]:
    """Chunk one document/conversation text.

    Returns per-chunk dicts: text, tokens (count), seg_id,
    token_start/token_end (indices into the segment's token list).
    Mirrors reference chunk_text (text_chunker.py:185-209) plus the
    short-text path (:195-198). ``tokenizer`` = safe_tokenize slot.
    """
    if not text or len(text) < chunk_size / 10:
        tokens = safe_tokenize(text, tokenizer, max_text_length)
        if not tokens:
            return []
        return [
            {
                "text": "".join(tokens),
                "tokens": len(tokens),
                "seg_id": 0,
                "token_start": 0,
                "token_end": len(tokens),
            }
        ]

    chunks: list[dict] = []
    for seg_id, segment in enumerate(preprocess_large_text(text, max_text_length)):
        tokens = safe_tokenize(segment, tokenizer, max_text_length)
        for start, end in chunk_segment_spans(tokens, chunk_size, overlap):
            chunks.append(
                {
                    "text": "".join(tokens[start:end]),
                    "tokens": end - start,
                    "seg_id": seg_id,
                    "token_start": start,
                    "token_end": end,
                }
            )
    return chunks


def conversation_text(turn_texts: list[str]) -> str:
    """Join ordered turn texts into one document text.

    \\n\\n is the paragraph separator, deliberately matching the
    boundary preprocess_large_text splits on — so oversized
    conversations pre-split at turn boundaries.
    """
    return "\n\n".join("" if t is None else t for t in turn_texts)
