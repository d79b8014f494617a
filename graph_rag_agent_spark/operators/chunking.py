"""Per-conversation chunking operator.

Two-phase Spark shape (skew-proof):

  1. **Segment planning** — groupBy(conv_id).applyInPandas: sort turns
     by turn_idx (the stable-ordering invariant), join them into the
     conversation text and split it into chunking segments exactly as
     the reference does (core/textchunk.preprocess_large_text —
     paragraph pre-split of >500k-char texts, reference
     processor/text_chunker.py:43-102). A ≤500k-char conversation is
     one segment. This phase is a cheap linear string scan; the
     mega-conversation costs one memcpy-grade task.
  2. **Segment chunking** — repartition segments by hash and
     mapInPandas the transcribed window chunker
     (core/textchunk.chunk_segment_spans; reference :211-266) over
     each segment independently. Chunk windows never cross segment
     boundaries in the reference either, so this parallelization is
     semantics-preserving — a 10%-of-corpus mega-conversation becomes
     ~28 independent 250k-char tasks instead of one straggler.

Everything the reference computes per-chunk imperatively in
struct_builder (/root/reference/graph/structure/struct_builder.py:
80-127) is done JVM-side with window functions (SURVEY.md §2 W1-W3):
  - chunk_id   = sha1(text)         → F.sha1(F.encode(...)) (F1, bit-
                 identical to graph/core/utils.py:24-34)
  - position   = row_number per conv (W3; :83)
  - content_offset = running sum of previous chunk lengths, overlap
                 double-counted exactly like the reference (W2; :86-88)
  - previous_chunk_id = lag(chunk_id), first chunk points at itself
                 (W1; :84) — the NEXT_CHUNK chain as a column
  - first_chunk = position == 1     → the FIRST_CHUNK edge (:90)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.textchunk import (
    MAX_TEXT_LENGTH,
    chunk_segment_spans,
    preprocess_large_text,
    safe_tokenize,
)

_SEGMENT_SCHEMA = "conv_id string, seg_id int, seg_text string"

_CONV_SCHEMA = "conv_id string, conv_text string"

_CHUNK_SCHEMA = (
    "conv_id string, seg_id int, seg_chunk_index int, text string, "
    "tokens int, token_start int, token_end int"
)


def _plan_oversized(max_text_length: int = MAX_TEXT_LENGTH):
    """Paragraph pre-split for oversized conversations that cannot be
    unit-segmented (<5 paragraph units) — one input row per
    conversation, already assembled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, text in zip(pdf["conv_id"], pdf["conv_text"]):
                for seg_id, seg in enumerate(
                    preprocess_large_text(text, max_text_length)
                ):
                    rows.append((conv_id, seg_id, seg))
            yield pd.DataFrame(rows, columns=["conv_id", "seg_id", "seg_text"])

    return run


def _chunk_segments_fn(tokenizer=None):
    """Per-segment window chunker. ``tokenizer`` (str → list[str],
    joinable back to the text) is captured into the mapInPandas
    closure — the reference's pluggable-tokenizer seam (HanLP at
    text_chunker.py:25): a real model loads once per executor worker
    inside this body (or arrives via sc.broadcast) and CI pins the
    deterministic lossless tokenizer (None)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, seg_id, seg_text in zip(
                pdf["conv_id"], pdf["seg_id"], pdf["seg_text"]
            ):
                tokens = safe_tokenize(seg_text, tokenizer)
                for i, (start, end) in enumerate(chunk_segment_spans(tokens)):
                    rows.append(
                        (
                            conv_id,
                            seg_id,
                            i,
                            "".join(tokens[start:end]),
                            end - start,
                            start,
                            end,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id",
                    "seg_id",
                    "seg_chunk_index",
                    "text",
                    "tokens",
                    "token_start",
                    "token_end",
                ],
            )

    return run


_UNIT_SCHEMA = (
    "conv_id string, turn_idx int, piece_idx int, sub_idx int, "
    "unit_text string, unit_len long, from_split boolean"
)

_ASSIGN_SCHEMA = (
    "conv_id string, turn_idx int, piece_idx int, sub_idx int, seg_id int"
)


def _seg_target(max_text_length: int) -> int:
    # reference text_chunker.py:56 via core.textchunk.preprocess_large_text
    return min(max_text_length, max(10_000, max_text_length // 2))


def _mega_units(target: int):
    """Per-unit python pass for mega conversations: strip, drop
    empties, sentence-split oversized paragraphs. Unit-local — no
    conversation ever materializes in one task."""
    from ..core.textchunk import split_long_paragraph

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, piece_idx, raw in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["piece_idx"], pdf["unit_raw"]
            ):
                para = (raw or "").strip()
                if not para:
                    continue
                if len(para) > target:
                    for s, sub in enumerate(split_long_paragraph(para, target)):
                        rows.append(
                            (conv_id, turn_idx, piece_idx, s, sub, len(sub), True)
                        )
                else:
                    rows.append(
                        (conv_id, turn_idx, piece_idx, 0, para, len(para), False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id",
                    "turn_idx",
                    "piece_idx",
                    "sub_idx",
                    "unit_text",
                    "unit_len",
                    "from_split",
                ],
            )

    return run


def _pack_units(target: int):
    """Greedy paragraph packing — the exact preprocess_large_text fold
    (reference text_chunker.py:43-102) — over unit LENGTHS only; the
    text never enters this stage."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "piece_idx", "sub_idx"])
        out = []
        seg = 0
        cur_len = 0
        cur_ids: list[tuple] = []

        def flush():
            nonlocal seg, cur_len, cur_ids
            if cur_ids:
                for key in cur_ids:
                    out.append((*key, seg))
                seg += 1
                cur_ids = []
                cur_len = 0

        for conv_id, t, p, s, n, from_split in zip(
            pdf["conv_id"],
            pdf["turn_idx"],
            pdf["piece_idx"],
            pdf["sub_idx"],
            pdf["unit_len"],
            pdf["from_split"],
        ):
            key = (conv_id, int(t), int(p), int(s))
            if from_split:
                flush()
                out.append((*key, seg))
                seg += 1
            elif cur_len + int(n) + 2 > target:
                flush()
                cur_ids = [key]
                cur_len = int(n)
            else:
                cur_len = int(n) if not cur_ids else cur_len + 2 + int(n)
                cur_ids.append(key)
        flush()
        return pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "piece_idx", "sub_idx", "seg_id"]
        )

    return pack


def chunk_conversations(
    transcripts: DataFrame,
    max_text_length: int = MAX_TEXT_LENGTH,
    tokenizer=None,
) -> DataFrame:
    """transcripts → chunks table (schemas.CHUNKS).

    Mega conversations (> max_text_length chars) are segmented WITHOUT
    ever assembling the full conversation into one row: paragraph
    units (the \\n\\n pieces of each turn — identical to splitting the
    joined text, since \\n\\n is also the join separator) are derived
    by a JVM explode, oversized units are sentence-split unit-locally,
    the greedy packing fold runs over unit lengths only, and segment
    text is stitched per (conv, segment) — each ≤ the segment target.
    A >500k-char conversation with fewer than 5 paragraph units (the
    reference's split('\\n') fallback) is rare and degenerate; it
    takes the legacy single-row path.
    """
    spark = transcripts.sparkSession
    partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    target = _seg_target(max_text_length)

    tl = transcripts.select(
        "conv_id", "turn_idx", F.coalesce("text", F.lit("")).alias("text")
    )
    lens = tl.groupBy("conv_id").agg(
        (F.sum(F.length("text")) + 2 * (F.count("*") - 1)).alias("conv_len"),
        F.sum(F.size(F.split("text", r"\n\n", -1))).alias("n_units"),
    )
    mega_ids = lens.where(
        (F.col("conv_len") > max_text_length) & (F.col("n_units") >= 5)
    ).select("conv_id")

    # conversation assembly is pure string work → JVM-side:
    # sort turns by turn_idx (array_sort on struct), null text → '',
    # join with '\n\n' (== core.textchunk.conversation_text)
    conv_text = F.concat_ws(
        "\n\n",
        F.transform(
            F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
            lambda s: F.coalesce(s["text"], F.lit("")),
        ),
    )
    convs = transcripts.join(mega_ids, "conv_id", "left_anti").groupBy(
        "conv_id"
    ).agg(conv_text.alias("conv_text"))

    normal = convs.where(
        (F.length("conv_text") > 0) & (F.length("conv_text") <= max_text_length)
    ).select("conv_id", F.lit(0).alias("seg_id"), F.col("conv_text").alias("seg_text"))
    oversized = (
        convs.where(F.length("conv_text") > max_text_length)
        .select("conv_id", "conv_text")
        .mapInPandas(_plan_oversized(max_text_length), schema=_SEGMENT_SCHEMA)
    )

    units = (
        tl.join(mega_ids, "conv_id", "left_semi")
        .select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.split("text", r"\n\n", -1)).alias(
                "piece_idx", "unit_raw"
            ),
        )
        .repartition(partitions, "conv_id", "turn_idx")
        .mapInPandas(_mega_units(target), schema=_UNIT_SCHEMA)
        .localCheckpoint()
    )
    assignment = (
        units.select(
            "conv_id", "turn_idx", "piece_idx", "sub_idx", "unit_len", "from_split"
        )
        .groupBy("conv_id")
        .applyInPandas(_pack_units(target), schema=_ASSIGN_SCHEMA)
    )
    mega_segments = (
        units.join(assignment, ["conv_id", "turn_idx", "piece_idx", "sub_idx"])
        .groupBy("conv_id", "seg_id")
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("turn_idx", "piece_idx", "sub_idx", "unit_text")
                        )
                    ),
                    lambda s: s["unit_text"],
                ),
            ).alias("seg_text")
        )
        .select("conv_id", F.col("seg_id").cast("int"), "seg_text")
    )

    segments = normal.unionByName(oversized).unionByName(mega_segments)

    base = segments.repartition(partitions, "conv_id", "seg_id").mapInPandas(
        _chunk_segments_fn(tokenizer), schema=_CHUNK_SCHEMA
    )

    w = Window.partitionBy("conv_id").orderBy("seg_id", "seg_chunk_index")
    offset_w = w.rowsBetween(Window.unboundedPreceding, -1)

    return (
        base.withColumn("chunk_id", F.sha1(F.encode("text", "utf-8")))
        .withColumn("position", F.row_number().over(w))
        .withColumn("length", F.length("text"))
        .withColumn(
            "content_offset",
            F.coalesce(F.sum("length").over(offset_w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "previous_chunk_id",
            F.coalesce(F.lag("chunk_id").over(w), F.col("chunk_id")),
        )
        .withColumn("first_chunk", F.col("position") == 1)
        .select(
            "chunk_id",
            "conv_id",
            "seg_id",
            "text",
            "position",
            "length",
            "content_offset",
            "tokens",
            "token_start",
            "token_end",
            "previous_chunk_id",
            "first_chunk",
        )
    )
