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
    tokenize,
)

_SEGMENT_SCHEMA = "conv_id string, seg_id int, seg_text string"

_CONV_SCHEMA = "conv_id string, conv_text string"

_CHUNK_SCHEMA = (
    "conv_id string, seg_id int, seg_chunk_index int, text string, "
    "tokens int, token_start int, token_end int"
)


def _plan_oversized(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Paragraph pre-split for >MAX_TEXT_LENGTH conversations only
    (rare) — one input row per conversation, already assembled."""
    for pdf in batches:
        rows = []
        for conv_id, text in zip(pdf["conv_id"], pdf["conv_text"]):
            for seg_id, seg in enumerate(preprocess_large_text(text, MAX_TEXT_LENGTH)):
                rows.append((conv_id, seg_id, seg))
        yield pd.DataFrame(rows, columns=["conv_id", "seg_id", "seg_text"])


def _chunk_segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for conv_id, seg_id, seg_text in zip(
            pdf["conv_id"], pdf["seg_id"], pdf["seg_text"]
        ):
            tokens = tokenize(seg_text)
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


def chunk_conversations(transcripts: DataFrame) -> DataFrame:
    """transcripts → chunks table (schemas.CHUNKS)."""
    spark = transcripts.sparkSession
    partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

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
    convs = transcripts.groupBy("conv_id").agg(conv_text.alias("conv_text"))

    normal = convs.where(
        (F.length("conv_text") > 0) & (F.length("conv_text") <= MAX_TEXT_LENGTH)
    ).select("conv_id", F.lit(0).alias("seg_id"), F.col("conv_text").alias("seg_text"))
    oversized = (
        convs.where(F.length("conv_text") > MAX_TEXT_LENGTH)
        .select("conv_id", "conv_text")
        .mapInPandas(_plan_oversized, schema=_SEGMENT_SCHEMA)
    )
    segments = normal.unionByName(oversized)

    base = segments.repartition(partitions, "conv_id", "seg_id").mapInPandas(
        _chunk_segments, schema=_CHUNK_SCHEMA
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
