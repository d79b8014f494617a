"""Per-conversation chunking operator.

Spark shape: groupBy(conv_id).applyInPandas — each group receives its
turns, sorts by turn_idx (the stable-ordering invariant), joins them
into the conversation text and runs the transcribed chunker
(core/textchunk.py; reference processor/text_chunker.py:185-266).

Everything that the reference computes per-chunk imperatively in
struct_builder (/root/reference/graph/structure/struct_builder.py:
80-127) is done JVM-side afterwards with window functions (SURVEY.md
§2 W1-W3):
  - chunk_id   = sha1(text)         → F.sha1(F.encode(...)) (F1, bit-
                 identical to graph/core/utils.py:24-34)
  - position   = row_number per conv (W3; :83)
  - content_offset = running sum of previous chunk lengths, overlap
                 double-counted exactly like the reference (W2; :86-88)
  - previous_chunk_id = lag(chunk_id), first chunk points at itself
                 (W1; :84) — the NEXT_CHUNK chain as a column
  - first_chunk = position == 1     → the FIRST_CHUNK edge (:90)

Scale note (100 TB): the group key is conv_id, so a mega-conversation
lands in one task — but chunking is a single linear pass over its
text; the expensive downstream work (extraction) is redistributed by
chunk hash immediately after (see operators/extraction.py). Oversized
conversations (>500k chars) are pre-split into segments inside the
chunker (textchunk.preprocess_large_text), exactly like the reference,
bounding per-window memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.textchunk import chunk_text, conversation_text

_BASE_SCHEMA = (
    "conv_id string, seg_id int, chunk_index int, text string, "
    "tokens int, token_start int, token_end int"
)


def _chunk_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    conv_id = pdf["conv_id"].iloc[0]
    text = conversation_text(pdf["text"].tolist())
    rows = []
    for i, ch in enumerate(chunk_text(text)):
        rows.append(
            {
                "conv_id": conv_id,
                "seg_id": ch["seg_id"],
                "chunk_index": i,
                "text": ch["text"],
                "tokens": ch["tokens"],
                "token_start": ch["token_start"],
                "token_end": ch["token_end"],
            }
        )
    return pd.DataFrame(
        rows,
        columns=[
            "conv_id",
            "seg_id",
            "chunk_index",
            "text",
            "tokens",
            "token_start",
            "token_end",
        ],
    )


def chunk_conversations(transcripts: DataFrame) -> DataFrame:
    """transcripts → chunks table (schemas.CHUNKS)."""
    base = transcripts.select("conv_id", "turn_idx", "text").groupBy("conv_id").applyInPandas(
        _chunk_group, schema=_BASE_SCHEMA
    )

    w = Window.partitionBy("conv_id").orderBy("chunk_index")
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
