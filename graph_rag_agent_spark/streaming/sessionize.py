"""Streaming conversation sessionization (additive; SURVEY.md §2.11).

The batch pipeline's unit of work is a COMPLETE conversation
(chunking windows span turns, reference processor/text_chunker.py
builds per-document chunk streams the same way). A streaming producer
delivers turns incrementally, so something must decide "this
conversation is finished — hand it to the KG build". Two operators:

- ``conversation_sessions``: Spark's built-in ``session_window``
  aggregation — pure JVM, watermark-driven, one shuffle. A session
  closes after ``gap`` of event-time silence; the emitted row is the
  conversation descriptor (turn count, span, chars) the incremental
  plan (plans/incremental.py) ingests. Prefer this path: it is
  whole-stage-codegen'd state machinery with no Python boundary.

- ``sessionize_stateful``: applyInPandasWithState with event-time
  timeout — the custom-stateful-operator slot for semantics the
  built-in cannot express. Here: EARLY EMIT of mega-conversations.
  A conversation that keeps streaming past ``max_turns`` never goes
  quiet, so a pure gap window would buffer it forever (the 10 %
  mega-conversation skew documented in chunking.py is exactly this
  shape); the stateful operator emits a partial descriptor every
  ``max_turns`` turns (``closed = false``) and a final one on gap
  timeout (``closed = true``), bounding per-key state regardless of
  conversation length.

State per key is O(1) (counts + bounds, never buffered turns), so a
1000-executor cluster holds state for billions of in-flight
conversations; the shuffle is the groupBy(conv_id) hash partition the
rest of the pipeline already uses.
"""

from __future__ import annotations

from collections.abc import Iterator


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("total_chars", LongType()),
        StructField("closed", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("first_ts_ms", LongType()),
        StructField("last_ts_ms", LongType()),
        StructField("total_chars", LongType()),
        StructField("emitted_turns", LongType()),
        StructField("part_idx", IntegerType()),
    ]
)


def conversation_sessions(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Built-in session-window rollup: one row per (conv_id, session),
    emitted when the watermark passes session end + gap. JVM-only."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .select(
            "conv_id", "n_turns", "first_ts", "last_ts", "total_chars",
            F.lit(True).alias("closed"),
        )
    )


def _ms(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000_000)


def sessionize_stateful(
    stream: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    max_turns: int = 10_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful sessionization with mega-conversation early
    emit (applyInPandasWithState + event-time timeout).

    Emits (conv_id, n_turns, first_ts, last_ts, total_chars, closed):
    ``closed=false`` partial rows every ``max_turns`` turns while a
    conversation keeps streaming, and a ``closed=true`` row when the
    watermark passes last_ts + gap_ms. n_turns on the final row is the
    conversation total (partials are progress markers, not splits).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, first_ms, last_ms, chars, _emitted, _part = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n],
                    "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                    "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                    "total_chars": [chars],
                    "closed": [True],
                }
            )
            return

        if state.exists:
            n, first_ms, last_ms, chars, emitted, part = state.get
        else:
            n, first_ms, last_ms, chars, emitted, part = 0, None, None, 0, 0, 0

        for pdf in pdfs:
            n += len(pdf)
            chars += int(pdf["text"].str.len().fillna(0).sum())
            ts_ms = pdf["ts"].map(_ms)
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)

        out = []
        # mega-conversation guard: emit a partial descriptor each time
        # another max_turns turns have streamed in — state stays O(1)
        # and downstream consumers see progress for never-quiet keys
        while n - emitted >= max_turns:
            emitted += max_turns
            part += 1
            out.append(
                {
                    "conv_id": conv_id,
                    "n_turns": n,
                    "first_ts": pd.Timestamp(first_ms, unit="ms"),
                    "last_ts": pd.Timestamp(last_ms, unit="ms"),
                    "total_chars": chars,
                    "closed": False,
                }
            )
        state.update((n, first_ms, last_ms, chars, emitted, part))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        if out:
            yield pd.DataFrame(out)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
