"""Structured-Streaming transcript ingest (additive; SURVEY.md §2.11 —
the reference has NO streaming, its "incremental" is a polling batch
scheduler. This module is the Spark-native upgrade of that path, kept
out of the parity gate).

readStream on a parquet directory of transcript files →
  watermark on ts → dropDuplicates within watermark on
  (conv_id, turn_idx) (exactly-once turn semantics for replayed
  producers) → foreachBatch appends to the transcripts table and
  re-runs the incremental KG update for the affected conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


def read_transcript_stream(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )


def start_ingest(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Append deduplicated turns to the transcripts table. Returns the
    StreamingQuery; callers chain the incremental KG update on the
    written conv_ids (plans/incremental.py)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(target_dir)

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
