"""Transcript sources.

Three ways to obtain the pipeline's input table
``transcripts(conv_id, turn_idx, role, text, tool, ts)``:

  1. ``synthesize_transcripts`` — fully distributed deterministic
     generator. Turn counts are planned JVM-side (spark.range +
     sequence/explode), text is materialized by an Arrow-batched
     mapInPandas over ``core.gen.turn_row`` — a pure function of
     (conv_id, turn_idx), so any partitioning yields identical rows
     and the mega-conversation's turns spread evenly across tasks
     (no skew at generation time).
  2. ``transcripts_from_documents`` — derives transcripts from the
     driver-provided ``documents`` parquet (TESTDATA.md): each doc is
     one conversation, sentence-split into turns. Used by
     __spark_entry__ so driver checks run on driver data.
  3. ``spark.read.parquet`` on an existing table (prod path; Iceberg
     in a real deployment — the reader API is identical).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..core.gen import conv_id_for, turn_row, turns_in_conversation


def synthesize_transcripts(
    spark: SparkSession, n_convs: int, partitions: int | None = None
) -> DataFrame:
    partitions = partitions or spark.sparkContext.defaultParallelism

    @F.pandas_udf("int")
    def n_turns_udf(conv_index: pd.Series) -> pd.Series:
        return conv_index.map(lambda c: turns_in_conversation(int(c), n_convs))

    plan = (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv_index")
        .withColumn("n_turns", n_turns_udf("conv_index"))
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .select("conv_index", "turn_idx")
        .repartition(partitions)  # spread the mega-conversation
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                turn_row(int(c), int(t))
                for c, t in zip(pdf["conv_index"], pdf["turn_idx"])
            ]
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return plan.mapInPandas(gen, schema=schemas.TRANSCRIPTS)


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, plant_mentions: bool = False
) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → transcripts.

    Deterministic: conv_id = 'doc-<doc_id>'; turns = non-empty
    sentence fragments (split on [。.!?]); roles alternate
    user/assistant; ts = epoch + turn_idx minutes. Entirely JVM-side
    (split/posexplode), so it also serves as the oracle-SQL-checkable
    turn derivation (see __spark_entry__).

    ``plant_mentions`` appends a hash-chosen vocabulary sentence to
    each turn (the driver's documents are entity-free word soup; the
    flagship KG query needs real mentions to extract).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = (
        docs.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
            F.posexplode(F.split(F.col("text"), r"[。.!?]")).alias("pos", "turn_text"),
        )
        .where(F.length(F.trim("turn_text")) > 0)
        .select(
            "conv_id",
            F.col("pos").cast("int").alias("turn_idx"),
            F.when(F.col("pos") % 2 == 0, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            F.trim("turn_text").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.lit("2025-01-01 00:00:00").cast("timestamp") + F.make_interval(mins=F.col("pos")))
            .alias("ts"),
        )
    )
    if not plant_mentions:
        return base

    from ..core.vocab import ALL_ALIASES

    aliases = F.array(*[F.lit(a) for a in ALL_ALIASES])
    n = len(ALL_ALIASES)
    idx_a = F.pmod(F.hash("conv_id", "turn_idx"), F.lit(n)) + 1
    idx_b = F.pmod(F.hash("conv_id", "turn_idx", F.lit(7)), F.lit(n)) + 1
    return base.withColumn(
        "text",
        F.concat(
            "text",
            F.lit(" "),
            F.element_at(aliases, idx_a),
            F.lit("与"),
            F.element_at(aliases, idx_b),
            F.lit("有合作关系。"),
        ),
    )


def conversation_registry(transcripts: DataFrame) -> DataFrame:
    """Per-conversation SHA-256 content registry — the incremental
    change detector's snapshot (reference
    build/incremental/file_change_manager.py:53-134 hashes file bytes;
    ours hashes the ordered turn texts)."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.sha2(
                F.concat_ws(
                    "\x1e",
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ).getField("text"),
                ),
                256,
            ).alias("content_sha256"),
            F.count("*").cast("int").alias("n_turns"),
        )
    )
