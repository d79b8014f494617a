"""Graph consistency validation + statistics (SURVEY.md §2 P6 / A6).

The reference's post-hoc invariant suite
(/root/reference/graph/graph_consistency_validator.py:37-180) recast
as DataFrame checks — left-anti joins and window predicates instead of
Cypher scans. Each check returns violating rows; ``validate_graph``
aggregates counts (its result being all-zeros is itself a pytest
invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def orphan_entities(entities: DataFrame, mentions: DataFrame) -> DataFrame:
    """Entities with no MENTIONS edge (validator :44-75)."""
    return entities.join(
        mentions.select("entity_id").distinct(), "entity_id", "left_anti"
    ).select("entity_id")


def dangling_mentions(mentions: DataFrame, entities: DataFrame) -> DataFrame:
    """Mentions pointing at no catalog entity."""
    return mentions.join(
        entities.select("entity_id"), "entity_id", "left_anti"
    ).select("chunk_id", "entity_id")


def empty_chunks(chunks: DataFrame) -> DataFrame:
    """Chunks with empty/whitespace text (validator empty-chunk rule)."""
    return chunks.where(
        F.col("text").isNull() | (F.length(F.trim("text")) == 0)
    ).select("chunk_id", "conv_id")


def docs_without_first_chunk(chunks: DataFrame) -> DataFrame:
    """Conversations with chunks but no position-1 chunk
    (FIRST_CHUNK rule, validator :100-140)."""
    has_first = chunks.where(F.col("position") == 1).select("conv_id").distinct()
    return (
        chunks.select("conv_id").distinct().join(has_first, "conv_id", "left_anti")
    )


def broken_chunk_chains(chunks: DataFrame) -> DataFrame:
    """position gaps / broken NEXT_CHUNK chain: position>1 whose
    predecessor row is missing (validator :141-180 via lag)."""
    w = Window.partitionBy("conv_id").orderBy("position")
    return (
        chunks.withColumn("prev_pos", F.lag("position").over(w))
        .where(
            (F.col("position") > 1)
            & (F.coalesce(F.col("prev_pos"), F.lit(-1)) != F.col("position") - 1)
        )
        .select("conv_id", "position", "prev_pos")
    )


def dangling_triples(triples: DataFrame, entities: DataFrame) -> DataFrame:
    """Triples whose endpoints are missing from the canonical catalog."""
    e = entities.select("entity_id")
    missing_subj = triples.join(
        e.withColumnRenamed("entity_id", "subj"), "subj", "left_anti"
    )
    missing_obj = triples.join(
        e.withColumnRenamed("entity_id", "obj"), "obj", "left_anti"
    )
    return missing_subj.unionByName(missing_obj).select("subj", "pred", "obj")


def validate_graph(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Run every check; returns violation counts (all zero = healthy)."""
    return {
        "orphan_entities": orphan_entities(
            tables["entities"], tables["mentions"]
        ).count(),
        "dangling_mentions": dangling_mentions(
            tables["mentions"], tables["entities"]
        ).count(),
        "empty_chunks": empty_chunks(tables["chunks"]).count(),
        "docs_without_first_chunk": docs_without_first_chunk(
            tables["chunks"]
        ).count(),
        "broken_chunk_chains": broken_chunk_chains(tables["chunks"]).count(),
        "dangling_triples": dangling_triples(
            tables["triples"], tables["entities"]
        ).count(),
    }


def graph_statistics(tables: dict[str, DataFrame]) -> DataFrame:
    """Single-row stats table (reference
    incremental_graph_builder.py:806-848 conditional label counts)."""
    spark = tables["chunks"].sparkSession
    counts = {
        "n_conversations": tables["chunks"].select("conv_id").distinct().count(),
        "n_chunks": tables["chunks"].count(),
        "n_entities": tables["entities"].count(),
        "n_triples": tables["triples"].count(),
        "n_mentions": tables["mentions"].count(),
    }
    if "communities" in tables:
        counts["n_communities"] = tables["communities"].count()
    return spark.createDataFrame(
        [tuple(counts.values())], ", ".join(f"{k} long" for k in counts)
    )
