"""Fixed StructType schemas for every table the engine materializes.

The reference has no declared schemas — its tables are Neo4j node
labels created implicitly by MERGE/SET (see SURVEY.md §1). We pin
explicit columnar schemas; mapping per table is documented against the
reference file:line that creates the equivalent node/edge.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Primary input (BASELINE.json input_hint).
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# __Document__ node (reference graph/structure/struct_builder.py:36-58);
# for transcripts: one row per conv_id.
DOCUMENTS = StructType(
    [
        StructField("file_name", StringType(), False),  # == conv_id
        StructField("type", StringType(), True),
        StructField("uri", StringType(), True),
        StructField("domain", StringType(), True),
    ]
)

# __Chunk__ node (struct_builder.py:102-111); chunk_id = sha1(text)
# hex (graph/core/utils.py:24-34). token_start/token_end are ours —
# they make de-overlapped reconstruction (the per-turn invariant test)
# possible without re-tokenizing.
CHUNKS = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("seg_id", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("position", IntegerType(), False),  # 1-based, per conv
        StructField("length", IntegerType(), False),
        StructField("content_offset", LongType(), False),
        StructField("tokens", IntegerType(), False),
        StructField("token_start", IntegerType(), False),
        StructField("token_end", IntegerType(), False),
        StructField("previous_chunk_id", StringType(), True),  # NEXT_CHUNK chain
        StructField("first_chunk", BooleanType(), False),  # FIRST_CHUNK edge
    ]
)

# Raw extractor output, one row per chunk (reference keeps these as
# in-flight strings, entity_extractor.py:208-210 + pickle cache).
EXTRACTIONS = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("result", StringType(), True),
    ]
)

# __Entity__ node as parsed (graph/extraction/graph_writer.py:57-69).
ENTITIES_RAW = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("description", StringType(), True),
    ]
)

# (subj)-[pred]->(obj) edge (graph_writer.py:72-110). THE P/R table.
TRIPLES = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("description", StringType(), True),
        StructField("weight", DoubleType(), True),
    ]
)

# MENTIONS lineage edge (graph_writer.py:272-281 re-points temp
# Document→Chunk; we emit (chunk_id, entity_id) directly).
MENTIONS = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("entity_id", StringType(), False),
    ]
)

# Deduped entity catalog with embeddings + linking columns
# (graph/indexing/entity_indexer.py:53-56; similar_entity.py:243-245).
ENTITIES = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("description", StringType(), True),
        # Neo4j LIST<FLOAT> is 64-bit, so double is the faithful type
        StructField("embedding", ArrayType(DoubleType()), True),
        StructField("wcc", LongType(), True),
        StructField("canonical_id", StringType(), True),
    ]
)

# SIMILAR edge (similar_entity.py:162-180).
SIMILAR = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("score", DoubleType(), False),
    ]
)

# entity → canonical survivor map (apoc.refactor.mergeNodes 'discard'
# semantics, entity_merger.py:348-360).
CANONICAL_MAP = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("canonical_id", StringType(), False),
    ]
)

# __Community__ membership + hierarchy (community/detector/leiden.py:91-140).
MEMBERSHIP = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("community_id", StringType(), False),  # "{level}-{n}"
        StructField("level", IntegerType(), False),
    ]
)

HIERARCHY = StructType(
    [
        StructField("child_community", StringType(), False),
        StructField("parent_community", StringType(), False),
    ]
)

COMMUNITIES = StructType(
    [
        StructField("community_id", StringType(), False),
        StructField("level", IntegerType(), False),
        StructField("community_rank", LongType(), True),  # summary/base.py:59-64
        StructField("weight", LongType(), True),
        StructField("summary", StringType(), True),
        StructField("full_content", StringType(), True),
        StructField("summary_created_at", TimestampType(), True),
    ]
)

# Incremental-update registry (build/incremental/file_change_manager.py:53-134,
# SHA-256 per source unit; ours is per conv_id).
REGISTRY = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("content_sha256", StringType(), False),
        StructField("n_turns", IntegerType(), False),
    ]
)

# Per-partition lineage/metrics rows written by each pipeline stage
# (north rule: "resumable from per-partition checkpoints with lineage
# and extraction metrics written per partition").
LINEAGE = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("rows", LongType(), False),
        StructField("bytes", LongType(), True),
        StructField("started_at", TimestampType(), True),
        StructField("finished_at", TimestampType(), True),
    ]
)
