"""Entity/relation extraction operator (the LLM boundary).

Spark shape: repartition chunks by chunk_id hash (this is the skew
killer — after this, a mega-conversation's chunks are spread evenly
across all executors regardless of conv_id skew), then mapInPandas
runs the extractor over Arrow batches. The default extractor is the
deterministic stub (core/stub_extract.py); production swaps in a
batched model client with the same ``str → str`` contract — exactly
the slot the reference fills with its LLM chain
(/root/reference/graph/extraction/entity_extractor.py:334-369).

Extraction cache: the reference memoizes LLM results in pickle files
keyed by sha1(chunk text) (entity_extractor.py:77-143). Ours is a
cache TABLE keyed by chunk_id (== sha1(text)): probe with a broadcast/
shuffle anti-join so only cache misses reach the UDF, then union the
hits back (SURVEY.md §4 — a deliberate pipeline stage, not a Catalyst
rule). Identical chunk texts across conversations dedupe through the
same mechanism: we extract once per distinct chunk_id and re-join.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.records import BATCH_SEPARATOR, split_batch_response
from ..core.stub_extract import stub_extract, stub_extract_batch

EXTRACT_SCHEMA = "chunk_id string, result string"

LLM_BATCH_SIZE = 5  # reference config/settings.py:76


def extract_chunks(
    chunks: DataFrame,
    extractor: Callable[[str], str] = stub_extract,
    cache: DataFrame | None = None,
    partitions: int | None = None,
    batched: bool = False,
    batch_extractor: Callable[[str], str] = stub_extract_batch,
    batch_size: int = LLM_BATCH_SIZE,
) -> DataFrame:
    """chunks → extractions(chunk_id, conv_id, result).

    ``cache`` is a DataFrame(chunk_id, result) of previous extractions
    (e.g. the extractions table of an earlier run / checkpoint).

    ``batched=True`` reproduces the reference's LLM batch mode
    (entity_extractor.py:220-332): pack up to ``batch_size`` chunk
    texts into one call joined by BATCH_SEPARATOR, split the response
    on the same separator, and fall back to per-chunk calls when the
    response section count mismatches.
    """
    spark = chunks.sparkSession
    partitions = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # one extraction per distinct chunk text; conv linkage re-joined after
    distinct_chunks = chunks.select("chunk_id", "text").dropDuplicates(["chunk_id"])

    if cache is not None:
        cache = cache.select("chunk_id", "result").dropDuplicates(["chunk_id"])
        misses = distinct_chunks.join(cache, "chunk_id", "left_anti")
        hits = distinct_chunks.join(cache, "chunk_id", "inner").select(
            "chunk_id", "result"
        )
    else:
        misses, hits = distinct_chunks, None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not batched:
                results = [extractor(t) for t in pdf["text"]]
            else:
                texts = list(pdf["text"])
                results = []
                for i in range(0, len(texts), batch_size):
                    group = texts[i : i + batch_size]
                    response = batch_extractor(BATCH_SEPARATOR.join(group))
                    sections = split_batch_response(response)
                    if len(sections) != len(group):
                        # entity_extractor.py:286-300 fallback ladder
                        sections = [extractor(t) for t in group]
                    results.extend(sections)
            yield pd.DataFrame({"chunk_id": pdf["chunk_id"], "result": results})

    # ROUND-ROBIN repartition, deliberately not hash-by-chunk_id: the
    # extractor is stateless per row, so no co-location is needed, and
    # in Spark 4.1 AQE's byte-based coalescing collapses an explicit
    # hash repartition(n, col) to ONE task when the shuffle is small —
    # which would serialize this latency-bound model boundary (seconds
    # per chunk against a real LLM, tiny bytes — exactly the shape
    # byte-based sizing mis-plans; measured: 233 × 1 s calls ran 233 s
    # instead of ~8 s). RoundRobinPartitioning with an explicit count
    # is exempt from the coalesce, keeps the skew-proof even spread,
    # and the result is re-joined by chunk_id downstream anyway.
    extracted = (
        misses.repartition(partitions)
        .mapInPandas(run, schema=EXTRACT_SCHEMA)
    )
    results = extracted.unionByName(hits) if hits is not None else extracted

    return chunks.select("chunk_id", "conv_id").join(results, "chunk_id").select(
        "chunk_id", "conv_id", "result"
    )
