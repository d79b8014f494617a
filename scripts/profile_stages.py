"""Per-stage wall-clock profile of the KG pipeline at one parallelism
level. Usage: python scripts/profile_stages.py <cores> <n_convs>
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.canonicalize import (
    canonical_entities,
    resolve_canonical,
    rewrite_mentions,
    rewrite_triples,
)
from graph_rag_agent_spark.operators.chunking import chunk_conversations
from graph_rag_agent_spark.operators.components import (
    connected_components,
    consecutive_component_ids,
)
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.linking import (
    entity_catalog,
    similar_entities,
    with_embeddings,
)
from graph_rag_agent_spark.operators.parsing import (
    entities_raw,
    mentions_raw,
    parse_extractions,
    triples_raw,
)
from graph_rag_agent_spark.session import get_spark
from graph_rag_agent_spark.sources.transcripts import synthesize_transcripts


def main():
    cores = int(sys.argv[1])
    n_convs = int(sys.argv[2])
    spark = get_spark(
        app_name=f"profile-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )
    t = synthesize_transcripts(spark, n_convs).localCheckpoint()
    t.count()

    times = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 1)
        print(f"{name}: {times[name]}s", flush=True)
        return out

    chunks = timed("chunk", lambda: chunk_conversations(t).localCheckpoint())
    timed("chunk_count", chunks.count)
    ex = timed("extract", lambda: extract_chunks(chunks).localCheckpoint())
    parsed = timed("parse", lambda: parse_extractions(ex).localCheckpoint())
    timed("parse_count", parsed.count)
    e_raw, t_raw, m_raw = entities_raw(parsed), triples_raw(parsed), mentions_raw(parsed)
    emb = timed(
        "catalog_embed",
        lambda: with_embeddings(entity_catalog(e_raw, chunks)).localCheckpoint(),
    )
    sim = timed("similar", lambda: similar_entities(emb, method="auto").localCheckpoint())
    wcc = timed(
        "wcc",
        lambda: consecutive_component_ids(
            connected_components(sim.select("src", "dst"), nodes=emb.select("entity_id"))
        )
        .select(F.col("node").alias("entity_id"), "wcc")
        .localCheckpoint(),
    )
    cmap = timed("canonical", lambda: resolve_canonical(wcc).localCheckpoint())
    timed("rewrite_triples", lambda: rewrite_triples(t_raw, cmap).count())
    timed("rewrite_mentions", lambda: rewrite_mentions(m_raw, cmap).count())
    print("TOTAL(sans gen):", round(sum(times.values()), 1), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
