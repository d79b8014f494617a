"""spark-submit entry point — the north rule's literal deployment shape:

    spark-submit --master <cluster> --py-files graph_rag_agent_spark.zip \
        scripts/submit_job.py [n_convs]

The package import below resolves from the --py-files zip (the launcher
puts it on the driver's sys.path and ships it to every executor); this
file deliberately does NOT sys.path-insert the repo, so a successful run
proves the zip is self-contained. The job runs the KG construction
pipeline (chunk -> extract -> parse -> link -> canonicalize -> rewrite)
over a deterministic synthetic transcript corpus and prints one
`RESULT {json}` line with phase timings and turns/sec — the payload
`scripts/spark_submit_probe.py` compares across cluster sizes for the
N -> 4N scaling-efficiency gate.
"""

import json
import sys
import time

from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.canonicalize import (
    resolve_canonical,
    rewrite_triples,
)
from graph_rag_agent_spark.operators.chunking import chunk_conversations
from graph_rag_agent_spark.operators.components import (
    connected_components,
    consecutive_component_ids,
)
from graph_rag_agent_spark.operators.dedup import chunk_signature_columns
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.linking import (
    entity_catalog,
    link_entities_driver_path,
    similar_entities,
    with_embeddings,
)
from graph_rag_agent_spark.operators.parsing import (
    entities_raw,
    parse_extractions,
    triples_raw,
)
from graph_rag_agent_spark.plans.inmem import build_kg_tables
from graph_rag_agent_spark.session import get_spark
from graph_rag_agent_spark.sources.transcripts import synthesize_transcripts


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    # master="" → inherit spark-submit's --master
    spark = get_spark(app_name="grars-submit", master="", shuffle_partitions=32)
    n_exec = spark.sparkContext.getConf().get("spark.master")

    transcripts = synthesize_transcripts(spark, n_convs).localCheckpoint()
    n_turns = transcripts.count()
    # warm the Python workers (package+numpy import cost is per-process
    # one-time, not steady-state throughput)
    warm = synthesize_transcripts(spark, 200).localCheckpoint()
    build_kg_tables(warm, similarity_method="auto", with_signatures=True)[
        "triples"
    ].count()

    phases = {}
    t0 = time.time()
    chunks = chunk_signature_columns(chunk_conversations(transcripts)).localCheckpoint()
    parsed = parse_extractions(extract_chunks(chunks)).localCheckpoint()
    e_raw, t_raw = entities_raw(parsed), triples_raw(parsed)
    parsed.count()
    phases["corpus"] = round(time.time() - t0, 2)

    t1 = time.time()
    catalog = entity_catalog(e_raw, chunks)
    linked = link_entities_driver_path(catalog)
    if linked is not None:
        cmap = linked["canonical_map"]
    else:
        embedded = with_embeddings(catalog).localCheckpoint()
        similar = similar_entities(embedded, method="auto").localCheckpoint()
        wcc = (
            consecutive_component_ids(
                connected_components(
                    similar.select("src", "dst"),
                    nodes=embedded.select("entity_id"),
                )
            )
            .select(F.col("node").alias("entity_id"), "wcc")
            .localCheckpoint()
        )
        cmap = resolve_canonical(wcc).localCheckpoint()
    phases["link"] = round(time.time() - t1, 2)

    t2 = time.time()
    n_triples = rewrite_triples(t_raw, cmap).count()
    phases["rewrite"] = round(time.time() - t2, 2)
    elapsed = time.time() - t0
    spark.stop()
    print(
        "RESULT "
        + json.dumps(
            {
                "master": n_exec,
                "n_turns": n_turns,
                "n_triples": n_triples,
                "seconds": round(elapsed, 2),
                "phases": phases,
                "turns_per_sec": round(n_turns / elapsed, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
