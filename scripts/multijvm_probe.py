"""True multi-JVM N vs 4N EXECUTOR probe (local-cluster mode).

The closest sandbox proxy to "spark-submit on a cluster at N and 4N
executors": separate executor JVMs, real executor-to-executor shuffle,
the package shipped via addPyFile (session.get_spark does this for
local-cluster masters). Round 1 recorded NO scaling here (1 vs 4
executors both ~135 s) — root-caused in round 2 to driver-side
optimizer-statistics blowup (see BENCH/BASELINE.md); this probe is the
regression check.

Usage: python scripts/multijvm_probe.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from graph_rag_agent_spark.session import get_spark
from graph_rag_agent_spark.sources.transcripts import synthesize_transcripts
from graph_rag_agent_spark.operators.chunking import chunk_conversations
from graph_rag_agent_spark.operators.dedup import chunk_signature_columns
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.parsing import parse_extractions, entities_raw, triples_raw
from graph_rag_agent_spark.operators.linking import entity_catalog, link_entities_driver_path, similar_entities, with_embeddings
from graph_rag_agent_spark.operators.components import connected_components, consecutive_component_ids
from graph_rag_agent_spark.operators.canonicalize import resolve_canonical, rewrite_triples

n_exec = {n_exec}
spark = get_spark(app_name=f"mjvm-{{n_exec}}",
                  master=f"local-cluster[{{n_exec}},4,4096]",
                  shuffle_partitions=32)
transcripts = synthesize_transcripts(spark, {n_convs}).localCheckpoint()
n_turns = transcripts.count()
warm = synthesize_transcripts(spark, 200).localCheckpoint()
from graph_rag_agent_spark.plans.inmem import build_kg_tables
build_kg_tables(warm, similarity_method="auto", with_signatures=True)["triples"].count()

phases = {{}}
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
    embedded, cmap = linked["embedded"], linked["canonical_map"]
else:
    embedded = with_embeddings(catalog).localCheckpoint()
    similar = similar_entities(embedded, method="auto").localCheckpoint()
    wcc = consecutive_component_ids(
        connected_components(similar.select("src", "dst"),
                             nodes=embedded.select("entity_id"))
    ).select(F.col("node").alias("entity_id"), "wcc").localCheckpoint()
    cmap = resolve_canonical(wcc).localCheckpoint()
phases["link"] = round(time.time() - t1, 2)
t2 = time.time()
n_triples = rewrite_triples(t_raw, cmap).count()
phases["rewrite"] = round(time.time() - t2, 2)
elapsed = time.time() - t0
spark.stop()
print("RESULT " + json.dumps({{"executors": n_exec, "n_turns": n_turns,
    "n_triples": n_triples, "seconds": round(elapsed, 2), "phases": phases,
    "turns_per_sec": round(n_turns / elapsed, 1)}}))
"""


def run_at(n_exec: int, n_convs: int) -> dict:
    code = RUNNER.format(repo=REPO, n_exec=n_exec, n_convs=n_convs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(f"{n_exec} executors failed:\n{out.stderr[-3000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    results = {}
    for n_exec in (1, 4):
        results[n_exec] = run_at(n_exec, n_convs)
        print(json.dumps(results[n_exec]), flush=True)
    eff = (results[4]["turns_per_sec"] / results[1]["turns_per_sec"]) / 4
    corpus_eff = (results[1]["phases"]["corpus"] / results[4]["phases"]["corpus"]) / 4
    summary = {
        "metric": "multijvm_scaling_1_to_4_executors",
        "raw": round(eff, 3),
        "corpus_phase": round(corpus_eff, 3),
        "unit": "ratio",
        "runs": {str(k): v for k, v in results.items()},
    }
    print(json.dumps(summary))
    # persist for bench_scaling.py's BASELINE.md renderer
    out = os.path.join(REPO, "BENCH", "multijvm.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
