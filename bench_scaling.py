"""Two-cluster-size scaling study (north rule).

The rule's criterion — ≥0.8 throughput scaling efficiency from N to
4N executors — cannot use a real cluster in this sandbox, so per
BASELINE.md we run the SAME job on the SAME input at local[8] and
local[32] (8 vs 32 executor threads, the sanctioned proxy) and report
throughput at both plus efficiency = (thr_32 / thr_8) / 4.

Job under test: the KG construction pipeline (chunk → extract →
parse → entity-link → canonicalize) over a deterministic synthetic
transcript corpus, including the mega-conversation skew fixture.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python bench_scaling.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from graph_rag_agent_spark.session import get_spark
from graph_rag_agent_spark.sources.transcripts import synthesize_transcripts
from graph_rag_agent_spark.plans.inmem import build_kg_tables

cores = {cores}
n_convs = {n_convs}
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
transcripts = synthesize_transcripts(spark, n_convs).localCheckpoint()
n_turns = transcripts.count()
t0 = time.time()
tables = build_kg_tables(transcripts, similarity_method="auto")
n_triples = tables["triples"].count()
elapsed = time.time() - t0
spark.stop()
print("RESULT " + json.dumps({{"cores": cores, "n_turns": n_turns,
    "n_triples": n_triples, "seconds": round(elapsed, 2),
    "turns_per_sec": round(n_turns / elapsed, 1)}}))
"""


def run_at(cores: int, n_convs: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = RUNNER.format(repo=repo, cores=cores, n_convs=n_convs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(f"run at {cores} cores failed:\n{out.stderr[-3000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    results = {}
    for cores in (8, 32):
        results[cores] = run_at(cores, n_convs)
        print(json.dumps(results[cores]))

    thr8 = results[8]["turns_per_sec"]
    thr32 = results[32]["turns_per_sec"]
    efficiency = round((thr32 / thr8) / 4, 3)

    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": efficiency,
        "unit": "ratio",
        "n_turns": results[8]["n_turns"],
        "throughput_local8_turns_per_sec": thr8,
        "throughput_local32_turns_per_sec": thr32,
        "seconds_local8": results[8]["seconds"],
        "seconds_local32": results[32]["seconds"],
    }
    print(json.dumps(summary))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-cluster-size scaling (north rule)

Same job (KG construction: chunk → extract → parse → link →
canonicalize over {results[8]['n_turns']:,} synthetic transcript turns
incl. a ~10% mega-conversation), same input, two parallelism levels —
the sandbox proxy for N vs 4N executors per BASELINE.md.

| parallelism | wall-clock (s) | throughput (turns/sec) |
|---|---|---|
| local[8]  (N)  | {results[8]['seconds']} | {thr8} |
| local[32] (4N) | {results[32]['seconds']} | {thr32} |

**Scaling efficiency (thr@32 / thr@8) / 4 = {efficiency}**
(target ≥ 0.8)

Reference single-node envelope for comparison: the reference builds
with MAX_WORKERS=4 threads + LLM batch 5 (BASELINE.md); its published
end-to-end numbers are query-side only (289.21 s avg per agent query,
readme.md:548) — no build-throughput figure exists, so the scaling
criterion above is the quantitative bar.

Skew note: conversation 0 holds ~10% of all turns; extraction is
repartitioned by chunk hash (operators/extraction.py) so the skew does
not serialize the expensive stage; AQE skew-join is enabled globally.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
