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

# the job body lives in graph_rag_agent_spark/plans/benchjob.py — the
# ONE copy every scaling probe measures (see its module docstring)
RUNNER = r"""
import json, sys
sys.path.insert(0, {repo!r})
from graph_rag_agent_spark.plans.benchjob import run_kg_job
from graph_rag_agent_spark.session import get_spark

n_exec = {n_exec}
spark = get_spark(app_name=f"mjvm-{{n_exec}}",
                  master=f"local-cluster[{{n_exec}},4,4096]",
                  shuffle_partitions=32)
result = {{"executors": n_exec, **run_kg_job(spark, {n_convs})}}
spark.stop()
print("RESULT " + json.dumps(result))
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
