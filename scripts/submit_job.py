"""spark-submit entry point — the north rule's literal deployment shape:

    spark-submit --master <cluster> --py-files graph_rag_agent_spark.zip \
        scripts/submit_job.py [n_convs]

The package import below resolves from the --py-files zip (the launcher
puts it on the driver's sys.path and ships it to every executor); this
file deliberately does NOT sys.path-insert the repo, so a successful run
proves the zip is self-contained. The job itself is the shared
benchmark job every scaling probe measures
(graph_rag_agent_spark/plans/benchjob.py: chunk → extract → parse →
link → canonicalize → rewrite over a deterministic synthetic transcript
corpus); it prints one `RESULT {json}` line with phase timings and
turns/sec — the payload `scripts/spark_submit_probe.py` compares across
cluster sizes for the N → 4N scaling-efficiency gate.
"""

import json
import sys

from graph_rag_agent_spark.plans.benchjob import run_kg_job
from graph_rag_agent_spark.session import get_spark


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    # master="" → inherit spark-submit's --master
    spark = get_spark(app_name="grars-submit", master="", shuffle_partitions=32)
    master = spark.sparkContext.getConf().get("spark.master")
    result = {"master": master, **run_kg_job(spark, n_convs)}
    spark.stop()
    print("RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
