"""SparkSession factory tuned for the KG-construction workload.

Defaults chosen for the 100 TB design point, scaled down for local[N]:
  - AQE on (runtime partition coalescing + skew-join splitting) — the
    reference hand-tunes batch sizes instead (graph/extraction/
    graph_writer.py:216, graph/structure/struct_builder.py:339); AQE
    replaces all of that.
  - Arrow on — every Python boundary in this engine is a batched
    pandas UDF / mapInPandas, never row-at-a-time.
  - shuffle partitions sized to cores locally; on a real cluster this
    is set per-job (≈ 2-3× total cores) and AQE coalesces down.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graph-rag-agent-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # local mode hosts every executor thread + all localCheckpoint
        # blocks in the driver JVM; an undersized heap turns the
        # pipeline's checkpoint barriers into a GC storm (observed:
        # 30× CPU burn at 8g). Size like an executor on a real
        # cluster: ~2 GB/core + headroom for cached stage outputs.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # ParallelGC beats G1 ~15% on this string-heavy batch workload
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # iterative pipelines issue many small shuffle jobs; waiting
        # for data locality just stalls the scheduler (halves fixed
        # job latency in local mode, standard for shuffle-heavy jobs
        # with dynamic executors on clusters too)
        .config("spark.locality.wait", "0")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if "local-cluster" in master or "://" in master:
        # real executor JVMs don't share the driver's sys.path — ship
        # the package like spark-submit --py-files would
        spark.sparkContext.addPyFile(make_pyfiles_zip())
    return spark


def make_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip this package for spark-submit --py-files / addPyFile.

    The north rule's deployment shape: `spark-submit --py-files
    graph_rag_agent_spark.zip job.py` on a multi-executor cluster.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out_path = out_path or os.path.join(
        tempfile.gettempdir(), "graph_rag_agent_spark.zip"
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "graph_rag_agent_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return out_path
