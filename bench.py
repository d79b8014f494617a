"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "turns_per_sec": ..., "kg_triples": ...}

The KG headline is the full construction pipeline (chunk → extract →
parse → link → canonicalize → communities) over a deterministic
synthetic transcript corpus sized by sf, plus the documents-derived
variant on the driver testdata. Relational headliners exercise the
join/window/agg operators from SURVEY.md §2.

The two-cluster-size scaling study (north rule) lives in
bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    # quiet-start gate (VERDICT r4 #4): previous rounds' committed
    # artifacts were captured at loadavg ~5 and every regression
    # adjudication had to route through BENCH/BASELINE.md's quiet-box
    # reruns. Rather than merely annotating, WAIT (bounded) for the
    # co-tenant load to drain so the committed artifact IS the quiet
    # run whenever the box allows it; if the budget expires loaded,
    # the loadavg_warning below still marks the artifact.
    quiet_wait_budget = float(
        os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT_S", "300")
    )
    quiet_waited = 0.0
    while os.getloadavg()[0] > 1.0 and quiet_waited < quiet_wait_budget:
        time.sleep(10)
        quiet_waited += 10

    import __spark_entry__ as entrymod
    from graph_rag_agent_spark.plans.inmem import build_kg_tables
    from graph_rag_agent_spark.session import get_spark
    from graph_rag_agent_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(
        app_name="grars-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    # Repeat count for the DETERMINISTIC read-only rows (best-of-N);
    # the stateful stream_build row is always single-shot. Override
    # with SPARK_GRAFT_BENCH_REPEATS=1 for a strictly single-shot run
    # (e.g. to compare against pre-round-3 single-shot records).
    n_repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    first_run: dict[str, float] = {}
    extra["loadavg_start"] = round(os.getloadavg()[0], 2)
    extra["quiet_wait_s"] = round(quiet_waited, 1)
    # loadavg gate (VERDICT r3 #8): a loaded box turns single rows into
    # noise (r3's only "regression" tracked loadavg 5.16). Annotate the
    # artifact so a contended run is recognizable by construction.
    if extra["loadavg_start"] > 1.0:
        extra["loadavg_warning"] = (
            "loadavg > 1 at start: timings may be contention-dominated"
        )
        print(
            f"WARNING: loadavg {extra['loadavg_start']} > 1.0 — "
            "bench timings may be noise-dominated",
            file=sys.stderr,
        )
    # metadata: repeats applies to the repeatable query rows only;
    # stream_build (stateful) is single-shot by construction
    extra["bench_repeats"] = n_repeats
    extra["single_shot_rows"] = ["stream_build", "noop_cycle", "delta_cycle"]

    def timed(name: str, fn, repeats: int = 1):
        """Time fn; with repeats=N record the best of N runs.

        This box carries external co-tenant load (documented swings of
        3-7x on individual rows in BENCH/BASELINE.md), so single-shot
        timings of deterministic read-only queries are noise-dominated
        at the tail. Best-of-N is the standard steady-state measure:
        all runs execute the identical plan on identical input; the
        min is the number the code actually costs. The first run's
        time is reported separately (first_run_s) so single-shot
        history stays comparable. Stateful rows (stream_build) stay
        single-shot."""
        best = None
        out = None
        for i in range(max(1, repeats)):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            if i == 0 and repeats > 1:
                first_run[name] = round(dt, 3)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # KG pipeline over synthetic transcripts (sized by sf)
    n_convs = max(100, int(20_000 * sf))
    transcripts = synthesize_transcripts(spark, n_convs).localCheckpoint()
    n_turns = transcripts.count()

    # warm the Python workers with the real pipeline on a tiny sample
    # (pandas/numpy/package imports cost ~14 CPU-s per worker on first
    # touch — a warm cluster, not process cold-start, is the steady
    # state the numbers are meant to predict)
    warm = synthesize_transcripts(spark, 24).localCheckpoint()
    build_kg_tables(
        warm,
        similarity_method="auto",
        with_communities=True,
        with_signatures=True,
    )["triples"].count()

    def kg_build():
        tables = build_kg_tables(
            transcripts,
            similarity_method="auto",
            with_communities=True,
            with_signatures=True,
        )
        return (
            tables["triples"].count(),
            tables["membership"].count(),
        )

    n_triples, _ = timed("kg_build_synthetic", kg_build, repeats=n_repeats)
    extra["turns_per_sec"] = round(n_turns / timings["kg_build_synthetic"], 1)
    extra["kg_triples"] = n_triples
    extra["n_turns"] = n_turns

    # documents-derived KG slice (driver testdata)
    timed(
        "kg_triples_docs",
        lambda: entrymod._kg_triples(spark, sf_dir).count(),
        repeats=n_repeats,
    )

    # the distributed linking chain alone (LSH → CC → judge → map),
    # all driver fast paths disabled — the 100 TB path, measured
    qs = entrymod.queries()
    timed(
        "link_chain_distributed",
        lambda: qs["entity_canonical_map"](spark, sf_dir).count(),
        repeats=n_repeats,
    )

    # relational + pipeline-extension headliners
    for name in [
        "mention_counts",
        "topk_per_group",
        "edit_distance_pairs",
        "dedup_edges",
        "connected_components",
        "chunk_windows",
        "chunk_vector_topk",
        "minhash_pairs",
        "simhash_pairs",
        "graph_coverage_per_sample",
        "local_search_batch",
        "global_search_map",
        "cache_lookup",
        "evidence_contradictions",
        "query_decomposition",
    ]:
        timed(name, lambda n=name: qs[n](spark, sf_dir).count(), repeats=n_repeats)

    # streaming → incremental build (the delta path), measured LAST so
    # its stream/warehouse state can't perturb the query timings above.
    # Two availableNow micro-batch deliveries through the foreachBatch
    # pipeline over a ~12%-of-corpus slice: the first batch BOOTSTRAPS
    # (build_all, bucketed layout + inverted indexes — a one-time cost,
    # untimed), the timed number is the SECOND batch: the steady-state
    # delta-proportional incremental cycle (change detection, conv-keyed
    # MERGEs, global link stages, delta triple/mention re-winnering).
    # At tiny per-batch volumes turns/sec is floor-bound by the cycle's
    # fixed orchestration latency (~60 driver barriers), the cost that
    # AMORTIZES at real batch sizes.
    _stream_dirs: list[str] = []

    def stream_build():
        import tempfile

        from pyspark.sql import functions as F

        from graph_rag_agent_spark.plans.build import BuildConfig
        from graph_rag_agent_spark.streaming.pipeline import (
            stream_incremental_build,
        )

        src = tempfile.mkdtemp(prefix="bench_stream_src_")
        wh = tempfile.mkdtemp(prefix="bench_stream_wh_")
        ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")
        _stream_dirs.extend([src, wh, ckpt])
        cfg = BuildConfig(warehouse=wh, resume=False, bucket_convs=16)
        stream_t = synthesize_transcripts(
            spark, max(60, n_convs // 8)
        ).localCheckpoint()
        half = F.pmod(F.xxhash64("conv_id"), F.lit(2))
        # bootstrap delivery (untimed one-time cost)
        stream_t.where(half == 0).coalesce(1).write.mode("append").parquet(src)
        q = stream_incremental_build(spark, src, wh, ckpt, cfg=cfg)
        q.awaitTermination(600)
        # steady-state incremental delivery (the timed path)
        batch2 = stream_t.where(half == 1)
        n_batch2 = batch2.count()
        batch2.coalesce(1).write.mode("append").parquet(src)

        def run_batch2():
            q2 = stream_incremental_build(spark, src, wh, ckpt, cfg=cfg)
            q2.awaitTermination(600)
            return n_batch2

        out = timed("stream_build", run_batch2)

        # the steady-state FLOOR: a cycle that detects zero changes
        # takes the unchanged-source shortcut (registry diff + metadata
        # probes, then return stored tables) — the per-cycle tax a
        # quiet stream pays between real deltas.
        from graph_rag_agent_spark.plans.build import _Warehouse
        from graph_rag_agent_spark.plans.incremental import (
            incremental_update,
        )

        cur = _Warehouse(spark, wh).read("transcripts").localCheckpoint()

        def run_noop():
            incremental_update(spark, cur, wh, cfg=cfg)
            return None

        timed("noop_cycle", run_noop)
        return out

    n_stream_turns = stream_build()
    extra["stream_turns_per_sec"] = round(
        n_stream_turns / timings["stream_build"], 1
    )

    # delta-proportional cycle at bench scale (VERDICT r3 #7): a 1 %
    # conversation delta against a FULL-corpus warehouse — the
    # wall-clock companion to the lineage delta-proportionality proof.
    # Bootstrap build_all is the untimed one-time cost; the timed row
    # is one incremental cycle (detection → conv MERGEs → link →
    # delta re-winnering → side-table delta-MERGE) and should sit far
    # under kg_build_synthetic.
    def delta_cycle():
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from graph_rag_agent_spark.plans.build import BuildConfig, build_all
        from graph_rag_agent_spark.plans.incremental import incremental_update

        wh = tempfile.mkdtemp(prefix="bench_delta_wh_")
        try:
            cfg = BuildConfig(warehouse=wh, resume=False, bucket_convs=16)
            # bootstrap: the full build_all on the SAME warehouse
            # machinery — the apples-to-apples denominator for the
            # delta_cycle claim (untimed row, recorded in extra)
            t0 = time.time()
            build_all(spark, transcripts, cfg)
            extra["delta_bootstrap_s"] = round(time.time() - t0, 3)
            sel = F.pmod(F.xxhash64("conv_id"), F.lit(100)) == 0
            mx = transcripts.groupBy("conv_id").agg(
                F.max("turn_idx").alias("__mx")
            )
            # the delta: drop the LAST turn of ~1 % of conversations
            v2 = (
                transcripts.join(mx, "conv_id")
                .where(~(sel & (F.col("turn_idx") == F.col("__mx"))))
                .drop("__mx")
                .localCheckpoint()
            )
            n_changed = (
                transcripts.where(sel).select("conv_id").distinct().count()
            )

            def run_cycle():
                incremental_update(spark, v2, wh, cfg=cfg)
                return n_changed

            return timed("delta_cycle", run_cycle)
        finally:
            # a full sf-sized warehouse per bench run would otherwise
            # accumulate in /tmp until Spark's own spill space runs out
            shutil.rmtree(wh, ignore_errors=True)

    extra["delta_cycle_changed_convs"] = delta_cycle()

    # corpus-bound delta cycle (VERDICT r4 #5): with the free stub
    # extractor, delta ≈ bootstrap at sandbox scale because both pay
    # only the fixed orchestration floor — the extraction saving the
    # delta path exists for costs milliseconds. This variant makes
    # extraction COST-BEARING (a per-chunk sleep simulating the
    # reference's LLM batch economics, build/build_graph.py:109 — real
    # calls run seconds per 5-chunk batch) so the 1 %-delta claim
    # becomes a wall-clock ratio instead of a lineage argument: the
    # bootstrap pays the cost on every distinct chunk, the delta cycle
    # only on the changed conversations' new tail chunks (everything
    # else hits the extraction cache by content hash).
    def delta_cycle_costed():
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from graph_rag_agent_spark.core.stub_extract import stub_extract
        from graph_rag_agent_spark.plans.build import BuildConfig, build_all
        from graph_rag_agent_spark.plans.incremental import incremental_update

        cost_s = float(
            os.environ.get("SPARK_GRAFT_BENCH_EXTRACT_COST_S", "5.0")
        )
        if cost_s <= 0:
            return None  # opt-out knob

        def costed_extract(text: str, _c=cost_s) -> str:
            time.sleep(_c)
            return stub_extract(text)

        wh = tempfile.mkdtemp(prefix="bench_delta_costed_wh_")
        try:
            cfg = BuildConfig(
                warehouse=wh,
                resume=False,
                bucket_convs=16,
                extractor=costed_extract,
            )
            t0 = time.time()
            build_all(spark, transcripts, cfg)
            extra["delta_costed_bootstrap_s"] = round(time.time() - t0, 3)
            extra["delta_costed_extract_cost_s"] = cost_s
            sel = F.pmod(F.xxhash64("conv_id"), F.lit(100)) == 0
            mx = transcripts.groupBy("conv_id").agg(
                F.max("turn_idx").alias("__mx")
            )
            v2 = (
                transcripts.join(mx, "conv_id")
                .where(~(sel & (F.col("turn_idx") == F.col("__mx"))))
                .drop("__mx")
                .localCheckpoint()
            )

            def run_cycle():
                incremental_update(spark, v2, wh, cfg=cfg)
                return None

            timed("delta_cycle_costed", run_cycle)
            # the costed row's wall-clock is dominated by DELIBERATE
            # sleeps — keep it out of the queries/value headline so
            # round-over-round comparisons stay like-for-like; it
            # lives in extra alongside its bootstrap + ratio
            extra["delta_cycle_costed_s"] = timings.pop(
                "delta_cycle_costed"
            )
            extra["delta_costed_ratio"] = round(
                extra["delta_cycle_costed_s"]
                / extra["delta_costed_bootstrap_s"],
                4,
            )
            # extraction-phase decomposition from the lineage log: the
            # cost-bearing stage alone, separating the delta's fixed
            # orchestration floor from the model-call economics the
            # delta path exists to avoid
            from pyspark.sql import functions as F2

            lin = spark.read.parquet(f"{wh}/lineage")
            span = F2.sum(
                F2.col("finished_at").cast("double")
                - F2.col("started_at").cast("double")
            )
            boot_ext = (
                lin.where(F2.col("stage") == "extract").agg(span).first()[0]
            )
            delta_ext = (
                lin.where(F2.col("stage") == "incr_extract")
                .agg(span)
                .first()[0]
            )
            extra["delta_costed_bootstrap_extract_s"] = round(
                boot_ext or 0.0, 3
            )
            extra["delta_costed_delta_extract_s"] = round(delta_ext or 0.0, 3)
            if boot_ext:
                extra["delta_costed_extract_ratio"] = round(
                    (delta_ext or 0.0) / boot_ext, 4
                )
        finally:
            shutil.rmtree(wh, ignore_errors=True)
        return None

    delta_cycle_costed()
    extra["loadavg_end"] = round(os.getloadavg()[0], 2)

    import shutil

    for d in _stream_dirs:
        shutil.rmtree(d, ignore_errors=True)

    spark.stop()

    result = {
        "metric": "kg_construction_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extra,
    }
    if first_run:
        # single-shot (cold) timings of the repeated rows, for
        # comparison against pre-round-3 single-shot records
        result["first_run_s"] = first_run
    print(json.dumps(result))


if __name__ == "__main__":
    main()
