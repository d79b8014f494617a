"""Warehouse maintenance: vacuum + compaction (plans/maintenance.py).

The hot incremental cycle deliberately leaves superseded turn-log
versions, orphaned chunk embeddings and stale extraction-cache rows
behind (delta-proportional cycles defer the global reference counts);
these tests prove the periodic maintenance pass reclaims exactly that
garbage without changing any observable table or breaking later
cycles."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graph_rag_agent_spark import schemas
from graph_rag_agent_spark.core.gen import generate_transcripts
from graph_rag_agent_spark.plans.build import BuildConfig, build_all
from graph_rag_agent_spark.plans.incremental import incremental_update
from graph_rag_agent_spark.plans.maintenance import (
    compact_table,
    maintain_warehouse,
    vacuum_chunk_embeddings,
    vacuum_extraction_cache,
    vacuum_turn_log,
)
from graph_rag_agent_spark.plans.merge import table_bucket_spec


def _snapshot_set(spark, turn_log):
    from graph_rag_agent_spark.streaming.pipeline import (
        latest_conversation_snapshot,
    )

    return {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in latest_conversation_snapshot(
            spark.read.parquet(turn_log)
        ).collect()
    }


def test_turn_log_vacuum_preserves_snapshot(spark, tmp_path_factory):
    """Two stream deliveries (second re-delivers a modified
    conversation), then vacuum: the latest-version snapshot is
    bit-identical, the superseded rows are gone, the all-live batch
    partition is not rewritten, and a post-vacuum delivery still
    builds correctly."""
    from graph_rag_agent_spark.streaming.pipeline import (
        stream_incremental_build,
    )

    src = str(tmp_path_factory.mktemp("vac_src"))
    wh = str(tmp_path_factory.mktemp("vac_wh"))
    ckpt = str(tmp_path_factory.mktemp("vac_ckpt"))
    cfg = BuildConfig(
        warehouse=wh, similarity_method="exact", extraction_buckets=2
    )
    rows = generate_transcripts(8)
    batch1 = [r for r in rows if r["conv_id"] != "conv-000005"]
    conv1_v2 = [
        r
        for r in rows
        if r["conv_id"] == "conv-000001" and r["turn_idx"] < 5
    ]
    conv5 = [r for r in rows if r["conv_id"] == "conv-000005"]

    def deliver(batch_rows):
        spark.createDataFrame(
            batch_rows, schema=schemas.TRANSCRIPTS
        ).coalesce(1).write.mode("append").parquet(src)
        q = stream_incremental_build(spark, src, wh, ckpt, cfg=cfg)
        q.awaitTermination(300)

    deliver(batch1)
    deliver(conv1_v2 + conv5)

    turn_log = f"{wh}/turn_log"
    before = _snapshot_set(spark, turn_log)
    batch1_superseded = [
        r for r in batch1 if r["conv_id"] == "conv-000001"
    ]
    live_part_files = sorted(os.listdir(f"{turn_log}/ingest_batch=1"))

    report = vacuum_turn_log(spark, wh)
    assert report["rows_deleted"] == len(batch1_superseded)
    assert report["partitions_rewritten"] == 1  # batch 0 keeps live rows
    assert report["partitions_removed"] == 0
    assert _snapshot_set(spark, turn_log) == before
    # every surviving row IS the live version now
    assert spark.read.parquet(turn_log).count() == len(before)
    # the all-live partition (batch 1) was never rewritten
    assert sorted(os.listdir(f"{turn_log}/ingest_batch=1")) == live_part_files
    # idempotent: a second vacuum is a metadata-only no-op
    assert vacuum_turn_log(spark, wh)["rows_deleted"] == 0

    # the pipeline keeps working on the vacuumed log: a truncated
    # re-delivery of conv-000005 replaces it in the snapshot, all
    # other conversations are untouched
    conv5_v2 = [dict(r, text=r["text"] + " addendum") for r in conv5[:3]]
    deliver(conv5_v2)
    after = _snapshot_set(spark, turn_log)
    after5 = {(t, txt) for c, t, txt in after if c == "conv-000005"}
    assert len(after5) == 3
    assert all(txt.endswith("addendum") for _, txt in after5)
    assert {x for x in after if x[0] != "conv-000005"} == {
        x for x in before if x[0] != "conv-000005"
    }


def test_vacuum_orphans_and_maintain_warehouse(spark, tmp_path_factory):
    """Modified + deleted conversations orphan their old content-hash
    chunk ids in chunk_embeddings and the extraction cache; the vacuum
    reclaims exactly those rows, preserves every live row, keeps the
    bucket layout, and the next incremental cycle still works."""
    wh = str(tmp_path_factory.mktemp("vac2_wh"))
    cfg = BuildConfig(
        warehouse=wh,
        similarity_method="exact",
        extraction_buckets=2,
        bucket_convs=8,
    )
    rows = generate_transcripts(10)
    build_all(
        spark,
        spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS),
        cfg,
    )

    # fresh build, zero orphans: the cache vacuum reclaims nothing but
    # the compaction still bin-packs its per-extraction-bucket files
    report0 = maintain_warehouse(spark, wh)
    assert report0["extraction_cache"]["rows_deleted"] == 0
    assert report0["compact_extraction_cache"]["files_before"] == 2
    assert report0["compact_extraction_cache"]["files_after"] == 1

    # v2: delete conv-000002, rewrite conv-000001's text (new chunk ids)
    v2_rows = [
        dict(r, text=r["text"] + " rewritten")
        if r["conv_id"] == "conv-000001"
        else r
        for r in rows
        if r["conv_id"] != "conv-000002"
    ]
    incremental_update(
        spark,
        spark.createDataFrame(v2_rows, schema=schemas.TRANSCRIPTS),
        wh,
        cfg=cfg,
    )

    live = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{wh}/chunks")
        .select("chunk_id")
        .distinct()
        .collect()
    }
    ce_before = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{wh}/chunk_embeddings")
        .select("chunk_id")
        .collect()
    }
    orphans = ce_before - live
    assert orphans, "fixture must actually orphan some embeddings"
    # the extraction-cache dir is only written by build_all (the delta
    # cycle reads its cache from the extractions table), so it holds
    # exactly the v1 chunk ids — its live remainder is v1 ∩ live
    cache_before = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{wh}/extraction_cache")
        .select("chunk_id")
        .collect()
    }
    live_emb_before = {
        (r["chunk_id"], tuple(r["embedding"]))
        for r in spark.read.parquet(f"{wh}/chunk_embeddings")
        .where(F.col("chunk_id").isin(list(live)))
        .collect()
    }

    report = maintain_warehouse(spark, wh)
    assert report["chunk_embeddings"]["rows_deleted"] == len(orphans)
    ce_after = spark.read.parquet(f"{wh}/chunk_embeddings")
    assert {r["chunk_id"] for r in ce_after.select("chunk_id").collect()} == live
    assert {
        (r["chunk_id"], tuple(r["embedding"])) for r in ce_after.collect()
    } == live_emb_before
    # bucket layout survives the pruned delete
    assert table_bucket_spec(f"{wh}/chunk_embeddings")["key"] == "chunk_id"

    # extraction cache: only live chunk ids remain, live results intact
    assert report["extraction_cache"]["rows_deleted"] == len(
        cache_before - live
    )
    cache_ids = {
        r["chunk_id"]
        for r in spark.read.parquet(f"{wh}/extraction_cache").collect()
    }
    assert cache_ids == cache_before & live

    # maintenance lineage rows landed with the reclaimed-row totals
    # (first pass reclaimed 0, this one the orphan total)
    maint = (
        spark.read.parquet(f"{wh}/lineage")
        .where(F.col("stage") == "maintenance")
        .collect()
    )
    assert sorted(r["rows"] for r in maint) == [
        0,
        sum(step.get("rows_deleted", 0) for step in report.values()),
    ]

    # second pass reclaims nothing; later cycles still green
    report2 = maintain_warehouse(spark, wh)
    assert report2["chunk_embeddings"]["rows_deleted"] == 0
    assert report2["extraction_cache"]["rows_deleted"] == 0
    tables = incremental_update(
        spark,
        spark.createDataFrame(v2_rows, schema=schemas.TRANSCRIPTS),
        wh,
        cfg=cfg,
    )
    from graph_rag_agent_spark.oracle import oracle_build

    assert {
        (r["subj"], r["pred"], r["obj"]) for r in tables["triples"].collect()
    } == oracle_build(v2_rows).triple_set()


def test_compact_table_merges_small_files(spark, tmp_path):
    """N appended files → 1, rows preserved; compact-again is a no-op
    that reads nothing."""
    path = str(tmp_path / "lineage_like")
    for i in range(4):
        spark.createDataFrame(
            [(f"stage-{i}", i)], "stage string, n int"
        ).coalesce(1).write.mode("append").parquet(path)
    rows_before = {
        tuple(r) for r in spark.read.parquet(path).collect()
    }
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files == 4

    report = compact_table(spark, path)
    assert report["files_before"] == 4 and report["files_after"] == 1
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == rows_before

    report2 = compact_table(spark, path)
    assert report2["units_compacted"] == 0 and report2["files_after"] == 1


def test_corrupt_link_sidecar_reads_as_none(spark, tmp_path):
    """A truncated/corrupt _link_params.json (crash mid-dump) must
    read as None — declining linking reuse — not crash every later
    incremental cycle."""
    from graph_rag_agent_spark.plans.build import (
        LINK_PARAMS_FILE,
        _Warehouse,
    )

    wh_dir = str(tmp_path / "wh")
    os.makedirs(wh_dir)
    with open(os.path.join(wh_dir, LINK_PARAMS_FILE), "w") as fh:
        fh.write('{"similarity_method": "ex')  # partial dump
    assert _Warehouse(spark, wh_dir).stored_link_params() is None


def test_vacuum_missing_tables_noop(spark, tmp_path):
    """Maintenance over an empty/partial warehouse is a clean no-op."""
    wh = str(tmp_path / "empty_wh")
    os.makedirs(wh)
    assert vacuum_turn_log(spark, wh)["rows_deleted"] == 0
    assert vacuum_chunk_embeddings(spark, wh)["rows_deleted"] == 0
    assert vacuum_extraction_cache(spark, wh)["rows_deleted"] == 0
