"""Full build plan vs the oracle: the north-rule P/R gate on canonical
triples, table-level equality, and kill/resume semantics."""

from __future__ import annotations

import pytest

from graph_rag_agent_spark.oracle.pipeline_oracle import precision_recall
from graph_rag_agent_spark.plans.build import BuildConfig, build_all


@pytest.fixture(scope="module")
def built(spark, transcripts_df, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    cfg = BuildConfig(warehouse=wh, similarity_method="exact", extraction_buckets=4)
    return build_all(spark, transcripts_df, cfg)


def test_triples_pr_gate(built, oracle_small):
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in built.tables["triples"].collect()
    }
    want = oracle_small.triple_set()
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0


def test_canonical_entities_match_oracle(built, oracle_small):
    got = {
        (r["entity_id"], r["entity_type"], r["description"])
        for r in built.tables["entities"].collect()
    }
    want = {
        (e["entity_id"], e["entity_type"], e["description"])
        for e in oracle_small.entities
    }
    assert got == want


def test_mentions_match_oracle(built, oracle_small):
    got = {
        (r["chunk_id"], r["entity_id"]) for r in built.tables["mentions"].collect()
    }
    want = {(m["chunk_id"], m["entity_id"]) for m in oracle_small.mentions}
    assert got == want


def test_membership_matches_oracle(built, oracle_small):
    got = {
        (r["entity_id"], r["community_id"], r["level"])
        for r in built.tables["membership"].collect()
    }
    want = {
        (m["entity_id"], m["community_id"], m["level"])
        for m in oracle_small.membership
    }
    assert got == want


def test_hierarchy_matches_oracle(built, oracle_small):
    got = {
        (r["child_community"], r["parent_community"])
        for r in built.tables["hierarchy"].collect()
    }
    want = {
        (h["child_community"], h["parent_community"])
        for h in oracle_small.hierarchy
    }
    assert got == want


def test_communities_match_oracle(built, oracle_small):
    got = {
        r["community_id"]: (
            r["level"],
            r["community_rank"],
            r["weight"],
            r["summary"],
            r["full_content"],
        )
        for r in built.tables["communities"].collect()
    }
    want = {
        c["community_id"]: (
            c["level"],
            c["community_rank"],
            c["weight"],
            c["summary"],
            c["full_content"],
        )
        for c in oracle_small.communities
    }
    assert got == want


def test_lineage_written(built, spark):
    lineage = built.tables  # lineage is on disk; read via any table's warehouse
    # reconstruct path from a written table
    # (triples table was read from <warehouse>/triples)
    path = built.tables["triples"].inputFiles()[0].split("/triples/")[0]
    rows = spark.read.parquet(path + "/lineage").collect()
    stages = {r["stage"] for r in rows}
    assert "extract" in stages  # per-bucket extraction metrics
    extract_rows = [r for r in rows if r["stage"] == "extract"]
    assert {r["partition_id"] for r in extract_rows} == {0, 1, 2, 3}
    # rows = per-bucket APPENDED count (not a cumulative cache re-scan
    # — that was an O(B²) tax); empty buckets legitimately record 0,
    # and the per-bucket counts must add up to the extraction total
    assert all(r["rows"] >= 0 for r in extract_rows)
    assert sum(r["rows"] for r in extract_rows) == built.tables[
        "extractions"
    ].count()


def test_kill_and_resume_identical(spark, transcripts_df, oracle_small, tmp_path_factory):
    """Kill after extraction bucket 1 → resume → identical triples
    (north rule resumability)."""
    wh = str(tmp_path_factory.mktemp("warehouse_resume"))
    cfg = BuildConfig(
        warehouse=wh,
        similarity_method="exact",
        extraction_buckets=4,
        fail_after_bucket=1,
    )
    with pytest.raises(RuntimeError, match="simulated failure"):
        build_all(spark, transcripts_df, cfg)

    # resume: buckets 0-1 must be skipped (lineage), 2-3 computed
    cfg2 = BuildConfig(warehouse=wh, similarity_method="exact", extraction_buckets=4)
    res = build_all(spark, transcripts_df, cfg2)
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in res.tables["triples"].collect()
    }
    assert got == oracle_small.triple_set()

    lineage = spark.read.parquet(f"{wh}/lineage")
    extract_rows = [r for r in lineage.collect() if r["stage"] == "extract"]
    # buckets 0,1 appear once (first run), 2,3 once (resume run)
    by_bucket = {}
    for r in extract_rows:
        by_bucket.setdefault(r["partition_id"], 0)
        by_bucket[r["partition_id"]] += 1
    assert by_bucket == {0: 1, 1: 1, 2: 1, 3: 1}
