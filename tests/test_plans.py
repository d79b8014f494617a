"""Physical-plan audits: the properties that make the 100 TB claims
real — predicate pushdown and column pruning reach the parquet scan,
small dimension joins broadcast, hot paths stay inside whole-stage
codegen, and nothing degenerates into a cartesian product.

These assert on the EXECUTED plan string, so a regression in join
strategy or scan pruning fails CI rather than silently multiplying
shuffle bytes at scale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_filter_and_projection_reach_parquet_scan(spark, docs):
    q = docs.where(F.col("doc_id") % 2 == 0).where(
        F.col("lang") == "en"
    ).select("doc_id", "n_chars")
    plan = _plan(q)
    # the equality filter must be pushed into the scan, and the scan
    # must read only the referenced columns
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters:")[1].split("]")[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema, read_schema


def test_canonical_rewrite_broadcasts_the_map(spark):
    from graph_rag_agent_spark.operators.canonicalize import rewrite_triples

    triples = spark.createDataFrame(
        [("a", "REL", "b", "d", 1.0, "c0", "ch0")],
        "subj string, pred string, obj string, description string, "
        "weight double, conv_id string, chunk_id string",
    )
    cmap = spark.createDataFrame(
        [("a", "A")], "entity_id string, canonical_id string"
    )
    plan = _plan(rewrite_triples(triples, cmap))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_canonical_rewrite_gates_broadcast_on_map_size(spark, monkeypatch):
    # above the byte budget the map hint must disappear (a 10⁸-entity
    # canonical map would blow the 8 GB broadcast ceiling) and the
    # rewrite must fall back to a shuffled join — with identical rows.
    # autoBroadcastJoinThreshold is disabled so the assertion sees the
    # HINT's effect, not Catalyst's own statistics-driven conversion.
    import graph_rag_agent_spark.operators.canonicalize as canon

    triples = spark.createDataFrame(
        [("a", "REL", "b", "d", 1.0, "c0", "ch0"),
         ("x", "REL", "a", "e", 2.0, "c1", "ch1")],
        "subj string, pred string, obj string, description string, "
        "weight double, conv_id string, chunk_id string",
    )
    cmap = spark.createDataFrame(
        [("a", "A")], "entity_id string, canonical_id string"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = canon.rewrite_triples(triples, cmap)
        assert "BroadcastHashJoin" in _plan(hinted)

        monkeypatch.setattr(canon, "CMAP_BROADCAST_MAX_BYTES", 0)
        gated = canon.rewrite_triples(triples, cmap)
        assert "BroadcastHashJoin" not in _plan(gated)
        assert sorted(map(tuple, gated.collect())) == sorted(
            map(tuple, hinted.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mention_join_stays_codegen(spark, docs):
    # a representative JVM-only text-analysis query: no Python
    # evaluation (BatchEvalPython / ArrowEvalPython) in the plan
    from graph_rag_agent_spark.functions.textstats import (
        quality_score_x100,
        token_count,
    )

    q = docs.select(
        "doc_id", token_count("text"), quality_score_x100("text")
    )
    plan = _plan(q)
    assert "EvalPython" not in plan
    # executedPlan toString marks whole-stage codegen spans with *(n)
    assert "*(1)" in plan or "WholeStageCodegen" in plan


def test_no_cartesian_in_lsh_candidates(spark, docs):
    from graph_rag_agent_spark.operators.dedup import minhash_candidates

    plan = _plan(minhash_candidates(docs.limit(50), "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_topk_broadcasts_queries(spark, docs):
    from graph_rag_agent_spark.operators.chunk_index import (
        top_chunks_for_query,
        with_chunk_embeddings,
    )

    chunks = with_chunk_embeddings(
        docs.select(F.col("doc_id").alias("chunk_id"), "text")
    )
    plan = _plan(top_chunks_for_query(chunks, "query text", k=2))
    # the query side must ship as a broadcast, never shuffle the corpus
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_reuse_is_anti_join_not_rescan(spark):
    # the incremental plan's unchanged-reuse must appear as a
    # broadcast (semi/anti) join against the small changed-id set,
    # not a full re-shuffle of the fact table
    changed = spark.createDataFrame([("c1",)], "conv_id string")
    facts = spark.range(1000).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
        F.col("id").alias("v"),
    )
    reused = facts.join(F.broadcast(changed), "conv_id", "left_anti")
    plan = _plan(reused)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_label_numbering_has_no_global_sort(spark):
    # dense_number_labels (shared by WCC consecutive ids, community
    # level numbering, SLLPA label numbering) must never funnel the
    # label set through a single-partition Window sort
    from graph_rag_agent_spark.operators.components import dense_number_labels

    labels = spark.range(500).select(
        F.concat(F.lit("lab"), (F.col("id") % 97).cast("string")).alias("label")
    )
    numbered = dense_number_labels(labels, "label", "number")
    assert "SinglePartition" not in _plan(numbered)
    rows = numbered.collect()
    nums = sorted(r["number"] for r in rows)
    assert nums == list(range(97))
    by_label = sorted(rows, key=lambda r: r["label"])
    assert [r["number"] for r in by_label] == list(range(97))


def test_sllpa_membership_plan_has_no_global_sort(spark):
    from graph_rag_agent_spark.operators.sllpa import sllpa_membership_table

    entities = spark.createDataFrame(
        [("e1",), ("e2",), ("e3",)], "entity_id string"
    )
    triples = spark.createDataFrame(
        [("e1", "R", "e2"), ("e2", "R", "e3")],
        "subj string, pred string, obj string",
    )
    out = sllpa_membership_table(entities, triples, max_iterations=3)
    assert "SinglePartition" not in _plan(out)


def test_evidence_contradictions_plan_shape(spark):
    # the numeric rung must stay a grouped equi-join (pair volume
    # bounded per evidence group) with the Jaccard gate JVM-side:
    # no cartesian, no Python eval after the claims UDF
    from graph_rag_agent_spark.operators.evidence import (
        evidence_contradictions,
    )

    ev = spark.createDataFrame(
        [("q0", f"e{i}", f"metric a value {10 + i} pts") for i in range(6)],
        "query_id string, evidence_id string, content string",
    )
    plan = _plan(evidence_contradictions(ev))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # claims are materialized once before the self-join — the pair
    # stage itself runs no Python at all
    assert "ArrowEvalPython" not in plan


def test_statement_matches_plan_shape(spark, docs):
    # phrase matching must be an equi-join on the phrase column —
    # never a cartesian of answers × evidence
    from graph_rag_agent_spark.operators.evidence import statement_matches

    ev = docs.limit(30).select(
        F.concat(F.lit("e"), "doc_id").alias("evidence_id"),
        F.concat(F.lit("s"), "doc_id").alias("source_id"),
        F.col("text").alias("content"),
        F.lit(1.0).alias("confidence"),
    )
    answers = docs.limit(3).select(
        F.col("doc_id").alias("answer_id"), F.col("text").alias("answer")
    )
    plan = _plan(statement_matches(answers, ev))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_classify_traces_stays_jvm(spark, docs):
    # the trace-status ladder is pure JVM — no Python eval in the plan
    from graph_rag_agent_spark.operators.thinking import classify_traces

    plan = _plan(
        classify_traces(
            docs.select(F.col("doc_id").alias("trace_id"),
                        F.col("text").alias("raw"))
        )
    )
    assert "EvalPython" not in plan


def test_validator_stays_jvm(spark, docs):
    from graph_rag_agent_spark.operators.validator import (
        validate_answers,
        with_query_complexity,
    )

    df = docs.select(
        F.col("text").alias("query"),
        F.col("text").alias("answer"),
        F.array(F.lit("value")).alias("high_level"),
        F.array(F.lit("table"), F.lit("fast")).alias("low_level"),
    )
    plan = _plan(with_query_complexity(validate_answers(df)))
    assert "EvalPython" not in plan


def test_cache_lookup_broadcasts_probes_no_cartesian(spark, docs):
    # the cache's vector rung must ship the probe batch as a
    # broadcast on the thread equi-join — the cache side streams;
    # nothing may degenerate into a cartesian or sort-merge shuffle
    # of the cache table
    from graph_rag_agent_spark.operators.query_cache import (
        cache_lookup_batch,
    )

    low = F.lower("text")
    vec = F.array(
        *[
            (F.length(low) - F.length(F.regexp_replace(low, c, ""))).cast(
                "long"
            )
            for c in "abcde"
        ]
    )
    cache = docs.select(
        F.md5(F.encode("text", "utf-8")).alias("cache_key"),
        F.col("text").alias("query"),
        F.substring("text", 1, 10).alias("content"),
        F.lit("t0").alias("thread_id"),
        F.lit(0).alias("quality_score"),
        F.lit(False).alias("user_verified"),
        F.lit(True).alias("fast_path_eligible"),
        vec.alias("embedding"),
    )
    probes = docs.limit(3).select(
        F.col("doc_id").alias("query_id"),
        F.concat(F.col("text"), F.lit("?")).alias("query"),
        F.lit("t0").alias("thread_id"),
        vec.alias("qvec"),
    )
    plan = _plan(cache_lookup_batch(cache, probes, threshold=1))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
