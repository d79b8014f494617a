"""Incremental KG update (SURVEY.md §3.2, S9, J9).

Reference behavior reproduced (/root/reference/build/
incremental_graph_builder.py:880-958 + incremental/file_change_manager
.py:53-134):
  1. change detection: SHA-256 content registry per source unit (file
     there, conversation here) diffed against the stored registry →
     added / modified / deleted conv_ids. Expressed as joins on the
     registry tables — the Iceberg-native variant would diff
     snapshots, same contract.
  2. deleted/modified cascade: chunks of those conversations are
     dropped; entities whose EVERY mention comes from dropped chunks
     are deleted (reference counting via anti-join — J9,
     incremental_graph_builder.py:566-669); shared entities survive.
     Entities flagged protected/manual_edit are never cascaded
     (conflict policy 'manual_first', config/settings.py:40-44).
  3. re-run the build pipeline on added+modified conversations only;
     unchanged chunks hit the extraction cache (anti-join) so even a
     modified conversation only pays for its new chunk texts.
  4. rewrite tables: delete old rows for changed convs, append new;
     linking/community stages re-run over the merged catalog (they
     are global by nature — same as the reference re-running its
     index/community stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.transcripts import conversation_registry


def detect_changes(
    new_registry: DataFrame, old_registry: DataFrame
) -> dict[str, DataFrame]:
    """→ {'added', 'modified', 'deleted'} conv_id DataFrames
    (file_change_manager.detect_changes semantics)."""
    new_keys = new_registry.select("conv_id", "content_sha256")
    old_keys = old_registry.select(
        F.col("conv_id"), F.col("content_sha256").alias("old_sha256")
    )
    joined = new_keys.join(old_keys, "conv_id", "full_outer")
    return {
        "added": joined.where(F.col("old_sha256").isNull()).select("conv_id"),
        "modified": joined.where(
            F.col("old_sha256").isNotNull()
            & F.col("content_sha256").isNotNull()
            & (F.col("content_sha256") != F.col("old_sha256"))
        ).select("conv_id"),
        "deleted": joined.where(F.col("content_sha256").isNull()).select("conv_id"),
    }


def cascade_delete_entities(
    mentions: DataFrame,
    dropped_convs: DataFrame,
    protected: DataFrame | None = None,
) -> DataFrame:
    """Entities mentioned ONLY by conversations being dropped →
    delete list (minus protected). Reference-counted via anti-join
    (incremental_graph_builder.py:585-657)."""
    surviving_mentions = mentions.join(dropped_convs, "conv_id", "left_anti")
    only_dropped = (
        mentions.join(dropped_convs, "conv_id", "left_semi")
        .select("entity_id")
        .distinct()
        .join(surviving_mentions.select("entity_id").distinct(), "entity_id", "left_anti")
    )
    if protected is not None:
        only_dropped = only_dropped.join(protected, "entity_id", "left_anti")
    return only_dropped


def incremental_update(
    spark: SparkSession,
    new_transcripts: DataFrame,
    warehouse: str,
    cfg=None,
) -> dict[str, DataFrame]:
    """Full incremental cycle against an existing build warehouse.

    Strategy: compute changed conv set; rebuild is then a targeted
    build_all over (old transcripts minus deleted/modified) ∪ new —
    with the extraction cache making unchanged chunk texts free. For
    parquet simplicity the per-conv fact tables are rewritten via
    anti-join + append (Iceberg: MERGE INTO / DELETE WHERE).
    """
    from .build import BuildConfig, build_all

    old_registry = spark.read.parquet(f"{warehouse}/registry")
    new_registry = conversation_registry(new_transcripts)
    changes = detect_changes(new_registry, old_registry)

    old_transcripts = spark.read.parquet(f"{warehouse}/transcripts")
    dropped = changes["deleted"].union(changes["modified"]).distinct()

    merged = (
        old_transcripts.join(dropped, "conv_id", "left_anti")
        .join(changes["added"].union(changes["modified"]), "conv_id", "left_anti")
        .unionByName(
            new_transcripts.join(
                changes["added"].union(changes["modified"]), "conv_id", "left_semi"
            )
        )
    )

    # materialize before build_all overwrites the tables they read from
    merged = merged.localCheckpoint()
    for key in changes:
        changes[key] = changes[key].localCheckpoint()

    # audit row for the cascade (J9) — what a delete-only cycle drops
    mentions = spark.read.parquet(f"{warehouse}/mentions")
    cascade = cascade_delete_entities(mentions, dropped).localCheckpoint()

    cfg = cfg or BuildConfig(warehouse=warehouse, resume=False)
    # keep the extraction cache: unchanged chunk texts are cache hits
    cfg.resume = False
    result = build_all(spark, merged, cfg)
    result.tables["cascade_deleted_entities"] = cascade
    result.tables["changes_added"] = changes["added"]
    result.tables["changes_modified"] = changes["modified"]
    result.tables["changes_deleted"] = changes["deleted"]
    return result.tables
