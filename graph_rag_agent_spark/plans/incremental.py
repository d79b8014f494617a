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
    """True incremental cycle against an existing build warehouse.

    Per-conversation stages (chunk, extract, parse, raw tables) are
    REUSED for unchanged conversations via anti-join + append — only
    the changed conv set flows through the operators, mirroring the
    reference's changed-files-only reprocessing
    (incremental_graph_builder.py:94-307). Global stages (entity
    catalog → linking → canonicalization → communities) re-run over
    the merged raw tables, exactly as the reference re-runs its
    index/community stage. At 100 TB an incremental cycle therefore
    costs O(changed conversations) + the global linking work, not a
    full-corpus re-chunk/re-parse (round 1 rebuilt everything).

    Lineage rows (stage='incr_*') record how many rows each
    incremental stage actually processed — the unchanged-is-free
    property is testable from them. Output tables are overwritten in
    the warehouse (Iceberg: MERGE INTO / DELETE WHERE).
    """
    from ..operators.canonicalize import (
        canonical_entities,
        resolve_canonical,
        rewrite_mentions,
        rewrite_triples,
    )
    from ..operators.chunk_index import with_chunk_embeddings
    from ..operators.chunking import chunk_conversations
    from ..operators.community import community_catalog, detect_communities
    from ..operators.components import (
        connected_components,
        consecutive_component_ids,
    )
    from ..operators.extraction import extract_chunks
    from ..operators.linking import (
        entity_catalog,
        link_entities_driver_path,
        similar_entities,
        with_embeddings,
    )
    from ..operators.parsing import (
        entities_raw,
        mentions_raw,
        parse_extractions,
        triples_raw,
    )
    from .build import BuildConfig, _Warehouse

    import time as _time

    cfg = cfg or BuildConfig(warehouse=warehouse, resume=False)
    wh = _Warehouse(spark, warehouse)

    old_registry = wh.read("registry")
    new_registry = conversation_registry(new_transcripts).localCheckpoint()
    changes = {
        k: v.localCheckpoint() for k, v in detect_changes(new_registry, old_registry).items()
    }
    changed = changes["added"].union(changes["modified"]).distinct().localCheckpoint()
    dropped = changes["deleted"].union(changes["modified"]).distinct().localCheckpoint()
    stale = dropped.union(changed).distinct().localCheckpoint()

    old_transcripts = wh.read("transcripts")
    old_chunks = wh.read("chunks")
    old_extractions = wh.read("extractions")
    old_parsed = wh.read("parsed")

    # audit row for the cascade (J9) — what a delete-only cycle drops
    cascade = cascade_delete_entities(wh.read("mentions"), dropped).localCheckpoint()

    changed_transcripts = new_transcripts.join(changed, "conv_id", "left_semi")
    transcripts = (
        old_transcripts.join(stale, "conv_id", "left_anti")
        .unionByName(changed_transcripts)
        .localCheckpoint()
    )

    # --- per-conversation stages: changed convs only -----------------
    t0 = _time.time()
    new_chunks = chunk_conversations(changed_transcripts).localCheckpoint()
    wh.append_lineage("incr_chunks", -1, new_chunks.count(), t0)
    chunks = (
        old_chunks.join(stale, "conv_id", "left_anti")
        .select(*old_chunks.columns)  # join key reorders columns
        .unionByName(new_chunks)
        .select(*new_chunks.columns)
        .localCheckpoint()
    )

    cache = None
    try:
        cache = wh.read("extraction_cache")
    except Exception:
        cache = old_extractions.select("chunk_id", "result")
    t0 = _time.time()
    kwargs = {} if cfg.extractor is None else {"extractor": cfg.extractor}
    new_extractions = extract_chunks(new_chunks, cache=cache, **kwargs).localCheckpoint()
    wh.append_lineage("incr_extract", -1, new_extractions.count(), t0)
    extractions = (
        old_extractions.join(stale, "conv_id", "left_anti")
        .unionByName(new_extractions.select(*old_extractions.columns))
        .select(*new_extractions.columns)
        .localCheckpoint()
    )

    t0 = _time.time()
    parsed_new = parse_extractions(new_extractions).localCheckpoint()
    wh.append_lineage("incr_parse", -1, parsed_new.count(), t0)
    parsed = (
        old_parsed.join(stale, "conv_id", "left_anti")
        .unionByName(parsed_new.select(*old_parsed.columns))
        .select(*parsed_new.columns)
        .localCheckpoint()
    )
    e_raw = entities_raw(parsed)
    t_raw = triples_raw(parsed)
    m_raw = mentions_raw(parsed)

    # chunk embeddings: re-embed only chunk texts not already embedded
    try:
        old_ce = wh.read("chunk_embeddings")
    except Exception:
        old_ce = None
    distinct_chunks = chunks.select("chunk_id", "text").dropDuplicates(["chunk_id"])
    if old_ce is not None:
        kept_ce = old_ce.join(
            distinct_chunks.select("chunk_id"), "chunk_id", "left_semi"
        )
        todo = distinct_chunks.join(old_ce.select("chunk_id"), "chunk_id", "left_anti")
        chunk_embeddings = kept_ce.unionByName(
            with_chunk_embeddings(todo).select("chunk_id", "embedding")
        ).localCheckpoint()
    else:
        chunk_embeddings = (
            with_chunk_embeddings(distinct_chunks)
            .select("chunk_id", "embedding")
            .localCheckpoint()
        )

    # --- global stages over the merged raw tables --------------------
    catalog = entity_catalog(e_raw, chunks)
    linked = link_entities_driver_path(catalog)
    if linked is not None:
        embedded, similar = linked["embedded"], linked["similar"]
        wcc, cmap = linked["wcc"], linked["canonical_map"]
    else:
        embedded = with_embeddings(catalog).localCheckpoint()
        similar = similar_entities(
            embedded, method=cfg.similarity_method
        ).localCheckpoint()
        wcc = (
            consecutive_component_ids(
                connected_components(
                    similar.select("src", "dst"), nodes=embedded.select("entity_id")
                )
            )
            .select(F.col("node").alias("entity_id"), "wcc")
            .localCheckpoint()
        )
        cmap = resolve_canonical(wcc).localCheckpoint()

    triples = rewrite_triples(t_raw, cmap).localCheckpoint()
    mentions = rewrite_mentions(m_raw, cmap).localCheckpoint()
    entities = (
        canonical_entities(embedded.join(wcc, "entity_id", "left"), cmap)
        .select("entity_id", "entity_type", "description", "embedding", "wcc")
        .localCheckpoint()
    )
    membership, hierarchy = detect_communities(
        entities, triples, max_levels=cfg.max_levels
    )
    membership = membership.localCheckpoint()
    hierarchy = hierarchy.localCheckpoint()
    communities = community_catalog(
        membership, entities, triples, mentions
    ).localCheckpoint()

    # --- persist: per-conversation tables MERGE only the delta-touched
    # bucket partitions when the warehouse stores them bucketed
    # (BuildConfig.bucket_convs > 0 at build time — plans/merge.py);
    # otherwise full overwrite. Global tables are global recomputes and
    # always overwrite. Everything above is eagerly checkpointed, so
    # reading-while-overwriting is safe. ------------------------------
    from .merge import table_bucket_spec, upsert_groups

    merged_writes: dict[str, DataFrame] = {}
    per_conv_deltas = {
        "transcripts": changed_transcripts.localCheckpoint(),
        "chunks": new_chunks,
        "extractions": new_extractions.select(*old_extractions.columns),
        "parsed": parsed_new.select(*old_parsed.columns),
    }
    for name, delta in per_conv_deltas.items():
        spec = table_bucket_spec(wh.path(name))
        if spec is not None and spec.get("key") == "conv_id":
            info = upsert_groups(
                spark, wh.path(name), delta, stale, "conv_id", None
            )
            wh.append_lineage(
                f"incr_merge_{name}", len(info["touched_buckets"]), -1, _time.time()
            )
            merged_writes[name] = wh.read(name)

    tables = {
        "transcripts": transcripts,
        "registry": new_registry,
        "chunks": chunks,
        "extractions": extractions,
        "parsed": parsed,
        "entities_raw": e_raw.localCheckpoint(),
        "triples_raw": t_raw.localCheckpoint(),
        "mentions_raw": m_raw.localCheckpoint(),
        "entity_embeddings": embedded,
        "similar": similar,
        "wcc": wcc,
        "canonical_map": cmap,
        "triples": triples,
        "mentions": mentions,
        "entities": entities,
        "membership": membership,
        "hierarchy": hierarchy,
        "communities": communities,
        "chunk_embeddings": chunk_embeddings,
    }
    out = {
        name: (
            merged_writes[name]
            if name in merged_writes
            else wh.write(df, name)
        )
        for name, df in tables.items()
    }
    out["cascade_deleted_entities"] = cascade
    out["changes_added"] = changes["added"]
    out["changes_modified"] = changes["modified"]
    out["changes_deleted"] = changes["deleted"]
    return out
