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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.transcripts import conversation_registry

# Fixed-latency guard for the round-5 CC+resolve delta. Below this
# catalog size the FULL recompute takes the solver's driver fast path
# (collect + pure-Python union-find — a handful of jobs), which is
# CHEAPER than the delta machinery's extra diff/assembly jobs
# (~8-10 fixed-latency barriers). Above it the full path is the
# iterative distributed loop the delta exists to avoid, so the
# solver's own driver threshold is exactly the crossover. Tests lower
# it to force the path on sandbox-sized fixtures. (The community
# localization's analogous guard is community.LOCALIZE_MIN_ENTITIES,
# shared with the aux-table write sites.)
from ..operators.components import DRIVER_THRESHOLD as _CC_DRIVER_THRESHOLD
from ..operators.components import (
    EDGE_DRIVER_THRESHOLD as _CC_EDGE_DRIVER_THRESHOLD,
)

CC_DELTA_MIN_ENTITIES = _CC_DRIVER_THRESHOLD
# the full solver's driver path also needs the EDGE list small — a
# dense small-node similarity graph forces the distributed loop, so
# the delta must engage there too (mirrors connected_components'
# two-condition gate)
CC_DELTA_MIN_EDGES = _CC_EDGE_DRIVER_THRESHOLD


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
    from .build import BuildConfig, _Warehouse, link_fingerprint

    import time as _time

    cfg = cfg or BuildConfig(warehouse=warehouse, resume=False)
    wh = _Warehouse(spark, warehouse)
    wh.link_params = link_fingerprint(cfg)

    # one-time repair of pre-v2 warehouses: a corpus-wide-deduped
    # mentions_raw would make the delta path's conv-keyed MERGE drop
    # shared-chunk pairs on conv delete (build.py docstring)
    from .build import ensure_mentions_raw_conv_complete

    ensure_mentions_raw_conv_complete(wh)

    if _delta_capable(wh):
        return _incremental_update_delta(spark, new_transcripts, wh, cfg)

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
    membership, hierarchy, comm_labels = detect_communities(
        entities, triples, max_levels=cfg.max_levels, return_labels=True
    )
    membership = membership.localCheckpoint()
    hierarchy = hierarchy.localCheckpoint()
    # localized-detection state: written above the crossover, stale
    # state deleted below it (maintain_localized_state). The deletion
    # happens inside the sidecar bracket opened below.
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

    # registry LAST: change detection keys off the stored registry, so
    # a cycle that dies mid-write must re-detect its conversations as
    # changed when retried (same rationale as the delta path)
    tables = {
        "transcripts": transcripts,
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
    tables["registry"] = new_registry
    # the write loop overwrites membership/hierarchy/communities among
    # the rest — bracket it with the community sidecar so a crash
    # mid-loop can't leave a stale stamp on half-written tables (the
    # delta path's no-change reuse probes this stamp)
    from .build import community_fingerprint

    wh.invalidate_community_params()
    tables.update(
        maintain_localized_state(wh, entities, triples, comm_labels)
    )
    out = {
        name: (
            merged_writes[name]
            if name in merged_writes
            else wh.write(df, name)
        )
        for name, df in tables.items()
    }
    wh.commit_community_params(community_fingerprint(cfg))
    out["cascade_deleted_entities"] = cascade
    out["changes_added"] = changes["added"]
    out["changes_modified"] = changes["modified"]
    out["changes_deleted"] = changes["deleted"]
    return out


from .build import _run_parallel  # noqa: E402  (shared job-parallel helper)


def _delta_capable(wh) -> bool:
    """True when the warehouse was built with the bucketed delta
    layout (BuildConfig.bucket_convs > 0): tkey-keyed triples and the
    entity→conv / chunk→conv inverted indexes. Older warehouses fall
    back to the legacy (global-rewrite) path above."""
    from ..operators.canonicalize import TRIPLE_KEY_COL
    from .merge import table_bucket_spec

    spec = table_bucket_spec(wh.path("triples"))
    return (
        spec is not None
        and spec.get("key") == TRIPLE_KEY_COL
        and table_bucket_spec(wh.path("entity_conv_index")) is not None
        and table_bucket_spec(wh.path("chunk_conv_index")) is not None
    )


def _incremental_update_delta(
    spark: SparkSession, new_transcripts: DataFrame, wh, cfg
) -> dict[str, DataFrame]:
    """Delta-proportional incremental cycle — the 100 TB path.

    Closes VERDICT r2 item #1: the legacy path above re-points the
    FULL merged corpus through the new canonical map and overwrites
    corpus-proportional tables every cycle; the reference only
    re-points edges touched by merges (entity_merger.py:348-360,
    cascade at incremental_graph_builder.py:566-669). This path makes
    every corpus-proportional READ bucket-pruned and every
    corpus-proportional WRITE a keyed MERGE:

      * per-conversation tables (transcripts/chunks/extractions/
        parsed/raw entity·triple·mention tables/registry): changed
        conversations recomputed, conv-keyed MERGE (delete stale conv
        groups + insert new) — cost O(changed convs).
      * canonical-map DELTA: entities whose effective canonical id
        changed vs the stored map (full-outer diff of two
        catalog-scale maps).
      * affected scope: stale convs ∪ convs containing delta-mapped
        entities, found via the entity→conv inverted index
        (bucket-pruned lookup — the Spark analogue of Neo4j's
        adjacency index the reference leans on).
      * triples: winner rows recomputed ONLY for affected canonical
        keys, from exactly the contributor conversations (preimage →
        index → pruned read), MERGEd by triple key.
      * mentions: recomputed ONLY for affected chunks (shared-chunk
        contributors via the chunk→conv index), MERGEd by chunk id.
      * entities: new catalog diffed against stored — only changed/
        removed rows MERGEd by entity id.
      * chunk embeddings: pruned-reuse + chunk-keyed upsert; rows for
        vanished content-hash chunks are left as orphans (content ids
        are shared across conversations — reclaiming them needs a
        global reference count, which belongs in a periodic vacuum
        job, not the hot cycle: plans/maintenance.py
        ``vacuum_chunk_embeddings`` / ``maintain_warehouse``).

    Remaining corpus-proportional work, by design (matching the
    reference's global index/community stage): ONE columnar scan of
    the raw entity table to rebuild the entity catalog aggregate, the
    community detection over the (entity-scale) graph, and the
    community-rank countDistinct over mentions. When the rebuilt
    catalog is bit-identical to the stored one, even the linking
    recompute is skipped (_stored_linking_if_catalog_unchanged — the
    chain is deterministic in the catalog, so the stored tables ARE
    its output); and when the SOURCE is bit-identical (zero detected
    changes, no surviving journal, config sidecars matching), the
    whole cycle is the reference's early return
    (incremental_graph_builder.py:903-905): change detection +
    metadata probes, then the stored tables (step 1.5). Entity-scale
    side tables are delta-MERGEd where their rows have stable keys
    (entity_embeddings / similar / canonical_map — diff vs stored,
    bucket-pruned upsert of changed/removed keys only); wcc and the
    community tables are overwritten (dense/global numbering has no
    stable per-key identity) — all catalog-proportional at worst,
    never corpus-proportional; entity EMBEDDING compute (the LLM
    boundary) is delta-only via (entity_id, description) reuse.

    Crash-retryability across the WHOLE cycle: the conv-keyed merges
    destroy the pre-merge evidence the canonical rewrites need, and the
    registry (the change detector's only input) commits right after
    them — so a rewrite-intent journal (step 3.5: pending conv ids /
    old-map triple keys / chunk ids, all delta-proportional) is
    persisted before the first merge and cleared only after the last
    table commits. A retry after ANY crash point re-derives the full
    rewrite scope from detection ∪ journal; all merges and keyed
    upserts are idempotent.

    Lineage rows (stage='incr_*') record the rows each delta stage
    actually processed; tests assert they scale with the delta, not
    the corpus.
    """
    import time as _time

    from ..operators.canonicalize import (
        TRIPLE_KEY_COL,
        canonical_entities,
        resolve_canonical,
        resolve_canonical_delta,
        rewrite_mentions,
        rewrite_triples,
        with_triple_key,
    )
    from ..operators.chunk_index import with_chunk_embeddings
    from ..operators.chunking import chunk_conversations
    from ..operators.community import community_catalog, detect_communities
    from ..operators.components import (
        connected_components,
        connected_components_delta,
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
    from .build import entity_conv_pairs
    from .merge import read_pruned, upsert_groups

    ck = lambda df: df.localCheckpoint()  # noqa: E731

    import os as _os

    _t_sect = [_time.time()]
    _dbg = bool(_os.environ.get("GRARS_DEBUG"))

    def _mark(section: str) -> None:
        if _dbg:
            now = _time.time()
            print(f"[incr] {section}: {now - _t_sect[0]:.2f}s", flush=True)
            _t_sect[0] = now

    # ---- 1. change detection -----------------------------------------
    old_registry = wh.read("registry")
    new_registry = ck(conversation_registry(new_transcripts))
    changes = {
        k: ck(v) for k, v in detect_changes(new_registry, old_registry).items()
    }
    changed = ck(changes["added"].union(changes["modified"]).distinct())
    dropped = ck(changes["deleted"].union(changes["modified"]).distinct())
    stale = ck(dropped.union(changed).distinct())

    _mark("1 change detection")

    # ---- 1.5. unchanged-source shortcut ------------------------------
    # The reference's incremental cycle returns right after change
    # detection when nothing changed (incremental_graph_builder.py:
    # 903-905). Same here: a registry-identical source means no conv
    # table was (or needs to be) touched, so when no crashed cycle left
    # obligations (journal empty post-heal), the stored linking AND
    # community tables were produced under this cfg (both sidecar
    # fingerprints match), and every output table exists, the stored
    # warehouse IS this cycle's output. A polling stream that finds a
    # quiet source pays change detection + metadata probes — nothing
    # else (no empty-frame chunk/extract/merge jobs, no catalog scan,
    # no EXCEPT probes). Any guard failing falls through to the normal
    # path, which handles partial reuse stage by stage.
    from .build import community_fingerprint

    _heal_journal(wh)
    if (
        not stale.limit(1).count()
        and not any(wh.exists(n) for n in _JOURNAL_TABLES)
        and wh.stored_link_params() == wh.link_params
        and wh.stored_community_params() == community_fingerprint(cfg)
        and all(wh.exists(n) for n in _DELTA_OUT_TABLES)
    ):
        wh.append_lineage(
            "incr_noop_shortcut", -1, 1, _time.time(), defer=True
        )
        wh.flush_lineage()
        out = _read_out_tables(wh)
        out["cascade_deleted_entities"] = spark.createDataFrame(
            [], "entity_id string"
        )
        out["changes_added"] = changes["added"]
        out["changes_modified"] = changes["modified"]
        out["changes_deleted"] = changes["deleted"]
        _mark("1.5 unchanged-source shortcut")
        return out

    # ---- 2. old-state slices (pruned reads, BEFORE any merge) --------
    old_traw_stale, old_mraw_stale, old_eraw_stale, old_chunks_stale, \
        old_cmap, old_entities = _run_parallel([
            lambda: ck(read_pruned(spark, wh.path("triples_raw"), stale)),
            lambda: ck(read_pruned(spark, wh.path("mentions_raw"), stale)),
            lambda: ck(read_pruned(spark, wh.path("entities_raw"), stale)),
            lambda: ck(read_pruned(spark, wh.path("chunks"), stale)),
            lambda: ck(wh.read("canonical_map")),
            lambda: ck(wh.read("entities")),
        ])
    old_pairs_stale = ck(
        entity_conv_pairs(old_eraw_stale, old_traw_stale, old_mraw_stale)
    )

    # cascade audit (J9) — canonical entities whose EVERY mention
    # lives in a dropped conversation: the same reference count
    # cascade_delete_entities computes over the canonical mentions
    # table, rebuilt here from index lookups instead of a corpus scan.
    #   1. candidates: canonical ids with a raw mention in a dropped
    #      conv (mentions basis, matching the legacy audit — NOT the
    #      entities∪triples union the conv index stores);
    #   2. aliases: ALL raw preimages of those canonicals — survival
    #      is a property of the canonical entity, so an alias seen
    #      only in dropped convs must not flag its canonical deleted
    #      while a sibling alias is still mentioned elsewhere;
    #   3. survival: a raw mention of ANY alias in a surviving conv,
    #      probed on the mentions_raw slice of the aliases' surviving
    #      convs (conv set pruned through entity_conv_index).
    # Bounded by the candidates' alias/conv footprint (hub-entity
    # proportional), never corpus-proportional.
    def _to_canon(df):
        return (
            df.join(old_cmap, "entity_id", "left")
            .select(
                F.coalesce("canonical_id", F.col("entity_id")).alias(
                    "canonical_id"
                )
            )
            .distinct()
        )

    cand_m = (
        old_mraw_stale.join(dropped, "conv_id", "left_semi")
        .select("entity_id")
        .distinct()
    )
    cand_canon = ck(_to_canon(cand_m))
    aliases = ck(
        old_cmap.join(cand_canon, "canonical_id", "left_semi")
        .select("entity_id")
        .union(cand_canon.select(F.col("canonical_id").alias("entity_id")))
        .union(cand_m)
        .distinct()
    )
    alias_surviving_convs = (
        read_pruned(spark, wh.path("entity_conv_index"), aliases)
        .join(dropped, "conv_id", "left_anti")
        .select("conv_id")
        .distinct()
    )
    surviving_canon = _to_canon(
        read_pruned(spark, wh.path("mentions_raw"), alias_surviving_convs)
        .join(aliases, "entity_id", "left_semi")
        .select("entity_id")
        .distinct()
    )
    cascade = ck(
        cand_canon.join(surviving_canon, "canonical_id", "left_anti")
        .select(F.col("canonical_id").alias("entity_id"))
        .distinct()
    )

    _mark("2 old slices + cascade")

    # ---- 3. per-conversation deltas ----------------------------------
    changed_transcripts = ck(
        new_transcripts.join(changed, "conv_id", "left_semi")
    )
    t0 = _time.time()
    new_chunks = ck(chunk_conversations(changed_transcripts))
    wh.append_lineage("incr_chunks", -1, new_chunks.count(), t0, defer=True)

    # extraction cache: chunk ids are content hashes, so a new
    # conversation can share chunk text with ANY conversation — not
    # just its own previous version. The chunk_conv_index (pre-merge
    # state, bucketed by chunk_id) maps the delta's chunk ids to every
    # conversation already holding them; reading the extractions of
    # those convs plus the stale convs gives full cross-conversation
    # cache hits at delta-proportional cost (bounded by the new
    # chunks' duplication footprint — never a corpus cache scan).
    # extract_chunks dedups the cache to one result per chunk id, so a
    # nondeterministic extractor can't seed conflicting rows for
    # identical content. No ck: consumed only while new_extractions
    # materializes, before the extractions/index tables are merged.
    cache_convs = (
        read_pruned(
            spark,
            wh.path("chunk_conv_index"),
            new_chunks.select("chunk_id").distinct(),
        )
        .select("conv_id")
        .union(stale.select("conv_id"))
        .distinct()
    )
    cache = read_pruned(spark, wh.path("extractions"), cache_convs).select(
        "chunk_id", "result"
    )
    t0 = _time.time()
    kwargs = {} if cfg.extractor is None else {"extractor": cfg.extractor}
    new_extractions = ck(extract_chunks(new_chunks, cache=cache, **kwargs))
    wh.append_lineage("incr_extract", -1, new_extractions.count(), t0, defer=True)

    t0 = _time.time()
    parsed_new = ck(parse_extractions(new_extractions))
    wh.append_lineage("incr_parse", -1, parsed_new.count(), t0, defer=True)
    # raw-table deltas are cheap narrow maps over the checkpointed
    # parsed_new — no ck of their own (each evaluation re-derives from
    # the materialized parent)
    e_raw_new = entities_raw(parsed_new)
    t_raw_new = triples_raw(parsed_new)
    m_raw_new = mentions_raw(parsed_new)

    _mark("3 per-conv deltas")

    # ---- 3.5. rewrite-intent journal --------------------------------
    # The conv-keyed merges below DESTROY the old-state evidence the
    # canonical rewrites (steps 8-10) need: once a deleted conv's raw
    # rows are merged away, nothing in the warehouse says which winner
    # rows in `triples`/`mentions` it contributed to. The registry then
    # commits at the end of step 4+5, so a crash anywhere between that
    # commit and the step 8-10 upserts would otherwise orphan those
    # winner rows forever — the retry detects zero changes and the
    # stale/delta scopes all come up empty. Journaling the rewrite
    # obligations FIRST (stale+changed conv ids, the stale convs' old
    # canonical triple keys, the stale+new chunk ids — all
    # delta-proportional) lets any retry re-derive the full rewrite
    # scope from the journal alone; the journal is cleared only after
    # the whole cycle commits. Unioning with a previous crashed cycle's
    # journal (instead of overwriting it) keeps obligations alive even
    # when the retry's own change detection is empty.
    journal = _read_journal(spark, wh)
    journal_on_disk = any(wh.exists(n) for n in _JOURNAL_TABLES)
    k_old_stale = ck(_triple_keys(old_traw_stale, old_cmap))
    pending_convs = ck(
        journal["pending_rewrite_convs"].union(stale).distinct()
    )
    pending_tkeys = ck(
        journal["pending_rewrite_tkeys"].union(k_old_stale).distinct()
    )
    pending_chunks = ck(
        journal["pending_rewrite_chunks"]
        .union(old_chunks_stale.select("chunk_id"))
        .union(new_chunks.select("chunk_id"))
        .distinct()
    )
    # A no-change cycle (stale empty ⇒ every journaled union above is a
    # no-op) adds no obligations: skip the three write jobs on the
    # steady-state hot path. A surviving journal is left in place —
    # this cycle still fulfils it through pending_* and clears it on
    # commit. One limit(1) probe on the checkpointed stale frame
    # replaces three parquet writes.
    has_new_obligations = bool(stale.limit(1).count())
    if has_new_obligations:
        _write_journal(
            wh,
            {
                "pending_rewrite_convs": pending_convs,
                "pending_rewrite_tkeys": pending_tkeys,
                "pending_rewrite_chunks": pending_chunks,
            },
        )
    journal_live = has_new_obligations or journal_on_disk

    _mark("3.5 rewrite journal")

    # ---- 4+5. conv-keyed MERGEs + inverted-index maintenance, all
    # mutually independent (distinct paths, inputs checkpointed) → one
    # driver-thread pool so their ~4 barrier jobs each overlap -------
    new_pairs, new_chunk_pairs = _run_parallel([
        lambda: ck(entity_conv_pairs(e_raw_new, t_raw_new, m_raw_new)),
        lambda: ck(new_chunks.select("chunk_id", "conv_id").distinct()),
    ])
    touched_entities, touched_chunks = _run_parallel([
        lambda: ck(
            old_pairs_stale.select("entity_id")
            .union(new_pairs.select("entity_id"))
            .distinct()
        ),
        lambda: ck(
            old_chunks_stale.select("chunk_id")
            .union(new_chunk_pairs.select("chunk_id"))
            .distinct()
        ),
    ])

    per_conv = {
        "transcripts": changed_transcripts,
        "chunks": new_chunks,
        "extractions": new_extractions,
        "parsed": parsed_new,
        "entities_raw": e_raw_new,
        "triples_raw": t_raw_new,
        "mentions_raw": m_raw_new,
    }

    def _merge_conv_table(name, delta):
        target_cols = wh.read(name).columns
        info = upsert_groups(
            spark, wh.path(name), delta.select(*target_cols), stale, "conv_id"
        )
        wh.append_lineage(
            f"incr_merge_{name}",
            len(info["touched_buckets"]),
            -1,
            _time.time(),
            defer=True,
        )

    def _merge_entity_index():
        cur_idx = read_pruned(
            spark, wh.path("entity_conv_index"), touched_entities
        )
        idx_rows = ck(
            cur_idx.join(stale, "conv_id", "left_anti")
            .unionByName(new_pairs)
            .distinct()
        )
        upsert_groups(
            spark,
            wh.path("entity_conv_index"),
            idx_rows,
            touched_entities,
            "entity_id",
        )

    def _merge_chunk_index():
        cur_cidx = read_pruned(
            spark, wh.path("chunk_conv_index"), touched_chunks
        )
        cidx_rows = ck(
            cur_cidx.join(stale, "conv_id", "left_anti")
            .unionByName(new_chunk_pairs)
            .distinct()
        )
        upsert_groups(
            spark,
            wh.path("chunk_conv_index"),
            cidx_rows,
            touched_chunks,
            "chunk_id",
        )

    _run_parallel(
        [
            (lambda n=n, d=d: _merge_conv_table(n, d))
            for n, d in per_conv.items()
        ]
        + [_merge_entity_index, _merge_chunk_index]
    )
    # the registry commits LAST among the conv tables, after every
    # data-table merge above has succeeded: change detection keys
    # solely off the stored registry, so under foreachBatch's
    # at-least-once retry a cycle that died mid-merge must re-detect
    # its conversations as changed on the retry (the conv-keyed
    # upserts are idempotent). Committing the registry first would
    # make the retry a no-op and leave any failed table stale forever.
    # The global stages (6-12) are covered past this point by the
    # rewrite-intent journal (step 3.5): a crash after this commit
    # leaves the retry with zero detected changes, and the journal is
    # what re-derives the canonical rewrite scope.
    _merge_conv_table(
        "registry", new_registry.join(changed, "conv_id", "left_semi")
    )

    _mark("4+5 conv merges + indexes")

    # ---- 6. global linking over the merged catalog, embeddings
    # recomputed ONLY where (entity_id, description) changed ----------
    e_raw_merged = wh.read("entities_raw")
    chunks_merged = wh.read("chunks")
    catalog = entity_catalog(e_raw_merged, chunks_merged)

    # catalog-unchanged shortcut: the whole linking chain (embed → LSH
    # → CC → resolve) is a DETERMINISTIC pure function of the
    # (entity_id, entity_type, description) catalog, so when a cycle
    # leaves the catalog bit-identical to the stored one (re-delivered
    # data; edits that only move mentions around existing entities),
    # the stored similar/wcc/canonical_map ARE the chain's output —
    # reuse them and skip the catalog-proportional recompute. Two
    # entity-scale EXCEPT probes decide; any table missing or any
    # difference falls through to the full chain.
    reuse = _stored_linking_if_catalog_unchanged(wh, catalog)
    linked = None if reuse is not None else link_entities_driver_path(catalog)
    # True when the CC delta proved the stored wcc/canonical_map ARE
    # this cycle's output (partition unchanged) — step 11 then skips
    # their writes entirely
    wcc_cmap_unchanged = False
    if reuse is not None:
        embedded, similar, wcc, cmap = _run_parallel(
            [lambda t=t: ck(t) for t in reuse]
        )
        wh.append_lineage(
            "incr_link_reused", -1, 1, _time.time(), defer=True
        )
    elif linked is not None:
        embedded, similar, wcc, cmap = _run_parallel([
            lambda: ck(linked["embedded"]),
            lambda: ck(linked["similar"]),
            lambda: ck(linked["wcc"]),
            lambda: ck(linked["canonical_map"]),
        ])
    else:
        old_emb = wh.read("entity_embeddings").select(
            "entity_id", F.col("description").alias("__old_desc"), "embedding"
        )
        with_old = catalog.join(old_emb, "entity_id", "left")
        kept = with_old.where(
            F.col("__old_desc").isNotNull()
            & (F.col("__old_desc") == F.col("description"))
        ).select("entity_id", "entity_type", "description", "embedding")
        todo = with_old.where(
            F.col("__old_desc").isNull()
            | (F.col("__old_desc") != F.col("description"))
        ).select("entity_id", "entity_type", "description")
        t0 = _time.time()
        embedded = ck(
            kept.unionByName(
                with_embeddings(todo).select(
                    "entity_id", "entity_type", "description", "embedding"
                )
            )
        )
        wh.append_lineage("incr_embed", -1, todo.count(), t0, defer=True)
        # incremental KNN maintenance: when the full path would run
        # the LSH chain AND the stored (entity_embeddings, similar)
        # pair is a consistent committed set (the link-params sidecar
        # survives only when all four linking tables landed together),
        # re-score ONLY the sources sharing a band bucket with a
        # changed/removed/added entity — provably equal to the full
        # recompute (linking.similar_entities_lsh_delta), and
        # delta-proportional instead of catalog-proportional.
        from ..operators import linking as _linking
        from ..operators.linking import similar_entities_lsh_delta

        use_lsh = cfg.similarity_method == "lsh" or (
            cfg.similarity_method == "auto"
            and embedded.count() > _linking.EXACT_THRESHOLD
        )
        # the stored `similar` is LSH-produced ONLY if the previous
        # cycle's catalog exceeded both the driver fast-path and the
        # exact-method thresholds (routing is deterministic in
        # catalog size + method) — a table produced by the exact or
        # driver KNN contains pairs no band join would generate, and
        # reusing those rows would diverge from the LSH recompute.
        # Below the floor the full chain is cheap anyway.
        lsh_floor = max(
            _linking.EXACT_THRESHOLD, _linking.LINK_DRIVER_THRESHOLD
        )
        stored_is_lsh = False
        if wh.stored_link_params() == wh.link_params and wh.exists("similar"):
            stored_is_lsh = (
                wh.read("entity_embeddings").count() > lsh_floor
            )
        lsh_affected = None
        if use_lsh and stored_is_lsh:
            t0 = _time.time()
            sim_raw, aff_raw = similar_entities_lsh_delta(
                embedded,
                wh.read("entity_embeddings"),
                wh.read("similar"),
                with_affected=True,
            )
            similar = ck(sim_raw)
            lsh_affected = ck(aff_raw)
            # marker row (rows=1, like incr_link_reused): the table
            # count would read catalog-proportional and obscure that
            # only the affected sources re-scored
            wh.append_lineage(
                "incr_similar_delta", -1, 1, t0, defer=True
            )
        else:
            similar = ck(
                similar_entities(embedded, method=cfg.similarity_method)
            )
        # VERDICT r4 #1: delta-localize connected components + the
        # canonical resolve — the last catalog-proportional stages of
        # the linking chain. Gate (provable equality, mirroring the
        # LSH delta's): the link-params sidecar survives only when
        # entity_embeddings/similar/wcc/canonical_map all committed
        # together under this cfg (step 11's torn-window dance), so
        # the stored wcc IS connected_components(stored similar) and
        # the stored canonical_map IS its resolve — exactly the
        # precondition connected_components_delta's proof needs. The
        # LSH delta's affected-source set localizes the edge diff;
        # without it (exact/auto routing) the diff is one narrow
        # full-list pass, still far cheaper than the iterative loop.
        cc_delta = None
        if (
            wh.stored_link_params() == wh.link_params
            and all(
                wh.exists(n) for n in ("similar", "wcc", "canonical_map")
            )
            # fixed-latency guard (module constants above): when the
            # full CC+resolve would be a driver-side union-find (small
            # node AND edge counts — both conditions of the solver's
            # driver gate), it is cheaper than the delta's extra
            # diff/assembly jobs; either count crossing over means the
            # full path runs the distributed iterative loop the delta
            # exists to avoid
            and (
                embedded.count() > CC_DELTA_MIN_ENTITIES
                or similar.count() > CC_DELTA_MIN_EDGES
            )
        ):
            t0 = _time.time()
            cc_delta = connected_components_delta(
                similar.select("src", "dst"),
                embedded.select("entity_id"),
                wh.read("similar").select("src", "dst"),
                wh.read("wcc").select("entity_id", "wcc"),
                changed_src_hint=lsh_affected,
            )
        if cc_delta is not None and cc_delta["unchanged"]:
            # edge/node delta empty ⇒ partition identical ⇒ the dense
            # numbering and the resolve are identical too — stored
            # tables reused verbatim (and step 11 skips their writes)
            wcc, cmap = _run_parallel([
                lambda: ck(wh.read("wcc")),
                lambda: ck(wh.read("canonical_map")),
            ])
            wcc_cmap_unchanged = True
            wh.append_lineage("incr_cc_delta", -1, 0, t0, defer=True)
        elif cc_delta is not None:
            affected = ck(cc_delta["affected_nodes"])
            # ck before numbering: consecutive_component_ids evaluates
            # its input twice (distinct labels + the join back)
            comp_full = ck(cc_delta["components"])
            wcc = ck(
                consecutive_component_ids(comp_full).select(
                    F.col("node").alias("entity_id"), "wcc"
                )
            )
            cmap = ck(
                resolve_canonical_delta(
                    cc_delta["local"], old_cmap, affected
                )
            )
            # rows = recomputed-scope size: the delta-proportionality
            # evidence (a full recompute would read catalog-sized)
            wh.append_lineage(
                "incr_cc_delta", -1, affected.count(), t0, defer=True
            )
        else:
            wcc = ck(
                consecutive_component_ids(
                    connected_components(
                        similar.select("src", "dst"),
                        nodes=embedded.select("entity_id"),
                    )
                ).select(F.col("node").alias("entity_id"), "wcc")
            )
            cmap = ck(resolve_canonical(wcc))

    _mark("6 global linking")

    # ---- 7. canonical-map delta → affected scope ---------------------
    oc = old_cmap.select("entity_id", F.col("canonical_id").alias("__old_c"))
    nc = cmap.select("entity_id", F.col("canonical_id").alias("__new_c"))
    delta_entities = ck(
        oc.join(nc, "entity_id", "full_outer")
        .where(
            F.coalesce("__old_c", "entity_id")
            != F.coalesce("__new_c", "entity_id")
        )
        .select("entity_id")
        .distinct()
    )
    delta_convs = ck(
        read_pruned(spark, wh.path("entity_conv_index"), delta_entities)
        .select("conv_id")
        .distinct()
    )
    # pending_convs ⊇ stale, plus any crashed cycle's unfinished scope
    affected_convs = ck(pending_convs.union(delta_convs).distinct())
    wh.append_lineage(
        "incr_affected_convs", -1, affected_convs.count(), _time.time(),
        defer=True,
    )

    _mark("7 cmap delta scope")

    # ---- 8-10, 12: four mutually independent delta-rewrite tasks
    # (mentions / triples / entities / chunk embeddings — distinct
    # target tables, read-only sharing of the merged raw tables and
    # indexes) run from one driver-thread pool -------------------------

    # community detection is a pure function of (entity id set,
    # triple (s,p,o) key set, max_levels) — projection weight is
    # COUNT over keys, nodes are entity ids (detect_communities).
    # The rewrite tasks therefore record whether those two inputs
    # actually changed (delta-sized set diffs computed against the
    # PRE-upsert store), so the communities section can keep the
    # stored membership/hierarchy and recompute only the
    # mentions-dependent catalog. Defaults True = safe (recompute).
    detection_input_changed = {"triples": True, "entities": True}
    # delta-sized frames the LOCALIZED community recompute (below)
    # seeds from; None ⇒ the owning task failed to materialize them
    # and the localized branch declines (full recompute). All are
    # canonical-entity scoped and checkpointed by their writers.
    delta_scope: dict[str, DataFrame | None] = {
        "changed_key_pairs": None,  # (subj, obj) of added/removed keys
        "triples_scope_entities": None,  # canon endpoints of affected keys
        "entity_churn": None,  # added ∪ removed canonical entity ids
        "changed_entity_rows": None,  # ids whose entity row changed
        "mention_entities": None,  # ids whose mention rows may differ
    }

    def _rewrite_mentions_task():
        m_raw_delta = read_pruned(spark, wh.path("mentions_raw"), delta_convs)
        chunks_repointed = m_raw_delta.join(
            delta_entities, "entity_id", "left_semi"
        ).select("chunk_id")
        # pending_chunks ⊇ stale ∪ new chunk ids (journaled step 3.5)
        affected_chunks = ck(
            pending_chunks.union(chunks_repointed).distinct()
        )
        contrib_convs_m = (
            read_pruned(spark, wh.path("chunk_conv_index"), affected_chunks)
            .select("conv_id")
            .distinct()
        )
        m_contrib = read_pruned(
            spark, wh.path("mentions_raw"), contrib_convs_m
        ).join(affected_chunks, "chunk_id", "left_semi")
        t0 = _time.time()
        mentions_delta = ck(rewrite_mentions(m_contrib, cmap))
        wh.append_lineage(
            "incr_mentions_rewrite", -1, mentions_delta.count(), t0, defer=True
        )
        # canonical entities whose mention rows may differ after the
        # upsert: anything in the pre-merge slice of the affected
        # chunks ∪ anything in the delta (superset is fine — the
        # localized community catalog recomputes their communities'
        # rank). Materialized BEFORE the upsert destroys the old
        # slice; bounded by the affected-chunk footprint.
        delta_scope["mention_entities"] = ck(
            read_pruned(spark, wh.path("mentions"), affected_chunks)
            .select("entity_id")
            .union(mentions_delta.select("entity_id"))
            .distinct()
        )
        upsert_groups(
            spark, wh.path("mentions"), mentions_delta, affected_chunks,
            "chunk_id",
        )

    def _rewrite_triples_task():
        t_raw_aff = ck(
            read_pruned(spark, wh.path("triples_raw"), affected_convs)
        )
        k_new = _triple_keys(t_raw_aff, cmap)
        # pending_tkeys ⊇ k_old_stale (journaled in step 3.5, including
        # any crashed cycle's keys whose pre-merge evidence is gone);
        # every affected conv (= pending ∪ delta — exactly the set
        # t_raw_aff was read pruned to) also contributes its CURRENT
        # raw keys under the stored map — the winner rows those keys
        # name are superseded by the rewrite under the new map
        k_old_repointed = _triple_keys(t_raw_aff, old_cmap)
        affected_keys = ck(
            k_new.union(pending_tkeys).union(k_old_repointed).distinct()
        )
        aff_canon = (
            affected_keys.select(F.col("subj").alias("entity_id"))
            .union(affected_keys.select(F.col("obj").alias("entity_id")))
            .distinct()
        )
        preimages = ck(
            cmap.join(
                aff_canon.withColumnRenamed("entity_id", "canonical_id"),
                "canonical_id",
                "left_semi",
            )
            .select("entity_id")
            .union(aff_canon)
            .distinct()
        )
        contrib_convs_t = (
            read_pruned(spark, wh.path("entity_conv_index"), preimages)
            .select("conv_id")
            .union(affected_convs)
            .distinct()
        )
        t_contrib = read_pruned(spark, wh.path("triples_raw"), contrib_convs_t)
        t0 = _time.time()
        triples_delta = ck(
            with_triple_key(rewrite_triples(t_contrib, cmap, keys=affected_keys))
        )
        wh.append_lineage(
            "incr_triples_rewrite", -1, triples_delta.count(), t0, defer=True
        )
        stale_tkeys = with_triple_key(affected_keys).select(TRIPLE_KEY_COL)
        # delta-sized key-set diff BEFORE the upsert: outside the
        # affected scope keys are untouched by construction, so scope
        # equality ⇔ global (s,p,o) set equality. Keys are unique per
        # row on both sides (winner rows), so the anti-joins ARE the
        # multiset diff; the changed pairs seed the localized
        # community recompute (projection weights = counts over keys,
        # so an added/removed key dirties exactly its unordered pair).
        old_scope = ck(
            read_pruned(spark, wh.path("triples"), stale_tkeys).select(
                TRIPLE_KEY_COL, "subj", "obj"
            )
        )
        new_scope = triples_delta.select(TRIPLE_KEY_COL, "subj", "obj")
        changed_key_pairs = ck(
            old_scope.join(new_scope, TRIPLE_KEY_COL, "left_anti")
            .select("subj", "obj")
            .union(
                new_scope.join(old_scope, TRIPLE_KEY_COL, "left_anti").select(
                    "subj", "obj"
                )
            )
            .distinct()
        )
        delta_scope["changed_key_pairs"] = changed_key_pairs
        delta_scope["triples_scope_entities"] = ck(aff_canon)
        detection_input_changed["triples"] = (
            changed_key_pairs.limit(1).count() > 0
        )
        upsert_groups(
            spark, wh.path("triples"), triples_delta, stale_tkeys, TRIPLE_KEY_COL
        )

    def _merge_entities_task():
        ent_cols = ["entity_id", "entity_type", "description", "embedding", "wcc"]
        entities_full = ck(
            canonical_entities(
                embedded.join(wcc, "entity_id", "left"), cmap
            ).select(*ent_cols)
        )

        # fingerprint diff — same rationale as _merge_side_table: a
        # full-row exceptAll would shuffle every embedding twice
        def fp(df):
            return df.select(
                "entity_id",
                F.hash(*ent_cols).alias("__h32"),
                F.xxhash64(*ent_cols).alias("__h64"),
            )

        old_ents = old_entities.select(*ent_cols)
        changed_keys = fp(entities_full).join(
            ck(fp(old_ents)), ["entity_id", "__h32", "__h64"], "left_anti"
        ).select("entity_id")
        changed_rows = ck(
            entities_full.join(changed_keys, "entity_id", "left_semi")
        )
        removed_ids = old_entities.select("entity_id").exceptAll(
            entities_full.select("entity_id")
        )
        stale_ent_ids = ck(
            changed_rows.select("entity_id").union(removed_ids).distinct()
        )
        # id-SET diff (changed_rows may be description/embedding-only
        # updates, which don't move community detection)
        added_ids = changed_rows.select("entity_id").join(
            old_entities.select("entity_id"), "entity_id", "left_anti"
        )
        entity_churn = ck(added_ids.union(removed_ids).distinct())
        delta_scope["entity_churn"] = entity_churn
        delta_scope["changed_entity_rows"] = ck(
            changed_rows.select("entity_id")
        )
        detection_input_changed["entities"] = (
            entity_churn.limit(1).count() > 0
        )
        t0 = _time.time()
        upsert_groups(
            spark, wh.path("entities"), changed_rows, stale_ent_ids, "entity_id"
        )
        wh.append_lineage(
            "incr_entities_merge", -1, changed_rows.count(), t0, defer=True
        )

    def _chunk_embeddings_task():
        # scope = new chunk ids ∪ the journal's pending ids: a retry
        # after the registry committed has empty new_chunks, and the
        # journal is what names the chunks whose embeddings the crashed
        # cycle never wrote. Texts for missing ids come from the MERGED
        # chunks table (conv-bucketed, so the id set routes through the
        # chunk→conv index first) — both paths embed identically.
        # Already-stored rows are kept VERBATIM, orphans included:
        # reclaiming content-hash ids needs the global liveness check
        # the periodic vacuum does (plans/maintenance.py), not the hot
        # cycle.
        want_ids = ck(
            new_chunks.select("chunk_id").union(pending_chunks).distinct()
        )
        cur_ce = ck(
            read_pruned(spark, wh.path("chunk_embeddings"), want_ids)
        )
        holder_convs = (
            read_pruned(spark, wh.path("chunk_conv_index"), want_ids)
            .select("conv_id")
            .distinct()
        )
        live = read_pruned(spark, wh.path("chunks"), holder_convs).join(
            want_ids, "chunk_id", "left_semi"
        )
        todo_ce = (
            live.select("chunk_id", "text")
            .dropDuplicates(["chunk_id"])
            .join(cur_ce.select("chunk_id"), "chunk_id", "left_anti")
        )
        ce_delta = ck(
            cur_ce.select("chunk_id", "embedding").unionByName(
                with_chunk_embeddings(todo_ce).select("chunk_id", "embedding")
            )
        )
        upsert_groups(
            spark, wh.path("chunk_embeddings"), ce_delta, want_ids,
            "chunk_id",
        )

    _run_parallel(
        [
            _rewrite_mentions_task,
            _rewrite_triples_task,
            _merge_entities_task,
            _chunk_embeddings_task,
        ]
    )

    _mark("8-10,12 delta rewrites")

    # ---- 11. entity-scale side tables: delta-MERGE (parallel);
    # nothing to write when the stored tables were reused verbatim.
    # entity_embeddings / similar / canonical_map are bucketed MERGE
    # tables (plans/build.py), so each cycle diffs the recomputed
    # frame against the stored one and rewrites only the buckets
    # holding changed/removed keys — rows ∝ the cycle's real change
    # set, not O(catalog). wcc stays an overwrite: its dense component
    # numbering is a GLOBAL renumbering (one new component can shift
    # every downstream label), so its rows have no stable per-key
    # identity worth diffing, and it is the smallest of the four.
    # Legacy/unbucketed warehouses keep the old full overwrite.
    #
    # Sidecar dance (same torn-window guard as before): the link-params
    # sidecar is removed BEFORE the first side-table write and restored
    # only after canonical_map lands — sequentially LAST, so the
    # catalog-unchanged reuse probe declines for any crash inside the
    # window instead of pairing new embeddings with a stale map.
    def _merge_side_table(df_new, name: str, key: str, lineage_stage: str):
        from .merge import table_bucket_spec

        path = wh.path(name)
        if not wh.exists(name) or table_bucket_spec(path) is None:
            # bucket the fallback write on bucketed-config warehouses
            # (same shape as build_all's stages) so a once-missing or
            # legacy-unbucketed table re-enters the delta-MERGE
            # regime next cycle instead of overwriting forever
            wh.write(
                df_new,
                name,
                group_key=key if cfg.bucket_convs else None,
                num_buckets=cfg.bucket_convs,
            )
            return
        cols = [c for c in df_new.columns]
        old = wh.read(name).select(*cols)
        new = df_new.select(*cols)

        # the diff rides compact row FINGERPRINTS, not rows: a
        # full-row exceptAll would shuffle the embedding arrays twice
        # — O(catalog bytes), i.e. exactly what the overwrite this
        # merge replaces costs. (key, murmur3-32, xxhash64) is ~16
        # bytes/row; with ~96 independent hash bits a changed row
        # masquerading as unchanged needs a 2⁻⁹⁶ double collision,
        # and its worst case is one stale side-table row until the
        # next cycle that touches the key. Rows are unique per key
        # group in all three tables (single-row keys resp. unique
        # (src, dst) pairs), which the anti-join shape relies on.
        def fp(df):
            return df.select(
                F.col(key),
                F.hash(*cols).alias("__h32"),
                F.xxhash64(*cols).alias("__h64"),
            )

        # new + modified rows by fingerprint anti-join; the multiset
        # key diff catches pure removals (a key with fewer — but
        # individually unchanged — rows still lands in the stale set)
        oldk = ck(fp(old))
        newk = fp(new)
        changed_keys = newk.join(
            oldk, [key, "__h32", "__h64"], "left_anti"
        ).select(key)
        removed = oldk.select(key).exceptAll(newk.select(key))
        stale = ck(changed_keys.union(removed).distinct())
        # group semantics: re-insert EVERY current row of a stale key
        # (for per-key-grouped tables like `similar` a partially
        # changed group must be replaced whole)
        new_rows = new.join(stale, key, "left_semi")
        t0 = _time.time()
        upsert_groups(spark, path, new_rows, stale, key)
        wh.append_lineage(
            lineage_stage, -1, new_rows.count(), t0, defer=True
        )

    if reuse is None:
        from . import fsio
        from .build import LINK_PARAMS_FILE

        fsio.remove(os.path.join(wh.root, LINK_PARAMS_FILE))
        side_jobs = [
            lambda: _merge_side_table(
                embedded, "entity_embeddings", "entity_id",
                "incr_embeddings_merge",
            ),
            lambda: _merge_side_table(
                similar, "similar", "src", "incr_similar_merge"
            ),
        ]
        if not wcc_cmap_unchanged:
            side_jobs.append(lambda: wh.write(wcc, "wcc"))
        _run_parallel(side_jobs)
        if not wcc_cmap_unchanged:
            # skipped when the CC delta reused the stored tables
            # verbatim — the fingerprint diff would scan the catalog
            # just to find zero changed keys
            _merge_side_table(
                cmap, "canonical_map", "entity_id", "incr_cmap_merge"
            )
        if wh.link_params is not None:
            fsio.write_json(
                os.path.join(wh.root, LINK_PARAMS_FILE), wh.link_params
            )

    _mark("11 side-table writes")

    # no-change-cycle communities reuse: detection + catalog are a
    # deterministic function of (entities, triples, mentions,
    # max_levels). When this cycle's linking was reused verbatim
    # (catalog bit-identical ⇒ cmap unchanged ⇒ delta scope empty) AND
    # no conv changed (stale empty) AND no crashed cycle's journal
    # could have left the winner tables mid-rewrite, the stored
    # community tables ARE this cycle's output — the steady-state
    # no-op cycle skips the whole corpus-proportional detection loop.
    # The sidecar fingerprint declines reuse across a max_levels change
    # and across a crash inside the three-table overwrite window.
    from .build import community_fingerprint

    communities_reusable = (
        reuse is not None
        and not journal_live
        and wh.stored_community_params() == community_fingerprint(cfg)
        and all(
            wh.exists(t) for t in ("membership", "hierarchy", "communities")
        )
    )
    # detection reuse (weaker than full reuse): conversations changed,
    # but the rewrite tasks proved the entity ID set and the triple
    # (s,p,o) key set both unchanged — membership/hierarchy are a pure
    # function of exactly those inputs (+ max_levels), so only the
    # mentions/description-dependent community CATALOG recomputes.
    # The corpus-proportional detection loop — the largest remaining
    # non-delta cost of a small-delta cycle — is skipped.
    # journal_on_disk guard: after a crash BETWEEN the triple upsert
    # and the communities write, the retry's key diff reads the
    # already-updated store as "unchanged" while the stored membership
    # still reflects the pre-crash key set — a surviving journal is
    # exactly the marker of that window, so it declines detection
    # reuse (the community sidecar alone can't: the crashed cycle may
    # never have reached its invalidation).
    detection_reusable = (
        not communities_reusable
        and not journal_on_disk
        and not detection_input_changed["triples"]
        and not detection_input_changed["entities"]
        and wh.stored_community_params() == community_fingerprint(cfg)
        and all(
            wh.exists(t) for t in ("membership", "hierarchy", "communities")
        )
    )
    # component-scoped recompute (VERDICT r4 #3): when the binary
    # reuses decline because detection inputs DID change, localize the
    # leveled-LPA loop + the summary regeneration to the touched
    # projection components (see _localized_communities). Gates mirror
    # detection_reusable's (sidecar, crash-journal residue) plus the
    # round-5 aux tables and the rewrite tasks' materialized scopes.
    detection_localizable = (
        not communities_reusable
        and not detection_reusable
        and not journal_on_disk
        and wh.stored_community_params() == community_fingerprint(cfg)
        and all(
            wh.exists(t)
            for t in (
                "membership",
                "hierarchy",
                "communities",
                "community_labels",
                "proj_wcc",
            )
        )
        and all(v is not None for v in delta_scope.values())
    )
    localized = (
        _localized_communities(spark, wh, cfg, delta_scope)
        if detection_localizable
        else None
    )
    if communities_reusable:
        # nothing to compute or write — the stored tables are read back
        # (with everything else) in the out-dict below
        wh.append_lineage(
            "incr_communities_reused", -1, 1, _time.time(), defer=True
        )
    elif localized is not None:
        wh.invalidate_community_params()
        _run_parallel(
            [
                lambda: wh.write(localized["membership"], "membership"),
                lambda: wh.write(localized["hierarchy"], "hierarchy"),
                lambda: wh.write(localized["communities"], "communities"),
                lambda: wh.write(
                    localized["community_labels"], "community_labels"
                ),
                lambda: wh.write(localized["proj_wcc"], "proj_wcc"),
            ]
        )
        wh.commit_community_params(community_fingerprint(cfg))
        # rows = recomputed-community count: the delta-proportionality
        # evidence for the summary stage (the LLM boundary)
        wh.append_lineage(
            "incr_communities_localized",
            -1,
            localized["n_changed"],
            localized["t0"],
            defer=True,
        )
    elif detection_reusable:
        membership = ck(wh.read("membership"))
        entities_tbl = wh.read("entities")
        triples_tbl = wh.read("triples")
        mentions_tbl = wh.read("mentions")
        # round 5: with membership verbatim-reused (no renumbering),
        # the catalog stage localizes too — only communities holding a
        # changed entity row / rewritten mention / rewritten triple
        # re-summarize; stored rows stand in for the rest (same
        # summary_created_at caveat as _localized_communities)
        scope_ready = all(
            delta_scope[k] is not None
            for k in (
                "changed_entity_rows",
                "mention_entities",
                "triples_scope_entities",
            )
        ) and wh.exists("communities")
        if scope_ready:
            from ..operators.community import localized_community_catalog

            dirty_entities = ck(
                delta_scope["changed_entity_rows"]
                .union(delta_scope["mention_entities"])
                .union(delta_scope["triples_scope_entities"])
                .distinct()
            )
            communities, _ = localized_community_catalog(
                membership,
                dirty_entities,
                ck(wh.read("communities")),
                entities_tbl,
                triples_tbl,
                mentions_tbl,
            )
            communities = ck(communities)
        else:
            communities = ck(
                community_catalog(
                    membership, entities_tbl, triples_tbl, mentions_tbl
                )
            )
        # same torn-window guard as the full path: the sidecar drops
        # before the catalog overwrite and is restored after, so a
        # crash mid-write declines every community reuse on retry
        wh.invalidate_community_params()
        wh.write(communities, "communities")
        wh.commit_community_params(community_fingerprint(cfg))
        wh.append_lineage(
            "incr_detection_reused", -1, 1, _time.time(), defer=True
        )
    else:
        entities_tbl = wh.read("entities")
        triples_tbl = wh.read("triples")
        membership, hierarchy, comm_labels = detect_communities(
            entities_tbl,
            triples_tbl,
            max_levels=cfg.max_levels,
            return_labels=True,
        )
        membership = ck(membership)
        hierarchy = ck(hierarchy)
        mentions_tbl = wh.read("mentions")
        communities = ck(
            community_catalog(
                membership, entities_tbl, triples_tbl, mentions_tbl
            )
        )
        writes = [
            lambda: wh.write(membership, "membership"),
            lambda: wh.write(hierarchy, "hierarchy"),
            lambda: wh.write(communities, "communities"),
        ]
        # localized-detection state for the NEXT cycle: written above
        # the crossover, DELETED below it (maintain_localized_state —
        # stale aux under a fresh sidecar would poison a later
        # localized cycle). Both inside the sidecar bracket.
        wh.invalidate_community_params()
        aux = maintain_localized_state(
            wh, entities_tbl, triples_tbl, comm_labels
        )
        writes += [
            (lambda n=n, d=d: wh.write(d, n)) for n, d in aux.items()
        ]
        _run_parallel(writes)
        wh.commit_community_params(community_fingerprint(cfg))

    _mark("communities")
    wh.flush_lineage()
    # every table is committed — the rewrite obligations are met, so
    # the journal can go. A crash BEFORE this point leaves it in place
    # and the next cycle re-winners the journaled scope (idempotent).
    # No-change cycles with no surviving journal have nothing to clear
    # (and skip the three delete RPCs).
    if journal_live:
        _clear_journal(wh)

    out = _read_out_tables(wh)
    out["cascade_deleted_entities"] = cascade
    out["changes_added"] = changes["added"]
    out["changes_modified"] = changes["modified"]
    out["changes_deleted"] = changes["deleted"]
    return out


_DELTA_OUT_TABLES = (
    "transcripts",
    "registry",
    "chunks",
    "extractions",
    "parsed",
    "entities_raw",
    "triples_raw",
    "mentions_raw",
    "entity_embeddings",
    "similar",
    "wcc",
    "canonical_map",
    "triples",
    "mentions",
    "entities",
    "membership",
    "hierarchy",
    "communities",
    "chunk_embeddings",
)


def _read_out_tables(wh) -> dict[str, DataFrame]:
    return dict(
        zip(
            _DELTA_OUT_TABLES,
            _run_parallel(
                [(lambda n=n: wh.read(n)) for n in _DELTA_OUT_TABLES]
            ),
        )
    )


def maintain_localized_state(wh, entities_tbl, triples_tbl, comm_labels):
    """The ONE owner of the localized-detection aux state
    (community_labels + proj_wcc) for every full-detection write site
    (build_all, the legacy incremental path, the delta path's full
    branch). Above the localization crossover
    (community.localization_crossover — node AND edge conditions,
    mirroring the detector's driver gate) returns the aux tables to
    commit inside the caller's sidecar bracket; below it returns {}
    AND DELETES any stale aux tables first. The deletion is a
    correctness requirement, not hygiene: a catalog that dips under
    the crossover and climbs back would otherwise leave aux tables
    from an OLDER detection on disk under a freshly committed sidecar,
    and the next localized cycle would patch its labels against a base
    that no longer corresponds to the stored membership."""
    from ..operators import community as community_mod
    from ..operators.community import projection_components

    if community_mod.localization_crossover(
        entities_tbl.count(), triples_tbl.count()
    ):
        return {
            "community_labels": comm_labels.localCheckpoint(),
            "proj_wcc": projection_components(
                entities_tbl, triples_tbl
            ).localCheckpoint(),
        }
    from . import fsio

    for name in ("community_labels", "proj_wcc"):
        fsio.rmtree(wh.path(name))
    return {}


def _localized_communities(spark, wh, cfg, delta_scope):
    """Component-scoped community recompute (VERDICT r4 #3): the
    leveled-LPA loop — the expensive multi-round shuffle stage — runs
    only over projection components touched by the cycle's triple-key
    / entity deltas; untouched components reuse their stored raw
    labels verbatim. One global renumbering pass then assembles the
    exact membership/hierarchy a full recompute would produce
    (assemble_communities_from_labels is deterministic in the label
    rows), and the catalog/summary stage — the LLM boundary at
    production scale — recomputes ONLY communities whose members,
    intra-community triples, mentions or dense ids changed; stored
    rows stand in for the rest (their ``summary_created_at`` keeps the
    writing cycle's stamp — the one permitted divergence from a full
    recompute, matching the MERGE-table convention elsewhere).

    Preconditions (checked by the caller's gate): the community
    sidecar matches cfg, ``community_labels`` + ``proj_wcc`` exist
    (committed inside the same sidecar bracket as the community
    tables), no crashed cycle's journal survives, and every
    delta_scope frame was materialized by its rewrite task.

    Returns the new tables dict, or None when the projection delta
    turns out empty (caller falls back — the binary reuse branches
    should have caught that case).

    Remaining corpus-proportional work, by design: the per-level
    dense renumbering and the hierarchy joins (single-pass, narrow —
    the dense-id contract of the reference schema is a global rank,
    leiden.py:107), and the one projection-edges scan of the triples
    table. The iterative sweeps and the summary regeneration — the
    two costs that dominate at a 10⁸-entity catalog — are
    delta-proportional.
    """
    import time as _time

    from ..operators.community import (
        assemble_communities_from_labels,
        detect_level_labels,
        extend_labels_to,
        localized_community_catalog,
        projection_edges,
    )
    from ..operators.components import connected_components_delta

    ck = lambda df: df.localCheckpoint()  # noqa: E731

    t0 = _time.time()
    entities_tbl = wh.read("entities")
    triples_tbl = wh.read("triples")
    mentions_tbl = wh.read("mentions")
    # fixed-latency guard: below the crossover the full detection is
    # a collect + pure-Python LPA — cheaper than this path's ~15
    # assembly jobs. Node AND edge conditions (a dense small-node
    # projection also forces the distributed loop); triple row count
    # is a sound upper bound on projection edges and is a parquet
    # metadata read. Same call-time predicate gates the aux writes.
    from ..operators import community as community_mod

    if not community_mod.localization_crossover(
        entities_tbl.count(), triples_tbl.count()
    ):
        return None
    proj = ck(projection_edges(triples_tbl))
    pairs = delta_scope["changed_key_pairs"].select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    cc = connected_components_delta(
        proj.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        entities_tbl.select("entity_id"),
        None,
        wh.read("proj_wcc").select("entity_id", "pwcc"),
        changed_pairs=pairs,
    )
    if cc["unchanged"]:
        return None
    affected = ck(
        cc["affected_nodes"].select(F.col("node").alias("entity_id"))
    )
    local_nodes = cc["local"].select("node")
    # edge-closure (connected_components_delta proof): every projection
    # edge touching the recomputed region lies wholly inside it
    local_edges = proj.join(
        local_nodes.withColumnRenamed("node", "a"), "a", "left_semi"
    )
    local_labels = detect_level_labels(
        local_nodes, local_edges, max_levels=cfg.max_levels
    )
    stored_labels = ck(wh.read("community_labels"))
    reused_labels = stored_labels.join(affected, "entity_id", "left_anti")
    padded = ck(
        extend_labels_to(
            reused_labels.unionByName(local_labels), cfg.max_levels
        )
    )
    # executed-level count a full run would choose: the loop executes
    # level l iff every level before it merged something (component
    # flattening is monotone, so global merge levels are contiguous);
    # merges at level l ⟺ distinct labels at l < distinct at l-1
    counts = {
        r["level"]: r["n"]
        for r in padded.groupBy("level")
        .agg(F.countDistinct("label").alias("n"))
        .collect()
    }
    prev = padded.where(F.col("level") == 0).count()  # = entity count
    if prev == 0:
        # the delta removed every entity — no labels to assemble; the
        # full detect_communities path handles the empty catalog
        return None
    e_new = 1
    for lvl in range(cfg.max_levels):
        c = counts.get(lvl, prev)
        if c < prev:
            e_new = lvl + 1
            prev = c
        else:
            break
    final_labels = ck(padded.where(F.col("level") < e_new))
    membership, hierarchy = assemble_communities_from_labels(final_labels)
    membership, hierarchy = _run_parallel(
        [lambda: ck(membership), lambda: ck(hierarchy)]
    )
    pwcc_new = ck(
        cc["components"].select(
            F.col("node").alias("entity_id"), F.col("component").alias("pwcc")
        )
    )

    # communities whose catalog row can differ from the stored one:
    # any member in the recomputed region or the cycle's entity /
    # triple / mention change scope, plus every community whose dense
    # id moved (renumbering changes the id inside summary/full_content)
    old_membership = ck(wh.read("membership"))
    dirty_entities = ck(
        affected.select("entity_id")
        .union(delta_scope["changed_entity_rows"])
        .union(delta_scope["mention_entities"])
        .union(delta_scope["triples_scope_entities"])
        .distinct()
    )
    old_map = (
        stored_labels.join(old_membership, ["entity_id", "level"])
        .select("level", "label", F.col("community_id").alias("__old_id"))
        .distinct()
    )
    new_map = (
        final_labels.join(membership, ["entity_id", "level"])
        .select("level", "label", "community_id")
        .distinct()
    )
    renumbered = (
        new_map.join(old_map, ["level", "label"], "left")
        .where(
            F.col("__old_id").isNull()
            | (F.col("__old_id") != F.col("community_id"))
        )
        .select("community_id")
    )
    communities, changed_ids = localized_community_catalog(
        membership,
        dirty_entities,
        ck(wh.read("communities")),
        entities_tbl,
        triples_tbl,
        mentions_tbl,
        extra_changed_ids=renumbered,
    )
    return {
        "membership": membership,
        "hierarchy": hierarchy,
        "communities": ck(communities),
        "community_labels": final_labels,
        "proj_wcc": pwcc_new,
        "n_changed": changed_ids.count(),
        "t0": t0,
    }


def _stored_linking_if_catalog_unchanged(wh, catalog: DataFrame):
    """(embedded, similar, wcc, canonical_map) from the warehouse when
    the merged entity catalog is BIT-IDENTICAL to the stored one, else
    None.

    Soundness: every stage of the linking chain — the embedding stub,
    hyperplane-LSH banding (fixed seed), candidate scoring, connected
    components, the per-component resolve — is a deterministic pure
    function of the (entity_id, entity_type, description) catalog
    (README "Determinism as a contract") PLUS the linking config, so
    identical (catalog, config) pairs produce identical outputs and
    the stored tables can stand in for the recompute. The config half
    is checked against the _link_params.json sidecar persisted with
    every canonical_map write — a warehouse built under a different
    similarity_method (or predating the sidecar) declines reuse and
    falls through to the full chain. The probe costs two entity-scale
    EXCEPT jobs — cheap next to the LSH shuffle + CC loop it skips.
    Any missing table or any difference (including entity count)
    returns None.
    """
    stored_params = wh.stored_link_params()
    if stored_params is None or stored_params != wh.link_params:
        return None
    cols = ["entity_id", "entity_type", "description"]
    try:
        stored_emb = wh.read("entity_embeddings")
        tables = (
            stored_emb,
            wh.read("similar"),
            wh.read("wcc"),
            wh.read("canonical_map"),
        )
    except Exception:
        return None
    if set(cols) - set(stored_emb.columns):
        return None
    new_cat = catalog.select(*cols)
    old_cat = stored_emb.select(*cols)
    # both sides are unique per entity_id, so the symmetric difference
    # decides set equality; one UNION plan evaluates both EXCEPT legs
    # inside a single job (the probe is on every cycle's hot path —
    # one barrier, not two) and limit(1) short-circuits
    diff = new_cat.exceptAll(old_cat).unionAll(old_cat.exceptAll(new_cat))
    if diff.limit(1).count():
        return None
    return tables


# rewrite-intent journal (step 3.5 of the delta cycle): the
# delta-proportional obligations a retry needs after the conv merges
# have destroyed the pre-merge evidence and the registry has committed
_JOURNAL_TABLES = {
    "pending_rewrite_convs": "conv_id string",
    "pending_rewrite_tkeys": "subj string, pred string, obj string",
    "pending_rewrite_chunks": "chunk_id string",
}


_JOURNAL_NEXT_SUFFIX = "__next"


def _heal_journal(wh) -> None:
    """Finish any swap a crash interrupted: a COMPLETE ``__next``
    generation (its _SUCCESS exists) supersedes the main table — it is
    always a superset (every write unions the stored journal), so
    promoting it is monotone-safe whether the crash hit before or after
    the main table's delete. After this, the main path is the single
    authoritative copy and a later overwrite of ``__next`` can never
    destroy live obligations."""
    from . import fsio

    for name in _JOURNAL_TABLES:
        nxt = wh.path(name) + _JOURNAL_NEXT_SUFFIX
        if fsio.exists(os.path.join(nxt, "_SUCCESS")):
            fsio.rmtree(wh.path(name))
            fsio.rename(nxt, wh.path(name))


def _read_journal(spark: SparkSession, wh) -> dict[str, DataFrame]:
    """The surviving journal of a crashed cycle, empty frames when the
    last cycle completed (or none ever ran). Heals an interrupted swap
    first so the caller (and a subsequent _write_journal) always sees
    one authoritative generation per table."""
    _heal_journal(wh)
    return {
        name: (
            wh.read(name)
            if wh.exists(name)
            else spark.createDataFrame([], schema)
        )
        for name, schema in _JOURNAL_TABLES.items()
    }


def _write_journal(wh, updates: dict[str, DataFrame]) -> None:
    """Persist the journal BEFORE the first destructive merge, without
    ever holding the obligations in zero complete copies: each table is
    written to a ``__next`` sibling first, then swapped in (delete main
    + atomic rename). A plain overwrite of the main path would be
    delete-then-write — a crash inside that window destroys a PRIOR
    crashed cycle's obligations, which are exactly the ones the retry's
    change detection cannot re-derive (its registry already committed).
    Crash windows here: during the ``__next`` write the main table is
    intact (and any complete prior ``__next`` was promoted by
    _heal_journal before this call); between delete and rename the
    complete ``__next`` survives and the next read heals it forward.
    Inputs are checkpointed by the caller (they union the stored
    journal being replaced)."""
    from . import fsio

    for name, df in updates.items():
        nxt = wh.path(name) + _JOURNAL_NEXT_SUFFIX
        df.write.mode("overwrite").parquet(nxt)
        fsio.rmtree(wh.path(name))
        fsio.rename(nxt, wh.path(name))


def _clear_journal(wh) -> None:
    from . import fsio

    for name in _JOURNAL_TABLES:
        fsio.rmtree(wh.path(name))
        fsio.rmtree(wh.path(name) + _JOURNAL_NEXT_SUFFIX)


def _triple_keys(t_raw: DataFrame, cmap: DataFrame) -> DataFrame:
    """Distinct canonical (subj, pred, obj) keys of a raw-triple slice
    under a given canonical map."""
    from ..operators.canonicalize import _canonize

    return (
        _canonize(_canonize(t_raw, "subj", cmap), "obj", cmap)
        .select("subj", "pred", "obj")
        .distinct()
    )
