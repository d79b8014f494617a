"""Query-result cache: exact-key + vector-similarity lookup with
quality metadata (the reference's CacheManage/ subsystem).

Reference behavior reproduced:
  - cache keys: md5 of the stripped query
    (CacheManage/strategies/simple.py:9-10); context-aware variant
    combines ``thread:{tid}|ctx:{history}|v{version}|{query}``
    (strategies/context_aware.py:36-51);
  - cache items carry quality metadata — quality_score,
    user_verified, fast_path_eligible, access_count
    (models/cache_item.py:14-35) — with
    ``is_high_quality = user_verified OR quality_score > 2 OR
    fast_path_eligible`` (cache_item.py:41-44);
  - ``mark_quality``: positive → score+1, user_verified=True,
    fast_path_eligible=True; negative → score=max(-5, score-2),
    fast_path_eligible=False (cache_item.py:46-56);
  - ``get``: exact key first, then vector-similarity fallback over
    stored query embeddings — top-3 candidates, inner-product score ≥
    similarity_threshold (config/settings.py:38: 0.9), context gated
    on thread_id equality (manager.py:100-153,
    vector_similarity/matcher.py:78-148);
  - ``get_fast`` (the "fast_cache_check" the readme times at
    0.93-1.11 s, readme.md:175,254,335,424): same ladder but top-1
    and HIGH-QUALITY ONLY on both rungs (manager.py:155-199).

Spark-first shape: the cache is a TABLE (cache_key, query, content,
thread_id, quality metadata, embedding) — bucketed by cache_key under
plans/merge for MERGE-backed set/mark at scale — and lookups are
BATCHED: one job answers a whole query set. The exact rung streams
the cache once through an inner join against the broadcast probe-key
set; the vector rung scores the stored side in place against the
broadcast query batch (query batches are small-by-contract — the same
contract as chunk_index.chunk_topk). The stored side is never
collected or shuffled: a 10⁹-row cache scans exactly twice per
lookup, bucketed-pruned when the caller pre-filters threads. No
FAISS: at cache sizes where even the scan hurts, route the vector
rung through operators/knn (LSH/IVF) — same candidate contract.

Deterministic deviation (documented, same policy as the ASCII-\\b
article regex): FAISS breaks score ties by insertion order
(matcher.py:96-113); here ties break (score DESC, cache_key ASC) so
both engines and the SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: reference config/settings.py:38 — similarity_threshold = 0.9 on
#: normalized sentence-transformer embeddings. Integer stub embeddings
#: use an integer threshold instead (exact cross-engine arithmetic).
SIMILARITY_THRESHOLD = 0.9


def cache_key_simple(query_col) -> F.Column:
    """md5(query.strip()) — bit-identical hex to
    CacheManage/strategies/simple.py:9-10 for ASCII whitespace
    (java \\s vs Python str.strip()'s full-unicode set — the
    documented ASCII deviation)."""
    stripped = F.regexp_replace(query_col, r"^\s+|\s+$", "")
    return F.md5(F.encode(stripped, "utf-8"))


def cache_key_context(
    query_col, thread_id_col, context_col, version_col
) -> F.Column:
    """Context-aware key: md5 of
    ``thread:{tid}|ctx:{context}|v{version}|{query}`` stripped —
    strategies/context_aware.py:36-51. ``context_col`` is the caller's
    space-joined last-N history window (the reference keeps that
    driver-side per thread; a Spark caller derives it with a lag/
    collect_list window over its conversation table)."""
    combined = F.concat(
        F.lit("thread:"),
        thread_id_col,
        F.lit("|ctx:"),
        context_col,
        F.lit("|v"),
        version_col.cast("string"),
        F.lit("|"),
        query_col,
    )
    return F.md5(F.encode(F.regexp_replace(combined, r"^\s+|\s+$", ""), "utf-8"))


def is_high_quality() -> F.Column:
    """cache_item.is_high_quality (models/cache_item.py:41-44)."""
    return (
        F.coalesce(F.col("user_verified"), F.lit(False))
        | (F.coalesce(F.col("quality_score"), F.lit(0)) > 2)
        | F.coalesce(F.col("fast_path_eligible"), F.lit(False))
    )


def apply_quality_marks(cache: DataFrame, marks: DataFrame) -> DataFrame:
    """mark_quality over a batch: ``marks(cache_key, is_positive)``
    (one row per key — the reference marks one item per call,
    manager.py mark_quality path; callers dedup upstream).
    Positive: score+1, user_verified=True, fast_path_eligible=True.
    Negative: score=max(-5, score-2), fast_path_eligible=False
    (cache_item.py:46-56). Unmarked rows pass through unchanged; the
    persisted variant routes the changed rows through a cache_key
    MERGE (plans/merge.merge_into) so only delta-touched buckets
    rewrite."""
    score = F.coalesce(F.col("quality_score"), F.lit(0))
    j = cache.join(F.broadcast(marks), "cache_key", "left")
    return (
        j.withColumn(
            "quality_score",
            F.when(F.col("is_positive") == True, score + 1)  # noqa: E712
            .when(
                F.col("is_positive") == False,  # noqa: E712
                F.greatest(F.lit(-5), score - 2),
            )
            .otherwise(F.col("quality_score")),
        )
        .withColumn(
            "user_verified",
            F.when(
                F.col("is_positive") == True, F.lit(True)  # noqa: E712
            ).otherwise(F.col("user_verified")),
        )
        .withColumn(
            "fast_path_eligible",
            F.when(F.col("is_positive") == True, F.lit(True))  # noqa: E712
            .when(F.col("is_positive") == False, F.lit(False))  # noqa: E712
            .otherwise(F.col("fast_path_eligible")),
        )
        .drop("is_positive")
    )


def _scored_candidates(
    cache: DataFrame, misses: DataFrame, threshold, metric: str
) -> DataFrame:
    """Vector rung: every same-thread (query, entry) pair scored,
    threshold-cut — matcher.find_similar's context gate (thread_id
    equality, matcher.py:139-148) + score cut (matcher.py:103-107).
    The query batch is small-by-contract; the cache side streams in
    ONE scan per lookup (never collected), and the winner rows carry
    their content/quality payload so no second cache join is needed.

    Physical strategy by vector type (same routing as
    chunk_index.chunk_topk): integral dot → the shared
    partial_top_scores_integral core (per-thread int64 matmuls, each
    batch emitting its ties-kept top-1 superset per query, integer
    ceil of the threshold so score ≥ threshold matches the float
    comparison on integer scores); float metrics → JVM zip_with on
    the broadcast thread equi-join.

    → (query_id, cache_key, score, content, quality_score,
    user_verified, fast_path_eligible).

    Deviation (documented): the reference context-filters AFTER a
    global FAISS top-2k probe (matcher.py:96-107), so a same-thread
    entry outranked globally by other threads' vectors can be missed;
    gating on thread BEFORE ranking scores exactly the candidate set
    the semantics name — strictly better recall, and replayable in
    closed-form SQL. Corpus-scale caches route this rung through
    operators/knn (LSH/IVF) instead of the full scan.

    NULL thread_ids coalesce to 'default' on BOTH sides before the
    thread gate — the reference maps an absent thread_id to 'default'
    (matcher.py:145-148, manager.py:94,227), so a
    NULL-thread probe matches NULL-thread cache entries instead of
    silently never vector-matching through the inner join."""
    from .chunk_index import _dot

    cache = cache.withColumn(
        "thread_id", F.coalesce(F.col("thread_id"), F.lit("default"))
    )
    misses = misses.withColumn(
        "thread_id", F.coalesce(F.col("thread_id"), F.lit("default"))
    )
    elem = cache.schema["embedding"].dataType.elementType.simpleString()
    q_elem = misses.schema["qvec"].dataType.elementType.simpleString()
    _ints = ("int", "bigint", "smallint", "tinyint")
    if metric == "dot" and elem in _ints and q_elem in _ints:
        return _scored_candidates_integral(cache, misses, threshold)
    joined = cache.select(
        "cache_key",
        "thread_id",
        "embedding",
        *_PAYLOAD_COLS,
    ).join(
        F.broadcast(misses.select("query_id", "thread_id", "qvec")),
        "thread_id",
    )
    if metric == "dot":
        score = _dot("embedding", "qvec", False)
    else:
        dot = _dot("embedding", "qvec", False)
        n_c = F.sqrt(
            F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x)
        )
        n_q = F.sqrt(
            F.aggregate(F.col("qvec"), F.lit(0.0), lambda a, x: a + x * x)
        )
        score = F.when((n_c == 0) | (n_q == 0), F.lit(0.0)).otherwise(
            dot / (n_c * n_q)
        )
    return (
        joined.withColumn("score", score)
        .where(F.col("score") >= threshold)
        .select("query_id", "cache_key", "score", *_PAYLOAD_COLS)
    )


#: winner-row payload echoed through the vector rung so quality gating
#: and content never need a second cache join
_PAYLOAD_COLS = (
    "content",
    "quality_score",
    "user_verified",
    "fast_path_eligible",
)


def _scored_candidates_integral(
    cache: DataFrame, misses: DataFrame, threshold
) -> DataFrame:
    """Integral-dot vector rung over the shared matmul core
    (chunk_index.partial_top_scores_integral, group_col=thread_id):
    the probe batch collects driver-side (it already rides a broadcast
    in the JVM plan — same bound) into one int64 matrix per thread.
    The threshold is ceil'd: integer scores satisfy
    ``score >= threshold`` iff ``score >= ceil(threshold)``, so the
    module's float default (0.9) behaves exactly like the float
    rung instead of truncating to 0."""
    import math

    import numpy as np

    from .chunk_index import partial_top_scores_integral

    spark = cache.sparkSession
    q_rows = [
        r
        for r in misses.select("query_id", "thread_id", "qvec").collect()
        if r[2] is not None and all(v is not None for v in r[2])
    ]
    qid_type = misses.schema["query_id"].dataType.simpleString()
    tid_type = cache.schema["thread_id"].dataType.simpleString()
    out_schema = (
        f"query_id {qid_type}, cache_key string, score long, "
        "content string, quality_score int, user_verified boolean, "
        "fast_path_eligible boolean"
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    by_thread: dict = {}
    for r in q_rows:
        by_thread.setdefault(r[1], []).append((r[0], r[2]))
    q_mats = {
        t: (
            [qid for qid, _ in rows],
            np.asarray([v for _, v in rows], dtype=np.int64).T,  # dim×Q
        )
        for t, rows in by_thread.items()
    }
    cand = partial_top_scores_integral(
        cache,
        q_mats,
        id_col="cache_key",
        vec_col="embedding",
        group_col="thread_id",
        k=1,
        threshold=math.ceil(threshold),
        payload_cols=_PAYLOAD_COLS,
    )
    qid_map = spark.createDataFrame(
        [
            (t, qi, ids[qi])
            for t, (ids, _) in q_mats.items()
            for qi in range(len(ids))
        ],
        f"thread_id {tid_type}, qi int, query_id {qid_type}",
    )
    return cand.join(F.broadcast(qid_map), ["thread_id", "qi"]).select(
        "query_id", "cache_key", "score", *_PAYLOAD_COLS
    )


def cache_lookup_batch(
    cache: DataFrame,
    queries: DataFrame,
    threshold=SIMILARITY_THRESHOLD,
    metric: str = "dot",
    fast: bool = True,
) -> DataFrame:
    """Batched get_fast / get over the cache table.

    ``cache``: (cache_key, query, content, thread_id, quality_score,
    user_verified, fast_path_eligible, embedding). ``queries``:
    (query_id, query, thread_id, qvec).

    → (query_id, hit_type 'exact'|'vector'|'miss', cache_key, content,
    score) — one row per query.

    ``fast=True`` = manager.get_fast (manager.py:155-199): exact hit
    returns only when high-quality; otherwise the TOP-1 same-thread
    candidate with score ≥ threshold returns only when high-quality
    (a low-quality best candidate is NOT skipped over — the reference
    iterates the top-1 list and falls through to miss).
    ``fast=False`` = manager.get (manager.py:100-153): an exact hit
    always returns; otherwise the best candidate returns regardless
    of quality (every candidate key exists in storage, so the
    reference's top-3 loop returns its first element).

    Scale shape: the cache streams exactly TWICE per lookup — once
    through the exact rung (inner join against a broadcast of the
    distinct probe keys; the tiny hit set is then eagerly
    materialized so downstream re-evaluation never re-scans the
    cache, and broadcast back onto the probe batch) and once through
    the vector rung (winner rows carry their content/quality payload,
    so no third join). Nothing shuffles the cache side.
    """
    qkeyed = queries.withColumn("cache_key", cache_key_simple(F.col("query")))
    probe_keys = qkeyed.select("cache_key").distinct()
    # exact rung: cache ⋈ broadcast(probe keys) — the cache streams
    # (build side = the probe batch), and the probe-sized hit set is
    # pinned with an eager localCheckpoint so the misses branch, the
    # integral rung's collect, and the final output join all reuse it
    # without re-reading the cache
    hits = (
        cache.select(
            "cache_key", "content", *(c for c in _PAYLOAD_COLS if c != "content")
        )
        .join(F.broadcast(probe_keys), "cache_key")
        # explicit presence marker: a stored row whose content is
        # legitimately NULL is still a hit (the reference treats any
        # stored item as a hit and returns its possibly-None content,
        # manager.py get/get_fast) — content IS NOT NULL would read
        # such a row as a miss
        .withColumn("__present", F.lit(True))
        .localCheckpoint()
    )
    exact_rows = (
        qkeyed.join(F.broadcast(hits), "cache_key", "left")
        .withColumn("__hq", is_high_quality())
        .withColumn(
            "__exact_hit",
            F.coalesce(F.col("__present"), F.lit(False))
            & (F.lit(not fast) | F.col("__hq")),
        )
        .select(
            "query_id",
            "thread_id",
            "qvec",
            "cache_key",
            "content",
            "__exact_hit",
        )
    )

    misses = exact_rows.where(~F.col("__exact_hit")).select(
        "query_id", "thread_id", "qvec"
    )
    cand = _scored_candidates(cache, misses, threshold, metric)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("cache_key")
    )
    best = (
        cand.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
        .withColumn("__hq", is_high_quality())
        .where(F.lit(not fast) | F.col("__hq"))
        .select(
            "query_id",
            F.col("cache_key").alias("__v_key"),
            F.col("content").alias("__v_content"),
            F.col("score").alias("__v_score"),
        )
    )

    out = exact_rows.join(F.broadcast(best), "query_id", "left")
    return out.select(
        "query_id",
        F.when(F.col("__exact_hit"), F.lit("exact"))
        .when(F.col("__v_key").isNotNull(), F.lit("vector"))
        .otherwise(F.lit("miss"))
        .alias("hit_type"),
        F.when(F.col("__exact_hit"), F.col("cache_key"))
        .otherwise(F.col("__v_key"))
        .alias("cache_key"),
        F.when(F.col("__exact_hit"), F.col("content"))
        .otherwise(F.col("__v_content"))
        .alias("content"),
        F.when(F.col("__exact_hit"), F.lit(None))
        .otherwise(F.col("__v_score"))
        .alias("score"),
    )


def upsert_cache_entries(spark, path: str, entries: DataFrame) -> dict:
    """cache.set for a batch: source-wins keyed MERGE into the
    bucketed cache table (manager.py set → storage.set; Iceberg
    MERGE INTO shape via plans/merge). Re-setting a key replaces
    content AND metadata — the reference wraps a fresh CacheItem on
    every set (manager.py:206-218)."""
    from ..plans.merge import merge_into

    keyed = entries.withColumn("cache_key", cache_key_simple(F.col("query")))
    return merge_into(spark, path, keyed, "cache_key")


def persist_quality_marks(spark, path: str, marks: DataFrame) -> dict:
    """mark_quality against the persisted cache: read ONLY the
    buckets holding the marked keys, apply the metadata formulas, and
    MERGE the changed rows back — delta-proportional like every other
    maintenance write (plans/merge.read_pruned + merge_into)."""
    from ..plans.merge import merge_into, read_pruned

    current = read_pruned(spark, path, marks.select("cache_key"))
    updated = apply_quality_marks(current, marks)
    return merge_into(spark, path, updated, "cache_key")
