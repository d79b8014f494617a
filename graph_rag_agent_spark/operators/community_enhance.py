"""Community-aware search enhancement — the deep-research
CommunityAwareSearchEnhancer's data operations (reference
search/tool/reasoning/community_enhance.py) as batched table
programs:

  - ``relevant_communities``: the rank-capped candidate pool (top-20
    by community_rank — a TakeOrderedAndProject, no global sort) cross
    joined with the broadcast query batch, scored 0.6×cosine +
    0.3×min(kw,5)/5 + 0.1×min(rank/10,1) entirely JVM-side, top-3 per
    query;
  - ``community_knowledge_entities`` / ``_relationships``: the
    IN_COMMUNITY member pull with mention counts (top-50 per query)
    and the member-pair relationship pull with path importance
    (top-100 per query) — joins + per-query windows instead of the
    reference's per-call Cypher;
  - ``with_temporal_info``: the five date regexes as JVM
    regexp_extract_all, concatenated in pattern order.

The query batch is small-by-contract (same contract as
chunk_index.chunk_topk); the community/membership/mention tables
stream through joins and are never collected. Deterministic pins
(documented): candidate and winner ties break community_id ASC; the
unordered Cypher LIMIT 50/100 ties break (mention_count DESC,
entity_id, community_id) resp. (path_importance DESC, subj, pred,
obj).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.community_enhance import (
    CANDIDATE_LIMIT,
    DEFAULT_TOP_K,
    ENTITY_LIMIT,
    RELATIONSHIP_LIMIT,
    TEMPORAL_PATTERNS,
)

_INTS = ("int", "bigint", "smallint", "tinyint")


def _cosine(a: str, b: str, integral: bool):
    """cosine(a, b) over the shared dot-fold core (chunk_index._dot —
    the same helper the query cache rides); with integral vectors the
    dot products are exact BIGINT folds and only the final sqrt/divide
    touch floats — the shape the SQL oracle replays bit-for-bit."""
    from .chunk_index import _dot

    d = _dot(a, b, integral).cast("double")
    na = F.sqrt(_dot(a, a, integral).cast("double"))
    nb = F.sqrt(_dot(b, b, integral).cast("double"))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        d / (na * nb)
    )


def relevant_communities(
    communities: DataFrame,
    queries: DataFrame,
    top_k: int = DEFAULT_TOP_K,
    candidate_limit: int = CANDIDATE_LIMIT,
) -> DataFrame:
    """find_relevant_communities batched (community_enhance.py:67-153).

    ``communities``: (community_id, summary, community_rank,
    embedding); ``queries``: (query_id, qvec, high_level, low_level).
    → (query_id, community_id, score, summary), top_k rows per query.

    The candidate pool is GLOBAL (the reference's rank-DESC LIMIT 20
    runs before any query is seen), so it computes once per batch and
    broadcasts; rank ties pin community_id ASC. NULL-summary rows are
    excluded exactly like the Cypher WHERE."""
    cand = (
        communities.where(F.col("summary").isNotNull())
        .orderBy(
            F.desc_nulls_last("community_rank"), F.asc("community_id")
        )
        .limit(candidate_limit)
    )
    integral = (
        communities.schema["embedding"].dataType.elementType.simpleString()
        in _INTS
        and queries.schema["qvec"].dataType.elementType.simpleString()
        in _INTS
    )
    low_summary = F.lower("summary")
    kw_score = F.size(
        F.filter(
            F.coalesce(F.col("high_level"), F.array().cast("array<string>")),
            lambda kw: low_summary.contains(F.lower(kw)),
        )
    ) * F.lit(2.0) + F.size(
        F.filter(
            F.coalesce(F.col("low_level"), F.array().cast("array<string>")),
            lambda kw: low_summary.contains(F.lower(kw)),
        )
    ) * F.lit(0.5)
    # `rank or 1`: NULL and 0 both read as 1 (core importance_norm;
    # the string-rank parse rung has no analogue in a typed column)
    rank = F.col("community_rank").cast("double")
    importance = F.least(
        F.when(rank.isNull() | (rank == 0), F.lit(1.0)).otherwise(rank)
        / F.lit(10.0),
        F.lit(1.0),
    )
    scored = (
        F.broadcast(cand)
        .crossJoin(queries)
        .withColumn("__sim", _cosine("embedding", "qvec", integral))
        .withColumn(
            "score",
            F.col("__sim") * 0.6
            + (F.least(kw_score, F.lit(5.0)) / 5.0) * 0.3
            + importance * 0.1,
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("community_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= top_k)
        .select("query_id", "community_id", "score", "summary")
    )


def community_knowledge_entities(
    selected: DataFrame,
    membership: DataFrame,
    mentions: DataFrame,
    limit: int = ENTITY_LIMIT,
    descriptions: DataFrame | None = None,
) -> DataFrame:
    """extract_community_knowledge's entity pull (community_enhance.py
    :173-188) per query: members of the selected communities with
    their chunk mention counts, top-``limit`` per query.

    ``selected``: (query_id, community_id) — e.g.
    relevant_communities' output; ``membership``: (entity_id,
    community_id); ``mentions``: (chunk_id, entity_id);
    ``descriptions`` (optional): (entity_id, description)."""
    counts = mentions.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("mention_count")
    )
    members = (
        selected.select("query_id", "community_id")
        .join(membership.select("entity_id", "community_id"), "community_id")
        .join(counts, "entity_id")  # inner: the Cypher MATCH requires ≥1
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("mention_count"), F.asc("entity_id"), F.asc("community_id")
    )
    out = (
        members.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= limit)
        .select("query_id", "entity_id", "community_id", "mention_count")
    )
    if descriptions is not None:
        out = out.join(
            descriptions.select("entity_id", "description"),
            "entity_id",
            "left",
        )
    return out


def community_knowledge_relationships(
    entities: DataFrame,
    triples: DataFrame,
    mentions: DataFrame,
    limit: int = RELATIONSHIP_LIMIT,
) -> DataFrame:
    """extract_community_knowledge's relationship pull
    (community_enhance.py:196-215) per query: triples whose BOTH
    endpoints are among the query's selected entities,
    path_importance = mentions(subj) + mentions(obj) (0 when
    unmentioned — the OPTIONAL MATCH), top-``limit`` per query.

    ``entities``: (query_id, entity_id) — e.g.
    community_knowledge_entities' output."""
    ent = entities.select("query_id", "entity_id").distinct()
    counts = mentions.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    t = (
        triples.select("subj", "pred", "obj", "weight")
        .join(
            ent.select(
                F.col("query_id"), F.col("entity_id").alias("subj")
            ),
            "subj",
        )
        # composite-key join: restricting the obj side to the SAME
        # query in the join condition (not a post-filter) keeps a
        # triple matched by k queries' subj sets from fanning out
        # k× against every query's obj set first
        .join(
            ent.select(
                F.col("query_id"), F.col("entity_id").alias("obj")
            ),
            ["query_id", "obj"],
        )
        .join(
            counts.select(
                F.col("entity_id").alias("subj"), F.col("__n").alias("__ns")
            ),
            "subj",
            "left",
        )
        .join(
            counts.select(
                F.col("entity_id").alias("obj"), F.col("__n").alias("__no")
            ),
            "obj",
            "left",
        )
        .withColumn(
            "path_importance",
            F.coalesce("__ns", F.lit(0)) + F.coalesce("__no", F.lit(0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("path_importance"), F.asc("subj"), F.asc("pred"), F.asc("obj")
    )
    return (
        t.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= limit)
        .select(
            "query_id", "subj", "pred", "obj", "weight", "path_importance"
        )
    )


def with_temporal_info(
    df: DataFrame, text_col: str = "summary", out_col: str = "temporal_info"
) -> DataFrame:
    """_extract_temporal_info (community_enhance.py:236-252): the five
    date regexes, findall per pattern, concatenated in pattern order —
    JVM regexp_extract_all, no Python."""
    parts = [
        F.regexp_extract_all(F.col(text_col), F.lit(p), 0)
        for p in TEMPORAL_PATTERNS
    ]
    return df.withColumn(out_col, F.concat(*parts))
