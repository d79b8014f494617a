"""Query-side retrieval over the materialized KG tables (SURVEY.md §2
J8/W6/L6/L7 — the reference's search/ package re-expressed as
DataFrame queries; secondary to the build gate but proves the tables
serve the same read patterns).

Reference behavior reproduced:
  - local search (search/local_search.py:88-133): embed the query →
    top-k entities by cosine → fan out to top chunks by mention
    frequency, top communities by rank, inside/outside relationships
    by weight — four joins + per-seed top-k windows;
  - global search (search/global_search.py:56-125): map over community
    summaries (LLM per community — stubbed) → reduce to an answer;
  - dual-level keyword extraction (search/tool/base.py:78+) — stubbed
    deterministically like the other LLM boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.stub_embed import embed_text
from ..core.stub_extract import extract_mentions


def _cosine_to_query(vec_col: str, query_vec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm == 0, F.lit(0.0)).otherwise(dot / norm)  # query is unit


def top_entities_for_query(
    entities: DataFrame, query: str, k: int = 10
) -> DataFrame:
    """Vector top-k entity seeds (Neo4jVector.similarity_search stand-in,
    local_search.py:165-227)."""
    qvec = embed_text(query)
    return (
        entities.where(F.col("embedding").isNotNull())
        .withColumn("score", _cosine_to_query("embedding", qvec))
        .orderBy(F.desc("score"), F.asc("entity_id"))
        .limit(k)
        .select("entity_id", "score")
    )


def local_search(
    entities: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    membership: DataFrame,
    communities: DataFrame,
    chunks: DataFrame,
    query: str,
    top_entities: int = 10,
    top_chunks: int = 3,
    top_communities: int = 3,
    top_rels: int = 10,
) -> dict[str, DataFrame]:
    """The reference's retrieval fan-out (local_search.py:88-133) as
    declarative queries from seed entities. When the chunks table
    carries an ``embedding`` column (build stage 3 —
    operators/chunk_index.with_chunk_embeddings), the result also
    includes direct chunk-vector retrieval (``vector_chunks``), the
    reference's Neo4jVector chunk-index read path."""
    seeds = top_entities_for_query(entities, query, top_entities)

    # chunks by mention frequency of seed entities (A7 + W6)
    chunk_freq = (
        mentions.join(seeds, "entity_id")
        .groupBy("chunk_id")
        .agg(F.countDistinct("entity_id").alias("freq"))
        .join(chunks.select("chunk_id", "text"), "chunk_id")
        .orderBy(F.desc("freq"), F.asc("chunk_id"))
        .limit(top_chunks)
    )

    vector_chunks = None
    if "embedding" in chunks.columns:
        from .chunk_index import top_chunks_for_query

        vector_chunks = top_chunks_for_query(chunks, query, k=top_chunks)

    # communities of seeds by rank (W5-like)
    seed_comms = (
        membership.join(seeds, "entity_id")
        .select("community_id")
        .distinct()
        .join(communities, "community_id")
        .orderBy(F.desc("community_rank"), F.asc("community_id"))
        .limit(top_communities)
        .select("community_id", "community_rank", "summary")
    )

    # inside rels: both endpoints are seeds; outside: exactly one is
    seed_ids = seeds.select(F.col("entity_id"))
    s_subj = seed_ids.withColumnRenamed("entity_id", "subj")
    s_obj = seed_ids.withColumnRenamed("entity_id", "obj")
    inside = (
        triples.join(s_subj, "subj", "left_semi")
        .join(s_obj, "obj", "left_semi")
        .orderBy(F.desc("weight"), "subj", "pred", "obj")
        .limit(top_rels)
        .select("subj", "pred", "obj", "weight")
    )
    one_side = triples.join(s_subj, "subj", "left_semi").union(
        triples.join(s_obj, "obj", "left_semi")
    )
    outside = (
        one_side.join(s_subj, "subj", "left_anti")
        .union(one_side.join(s_obj, "obj", "left_anti"))
        .dropDuplicates(["subj", "pred", "obj"])
        .orderBy(F.desc("weight"), "subj", "pred", "obj")
        .limit(top_rels)
        .select("subj", "pred", "obj", "weight")
    )

    out = {
        "seeds": seeds,
        "chunks": chunk_freq,
        "communities": seed_comms,
        "inside_rels": inside,
        "outside_rels": outside,
    }
    if vector_chunks is not None:
        out["vector_chunks"] = vector_chunks
    return out


def global_search_map(
    communities: DataFrame, query: str, level: int = 0, limit: int = 200
) -> DataFrame:
    """Map phase over community summaries (global_search.py:56-125 +
    the top-200-by-rank cap at summary/leiden.py:36-39). The per-
    community LLM scoring is stubbed as deterministic term overlap."""
    terms = [t for t in extract_query_keywords(query)["low_level"]]
    score = F.lit(0)
    for t in terms:
        score = score + F.when(F.col("full_content").contains(t), 1).otherwise(0)
    return (
        communities.where(F.col("level") == level)
        .orderBy(F.desc("community_rank"), F.asc("community_id"))
        .limit(limit)
        .withColumn("points", score)
        .where(F.col("points") > 0)
        .select("community_id", "points", "summary")
        .orderBy(F.desc("points"), F.asc("community_id"))
    )


def global_search_reduce(mapped: DataFrame, top: int = 5) -> str:
    """Reduce phase: merge top community points into one answer
    (stub of the reduce LLM call)."""
    rows = mapped.limit(top).collect()
    if not rows:
        return "No relevant communities found."
    parts = [f"[{r['community_id']} +{r['points']}] {r['summary']}" for r in rows]
    return "\n".join(parts)


def extract_query_keywords(query: str) -> dict[str, list[str]]:
    """Dual-level keyword extractor stub (search/tool/base.py:78+,
    {low_level, high_level}): vocabulary mentions are low-level
    (entity-ish); remaining long tokens high-level (concept-ish)."""
    mentions = extract_mentions(query)
    rest = [
        t
        for t in query.replace("，", " ").replace("。", " ").split()
        if len(t) > 3 and t not in mentions
    ]
    return {"low_level": list(dict.fromkeys(mentions)), "high_level": rest[:5]}
