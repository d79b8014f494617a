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

from collections.abc import Iterator

import pandas as pd
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
    # unionByName, never positional union: a USING join hoists its key
    # column first (obj-leg rows come back as (obj, subj, pred, …)),
    # so a positional union silently MIRRORS subj/obj for every
    # obj-leg row — caught by the batch-vs-loop parity test
    one_side = triples.join(s_subj, "subj", "left_semi").unionByName(
        triples.join(s_obj, "obj", "left_semi"), allowMissingColumns=False
    )
    outside = (
        one_side.join(s_subj, "subj", "left_anti")
        .unionByName(one_side.join(s_obj, "obj", "left_anti"))
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


def embed_query_batch(
    queries: DataFrame, text_col: str = "query_text"
) -> DataFrame:
    """(…, query_text) → + ``qvec``: the pluggable embedding slot as
    an Arrow-batched pandas UDF (same boundary as entity/chunk
    embeddings — never per-row Python)."""

    @F.pandas_udf("array<double>")
    def _emb(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield pd.Series([embed_text(t or "") for t in texts])

    return queries.withColumn("qvec", _emb(F.col(text_col)))


def local_search_batch(
    queries: DataFrame,
    entities: DataFrame,
    mentions: DataFrame | None = None,
    chunks: DataFrame | None = None,
    triples: DataFrame | None = None,
    membership: DataFrame | None = None,
    communities: DataFrame | None = None,
    top_entities: int = 10,
    top_chunks: int = 3,
    top_communities: int = 3,
    top_rels: int = 10,
    metric: str = "cosine",
) -> dict[str, DataFrame]:
    """BATCHED local search: every query in ``queries`` (query_id,
    qvec — see ``embed_query_batch``) runs the reference's retrieval
    fan-out (local_search.py:88-133) in ONE declarative plan, keyed by
    query_id. ``local_search`` above is the single-query shape (one
    driver round-trip per query, mirroring the reference's request
    loop); this is the serving/evaluation shape — the reference's
    evaluator replays hundreds of questions through the same fan-out
    one at a time (evaluator/*), which at cluster scale is hundreds of
    driver barriers for work one plan can share.

    Scale shape (the 100 TB path):
      - the query set is small-by-contract (thousands of rows × small
        vectors): float metrics broadcast it into one JVM scoring
        pass; the integer-dot path instead collects it driver-side
        and scores each stored Arrow batch with one blocked numpy
        matmul, emitting only per-query partial top-k candidates
        (``chunk_index._topk_integral_partial``) — either way the
        stored side is scored in place, never collected;
      - every top-k is a window PARTITIONED BY query_id — parallel
        across queries, never a single-partition global sort;
      - the chunk / community / relationship fan-outs join the
        (|Q|·k)-row seed set (broadcast) against mentions / triples —
        one shuffle each, shared by ALL queries, instead of |Q|
        sequential jobs.

    Facets are computed lazily from what is passed: ``seeds`` always;
    ``chunks`` needs ``mentions`` (+texts when ``chunks`` given);
    ``communities`` needs ``membership``+``communities``;
    ``inside_rels``/``outside_rels`` need ``triples``. Tie-breaks
    match ``local_search`` exactly (score/freq/weight desc, id asc),
    so the batch result row-for-row equals the per-query loop."""
    from .chunk_index import chunk_topk

    seeds = chunk_topk(
        entities.where(F.col("embedding").isNotNull()).select(
            "entity_id", "embedding"
        ),
        queries.select("query_id", "qvec"),
        k=top_entities,
        metric=metric,
        id_col="entity_id",
    )
    seed_ids = seeds.select("query_id", "entity_id")
    out: dict[str, DataFrame] = {"seeds": seeds}

    if mentions is not None:
        w_chunk = Window.partitionBy("query_id").orderBy(
            F.desc("freq"), F.asc("chunk_id")
        )
        chunk_freq = (
            mentions.select("chunk_id", "entity_id")
            .join(F.broadcast(seed_ids), "entity_id")
            .groupBy("query_id", "chunk_id")
            .agg(F.countDistinct("entity_id").alias("freq"))
            .withColumn("rank", F.row_number().over(w_chunk))
            .where(F.col("rank") <= top_chunks)
        )
        if chunks is not None and "text" in chunks.columns:
            chunk_freq = chunk_freq.join(
                chunks.select("chunk_id", "text"), "chunk_id"
            ).select("query_id", "chunk_id", "freq", "rank", "text")
        out["chunks"] = chunk_freq

    if membership is not None and communities is not None:
        w_comm = Window.partitionBy("query_id").orderBy(
            F.desc("community_rank"), F.asc("community_id")
        )
        out["communities"] = (
            membership.join(F.broadcast(seed_ids), "entity_id")
            .select("query_id", "community_id")
            .distinct()
            .join(communities, "community_id")
            .withColumn("rank", F.row_number().over(w_comm))
            .where(F.col("rank") <= top_communities)
            .select(
                "query_id", "community_id", "community_rank", "summary", "rank"
            )
        )

    if triples is not None:
        s_subj = seed_ids.select(
            "query_id", F.col("entity_id").alias("subj")
        )
        s_obj = seed_ids.select("query_id", F.col("entity_id").alias("obj"))
        w_rel = Window.partitionBy("query_id").orderBy(
            F.desc("weight"), "subj", "pred", "obj"
        )
        t = triples.select("subj", "pred", "obj", "weight")
        inside = (
            t.join(F.broadcast(s_subj), "subj")
            .join(F.broadcast(s_obj), ["query_id", "obj"], "left_semi")
            .withColumn("rank", F.row_number().over(w_rel))
            .where(F.col("rank") <= top_rels)
            .select("query_id", "subj", "pred", "obj", "weight", "rank")
        )
        one_side = t.join(F.broadcast(s_subj), "subj").unionByName(
            t.join(F.broadcast(s_obj), "obj")
        )
        outside = (
            one_side.join(
                F.broadcast(s_subj), ["query_id", "subj"], "left_anti"
            )
            .unionByName(
                one_side.join(
                    F.broadcast(s_obj), ["query_id", "obj"], "left_anti"
                )
            )
            .dropDuplicates(["query_id", "subj", "pred", "obj"])
            .withColumn("rank", F.row_number().over(w_rel))
            .where(F.col("rank") <= top_rels)
            .select("query_id", "subj", "pred", "obj", "weight", "rank")
        )
        out["inside_rels"] = inside
        out["outside_rels"] = outside
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


def hybrid_seed_entities(
    queries: DataFrame,
    entities: DataFrame,
    entity_limit: int = 10,
    metric: str = "dot",
) -> DataFrame:
    """The hybrid tool's three-rung seed-entity ladder, batched
    (reference search/tool/hybrid_tool.py:251-349 — the low-level
    retrieval's seed selection):

      1. keyword rung: entities whose id OR description CONTAINS any
         of the query's low-level keywords (the OR-joined Cypher at
         :269-290), capped at ``entity_limit``;
      2. vector rung, ONLY for queries the keyword rung left empty
         (:293-301): top-``entity_limit`` entities by embedding
         similarity;
      3. text rung, ONLY for queries still empty (:303-307 →
         _fallback_text_search :217-249): entities whose id or
         description CONTAINS the whole query string, capped.

    ``queries``: (query_id, query, low_keywords array<string>, qvec);
    ``entities``: (entity_id, description, embedding). →
    (query_id, rung 'keyword'|'vector'|'text', entity_id) — at most
    ``entity_limit`` rows per query.

    Deterministic deviation (documented): the reference's CONTAINS
    rungs are ``LIMIT`` without ORDER BY — Neo4j pick order; here the
    cap takes entity_id ASC so runs and the SQL oracle agree. Scale
    shape: the query batch broadcasts into the CONTAINS join (the
    entity table streams, one scan per rung actually needed); the
    vector rung rides chunk_topk's partial-top-k machinery.
    """
    from .chunk_index import chunk_topk

    w = Window.partitionBy("query_id").orderBy("entity_id")

    # rung 1 — keyword CONTAINS (queries without keywords skip it,
    # reference :268 `if keywords:`)
    q_kw = (
        queries.select("query_id", F.explode("low_keywords").alias("kw"))
        .where(F.col("kw").isNotNull() & (F.col("kw") != ""))
    )
    kw_hits = (
        entities.alias("e")
        .join(
            F.broadcast(q_kw),
            F.col("e.entity_id").contains(F.col("kw"))
            | F.col("e.description").contains(F.col("kw")),
        )
        .select("query_id", "entity_id")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= entity_limit)
        .select("query_id", F.lit("keyword").alias("rung"), "entity_id")
    )

    # rung 2 — vector, for queries with zero keyword hits
    need_vec = queries.join(
        kw_hits.select("query_id").distinct(), "query_id", "left_anti"
    ).localCheckpoint()
    vec_hits = (
        chunk_topk(
            entities.select("entity_id", "embedding"),
            need_vec.select("query_id", "qvec"),
            k=entity_limit,
            metric=metric,
            id_col="entity_id",
        )
        .select("query_id", F.lit("vector").alias("rung"), "entity_id")
    )

    # rung 3 — whole-query text CONTAINS, for queries still empty
    need_txt = need_vec.join(
        vec_hits.select("query_id").distinct(), "query_id", "left_anti"
    )
    txt_hits = (
        entities.alias("e")
        .join(
            F.broadcast(need_txt.select("query_id", "query")),
            F.col("e.entity_id").contains(F.col("query"))
            | F.col("e.description").contains(F.col("query")),
        )
        .select("query_id", "entity_id")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= entity_limit)
        .select("query_id", F.lit("text").alias("rung"), "entity_id")
    )
    return kw_hits.unionByName(vec_hits).unionByName(txt_hits)


def hybrid_search_batch(
    queries: DataFrame,
    entities: DataFrame,
    triples: DataFrame,
    mentions: DataFrame,
    communities: DataFrame,
    entity_limit: int = 10,
    chunk_limit: int = 5,
    community_level: int = 0,
    top_communities: int = 3,
    metric: str = "dot",
) -> dict[str, DataFrame]:
    """Full hybrid retrieval for a query batch (hybrid_tool.py's
    low-level :251-408 + high-level :410-474 halves):

      low-level — seeds via hybrid_seed_entities, then per query:
      seed entity rows; relationships with BOTH endpoints in the seed
      set and subj < obj (:334-346); the chunks mentioning seeds,
      DISTINCT, first ``chunk_limit`` (:350-359 ``[0..5]`` — the
      reference's unordered cut, made deterministic chunk_id ASC);

      high-level — communities at ``community_level`` whose summary
      OR full_content CONTAINS any high-level keyword (the whole
      query when a query has no keywords, :436-447), ordered
      rank-desc-NULLs-as-0 (:448-450), top ``top_communities``
      (ties → community_id ASC).

    ``queries`` additionally carries ``high_keywords array<string>``.
    → {'seeds', 'relationships', 'chunks', 'communities'}."""
    seeds = hybrid_seed_entities(
        queries, entities, entity_limit=entity_limit, metric=metric
    ).localCheckpoint()
    seed_ids = seeds.select("query_id", "entity_id")

    s1 = seed_ids.withColumnRenamed("entity_id", "subj")
    s2 = seed_ids.withColumnRenamed("entity_id", "obj")
    # the reference MATCHes undirected (e1)-[r]-(e2) and keeps the
    # orientation with e1.id < e2.id, so a stored edge in either
    # direction surfaces once, endpoint-sorted — symmetrize first
    sym = triples.select("subj", "pred", "obj").unionByName(
        triples.select(
            F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj")
        )
    )
    rels = (
        sym.join(F.broadcast(s1), "subj")
        .join(F.broadcast(s2), ["query_id", "obj"])
        .where(F.col("subj") < F.col("obj"))
        .select("query_id", "subj", "pred", "obj")
        .distinct()
    )

    wc = Window.partitionBy("query_id").orderBy("chunk_id")
    chunks = (
        mentions.join(F.broadcast(seed_ids), "entity_id")
        .select("query_id", "chunk_id")
        .distinct()
        .withColumn("__rk", F.row_number().over(wc))
        .where(F.col("__rk") <= chunk_limit)
        .drop("__rk")
    )

    q_hkw = queries.select(
        "query_id",
        F.when(
            F.size(F.coalesce("high_keywords", F.array())) > 0,
            F.col("high_keywords"),
        )
        .otherwise(F.array("query"))
        .alias("kws"),
    ).select("query_id", F.explode("kws").alias("kw"))
    lvl = communities.where(F.col("level") == community_level)
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("rank0"), F.asc("community_id")
    )
    comm = (
        lvl.join(
            F.broadcast(q_hkw),
            F.col("summary").contains(F.col("kw"))
            | F.col("full_content").contains(F.col("kw")),
        )
        .select(
            "query_id",
            "community_id",
            F.coalesce(F.col("community_rank"), F.lit(0)).alias("rank0"),
            "summary",
        )
        .distinct()
        .withColumn("__rk", F.row_number().over(wr))
        .where(F.col("__rk") <= top_communities)
        .select("query_id", "community_id", "rank0", "summary")
    )
    return {
        "seeds": seeds,
        "relationships": rels,
        "chunks": chunks,
        "communities": comm,
    }
