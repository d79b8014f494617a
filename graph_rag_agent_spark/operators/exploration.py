"""Multi-hop Chain of Exploration (SURVEY §2 G6 — query-side deep
search, reference search/tool/reasoning/chain_of_exploration.py).

Reference behavior reproduced:
  - iterative frontier expansion from seed entities, ``max_steps``
    hops (explore(), :33-170);
  - per step: 1-hop neighbors of the frontier excluding visited nodes,
    capped at 100 (:296-338 — the Cypher LIMIT; Neo4j's order is
    arbitrary, ours is pinned to (weight desc, neighbor asc));
  - neighbor scoring by cosine(query embedding, entity embedding)
    (:339-421 — the enhanced scorer's embedding term; its LLM
    adjustments are an LLM boundary);
  - adaptive exploration width — exact transcription of
    _calculate_adaptive_width / _estimate_query_complexity
    (:238-295): width = clamp(1..5, base · step · neighbor ·
    complexity factors);
  - next-step selection: the LLM chooser's deterministic fallback —
    top-width scored neighbors (:536,551).

Spark shape: neighbors/scoring are DataFrame joins against the
entity/triple tables (distributed); only the ≤5 selected ids per step
return to the driver to form the next frontier — the same
frontier-loop shape as the CC/LPA iterations, with trivially small
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.stub_embed import embed_text

NEIGHBOR_LIMIT = 100  # chain_of_exploration.py:315

# Hard cap on rows pulled to the driver per hop, independent of
# ``neighbor_limit``: selection keeps top-width ≤ 5 rows and the
# adaptive-width neighbor factor saturates at 15 neighbors
# (min(1.5, n/10)), so any cap ≥ 15 is exactly semantics-preserving
# while a pathological caller passing neighbor_limit=10⁹ on a dense
# graph can no longer pull an unbounded result set to the driver.
FRONTIER_COLLECT_CAP = 64

_COMPLEXITY_INDICATORS = [
    "为什么", "如果", "原因", "关系", "比较", "区别",
    "影响", "分析", "评估", "预测",
]  # chain_of_exploration.py:283-287


def estimate_query_complexity(query: str) -> float:
    """Exact transcription of _estimate_query_complexity (:266-295)."""
    length_factor = min(1.5, len(query) / 50)
    question_marks = query.count("?") + query.count("？")
    question_factor = 1.0 + question_marks * 0.1
    indicator_count = sum(
        1 for ind in _COMPLEXITY_INDICATORS if ind.lower() in query.lower()
    )
    indicator_factor = 1.0 + indicator_count * 0.1
    complexity = 0.5 + (
        length_factor * 0.3 + question_factor * 0.3 + indicator_factor * 0.4
    ) / 3
    return min(1.5, complexity)


def adaptive_width(
    step: int, query: str, n_neighbors: int, base_width: int = 3
) -> int:
    """Exact transcription of _calculate_adaptive_width (:238-264)."""
    step_factor = max(0.5, 1.0 - step * 0.2)
    neighbor_factor = min(1.5, n_neighbors / 10)
    complexity_factor = estimate_query_complexity(query)
    adjusted = int(base_width * step_factor * neighbor_factor * complexity_factor)
    return max(1, min(5, adjusted))


def _cosine_to_query(vec_col: str, query_vec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm == 0, F.lit(0.0)).otherwise(dot / norm)


def chain_of_exploration(
    entities: DataFrame,
    triples: DataFrame,
    query: str,
    starting_entities: list[str],
    max_steps: int = 5,
    exploration_width: int = 3,
    neighbor_limit: int = NEIGHBOR_LIMIT,
) -> dict[str, DataFrame]:
    """→ {'visited': (entity_id, step, score),
         'trail':   (step, src, pred, dst, weight, score)}.

    ``visited`` step 0 = seeds (score null); ``trail`` records which
    edge(s) reached each selected neighbor."""
    spark = entities.sparkSession
    qvec = embed_text(query)

    sym = triples.select(
        F.col("subj").alias("src"), "pred", F.col("obj").alias("dst"),
        F.coalesce("weight", F.lit(1.0)).alias("weight"),
    ).unionByName(
        triples.select(
            F.col("obj").alias("src"), "pred", F.col("subj").alias("dst"),
            F.coalesce("weight", F.lit(1.0)).alias("weight"),
        )
    ).localCheckpoint()

    emb = entities.select("entity_id", "embedding")
    visited = [(e, 0, None) for e in dict.fromkeys(starting_entities)]
    frontier = list(dict.fromkeys(starting_entities))
    trail_parts: list[DataFrame] = []

    for step in range(max_steps):
        if not frontier:
            break
        f_df = spark.createDataFrame([(e,) for e in frontier], "src string")
        v_df = spark.createDataFrame(
            [(e,) for e, _, _ in visited], "dst string"
        )
        nbr_edges = (
            sym.join(F.broadcast(f_df), "src")
            .join(F.broadcast(v_df), "dst", "left_anti")
            .orderBy(F.desc("weight"), F.asc("dst"), F.asc("src"), F.asc("pred"))
            .limit(neighbor_limit)
            .localCheckpoint()
        )
        scored = (
            nbr_edges.select("dst")
            .distinct()
            .join(emb, nbr_edges["dst"] == emb["entity_id"])
            .withColumn("score", _cosine_to_query("embedding", qvec))
            .select("entity_id", "score")
        )
        rows = (
            scored.orderBy(F.desc("score"), F.asc("entity_id"))
            .limit(FRONTIER_COLLECT_CAP)
            .collect()
        )
        if not rows:
            break
        # len(rows) saturates at the cap, which is above both the
        # neighbor-factor knee (15) and the max width (5) — identical
        # adaptive_width and selection to the uncapped collect
        width = adaptive_width(step, query, len(rows), exploration_width)
        selected = rows[:width]
        sel_ids = {r["entity_id"] for r in selected}
        sel_df = spark.createDataFrame(
            [(r["entity_id"], float(r["score"])) for r in selected],
            "dst string, score double",
        )
        trail_parts.append(
            nbr_edges.join(F.broadcast(sel_df), "dst")
            .select(
                F.lit(step + 1).alias("step"), "src", "pred", "dst",
                "weight", "score",
            )
        )
        visited.extend((r["entity_id"], step + 1, float(r["score"])) for r in selected)
        frontier = sorted(sel_ids)

    visited_df = spark.createDataFrame(
        visited, "entity_id string, step int, score double"
    )
    if trail_parts:
        trail = trail_parts[0]
        for part in trail_parts[1:]:
            trail = trail.unionByName(part)
    else:
        trail = spark.createDataFrame(
            [], "step int, src string, pred string, dst string, "
            "weight double, score double"
        )
    return {"visited": visited_df, "trail": trail}
