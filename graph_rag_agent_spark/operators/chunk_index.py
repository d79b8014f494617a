"""Chunk embedding + chunk vector index (the reference's build stage 3).

Reference behavior reproduced:
  - every chunk gets an embedding and a vector index over chunk nodes
    (/root/reference/build/build_chunk_index.py:101-172,
    graph/indexing/chunk_indexer.py:120+); chunk-level vector top-k is
    the primary RAG read path (Neo4jVector over the chunk index,
    search/local_search.py uses it as retriever input).

Spark-first shape: the embedding is ONE Arrow-batched pandas-UDF
column on the chunks table (prod swaps a batched model client into the
same slot — identical contract to entity embeddings in
operators/linking.with_embeddings). The "index" IS the embedded
column: top-k retrieval for a (small-by-contract, collectable) query
set scores the stored side in place — integer-dot queries via a
per-batch numpy matmul emitting only partial top-k candidates
(``_topk_integral_partial``), float metrics via a broadcast join with
a JVM-side score — then one per-query top-k window over the
candidates; the stored table is never collected.
Corpus-scale chunk↔chunk similarity reuses operators/knn (LSH/IVF).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.stub_embed import embed_text


def with_chunk_embeddings(chunks: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``embedding array<double>`` via an Arrow-batched pandas UDF
    (deterministic stub; prod: batched model client, same slot)."""

    @F.pandas_udf("array<double>")
    def embed_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield pd.Series([embed_text(t or "") for t in texts])

    return chunks.withColumn("embedding", embed_udf(text_col))


def _dot(vec_col: str, qvec_col: str, integral: bool):
    zero = F.lit(0).cast("long") if integral else F.lit(0.0)
    return F.aggregate(
        F.zip_with(F.col(vec_col), F.col(qvec_col), lambda x, y: x * y),
        zero,
        lambda acc, x: acc + x,
    )


def chunk_topk(
    chunks_emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    metric: str = "cosine",
    id_col: str = "chunk_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Top-k chunks per query vector: (query_id, <id_col>, rank, score).

    ``metric='cosine'`` (double) or ``'dot'`` — dot over integral
    vectors stays in exact integer arithmetic (score long), which is
    what makes the driver oracle hash-exact across engines.
    """
    _int_types = ("int", "bigint", "smallint", "tinyint")
    elem = chunks_emb.schema[vec_col].dataType.elementType.simpleString()
    q_elem = queries.schema[qvec_col].dataType.elementType.simpleString()
    # the integer fast path is only exact when BOTH sides are integral
    # — routing on the stored side alone would int64-cast double query
    # vectors in the numpy matmul and silently truncate them to the
    # floor (0.73 → 0); a double query against an integral store takes
    # the JVM broadcast path, where zip_with widens to double
    integral = metric == "dot" and elem in _int_types and q_elem in _int_types
    if integral:
        return _topk_integral_partial(
            chunks_emb, queries, k, id_col, query_id_col, vec_col, qvec_col
        )
    joined = chunks_emb.join(F.broadcast(queries))
    dot = _dot(vec_col, qvec_col, integral)
    if metric == "dot":
        score = dot
    else:
        n_c = F.sqrt(
            F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x)
        )
        n_q = F.sqrt(
            F.aggregate(F.col(qvec_col), F.lit(0.0), lambda a, x: a + x * x)
        )
        score = F.when((n_c == 0) | (n_q == 0), F.lit(0.0)).otherwise(
            dot / (n_c * n_q)
        )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        joined.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def partial_top_scores_integral(
    stored: DataFrame,
    q_mats: dict,
    *,
    id_col: str,
    vec_col: str,
    group_col: str | None = None,
    k: int,
    threshold: int | None = None,
    payload_cols: tuple = (),
    q_block: int = 256,
) -> DataFrame:
    """Shared int64-matmul partial-top-k core (ONE implementation of
    the exactness machinery — int64 casts, null-element dropping,
    ties-kept per-batch kth-best superset — shared by chunk_topk's
    integral path and the query-cache vector rung so the two cannot
    drift).

    ``q_mats``: {group: (query_ids, dim×Q int64 matrix)}; pass
    ``group_col=None`` with a single ``{None: ...}`` entry for an
    ungrouped corpus, or a group column (e.g. thread_id) to score each
    stored row against ONLY its group's queries. Emits the candidate
    SUPERSET ``(group?, qi, id, payload..., score)``: every row whose
    score ties-or-beats its batch's kth best per query (and clears
    ``threshold`` when given), so the caller's global
    (score DESC, id ASC) window reproduces the naive all-pairs plan
    bit for bit. ``payload_cols`` are echoed for winners (saves the
    caller a re-join against the stored side). Null (or null-element)
    vectors drop — the float path nulls their scores, ranking them
    past every real candidate, so the outcomes agree."""
    import numpy as np

    cols = [id_col, vec_col, *payload_cols]
    if group_col:
        cols.insert(0, group_col)

    def score_batches(it):
        for pdf in it:
            frames = []
            groups = (
                pdf.groupby(group_col, sort=False)
                if group_col
                else [(None, pdf)]
            )
            for g, grp in groups:
                gq = q_mats.get(g)
                if gq is None:
                    continue
                vals = grp[vec_col].tolist()
                keep = [
                    i
                    for i, v in enumerate(vals)
                    if v is not None and not any(e is None for e in v)
                ]
                n = len(keep)
                if n == 0:
                    continue
                emb = np.asarray([vals[i] for i in keep], dtype=np.int64)
                ids = grp[id_col].to_numpy()[keep]
                payload = {
                    c: grp[c].to_numpy()[keep] for c in payload_cols
                }
                take = min(k, n)
                mat = gq[1]
                for q0 in range(0, mat.shape[1], q_block):
                    scores = emb @ mat[:, q0 : q0 + q_block]
                    kth = np.partition(scores, n - take, axis=0)[n - take, :]
                    mask = scores >= kth[None, :]
                    if threshold is not None:
                        mask &= scores >= threshold
                    rows_i, cols_q = np.nonzero(mask)
                    if not len(rows_i):
                        continue
                    frame = {"qi": (cols_q + q0).astype("int32")}
                    if group_col:
                        frame[group_col] = grp[group_col].to_numpy()[keep][
                            rows_i
                        ]
                    frame[id_col] = ids[rows_i]
                    for c in payload_cols:
                        frame[c] = payload[c][rows_i]
                    frame["score"] = scores[rows_i, cols_q]
                    frames.append(pd.DataFrame(frame))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    schema_parts = ["qi int"]
    for c in cols:
        if c != vec_col:
            schema_parts.append(
                f"{c} {stored.schema[c].dataType.simpleString()}"
            )
    schema_parts.append("score long")
    return stored.select(*cols).mapInPandas(
        score_batches, schema=", ".join(schema_parts)
    )


def _topk_integral_partial(
    chunks_emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    query_id_col: str,
    vec_col: str,
    qvec_col: str,
) -> DataFrame:
    """Exact integer-dot top-k via PARTIAL top-k then merge — the
    scale shape for a big stored side × small query set.

    The naive plan (broadcast cross join + per-query window) pays a
    higher-order-function dot on every (row × query) pair and shuffles
    |rows|·|queries| scored rows into the window sort. Here each Arrow
    batch scores against the whole (collected, small-by-contract)
    query matrix with one int64 numpy matmul via the shared
    partial_top_scores_integral core and emits only its per-query
    top-k candidate superset; the final window sorts
    batches·|queries|·k rows instead of |rows|·|queries|. Integer
    arithmetic keeps scores bit-exact across numpy / JVM / DuckDB, so
    results equal the naive plan row for row on non-null vectors (see
    the core's docstring for the null rules).
    """
    import numpy as np

    q_rows = [
        r
        for r in queries.select(query_id_col, qvec_col).collect()
        # null / null-element query vectors can't be scored integrally;
        # drop them here (the float broadcast path nulls their scores)
        if r[1] is not None and all(v is not None for v in r[1])
    ]
    spark = chunks_emb.sparkSession
    q_id_type = queries.schema[query_id_col].dataType.simpleString()
    if not q_rows:
        id_type = chunks_emb.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [],
            f"{query_id_col} {q_id_type}, {id_col} {id_type}, "
            "rank int, score long",
        )
    q_ids = [r[0] for r in q_rows]
    q_mats = {
        None: (q_ids, np.asarray([r[1] for r in q_rows], dtype=np.int64).T)
    }
    cand = partial_top_scores_integral(
        chunks_emb, q_mats, id_col=id_col, vec_col=vec_col, k=k
    )
    qid_df = spark.createDataFrame(
        list(enumerate(q_ids)), f"qi int, {query_id_col} {q_id_type}"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        cand.join(F.broadcast(qid_df), "qi")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def top_chunks_for_query(
    chunks_emb: DataFrame, query: str, k: int = 3, id_col: str = "chunk_id"
) -> DataFrame:
    """Single-text convenience wrapper: embed the query with the same
    stub/model slot and retrieve top-k chunks by cosine."""
    spark = chunks_emb.sparkSession
    qdf = spark.createDataFrame(
        [("q0", embed_text(query))], f"{'query_id'} string, qvec array<double>"
    )
    return chunk_topk(chunks_emb, qdf, k=k, id_col=id_col)
