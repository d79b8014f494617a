"""Approximate-nearest-neighbor search over an embedding column
(training-pipeline extension; exercised on the driver ``embeddings``
table: vec_id bigint, embedding array<float>, label int).

Three strategies:
  - brute-force top-k: blocked cross join + exact cosine — the
    correctness baseline, O(n²) but fully JVM-side (zip_with/
    aggregate inside whole-stage codegen);
  - LSH: random-hyperplane band buckets → candidate equi-join → exact
    cosine re-rank (same family as linking/similar_entities_lsh);
  - IVF: k-means-lite coarse quantizer — deterministic seeded
    centroid init + a few Lloyd iterations driver-side on a sample,
    then assignment is one broadcast-joined JVM expression; probes =
    nprobe nearest centroids per query → candidates only within
    probed cells. The 100 TB path: cells partition the corpus, so
    per-query work is |corpus| * nprobe / ncells.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def _to_double(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias(f"{prefix}_vec"),
    )


def ann_bruteforce(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact top-k per vector by
    (cosine desc, neighbor_id asc)."""
    a = _to_double(df, id_col, vec_col, "query")
    b = _to_double(df, id_col, vec_col, "neighbor")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        a.crossJoin(b)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", _cosine_expr("query_vec", "neighbor_vec"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    return np.random.RandomState(7).normal(size=(n_planes, dim))


def _band_sig_udf(
    planes: np.ndarray | None, bands: int, rows: int, probes: int = 0
):
    """array<long> band hashes per vector, vectorized (reshape+matmul).

    ``planes=None`` derives the hyperplanes lazily from the first Arrow
    batch's vector width INSIDE the UDF — the generator is a fixed-seed
    RandomState, so every task materializes identical planes and no
    extra driver-side ``first()`` job is spent just to learn the dim.

    With ``probes`` > 0, additionally emits per band the hashes with
    the 1..probes lowest-|margin| bits flipped — multi-probe LSH
    (Lv et al., VLDB'07): the bits most likely to disagree between
    true neighbors are the ones whose hyperplane projection is
    closest to zero, so probing those buckets recovers most of the
    recall an extra hash table would buy, without growing the table
    count (i.e. without multiplying the shuffled candidate rows)."""
    weights = (1 << np.arange(rows - 1, -1, -1)).astype(np.int64)
    band_tags = np.arange(bands, dtype=np.int64) << 32

    @F.pandas_udf("array<long>")
    def sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        local_planes = planes
        for emb in it:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
            if local_planes is None:
                local_planes = _hyperplanes(mat.shape[1], bands * rows)
            margins = mat @ local_planes.T  # (n, bands*rows)
            bits = margins >= 0
            base = (
                bits.reshape(len(mat), bands, rows) @ weights + band_tags
            )  # (n, bands)
            if not probes:
                yield pd.Series(list(base))
                continue
            absm = np.abs(margins).reshape(len(mat), bands, rows)
            flip = np.argsort(absm, axis=2)[:, :, :probes]  # (n, bands, p)
            flipped = base[:, :, None] ^ (
                np.int64(1) << (rows - 1 - flip)
            )  # (n, bands, p)
            out = np.concatenate(
                [base[:, :, None], flipped], axis=2
            ).reshape(len(mat), bands * (probes + 1))
            yield pd.Series(list(out))

    return sig


def ann_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bands: int = 12,
    rows: int = 3,
    dim: int | None = None,
    probes: int = 0,
) -> DataFrame:
    """Banded hyperplane LSH candidates + exact re-rank.

    ``probes`` enables multi-probe on the QUERY side only: queries
    explode into base + probe buckets while data vectors stay in their
    base bucket, so the stored/index side of the shuffle is unchanged
    and only the (much smaller at typical q≪n, equal here) query side
    fans out ×(probes+1)."""
    # dim unknown → let the UDF derive the (seed-deterministic) planes
    # from its first batch instead of spending a driver job on first()
    planes = None if dim is None else _hyperplanes(dim, bands * rows)
    sig = _band_sig_udf(planes, bands, rows)

    base = _to_double(df, id_col, vec_col, "v")
    data = base.withColumn("band", F.explode(sig("v_vec")))
    if probes:
        probe_sig = _band_sig_udf(planes, bands, rows, probes=probes)
        queries = base.withColumn("band", F.explode(probe_sig("v_vec")))
    else:
        queries = data
    a = queries.select(
        F.col("v_id").alias("query_id"), F.col("v_vec").alias("query_vec"), "band"
    )
    b = data.select(
        F.col("v_id").alias("neighbor_id"), F.col("v_vec").alias("neighbor_vec"), "band"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        a.join(b, "band")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_vec", "neighbor_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", _cosine_expr("query_vec", "neighbor_vec"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    iterations: int = 5,
    sample: int = 10_000,
) -> np.ndarray:
    """Deterministic k-means-lite coarse quantizer: seeded sample,
    first-n init, a few Lloyd iterations driver-side. The corpus
    assignment stays distributed.

    Sampling is df.sample (per-partition Bernoulli — no global sort;
    round 1 ordered the whole corpus by md5 just to take 10k rows,
    a scale-killer). The deterministic tie-break for WHICH rows seed
    the centroids is the md5 sort applied to the small sample only.
    """
    n = df.count()
    fraction = min(1.0, (sample * 1.25) / max(n, 1))
    sampled = df.select(vec_col) if fraction >= 1.0 else df.select(vec_col).sample(
        withReplacement=False, fraction=fraction, seed=42
    )
    rows = (
        sampled.orderBy(F.md5(F.col(vec_col).cast("string")))
        .limit(sample)
        .collect()
    )
    vecs = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    centroids = vecs[:n_cells].copy()
    for _ in range(iterations):
        d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_cells):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 3,
    centroids: "np.ndarray | None" = None,
    store_cells: int = 1,
) -> DataFrame:
    """The IVF candidate-pair stage: (query_id, neighbor_id,
    query_vec, neighbor_vec), distinct pairs. Exposed separately so
    tests can measure candidate growth directly.

    ``store_cells`` = r: data vectors are stored in their r nearest
    cells (multi-cell assignment). r=1 is classic IVF; r=2 recovers
    queries whose true neighbor sits just across a cell boundary —
    recall rises while candidate volume grows at most ×r (tested).
    Pairs meeting in more than one cell are deduplicated BEFORE
    scoring, so the exact-cosine re-rank cost never multiplies."""
    if centroids is None:
        centroids = train_ivf_centroids(df, vec_col, n_cells)
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
        n_cells = len(centroids)
    n_list = max(nprobe, store_cells)

    @F.pandas_udf("array<int>")
    def probe_cells(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for emb in it:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
            d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d, axis=1)[:, :n_list]
            yield pd.Series([row.tolist() for row in order])

    base = _to_double(df, id_col, vec_col, "v").withColumn(
        "cells", probe_cells("v_vec")
    )
    data_side = base.select(
        F.col("v_id").alias("neighbor_id"),
        F.col("v_vec").alias("neighbor_vec"),
        F.explode(F.slice("cells", 1, store_cells)).alias("cell"),
    )
    query_side = base.select(
        F.col("v_id").alias("query_id"),
        F.col("v_vec").alias("query_vec"),
        F.explode(F.slice("cells", 1, nprobe)).alias("cell"),
    )
    pairs = (
        query_side.join(data_side, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_vec", "neighbor_vec")
    )
    if store_cells > 1:
        # a pair can meet in up to store_cells cells
        pairs = pairs.dropDuplicates(["query_id", "neighbor_id"])
    return pairs


def ann_ivf(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 3,
    centroids: "np.ndarray | None" = None,
    store_cells: int = 1,
) -> DataFrame:
    """IVF: assign every vector to its ``store_cells`` nearest
    centroid cells; each query probes its nprobe nearest cells; exact
    cosine within.

    ``centroids`` (n_cells × dim) overrides the trained coarse
    quantizer — callers that need a replayable index (the driver's
    SQL oracle, regression fixtures) pass explicit centroid vectors;
    production callers leave it None and get the sampled k-means.
    Cell choice is argsort(squared-L2, stable) so ties break by
    centroid index in every engine.

    Recall note (standard IVF trade-off): with store_cells=1 a true
    neighbor sitting just outside every probed cell is missed; raise
    nprobe, n_cells resolution, or store_cells (multi-cell
    assignment, ~×r storage/candidates for the recall tail). The
    driver query reports measured recall vs the brute-force baseline
    as an output column."""
    pairs = ivf_candidates(
        df, id_col, vec_col, n_cells, nprobe, centroids, store_cells
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("score", _cosine_expr("query_vec", "neighbor_vec"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
