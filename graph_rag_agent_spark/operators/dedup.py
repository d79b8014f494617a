"""Document deduplication operators (training-pipeline extensions).

Beyond the reference's entity-level dedup (SURVEY.md §2.7/G1), a
100 TB corpus pipeline needs document-level dedup. Four tiers, each a
distinct cost/recall point:

  - exact:      hash group-by (one shuffle, no UDF);
  - minhash:    char-shingle MinHash signatures (numpy, Arrow batches)
                banded into buckets → candidate equi-join → exact
                Jaccard verify on candidates only. The classic
                shingle→minhash→band→bucket-join plan: candidate
                generation is linear + one equi-join instead of n²;
  - simhash:    64-bit token-hash SimHash, near-dups = identical
                16-bit band (Hamming ≤ 3 over 4 bands guarantee);
  - embedding:  cosine near-dup over an embedding column via the same
                hyperplane-LSH used for entity linking.

All signature computation is vectorized numpy inside mapInPandas /
pandas_udf — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.hashing import stable_u64

# Deterministic universal-hash family over a 31-bit prime field.
# The base shingle/token hash is md5-derived (core/hashing.stable_u64
# == DuckDB md5_number_lower), and the permutation parameters are
# formulaic — so the ENTIRE MinHash/SimHash pipeline (signatures,
# band buckets, candidates, verification) is replicable in ANSI SQL;
# the driver oracles replay it step for step. 31-bit values keep
# a·h+b inside int64/BIGINT in both engines.
_P31 = 2_147_483_647
_N_PERM = 64
_A = np.array([(i * 40503 + 12347) % _P31 for i in range(_N_PERM)], dtype=np.int64)
_B = np.array([(i * 69621 + 777) % _P31 for i in range(_N_PERM)], dtype=np.int64)


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_hash, n_docs, keeper_id, doc_ids) — exact dedup via hash
    group-by; keeper = min id (deterministic survivor)."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def _shingles(text: str, k: int) -> list[str]:
    """Distinct character k-shingles; a short/empty text is its own
    single shingle (== SQL substr(text, 1, k) when length < k)."""
    if not text or len(text) < k:
        return [text or ""]
    return list({text[i : i + k] for i in range(len(text) - k + 1)})


# Per-process memoization of the md5 base hash. Shingles and tokens
# are Zipf-distributed, so the same strings recur constantly across
# documents and Arrow batches (measured: 52x repetition for
# char-5-shingles on the bench corpus — and natural-language token
# vocabularies repeat far more), which makes the per-string Python
# md5 the dominant signature cost. The value is a pure function of
# the string, so caching cannot change any result; the size cap
# (~50 MB worst case per Python worker) just stops pathological
# vocabularies from growing the dict unboundedly.
_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_MAX = 1 << 19


_HASH_CACHE_MAX_LEN = 64


def _md5_u64(s: str) -> int:
    h = _HASH_CACHE.get(s)
    if h is None:
        h = stable_u64(s)
        # cap cached-key LENGTH too: the entry cap alone bounds count,
        # not bytes — space-free text (CJK prose, base64 blobs) makes
        # arbitrarily long single "tokens" that never recur, so caching
        # them costs memory for zero hit rate. Shingles are k chars and
        # natural tokens are short; both stay well under the cap.
        if len(s) <= _HASH_CACHE_MAX_LEN and len(_HASH_CACHE) < _HASH_CACHE_MAX:
            _HASH_CACHE[s] = h
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """31-bit md5-based shingle hashes (DuckDB:
    md5_number_lower(shingle) % 2147483647)."""
    u = np.array(
        [_md5_u64(s) for s in _shingles(text, k)], dtype=np.uint64
    )
    return (u % np.uint64(_P31)).astype(np.int64)


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """_N_PERM minima of universal hashes over the shingle set.

    Computed one permutation at a time: the full (n_shingles × n_perm)
    matrix is ~1 MB per document, which saturates memory bandwidth
    when 32 Arrow workers run concurrently; the per-permutation
    temporary stays L2-resident and scales with cores."""
    sh = _shingle_hashes(text, k)
    out = np.empty(_N_PERM, dtype=np.int64)
    for i in range(_N_PERM):
        out[i] = ((sh * _A[i] + _B[i]) % _P31).min()
    return out


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """(a_id, b_id) candidate near-dup pairs from banded MinHash.

    Band bucket key = '<band>:<sig values joined>' — a plain string so
    the SQL oracle can reproduce the exact bucket (no re-hashing)."""
    rows = _N_PERM // bands

    @F.pandas_udf("array<string>")
    def band_hashes(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            out = []
            for t in texts:
                sig = minhash_signature(t or "", shingle_k)
                out.append(
                    [
                        f"{b}:" + ",".join(
                            str(int(v)) for v in sig[b * rows : (b + 1) * rows]
                        )
                        for b in range(bands)
                    ]
                )
            yield pd.Series(out)

    # CPU-bound Python stage: a small parquet source arrives as 1-2
    # partitions, which would serialize the signature computation on
    # one core — spread it explicitly (same rule as extraction/parsing)
    partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # checkpoint before the self-join: its two branches project
    # different column names ahead of the bucket shuffle, so the plans
    # don't canonicalize to a reusable exchange and the signature UDF
    # would run once per branch
    signed = (
        df.repartition(partitions)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(band_hashes(text_col)).alias("bucket"),
        )
        .localCheckpoint()
    )
    a = signed.select(F.col("doc").alias("a_id"), "bucket")
    b = signed.select(F.col("doc").alias("b_id"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def shingle_array(col, k: int):
    """JVM replica of _shingles: distinct char k-shingles, with the
    short/empty-text degenerate case ([text or ''])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (F.length(c) < k), F.array(F.coalesce(c, F.lit("")))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - (k - 1)),
                lambda i: c.substr(i, F.lit(k)),
            )
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidates + exact shingle-Jaccard verification ≥ threshold.

    The verify step is pure JVM: per-DOC shingle sets hashed once to
    xxhash64 LONG arrays (5k-300k candidate pairs reuse them through
    the id join — a long array shuffles and intersects several times
    cheaper than the equivalent small-string array, which matters
    when a self-similar corpus makes the band join emit 100k+
    candidates), intersection via array_intersect in whole-stage
    codegen, union by |a|+|b|−inter arithmetic on per-doc sizes
    computed once (array_union would allocate a fresh array per
    PAIR). The SQL oracle verifies over the raw shingle strings; the
    counts agree unless xxhash64 collides two distinct shingles of a
    candidate pair (p ≈ |sh|²/2⁶⁵ per doc — negligible even at
    corpus scale)."""
    # the candidate list shuffles as tiny id pairs, so AQE coalesces it
    # to a couple of partitions — but the verify below does |candidates|
    # array intersections, which is CPU-proportional to pairs, not
    # bytes: spread candidates before attaching the shingle arrays
    partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cands = minhash_candidates(df, id_col, text_col, bands, shingle_k).repartition(
        partitions
    )
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.transform(
            shingle_array(text_col, shingle_k), lambda s: F.xxhash64(s)
        ).alias("sh"),
    )
    paired = cands.join(
        sh.select(
            F.col("doc").alias("a_id"),
            F.col("sh").alias("a_sh"),
            F.size("sh").alias("a_n"),
        ),
        "a_id",
    ).join(
        sh.select(
            F.col("doc").alias("b_id"),
            F.col("sh").alias("b_sh"),
            F.size("sh").alias("b_n"),
        ),
        "b_id",
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.col("a_n") + F.col("b_n") - inter
    jaccard = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(1.0))
    return (
        paired.withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def chunk_signature_columns(
    df: DataFrame,
    text_col: str = "text",
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Adds dedup/quality signature columns to a chunk/document table:
    minhash_bands array<long>, simhash long (one Arrow pass), plus
    JVM-side lang/quality/token columns. At 100 TB these are
    materialized with the chunks so dedup and quality filtering are
    joins, not recomputation."""
    from ..functions.textstats import lang_id, quality_score_x100, token_count

    rows = _N_PERM // bands

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_minhash, out_simhash = [], []
            for t in pdf[text_col]:
                sig = minhash_signature(t or "", shingle_k)
                bh = []
                for b in range(bands):
                    chunk = sig[b * rows : (b + 1) * rows]
                    h = b
                    for v in chunk:
                        h = (h * 1000003 ^ int(v)) & 0x7FFFFFFFFFFFFFFF
                    bh.append(h)
                out_minhash.append(bh)
                out_simhash.append(simhash64(t or ""))
            pdf = pdf.copy()
            pdf["minhash_bands"] = out_minhash
            pdf["simhash"] = pd.Series(out_simhash, dtype="int64")
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += ", minhash_bands array<long>, simhash long"
    # AQE coalesces upstream shuffles by BYTES; this stage is CPU-bound
    # Python, so spread it across all cores explicitly
    partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartition(partitions)
        .mapInPandas(sigs, schema=schema)
        .withColumn("pred_lang", lang_id(text_col))
        .withColumn("quality_x100", quality_score_x100(text_col))
        .withColumn("n_tokens_ws", token_count(text_col))
    )


def simhash64(text: str) -> int:
    """64-bit SimHash over single-space-separated token occurrences.

    Token hash = md5_number_lower(token) (core/hashing.stable_u64), and
    tokenization is an explicit split on ' ' with empties dropped — both
    chosen for exact replication in the SQL oracle (string_split + md5)."""
    toks = [t for t in (text or "").split(" ") if t]
    shifts = np.arange(64, dtype=np.uint64)
    # vectorized (block × 64) passes instead of a per-token Python
    # loop; token hashes come from the shared per-process md5 cache
    # (identical values, so identical bits). Blocking the token axis
    # keeps the bit-matrix temporaries L2-resident — same reasoning
    # as minhash_signature's per-permutation loop above — so 32
    # concurrent Arrow workers don't saturate memory bandwidth on
    # long documents.
    acc = np.zeros(64, dtype=np.int64)
    block = 1024
    for t0 in range(0, len(toks), block):
        hs = np.array(
            [_md5_u64(t) for t in toks[t0 : t0 + block]], dtype=np.uint64
        )
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
        acc += (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = int(
        np.bitwise_or.reduce(
            np.where(acc > 0, np.uint64(1) << shifts, np.uint64(0))
        )
    )
    if out >= 1 << 63:  # unsigned → signed 64-bit
        out -= 1 << 64
    return out


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """(a_id, b_id, hamming) — banded SimHash: pairs sharing any of 4
    16-bit bands are candidates (guaranteed to include all pairs with
    Hamming ≤ 3), then exact Hamming filter."""

    @F.pandas_udf("long")
    def sim(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield pd.Series([simhash64(t) for t in texts], dtype="int64")

    partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # checkpoint for the same reason as the MinHash bucket join: the
    # a/b branches rename columns before the band shuffle, defeating
    # exchange reuse — without it the SimHash UDF runs twice
    hashed = (
        df.repartition(partitions)
        .select(F.col(id_col).alias("doc"), sim(text_col).alias("sh"))
        .localCheckpoint()
    )
    banded = hashed.select(
        "doc",
        "sh",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(i),
                        F.shiftright("sh", i * 16).bitwiseAND(F.lit(0xFFFF)).cast("string"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    )
    a = banded.select(F.col("doc").alias("a_id"), F.col("sh").alias("a_sh"), "band")
    b = banded.select(F.col("doc").alias("b_id"), F.col("sh").alias("b_sh"), "band")
    return (
        a.join(b, "band")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.0,
) -> DataFrame:
    """Char-set Jaccard between same-block doc pairs — JVM-side only
    (array_intersect/array_union over distinct char arrays), matching
    DuckDB's jaccard() for the oracle pair."""
    chars = F.array_distinct(F.split(F.col(text_col), ""))
    base = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc"),
        chars.alias("chars"),
    )
    a = base.select("block", F.col("doc").alias("a_id"), F.col("chars").alias("a_chars"))
    b = base.select("block", F.col("doc").alias("b_id"), F.col("chars").alias("b_chars"))
    inter = F.size(F.array_intersect("a_chars", "b_chars"))
    union = F.size(F.array_union("a_chars", "b_chars"))
    return (
        a.join(b, "block")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(inter.cast("double") / union, 6).alias("char_jaccard"),
        )
        .where(F.col("char_jaccard") >= threshold)
    )


def embedding_cosine_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold_num: int = 81,
    threshold_den: int = 100,
    scale: int = 1000,
    pre_quantized: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the fourth dedup tier
    (module docstring), fully JVM-side and exactly replayable in SQL.

    Vectors are quantized to integers (``floor(x * scale)`` — exact for
    float32 inputs widened to double, so Spark and DuckDB agree
    bit-for-bit), then the cosine threshold test is done in *integer*
    arithmetic: ``cos(a,b) >= t`` (with ``t^2 = threshold_num /
    threshold_den`` and ``dot > 0``) iff

        threshold_den * dot(a,b)^2 >= threshold_num * |a|^2 * |b|^2

    For unit-norm inputs at scale=1000 every term stays far inside
    int64, so there is no float comparison anywhere — the returned
    pair SET is deterministic across engines.

    Blocking: same-argmax-dimension (first position of the max
    quantized component). Near-identical vectors share their dominant
    dimension, and the block key is a pure expression both engines
    replay. At corpus scale the blocking slot composes with the
    hyperplane-LSH band join used for entity linking
    (operators/knn.ann_lsh — band equi-join + exact re-rank) instead
    of argmax; argmax blocking is the deterministic-oracle probe, and
    is quadratic only within a block.

    Returns (id_a, id_b, block, dot, na2, nb2) — all exact integers.
    """
    if pre_quantized:
        v = F.col(vec_col).cast("array<long>")
    else:
        v = F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * scale).cast("long")
        )
    lit0 = F.lit(0).cast("long")
    base = df.select(F.col(id_col).alias("_id"), v.alias("_v"))
    base = base.select(
        "_id",
        "_v",
        F.aggregate(
            F.transform("_v", lambda x: x * x), lit0, lambda acc, x: acc + x
        ).alias("_n2"),
        F.array_position("_v", F.array_max("_v")).cast("int").alias("_block"),
    )
    a = base.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n2").alias("na2"),
        F.col("_block").alias("block"),
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n2").alias("nb2"),
        F.col("_block").alias("block"),
    )
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y), lit0, lambda acc, x: acc + x
    )
    return (
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "block", dot.alias("dot"), "na2", "nb2")
        .where(
            (F.col("dot") > 0)
            & (
                F.lit(threshold_den) * F.col("dot") * F.col("dot")
                >= F.lit(threshold_num) * F.col("na2") * F.col("nb2")
            )
        )
    )
