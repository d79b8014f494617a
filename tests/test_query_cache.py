"""Query-result cache (reference CacheManage/): key parity, quality
metadata formulas, exact + vector lookup ladder, persisted MERGE."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.query_cache import (
    apply_quality_marks,
    cache_key_context,
    cache_key_simple,
    cache_lookup_batch,
    is_high_quality,
    persist_quality_marks,
    upsert_cache_entries,
)

CACHE_SCHEMA = (
    "cache_key string, query string, content string, thread_id string, "
    "quality_score int, user_verified boolean, fast_path_eligible boolean, "
    "embedding array<long>"
)
QUERY_SCHEMA = "query_id long, query string, thread_id string, qvec array<long>"


def _key(q: str) -> str:
    # reference CacheManage/strategies/simple.py:9-10
    return hashlib.md5(q.strip().encode("utf-8")).hexdigest()


def _entry(q, content, thread, vec, score=0, verified=False, fast=False):
    return (_key(q), q, content, thread, score, verified, fast, vec)


@pytest.fixture(scope="module")
def cache_df(spark):
    rows = [
        # high-quality exact target (fast_path_eligible)
        _entry("what is spark", "A:spark", "t0", [3, 0, 1], fast=True),
        # low-quality entry, same thread, identical vector to probes
        _entry("what is flink", "A:flink", "t0", [5, 5, 0]),
        # high-quality sibling in t0 with a LARGER vector (outscores
        # self-dot for the [5,5,0] probe: dot=60 > 50)
        _entry("big sibling", "A:big", "t0", [7, 5, 0], score=3),
        # same vector as "what is spark" but parked in another thread
        _entry("spark other thread", "A:other", "t1", [3, 0, 1], verified=True),
        # tie-break pair: identical vectors, both high quality, t2
        _entry("tie a", "A:tie-a", "t2", [2, 2, 2], verified=True),
        _entry("tie b", "A:tie-b", "t2", [2, 2, 2], verified=True),
    ]
    return spark.createDataFrame(rows, CACHE_SCHEMA).cache()


def test_simple_key_matches_hashlib(spark):
    qs = ["what is spark", "  padded  ", "\ttabs\n", "中文 查询 ", "a : b)"]
    got = (
        spark.createDataFrame([(q,) for q in qs], "q string")
        .select(cache_key_simple(F.col("q")).alias("k"))
        .collect()
    )
    assert [r["k"] for r in got] == [_key(q) for q in qs]


def test_context_key_matches_reference_formula(spark):
    # reference strategies/context_aware.py:36-51
    q, tid, ctx, v = "next question", "t7", "q1 q2 q3", 4
    expect = hashlib.md5(
        f"thread:{tid}|ctx:{ctx}|v{v}|{q}".strip().encode("utf-8")
    ).hexdigest()
    got = (
        spark.createDataFrame([(q, tid, ctx, v)], "q string, t string, c string, v int")
        .select(
            cache_key_context(
                F.col("q"), F.col("t"), F.col("c"), F.col("v")
            ).alias("k")
        )
        .first()["k"]
    )
    assert got == expect


def test_quality_mark_formulas(spark):
    # reference models/cache_item.py:46-56
    cache = spark.createDataFrame(
        [
            ("k1", 0, False, False),
            ("k2", -4, False, True),
            ("k3", 5, True, True),
            ("k4", 1, False, False),  # unmarked
        ],
        "cache_key string, quality_score int, user_verified boolean, "
        "fast_path_eligible boolean",
    )
    marks = spark.createDataFrame(
        [("k1", True), ("k2", False), ("k3", False)],
        "cache_key string, is_positive boolean",
    )
    got = {
        r["cache_key"]: (
            r["quality_score"], r["user_verified"], r["fast_path_eligible"]
        )
        for r in apply_quality_marks(cache, marks).collect()
    }
    assert got["k1"] == (1, True, True)  # positive: +1, verified, fast
    assert got["k2"] == (-5, False, False)  # negative: floor at -5
    assert got["k3"] == (3, True, False)  # negative: 5-2, fast revoked
    assert got["k4"] == (1, False, False)  # untouched


def test_is_high_quality_predicate(spark):
    # reference models/cache_item.py:41-44: verified OR score>2 OR fast
    rows = [
        ("a", 3, False, False, True),
        ("b", 2, False, False, False),
        ("c", 0, True, False, True),
        ("d", -5, False, True, True),
        ("e", None, None, None, False),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        "cache_key string, quality_score int, user_verified boolean, "
        "fast_path_eligible boolean",
    )
    got = {
        r["cache_key"]: r["hq"]
        for r in df.select("cache_key", is_high_quality().alias("hq")).collect()
    }
    assert got == {r[0]: r[4] for r in rows}


def _lookup(spark, cache_df, queries, **kw):
    qdf = spark.createDataFrame(queries, QUERY_SCHEMA)
    rows = cache_lookup_batch(cache_df, qdf, threshold=10, **kw).collect()
    return {r["query_id"]: r for r in rows}


def test_fast_exact_hit_requires_high_quality(spark, cache_df):
    got = _lookup(
        spark,
        cache_df,
        [
            (1, "what is spark", "t0", [3, 0, 1]),  # hq exact
            (2, "what is flink", "t0", [5, 5, 0]),  # low-quality exact
        ],
        fast=True,
    )
    assert got[1]["hit_type"] == "exact"
    assert got[1]["content"] == "A:spark"
    assert got[1]["score"] is None
    # low-quality exact falls to the vector rung; the best same-thread
    # candidate is "big sibling" (dot 60 vs self 50) and IS high
    # quality → vector hit on the sibling, reference get_fast shape
    assert got[2]["hit_type"] == "vector"
    assert got[2]["content"] == "A:big"
    assert got[2]["score"] == 60


def test_plain_get_returns_low_quality_exact(spark, cache_df):
    got = _lookup(
        spark, cache_df, [(1, "what is flink", "t0", [5, 5, 0])], fast=False
    )
    assert got[1]["hit_type"] == "exact"
    assert got[1]["content"] == "A:flink"


def test_vector_rung_thread_gated_and_thresholded(spark, cache_df):
    got = _lookup(
        spark,
        cache_df,
        [
            # same vector as the t1 entry but asked in t9 → no
            # same-thread candidates at all (matcher context gate)
            (1, "spark reworded", "t9", [3, 0, 1]),
            # t0, tiny vector: best same-thread dot is 3*7=21 ≥ 10 via
            # big sibling? dot([1,0,0],[7,5,0]) = 7 < 10 → below
            # threshold → miss
            (2, "tiny probe", "t0", [1, 0, 0]),
        ],
        fast=True,
    )
    assert got[1]["hit_type"] == "miss" and got[1]["content"] is None
    assert got[2]["hit_type"] == "miss"


def test_vector_tie_breaks_on_cache_key(spark, cache_df):
    got = _lookup(
        spark, cache_df, [(1, "tie probe", "t2", [2, 2, 2])], fast=True
    )
    assert got[1]["hit_type"] == "vector"
    want_key = min(_key("tie a"), _key("tie b"))
    assert got[1]["cache_key"] == want_key


def test_low_quality_best_candidate_is_not_skipped(spark):
    # reference get_fast iterates the TOP-1 candidate only: a
    # low-quality best is returned as miss, not skipped in favor of a
    # lower-scoring high-quality entry (manager.py:180-197)
    cache = spark.createDataFrame(
        [
            _entry("best low", "A:low", "t0", [9, 9, 9]),
            _entry("worse high", "A:high", "t0", [1, 1, 1], verified=True),
        ],
        CACHE_SCHEMA,
    )
    got = _lookup(spark, cache, [(1, "probe", "t0", [2, 2, 2])], fast=True)
    assert got[1]["hit_type"] == "miss"
    # plain get returns the low-quality best (manager.py:126-150)
    got = _lookup(spark, cache, [(1, "probe", "t0", [2, 2, 2])], fast=False)
    assert got[1]["hit_type"] == "vector" and got[1]["content"] == "A:low"


def test_persisted_set_and_mark_roundtrip(spark, tmp_path):
    path = str(tmp_path / "query_cache")
    entries = spark.createDataFrame(
        [
            (None, "q one", "A:1", "t0", 0, False, False, [1, 2, 3]),
            (None, "q two", "A:2", "t0", 0, False, False, [4, 5, 6]),
        ],
        CACHE_SCHEMA,
    ).drop("cache_key")
    info = upsert_cache_entries(spark, path, entries)
    assert info["total_buckets"] >= 1

    # re-set replaces content+metadata for the matched key only
    update = spark.createDataFrame(
        [(None, "q one", "A:1-v2", "t0", 9, True, True, [1, 2, 3])],
        CACHE_SCHEMA,
    ).drop("cache_key")
    info = upsert_cache_entries(spark, path, update)
    stored = {
        r["query"]: (r["content"], r["quality_score"])
        for r in spark.read.parquet(path).collect()
    }
    assert stored["q one"] == ("A:1-v2", 9)
    assert stored["q two"] == ("A:2", 0)

    marks = spark.createDataFrame(
        [(_key("q two"), True)], "cache_key string, is_positive boolean"
    )
    persist_quality_marks(spark, path, marks)
    stored = {
        r["query"]: (
            r["quality_score"], r["user_verified"], r["fast_path_eligible"]
        )
        for r in spark.read.parquet(path).collect()
    }
    assert stored["q two"] == (1, True, True)
    assert stored["q one"] == (9, True, True)  # untouched


def test_lookup_matches_python_oracle(spark, cache_df):
    """get_fast over a probe batch vs a pure-Python transcription of
    the reference ladder (thread-gated ranking variant — the
    documented deviation from the global FAISS pre-cut)."""
    cache_rows = cache_df.collect()
    by_key = {r["cache_key"]: r for r in cache_rows}

    def hq(r):
        return bool(
            (r["user_verified"] or False)
            or (r["quality_score"] or 0) > 2
            or (r["fast_path_eligible"] or False)
        )

    def oracle_get_fast(query, thread, qvec, threshold=10):
        k = _key(query)
        r = by_key.get(k)
        if r is not None and hq(r):
            return ("exact", k, r["content"], None)
        cands = [
            (sum(a * b for a, b in zip(c["embedding"], qvec)), c)
            for c in cache_rows
            if c["thread_id"] == thread
        ]
        cands = [(s, c) for s, c in cands if s >= threshold]
        if not cands:
            return ("miss", None, None, None)
        s, best = sorted(
            cands, key=lambda sc: (-sc[0], sc[1]["cache_key"])
        )[0]  # (score DESC, key ASC)
        if hq(best):
            return ("vector", best["cache_key"], best["content"], s)
        return ("miss", None, None, None)

    probes = [
        (i, q, t, v)
        for i, (q, t, v) in enumerate(
            [
                ("what is spark", "t0", [3, 0, 1]),
                ("what is flink", "t0", [5, 5, 0]),
                ("fresh question", "t0", [5, 5, 0]),
                ("fresh question", "t1", [3, 0, 1]),
                ("fresh question", "t2", [2, 2, 2]),
                ("no such thread", "t9", [9, 9, 9]),
                ("below threshold", "t0", [1, 0, 0]),
            ]
        )
    ]
    got = _lookup(spark, cache_df, probes, fast=True)
    for qid, q, t, v in probes:
        want = oracle_get_fast(q, t, v)
        r = got[qid]
        assert (r["hit_type"], r["cache_key"], r["content"], r["score"]) == want, (
            qid, q, t
        )


def test_integral_and_float_rungs_agree(spark, cache_df):
    """The numpy-matmul integral rung and the JVM zip_with float rung
    must pick the same winners (scores long vs double)."""
    probes = [
        (1, "p1", "t0", [5, 5, 0]),
        (2, "p2", "t2", [2, 2, 2]),
        (3, "p3", "t9", [9, 9, 9]),
    ]
    got_int = _lookup(spark, cache_df, probes, fast=True)
    cache_f = cache_df.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qdf = spark.createDataFrame(
        probes, QUERY_SCHEMA
    ).withColumn("qvec", F.col("qvec").cast("array<double>"))
    got_f = {
        r["query_id"]: r
        for r in cache_lookup_batch(
            cache_f, qdf, threshold=10, fast=True
        ).collect()
    }
    for qid in (1, 2, 3):
        a, b = got_int[qid], got_f[qid]
        assert (a["hit_type"], a["cache_key"], a["content"]) == (
            b["hit_type"], b["cache_key"], b["content"]
        )
        if a["score"] is not None:
            assert float(a["score"]) == float(b["score"])


def test_fractional_threshold_not_truncated(spark):
    """Review finding: int(0.9) == 0 admitted zero-score candidates on
    the integral rung. Integer scores satisfy score >= 0.9 iff
    score >= 1, so orthogonal vectors (dot 0) must MISS on both
    rungs under the module default threshold."""
    cache = spark.createDataFrame(
        [_entry("stored", "A:s", "t0", [0, 5, 0], verified=True)],
        CACHE_SCHEMA,
    )
    probes = [(1, "probe", "t0", [7, 0, 0])]  # dot = 0
    qdf = spark.createDataFrame(probes, QUERY_SCHEMA)
    got_int = cache_lookup_batch(cache, qdf, fast=True).first()
    assert got_int["hit_type"] == "miss"
    got_f = cache_lookup_batch(
        cache.withColumn("embedding", F.col("embedding").cast("array<double>")),
        qdf.withColumn("qvec", F.col("qvec").cast("array<double>")),
        fast=True,
    ).first()
    assert got_f["hit_type"] == "miss"
    # a positive dot (5) clears ceil(0.9) = 1 and hits
    got_one = cache_lookup_batch(
        cache, spark.createDataFrame([(1, "p", "t0", [0, 1, 0])], QUERY_SCHEMA)
    ).first()
    assert got_one["hit_type"] == "vector" and got_one["score"] == 5


def test_integral_rung_nonstring_thread_id(spark):
    """Review finding: the integral rung hardcoded thread_id as
    string; a bigint-threaded cache must work on both rungs."""
    cache = spark.createDataFrame(
        [(_key("q"), "q", "A:q", 7, 0, False, True, [2, 2, 2])],
        "cache_key string, query string, content string, thread_id long, "
        "quality_score int, user_verified boolean, "
        "fast_path_eligible boolean, embedding array<long>",
    )
    qdf = spark.createDataFrame(
        [(1, "reworded", 7, [1, 1, 1])],
        "query_id long, query string, thread_id long, qvec array<long>",
    )
    got = cache_lookup_batch(cache, qdf, threshold=5, fast=True).first()
    assert got["hit_type"] == "vector" and got["score"] == 6
