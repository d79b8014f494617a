"""Dedup tiers (exact / MinHash / SimHash / char-Jaccard) and ANN
(brute / LSH / IVF) on deterministic fixtures + driver testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators import dedup, knn

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and keeps running far away "
    # many DISTINCT tokens → a one-token diff flips only ~2 SimHash
    # bits (each token carries 1/n of the signature weight)
    other = " ".join(f"tok{i}" for i in range(500))
    rows = [
        (1, base * 8),
        (2, base * 8),  # exact duplicate of 1
        (3, base * 8 + "with a tiny suffix change"),  # near-dup of 1
        (4, other + " rules"),
        (5, "另一个完全不同的中文文档，内容关于知识图谱构建。"),
        (6, other + " rule"),  # one-token diff of 4 → hamming ≈ 2
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


def test_exact_duplicate_groups(docs):
    groups = {
        r["keeper_id"]: (r["n_docs"], r["doc_ids"])
        for r in dedup.exact_duplicate_groups(docs, "doc_id", "text").collect()
    }
    assert groups[1] == (2, [1, 2])
    assert groups[4][0] == 1


def test_minhash_near_duplicates(docs):
    pairs = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in dedup.minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup found
    assert all(not (a in (4, 5) and b in (4, 5)) for a, b in pairs)


def test_simhash_near_duplicates(docs):
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in dedup.simhash_near_duplicates(docs, "doc_id", "text").collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (4, 6) in pairs  # one-word-suffix diff → tiny hamming
    assert not any(5 in p for p in pairs)


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "en", "night"), (2, "en", "nacht"), (3, "zh", "中文")],
        "doc_id bigint, lang string, text string",
    )
    rows = {
        (r["a_id"], r["b_id"]): r["char_jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", "lang").collect()
    }
    # matches duckdb jaccard('night','nacht') = 3/7
    assert rows[(1, 2)] == round(3 / 7, 6)
    assert (1, 3) not in rows  # different block


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_ann_bruteforce_topk(embeddings):
    res = knn.ann_bruteforce(embeddings, k=3)
    got = res.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)
    assert res.where(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_ann_lsh_recall(embeddings):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn.ann_bruteforce(embeddings, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn.ann_lsh(embeddings, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall  # banded LSH on random vectors


def test_ann_lsh_multiprobe_recall_dominates(embeddings):
    """Multi-probe (flip the lowest-|margin| bits per band) must
    strictly widen the candidate set — recall ≥ the single-probe run
    at the SAME band budget, and materially closer to brute force at
    a REDUCED band budget (the scale argument: fewer tables, same
    recall)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn.ann_bruteforce(embeddings, k=3).collect()
    }

    def recall(bands, probes):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in knn.ann_lsh(embeddings, k=3, bands=bands, probes=probes).collect()
        }
        return len(exact & approx) / len(exact)

    r_single = recall(6, 0)
    r_multi = recall(6, 2)
    assert r_multi >= r_single, (r_multi, r_single)
    assert r_multi >= 0.55, r_multi


def test_ann_ivf_recall(embeddings):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn.ann_bruteforce(embeddings, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn.ann_ivf(embeddings, k=3, n_cells=8, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_ann_ivf_explicit_centroids_match_python(embeddings):
    """Explicit-centroid IVF (the driver-oracle path) equals a pure-
    Python replay: nearest-cell assignment with stable squared-L2
    argsort, nprobe probing, in-cell exact cosine top-k."""
    import numpy as np

    rows = sorted(embeddings.collect(), key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    cents = mat[:4].copy()

    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    order = np.argsort(d, axis=1, kind="stable")
    stored = {ids[i]: int(order[i, 0]) for i in range(len(ids))}
    probed = {ids[i]: set(order[i, :2].tolist()) for i in range(len(ids))}
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = set()
    for qi, q in enumerate(ids):
        cand = [
            n
            for n in ids
            if n != q and stored[n] in probed[q]
        ]
        sims = {n: float(norm[qi] @ norm[ids.index(n)]) for n in cand}
        top = sorted(cand, key=lambda n: (-sims[n], n))[:3]
        want.update((q, n, r + 1) for r, n in enumerate(top))

    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn.ann_ivf(
            embeddings, k=3, nprobe=2, centroids=cents
        ).collect()
    }
    assert got == want


class TestEmbeddingNearDup:
    def test_matches_numpy_brute_force_within_blocks(self, spark):
        """Operator pair set == numpy brute-force over same-argmax-block
        pairs with the identical integer threshold test."""
        import numpy as np

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(40, 16))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        # plant near-dups: rows 30..39 are tiny perturbations of 0..9
        vecs[30:] = vecs[:10] + rng.normal(scale=0.01, size=(10, 16))
        vecs[30:] /= np.linalg.norm(vecs[30:], axis=1, keepdims=True)
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        got = {
            (r.id_a, r.id_b)
            for r in dedup.embedding_cosine_near_duplicates(
                df, "vec_id", "embedding"
            ).collect()
        }
        q = np.floor(vecs * 1000).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        block = q.argmax(axis=1)
        want = set()
        for a in range(40):
            for b in range(a + 1, 40):
                if block[a] != block[b]:
                    continue
                dot = int((q[a] * q[b]).sum())
                if dot > 0 and 100 * dot * dot >= 81 * int(n2[a]) * int(n2[b]):
                    want.add((a, b))
        assert got == want
        # the planted perturbation pairs that share an argmax must be found
        planted = {(i, i + 30) for i in range(10) if block[i] == block[i + 30]}
        assert planted and planted <= got

    def test_driver_query_recovers_planted_pairs(self, spark):
        import __spark_entry__ as em

        out = em.queries()["embedding_near_dup"](spark, SF_DIR).collect()
        assert out
        # every pair links a base row to its planted sibling (+1_000_000)
        for r in out:
            assert r.id_b == r.id_a + 1_000_000
            assert r.id_a % 10 == 3
            # integer-exact threshold really holds
            assert 100 * r.dot * r.dot >= 81 * r.na2 * r.nb2


def test_ann_ivf_multicell_recall_lift_bounded_candidates(embeddings):
    """store_cells=2: recall never drops vs r=1, and the candidate
    set grows by at most the assignment factor (pairs are deduped
    before re-rank, so the exact-cosine work is bounded)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn.ann_bruteforce(embeddings, k=3).collect()
    }

    def run(r):
        approx = {
            (q["query_id"], q["neighbor_id"])
            for q in knn.ann_ivf(
                embeddings, k=3, n_cells=8, nprobe=2, store_cells=r
            ).collect()
        }
        cands = knn.ivf_candidates(
            embeddings, n_cells=8, nprobe=2, store_cells=r
        ).count()
        return len(exact & approx) / len(exact), cands

    rec1, cand1 = run(1)
    rec2, cand2 = run(2)
    assert rec2 >= rec1, (rec2, rec1)
    assert cand2 <= 2 * cand1, (cand2, cand1)
    assert cand2 > 0
