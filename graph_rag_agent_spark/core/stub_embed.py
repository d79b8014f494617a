"""Deterministic embedding stub (seeded hash-projection vectors).

Stands in for the reference's embedding model
(/root/reference/graph/indexing/entity_indexer.py:149-253; entity text
is ``id + ' ' + description``, entity_indexer.py:53-56). A real model
places aliases of one entity near each other; this stub simulates that
knowledge deterministically: a known alias's vector is dominated by a
projection of its cluster's canonical name plus a small alias-specific
component, so intra-cluster cosine ≈ 0.99 and cross-cluster cosine is
low — reproducing the KNN(topK=10, cutoff=0.9) regime
(similar_entity.py:168-169, settings.py:38) with known ground truth.
Unknown text falls back to the plain char-trigram projection.
"""

from __future__ import annotations

import math

from .hashing import stable_int
from .vocab import canonical_for

DIM = 64
_CLUSTER_WEIGHT = 10.0


def _gram_vector(text: str, dim: int = DIM) -> list[float]:
    v = [0.0] * dim
    s = f"\x02{text}\x03"
    for i in range(len(s) - 2):
        h = stable_int(s[i : i + 3], salt="gram")
        sign = 1.0 if (h >> 32) & 1 else -1.0
        v[h % dim] += sign
    return v


def _normalize(v: list[float]) -> list[float]:
    norm = math.sqrt(sum(x * x for x in v))
    if norm == 0.0:
        out = [0.0] * len(v)
        out[0] = 1.0
        return out
    return [x / norm for x in v]


def embed_text(text: str, dim: int = DIM) -> list[float]:
    """Deterministic unit vector for arbitrary text."""
    return _normalize(_gram_vector(text or "", dim))


def embed_entity(entity_id: str, description: str | None, dim: int = DIM) -> list[float]:
    """Entity embedding over id + ' ' + description (reference
    entity_indexer.py:53-56), cluster-aware for known aliases."""
    text = f"{entity_id} {description or ''}"
    base = _gram_vector(text, dim)
    canonical = canonical_for(entity_id)
    if canonical is not None:
        cvec = _normalize(_gram_vector(canonical, dim))
        bvec = _normalize(base)
        base = [_CLUSTER_WEIGHT * c + b for c, b in zip(cvec, bvec)]
    return _normalize(base)


def cosine(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    da = math.sqrt(sum(x * x for x in a))
    db = math.sqrt(sum(x * x for x in b))
    if da == 0.0 or db == 0.0:
        return 0.0
    return num / (da * db)
