"""Deterministic hashing helpers shared by generator, stubs and oracle.

``sha1_hex`` matches the reference's chunk-id hash exactly
(/root/reference/graph/core/utils.py:24-34: hashlib.sha1 over utf-8
text, hex digest) and therefore also matches Spark's
``F.sha1(F.encode(col, 'utf-8'))`` bit for bit.
"""

from __future__ import annotations

import hashlib


def sha1_hex(text: str) -> str:
    return hashlib.sha1(text.encode("utf-8")).hexdigest()


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def stable_int(*parts: object, salt: str = "") -> int:
    """Seed-free deterministic 64-bit int from the given parts —
    replaces random.* so generator output is a pure function of ids."""
    key = salt + "\x1f".join(str(p) for p in parts)
    return int.from_bytes(hashlib.sha1(key.encode("utf-8")).digest()[:8], "big")


HASH_SEP = "\x1f"


def stable_u64(*parts: object, salt: str = "") -> int:
    """Unsigned 64-bit hash that is bit-identical to DuckDB's
    ``md5_number_lower(key)`` (lower 8 digest bytes, little-endian) —
    used wherever a hash must be replicated by the ANSI-SQL oracle
    (stub relationship type/weight, MinHash/SimHash bases)."""
    key = salt + HASH_SEP.join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[8:16], "little")
