"""Small in-repo BPE tokenizer — a REAL learned tokenizer for the
pluggable-tokenizer seam (SURVEY §2 F7).

The reference chunks with HanLP COARSE_ELECTRA_SMALL_ZH plugged into
its _safe_tokenize ladder (/root/reference/processor/text_chunker.py:
25,165-183). CI can't ship a neural model, so the seam was previously
demonstrated only with toy tokenizers; this module provides a
non-trivial stand-in: classic byte-pair encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public algorithm), trained deterministically on the corpus itself.

Losslessness — the chunker's reconstruction contract
(``''.join(tokens) == text``, struct_builder.py:81) — holds by
construction: text is pre-split into a partition of whitespace /
non-whitespace runs, and BPE merges only ever CONCATENATE adjacent
symbols inside one pretoken, so the concatenation of all output
tokens is exactly the input.

Determinism: merge selection breaks frequency ties lexicographically,
so the same training corpus always yields the same merge table.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterable

# lossless pretokenization: whitespace runs and non-whitespace runs
# partition the text exactly
PRETOKEN_RE = re.compile(r"\s+|\S+")


def train_bpe(texts: Iterable[str], num_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from the given texts.

    Classic corpus-level BPE: start from single characters inside each
    pretoken, repeatedly merge the most frequent adjacent symbol pair
    (ties → lexicographically smallest pair, for determinism).
    Returns the ordered merge table."""
    word_freq: Counter[str] = Counter()
    for t in texts:
        if t:
            word_freq.update(PRETOKEN_RE.findall(t))

    vocab: dict[str, tuple[str, ...]] = {w: tuple(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic: max frequency, then smallest pair
        top = max(pairs.values())
        best = min(pair for pair, n in pairs.items() if n == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[str, tuple[str, ...]] = {}
        for w, syms in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges


class BPETokenizer:
    """``str -> list[str]`` callable for the safe_tokenize seam.

    Applies the learned merges greedily in rank order (lowest-rank
    eligible pair first — the standard BPE inference rule). Instances
    pickle by value into the chunking mapInPandas closure exactly the
    way a production tokenizer client would."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {m: i for i, m in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}

    def encode_pretoken(self, w: str) -> list[str]:
        hit = self._cache.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        while len(syms) > 1:
            best_i = -1
            best_rank: int | None = None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i < 0:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        if len(self._cache) < 100_000:  # bound worker memory
            self._cache[w] = syms
        return syms

    def __call__(self, text: str) -> list[str]:
        out: list[str] = []
        for w in PRETOKEN_RE.findall(text):
            out.extend(self.encode_pretoken(w))
        return out

    def __getstate__(self):  # don't ship the cache through pickle
        return {"ranks": self.ranks}

    def __setstate__(self, state):
        self.ranks = state["ranks"]
        self._cache = {}
