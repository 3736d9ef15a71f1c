"""Winnowing document fingerprints for exact-substring dedup.

Selects a bounded-density subset of each document's k-gram rolling
hashes with the MOSS guarantee (Schleimer, Wilkerson, Aiken, SIGMOD'03
"Winnowing: Local Algorithms for Document Fingerprinting"): for window
size ``w``, any two documents sharing a verbatim run of at least
``w + k - 1`` characters select at least one common fingerprint VALUE.
That makes the fingerprint equi-join a guaranteed SUPERSET candidate
generator for "shares an exact substring of length >= L" (L = w+k-1) —
the verbatim-overlap dedup of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better"), whose suffix-array construction
does not distribute; winnowing is the bounded-memory, shuffle-friendly
form of the same detection problem.

Guarantee sketch: a shared character run of length >= w+k-1 spans >= w
consecutive k-grams in BOTH documents with identical contents, hence
identical hash sequences; the minimum over that shared window is
selected on both sides, so the pair meets in the fingerprint join. The
selection is over byte-level k-grams (UTF-8): an L-CHAR shared run is
>= L bytes, so the byte-level guarantee covers the character-level
predicate. Hash collisions and coincidentally-equal window minima only
ADD candidates — the consumer must verify exactly (and
``dedup_substring_pairs`` does, on real L-gram strings), so no hash
choice can affect emitted values.

Density: expected fingerprints per position is 2/(w+2) (~18% at the
w=9 operating point of :func:`k_for`) — the corpus-sized explode a
stride-1 L-gram index would need shrinks ~5.5x before anything
shuffles, which is the 100 TB point of the construction; see
:func:`k_for` for why the density is spent on candidate precision.

The kernel is an Arrow-batched ``mapInPandas`` (numpy rolling hash +
sliding-window min): the rolling hash is k fused multiply-adds per
position in uint64 wraparound arithmetic (exactly mod 2^64) and the
window min is a C-vectorized sliding view — the interpreted-lambda JVM
equivalent (``transform(sequence(...), t -> array_min(slice(...)))``)
evaluates O(n*w) higher-order-function calls per document and loses by
an order of magnitude at corpus scale.

Reference anchor: the reference has no dedup surface at all
(``neo4j.go`` delegates every read to Neo4j); this operator belongs to
the engine's training-data-pipeline extension, same family as
``benchqueries/dedup.py``.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
from pyspark.sql import DataFrame

# FNV-1a 64-bit prime: odd, well-mixed as a polynomial base; the hash
# is sum c[i+j] * B^(k-1-j) mod 2^64 via native uint64 wraparound.
_BASE = np.uint64(0x100000001B3)

K_GRAM_MAX = 32  # k-gram ceiling of the rolling hash
_W_MIN = 9  # keep >= this much winnowing (density <= 2/(w+2) ~ 18%)


def k_for(min_len: int) -> int:
    """k-gram width for a detection target of ``min_len`` chars.

    k trades candidate PRECISION against fingerprint DENSITY: a false
    candidate pair only needs a shared k-char run (both docs selecting
    the same window minimum), while density is ~2/(w+2) with
    w = min_len-k+1. Measured at sf0.1 (L=40): k=16 emits 104k
    fingerprints but 287k candidates for 259 true pairs (1100:1 — every
    template phrase collides); k=32 emits 262k fingerprints and 339
    candidates (1.3:1). Large k wins as long as some winnowing remains,
    so: the largest k <= K_GRAM_MAX that keeps w >= {_W_MIN}."""
    k = min(K_GRAM_MAX, min_len - _W_MIN + 1)
    if k < 4:
        raise ValueError(f"min_len too small for winnowing: {min_len}")
    return k


def window_for(min_len: int, k: int | None = None) -> int:
    """Window size guaranteeing detection of shared runs >= min_len."""
    w = min_len - (k if k is not None else k_for(min_len)) + 1
    if w < 1:
        raise ValueError(f"min_len {min_len} must be >= k ({k})")
    return w


def fingerprint_values(text: str, w: int, k: int = K_GRAM_MAX) -> np.ndarray:
    """The winnowed fingerprint VALUE set of one document: distinct
    sliding-window minima of the byte-level k-gram rolling hashes,
    window ``w``. int64 view of the uint64 hashes (Spark has no
    unsigned type; the reinterpret is a bijection)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    m = len(b) - k + 1
    if m < 1:
        return np.empty(0, dtype=np.int64)
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _BASE + b[j : j + m]
    if m <= w:
        mins = h.min(keepdims=True)
    else:
        mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    return np.unique(mins).view(np.int64)


def lgram_hash_values(text: str, L: int) -> np.ndarray:
    """Sorted distinct rolling hashes of every L-byte gram — the cheap
    per-doc screen representation for exact-substring verification
    (2 KB/doc vs ~35 KB for Python string sets at 300-char docs). Equal
    strings hash equal, so an empty intersect of two docs' arrays
    PROVES an empty string-gram intersect; collisions only pass pairs
    forward to the exact string check."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    m = len(b) - L + 1
    if m < 1:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(m, dtype=np.uint64)
    for j in range(L):
        h = h * _BASE + b[j : j + m]
    return np.unique(h)


def winnow_fingerprints(docs: DataFrame, min_len: int) -> DataFrame:
    """(doc_id, fp) — the winnowed fingerprint set of every document,
    tuned so any two docs sharing a verbatim run of >= ``min_len``
    chars share a fingerprint value. Arrow-batched; no shuffle (the
    fingerprint explode happens inside the Python worker, emitting
    ~2/(w+2) rows per character instead of one per position)."""
    k = k_for(min_len)
    w = window_for(min_len, k)

    def gen(batches: Iterable):
        import pandas as pd

        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                v = fingerprint_values(text, w, k)
                if len(v):
                    ids.append(np.full(len(v), doc_id, dtype=np.int64))
                    fps.append(v)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fp": np.concatenate(fps)}
                )

    return docs.select("doc_id", "text").mapInPandas(gen, "doc_id long, fp long")
