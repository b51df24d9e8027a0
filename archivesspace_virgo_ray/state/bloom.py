"""Vectorized Bloom filter — the broadcast membership PREFILTER for
anti-joins whose build side is too big to ship as an exact set.

Scale contract: the filter's byte size is fixed by (n_items, fpr) — about
1.2 bytes/item at 1% fpr — independent of key width, so a 10^9-row build
side broadcasts as ~1.2 GB of bits instead of 32 GB of md5 strings. A
Bloom NEVER yields false negatives, so the composition

    probe.filter(bloom.contains)  ->  exact verify of the (rare) positives

is EXACT end-to-end: misses are guaranteed misses, and the verify step
(a hash join against the build side, now candidate-sized) removes the
false positives. ``pipelines.queries.incremental_dedup_bloom`` is the
reference composition.

Everything is numpy-vectorized: k probe positions per key come from
double hashing (Kirsch–Mitzenmacher: idx_i = h1 + i*h2 mod m), bits live
in one uint8 array, and per-batch partial filters union with a single
``np.bitwise_or`` — so a Bloom can be BUILT distributed (one partial per
batch, OR-reduced) as well as probed distributed.
"""

from __future__ import annotations

import math

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _h2(h: np.ndarray) -> np.ndarray:
    """Second hash stream for double hashing — an odd multiplier keeps the
    stride coprime with any power-of-two table size."""
    with np.errstate(over="ignore"):
        x = (h ^ (h >> np.uint64(33))) * _MIX
    return x | np.uint64(1)


class BloomFilter:
    """Fixed-size bit array + k derived probe positions per uint64 key."""

    def __init__(self, n_items: int, fpr: float = 0.01):
        n = max(1, int(n_items))
        m = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
        self.m = int(2 ** math.ceil(math.log2(m)))  # power of two: mask, no div
        self.k = max(1, int(round(self.m / n * math.log(2))))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    # -- construction ---------------------------------------------------------

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(h, dtype=np.uint64)
        mask = np.uint64(self.m - 1)
        step = _h2(h)
        with np.errstate(over="ignore"):
            idx = (h[None, :]
                   + np.arange(self.k, dtype=np.uint64)[:, None] * step[None, :])
        return (idx & mask).astype(np.int64)  # (k, n)

    def add(self, h: np.ndarray) -> None:
        idx = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, idx >> 3,
                         np.left_shift(np.uint8(1), (idx & 7).astype(np.uint8)))

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership test — True may be a false positive, False
        is ALWAYS correct (no false negatives)."""
        if not len(h):
            return np.zeros(0, dtype=bool)
        idx = self._positions(h)
        byte = self.bits[idx >> 3]
        bit = np.left_shift(np.uint8(1), (idx & 7).astype(np.uint8))
        return ((byte & bit) != 0).all(axis=0)

    # -- distributed build ----------------------------------------------------

    def merge_bits(self, other_bits: np.ndarray) -> None:
        """Union a partial filter built with the SAME (m, k) parameters —
        the OR-reduce step of a distributed Bloom build."""
        if len(other_bits) != len(self.bits):
            raise ValueError("bloom partials must share (n_items, fpr) params")
        np.bitwise_or(self.bits, other_bits, out=self.bits)
