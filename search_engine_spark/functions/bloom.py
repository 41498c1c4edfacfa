"""Bloom filter with the reference's exact hash family (SURVEY §2.9 D1/D2).

Reference: ``crawler/core/bloomfilter.go:12-59`` — 5 polynomial rolling
hashes over the url's runes with seeds {31, 37, 61, 17, 13}, Go 64-bit
wrapping arithmetic, AbsInt, modulo the bitmap's bit count; bitmap sized
``maxDocCount>>3`` uint64 words (8 bits per expected member).

The vectorized form processes a batch of strings position-wise: one numpy
pass per character column (max_len iterations over the whole batch), so a
million URLs hash in a handful of numpy ops per character, not a Python
loop per URL.

Spark usage: ``build_bloom`` folds per-partition bitmaps (mapInPandas →
one binary row per partition → driver OR-reduce) — the distributed twin of
the reference's Redis-bitmap variant (``bloomfilter.go:91-157``), with the
shared-state Redis round-trips replaced by a broadcast-able immutable
bitmap. ``filter_unseen`` is the crawler's "skip already-crawled" gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SEEDS = (31, 37, 61, 17, 13)  # bloomfilter.go:15


def go_hash(s: str, seed: int) -> int:
    """Scalar reference hash (bloomfilter.go:24-30): h = h*seed + rune,
    64-bit wrapping, then AbsInt."""
    h = 0
    for ch in s:
        h = (h * seed + ord(ch)) & 0xFFFFFFFFFFFFFFFF
    if h >= 1 << 63:
        h -= 1 << 64
    return _abs_int64(h)


def _abs_int64(h: int) -> int:
    """Go AbsInt over int64: -MinInt64 overflows back to MinInt64 (stays
    negative) — matching hash_batch's wrapping np.int64 negation, so the
    scalar and vector paths floor-mod to the same bit index."""
    if h == -(1 << 63):
        return h
    return -h if h < 0 else h


def hash_batch(strings: pd.Series | list[str], n_bits: int) -> np.ndarray:
    """Vectorized (n, 5) bit positions for a batch of strings."""
    texts = [s if isinstance(s, str) else "" for s in strings]
    n = len(texts)
    if n == 0:
        return np.empty((0, len(SEEDS)), np.int64)
    lens = np.fromiter((len(t) for t in texts), np.int64, n)
    max_len = int(lens.max()) if n else 0
    # column-major codepoint matrix, zero-padded (zeros are harmless: the
    # mask below freezes h once a string is exhausted)
    cp = np.zeros((n, max_len), np.uint64)
    for i, t in enumerate(texts):  # row fill; the hash math is vectorized
        if t:
            cp[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), "<u4")
    out = np.empty((n, len(SEEDS)), np.int64)
    for k, seed in enumerate(SEEDS):
        h = np.zeros(n, np.uint64)
        sd = np.uint64(seed)
        for j in range(max_len):
            active = j < lens
            h = np.where(active, h * sd + cp[:, j], h)
        sh = h.view(np.int64)
        sh = np.where(sh < 0, -sh, sh)  # Go AbsInt incl. MinInt64 quirk
        out[:, k] = sh % n_bits
    return out


class LocalBloomFilter:
    """Batch-vectorized twin of LocalBloomFilter (bloomfilter.go:38-59)."""

    def __init__(self, max_doc_count: int) -> None:
        words = max(max_doc_count >> 3, 1)  # bloomfilter.go:79-83
        self.bitmap = np.zeros(words, np.uint64)

    @property
    def n_bits(self) -> int:
        return self.bitmap.size << 6

    def add_batch(self, strings) -> None:
        pos = hash_batch(strings, self.n_bits).ravel()
        np.bitwise_or.at(
            self.bitmap, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        )

    def has_batch(self, strings) -> np.ndarray:
        pos = hash_batch(strings, self.n_bits)
        bits = (self.bitmap[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)

    def add(self, s: str) -> None:
        self.add_batch([s])

    def has(self, s: str) -> bool:
        return bool(self.has_batch([s])[0])


def build_bloom(df: DataFrame, col: str, max_doc_count: int) -> LocalBloomFilter:
    """Distributed bloom build: per-partition bitmaps OR-folded on the
    driver. One narrow pass over the data; the driver receives
    (n_partitions × bitmap_bytes), not the rows."""
    words = max(max_doc_count >> 3, 1)
    n_bits = words << 6

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(words, np.uint64)
        for pdf in batches:
            pos = hash_batch(pdf[col], n_bits).ravel()
            np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    parts = df.select(col).mapInPandas(kernel, "bitmap binary").collect()
    bf = LocalBloomFilter(max_doc_count)
    for r in parts:
        bf.bitmap |= np.frombuffer(r["bitmap"], np.uint64)
    return bf


def filter_unseen(df: DataFrame, col: str, bloom: LocalBloomFilter) -> DataFrame:
    """Rows whose ``col`` is definitely NOT in the filter (the crawler's
    frontier gate: bloom 'maybe' rows are dropped — same false-positive
    drop behavior as the reference)."""
    spark = df.sparkSession
    bitmap_b = spark.sparkContext.broadcast(bloom.bitmap.tobytes())
    n_bits = bloom.n_bits

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.frombuffer(bitmap_b.value, np.uint64)
        for pdf in batches:
            pos = hash_batch(pdf[col], n_bits)
            bits = (bm[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
            yield pdf[~bits.all(axis=1)]

    return df.mapInPandas(kernel, df.schema)
