"""Bloom filter: vectorized hash == scalar Go-semantics hash; membership
properties; distributed build == local build."""

import numpy as np
import pytest

from search_engine_spark.functions.bloom import (
    LocalBloomFilter,
    SEEDS,
    build_bloom,
    filter_unseen,
    go_hash,
    hash_batch,
)

URLS = [
    "http://example.com/a",
    "https://例子.测试/路径?q=你好",
    "x",
    "",
    "http://example.com/a",  # duplicate
    "a" * 300,
    "HTTP://EXAMPLE.COM/A",  # case differs => different hash
]


def test_vectorized_matches_scalar():
    n_bits = (100_000 >> 3) << 6
    got = hash_batch(URLS, n_bits)
    for i, u in enumerate(URLS):
        for k, seed in enumerate(SEEDS):
            assert got[i, k] == go_hash(u, seed) % n_bits, (u, seed)


def test_no_false_negatives():
    bf = LocalBloomFilter(10_000)
    bf.add_batch(URLS)
    assert bf.has_batch(URLS).all()


def test_unseen_mostly_absent():
    bf = LocalBloomFilter(100_000)
    bf.add_batch([f"http://site/{i}" for i in range(1000)])
    probes = [f"http://other/{i}" for i in range(1000)]
    fp = int(bf.has_batch(probes).sum())
    assert fp < 50  # 8 bits/entry, 5 hashes => fp rate ~2%


def test_distributed_build_matches_local(spark):
    urls = [f"http://h{i % 13}.com/p{i}" for i in range(2000)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(4)
    bf_dist = build_bloom(df, "url", 100_000)
    bf_local = LocalBloomFilter(100_000)
    bf_local.add_batch(urls)
    assert np.array_equal(bf_dist.bitmap, bf_local.bitmap)


def test_filter_unseen(spark):
    seen = [f"http://seen/{i}" for i in range(500)]
    new = [f"http://new/{i}" for i in range(500)]
    bf = LocalBloomFilter(100_000)
    bf.add_batch(seen)
    df = spark.createDataFrame([(u,) for u in seen + new], "url string")
    out = [r.url for r in filter_unseen(df, "url", bf).collect()]
    assert not (set(out) & set(seen))  # no seen url survives
    assert len(out) >= 490  # a few new may be false-positive dropped


def test_jaccard_max_shingle_df(spark):
    """Boilerplate cap: a shingle shared by every doc is droppable without
    changing pairs driven by rarer overlap."""
    from search_engine_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "copyright acme corp all rights reserved"
    rows = [
        (1, f"{boiler} alpha beta gamma delta epsilon"),
        (2, f"{boiler} alpha beta gamma delta zeta"),
        (3, f"{boiler} totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(df, threshold=0.2, max_shingle_df=2)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (1, 2) in got          # real near-dups survive
    assert (1, 3) not in got and (2, 3) not in got  # boilerplate-only overlap gone


def test_absint_minint64_parity_with_vector_path():
    """Go's AbsInt(MinInt64) == MinInt64 (wrapping negation); the scalar
    helper must agree with hash_batch's np.int64 negation + floor-mod."""
    import numpy as np

    from search_engine_spark.functions.bloom import _abs_int64

    h = -(1 << 63)
    assert _abs_int64(h) == h
    sh = np.int64(h)
    with np.errstate(over="ignore"):
        vec = np.where(sh < 0, -sh, sh)  # wraps back to MinInt64
    n_bits = 4096
    assert int(vec % n_bits) == _abs_int64(h) % n_bits
    # ordinary negatives still abs() identically
    for v in (-5, -(1 << 62), 7, 0):
        assert _abs_int64(v) == abs(v)
