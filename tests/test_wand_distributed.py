"""Executor-side score-ordered query family (topk_scores_distributed).

The driver block-max routes (topk_wand / topk_bm25_wand / *_exhaustive)
and the distributed plan must agree rank-identically, and the distributed
route must keep the DRIVER at O(k): no doc-length collect (DiskIndex._dl
stays None) and no postings blobs fetched into the driver LRU
(segment_cache stays empty). Mirrors the reference read path
(/root/reference/index/core/search.go:187-273) at cluster scale.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import wand
from search_engine_spark.operators.postings import build_documents_from_testdata
from search_engine_spark.operators.segments import load_index, write_index

QUERIES = ["table", "table spark", "customer query", "dup", "qqqq"]


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, spark, sf_dir):
    docs = build_documents_from_testdata(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("dist_index"))
    write_index(docs, path, n_buckets=16, n_shards=2, n_salts=4, salt_threshold=50)
    return path


def _assert_rank_identical(got, exp, tol=1e-9):
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (d, s), (_, es) in zip(got, exp):
        assert abs(s - es) < tol, (d, s, es)


@pytest.mark.parametrize("query", QUERIES)
def test_bm25_distributed_parity(spark, index_dir, query):
    di = load_index(spark, index_dir)
    driver = wand.topk_bm25_wand(di, query, 10)
    dist = wand.topk_bm25_wand(load_index(spark, index_dir), query, 10,
                               max_driver_postings=0)
    _assert_rank_identical(dist, driver)


@pytest.mark.parametrize("query", QUERIES)
def test_tfidf_distributed_parity(spark, index_dir, query):
    di = load_index(spark, index_dir)
    driver = wand.topk_wand(di, query, 10)
    dist = wand.topk_wand(load_index(spark, index_dir), query, 10,
                          max_driver_postings=0)
    _assert_rank_identical(dist, driver)
    ex = wand.topk_exhaustive(load_index(spark, index_dir), query, 10,
                              max_driver_postings=0)
    _assert_rank_identical(ex, driver)
    bm_ex = wand.topk_bm25_exhaustive(load_index(spark, index_dir), query, 10,
                                      max_driver_postings=0)
    _assert_rank_identical(bm_ex, wand.topk_bm25_exhaustive(di, query, 10))


def test_distributed_driver_holds_only_k(spark, index_dir):
    """The O(k)-driver contract for a df≈n_docs query: after a forced
    distributed run on a FRESH index handle, the driver has collected
    neither the dl column nor any postings blob — only the k winners."""
    di = load_index(spark, index_dir)
    rows = wand.topk_bm25_wand(di, "table spark", 10, max_driver_postings=0)
    assert 0 < len(rows) <= 10
    assert wand.topk_bm25_wand.last_stats["path"] == "distributed"
    assert di._dl is None, "distributed route must not collect doc lengths"
    assert len(di.segment_cache._d) == 0, (
        "distributed route must not ship postings blobs to the driver"
    )


def test_ndocs_valve_routes_distributed(spark, index_dir, monkeypatch):
    """Above MAX_DRIVER_DOCS the default call (no forced valve) must take
    the executor-side plan — the corpus size alone disqualifies the
    driver dl cache."""
    driver = wand.topk_bm25_wand(load_index(spark, index_dir), "table", 10)
    monkeypatch.setattr(wand, "MAX_DRIVER_DOCS", 1)
    di = load_index(spark, index_dir)
    dist = wand.topk_bm25_wand(di, "table", 10)
    assert wand.topk_bm25_wand.last_stats["path"] == "distributed"
    assert di._dl is None
    _assert_rank_identical(dist, driver)


def test_df_equals_ndocs_term(spark, tmp_path):
    """A term present in EVERY document (df == n_docs — the exact shape
    that breaks an O(df) driver collect at scale): the distributed plan
    answers it rank-identically to the driver plan."""
    n = 120
    rows = [
        (i + 1, f"https://h{i % 7}/p{i}", "", f"zz{i % 11} common w{i} zz")
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, title string, body string"
    ).withColumn("content_sha256", F.sha2(F.col("body"), 256))
    path = str(tmp_path / "idx")
    write_index(docs, path, n_buckets=8, n_shards=2, n_salts=2, salt_threshold=50)
    driver = wand.topk_bm25_wand(load_index(spark, path), "common", 10)
    di = load_index(spark, path)
    dist = wand.topk_bm25_wand(di, "common", 10, max_driver_postings=0)
    assert len(driver) == 10  # the term matches all 120 docs
    _assert_rank_identical(dist, driver)
    assert di._dl is None and len(di.segment_cache._d) == 0
