"""End-to-end rank identity: Spark engine vs pure-Python oracle.

FIXTURES.md §4 — score tolerance 1e-9, ordering = score desc / doc_id asc,
candidates pre-truncated to the 50 lowest docIds.
"""

import pytest

from search_engine_spark.operators.postings import (
    build_documents_from_testdata,
    build_index,
)
from search_engine_spark.operators.search import paginate, search
from search_engine_spark.oracle.reference import OracleIndex

QUERIES = [
    "the",            # q01-style single keyword
    "spark",
    "table scan",     # multi-keyword AND (first-keyword scores)
    "scan -merge",    # exclusion NOT
    "order site:src3",  # site suffix filter
    "qqqq",           # absent bigrams → empty
    "z",              # single char → no tokens → empty
    "",               # empty query → empty
    "   ",
    "the -",          # empty exclusion keyword → no-op
    "sort merge -scan site:src1",  # everything combined
    "thethe",         # repeated-bigram query (duplicate query tokens)
]


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    docs = build_documents_from_testdata(spark, sf_dir)
    idx = build_index(docs)
    oracle = OracleIndex()
    for r in docs.select("doc_id", "url", "title", "body").collect():
        oracle.add_document(r.doc_id, r.url, r.title, r.body)
    return idx, oracle


def assert_rank_identical(got, exp, tol=1e-9):
    assert len(got) == len(exp)
    assert {d for d, _ in got} == {d for d, _ in exp}
    exp_by_doc = dict(exp)
    for d, s in got:
        assert abs(s - exp_by_doc[d]) < tol, (d, s, exp_by_doc[d])
    # rank order identical modulo float-noise ties: compare orders after
    # rounding (both engines then order by (score_r desc, doc_id asc))
    g = sorted(got, key=lambda x: (-round(x[1], 6), x[0]))
    e = sorted(exp, key=lambda x: (-round(x[1], 6), x[0]))
    assert [d for d, _ in g] == [d for d, _ in e]


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity(built, query):
    idx, oracle = built
    got = [(r.doc_id, r.score) for r in search(idx, query).collect()]
    exp = oracle.search(query)
    assert_rank_identical(got, exp)


def test_pagination(built):
    idx, _ = built
    ranked = search(idx, "the")
    page1 = paginate(ranked, 1).collect()
    page2 = paginate(ranked, 2).collect()
    assert len(page1) == 10 and len(page2) == 10
    assert [r.rank for r in page1] == list(range(1, 11))
    assert [r.rank for r in page2] == list(range(11, 21))
    assert page1[0].score >= page1[-1].score


def test_per_shard_truncation_is_lowest_50_docids(built):
    # engine.go:65: the candidate set is cut to the 50 LOWEST docIds before
    # the score sort — a high-scoring doc with docId rank >50 must be absent.
    idx, oracle = built
    got = {r.doc_id for r in search(idx, "the").collect()}
    all_cands = sorted(oracle.search_docs("the"))
    assert got == set(all_cands[:50])


def test_sha256_invariant(spark, sf_dir):
    # north-rule per-row invariant: content sha256 equality input vs documents
    import hashlib

    docs = build_documents_from_testdata(spark, sf_dir)
    rows = docs.select("body", "content_sha256").limit(100).collect()
    for r in rows:
        assert hashlib.sha256(r.body.encode()).hexdigest() == r.content_sha256
