"""E2E over the synthetic source-code corpus (input_hint shape) — exercises
the HTML parse path, title boosts (R3), CJK bigrams, and deterministic
doc_id assignment."""

import pytest

from search_engine_spark.corpus import generate_corpus
from search_engine_spark.operators.docids import assign_doc_ids
from search_engine_spark.operators.postings import build_documents_from_corpus, build_index
from search_engine_spark.operators.search import search
from search_engine_spark.oracle.reference import OracleIndex

N_DOCS = 240

QUERIES = [
    "hello",
    "HelloWorld",
    "Doc",          # appears in HTML titles → title ×3 boost + title phrase
    "你好世界",       # CJK bigrams
    "abcdef",       # long verbatim run → phrase boost
    "ABCdef",       # case-sensitivity twin
    "index -Merge",
    "postings site:org1",
    "文档",          # CJK in titles
]


@pytest.fixture(scope="module")
def built(spark):
    corpus = generate_corpus(spark, N_DOCS, n_partitions=4).cache()
    docs = build_documents_from_corpus(corpus)
    idx = build_index(docs)
    oracle = OracleIndex()
    for r in docs.select("doc_id", "url", "title", "body").collect():
        oracle.add_document(r.doc_id, r.url, r.title, r.body)
    return corpus, idx, oracle


def test_corpus_deterministic(spark, built):
    corpus, _, _ = built
    again = generate_corpus(spark, N_DOCS, n_partitions=2)
    a = sorted(corpus.select("repo", "path", "commit", "content_sha256").collect())
    b = sorted(again.select("repo", "path", "commit", "content_sha256").collect())
    assert a == b


def test_html_docs_parsed_titles(built):
    _, idx, _ = built
    titled = idx.documents.filter("title != ''").count()
    assert titled == N_DOCS // 6  # one lang in 6 is html, all carry <title>


def test_docid_assignment_scalable_matches_window(built):
    from pyspark.sql import functions as F

    _, idx, _ = built
    base = idx.documents.select(F.col("url").alias("u")).repartition(5)
    seq = assign_doc_ids(base, key_cols=["u"], scalable=False).select(
        "u", F.col("doc_id").alias("a")
    )
    par = assign_doc_ids(base, key_cols=["u"], scalable=True).select(
        F.col("u").alias("u_b"), F.col("doc_id").alias("b")
    )
    joined = seq.join(par, seq.u == par.u_b)
    assert joined.count() == base.count()
    assert joined.filter("a != b").count() == 0


@pytest.mark.parametrize("query", QUERIES)
def test_corpus_rank_identity(built, query):
    from tests.test_search_e2e import assert_rank_identical

    _, idx, oracle = built
    got = [(r.doc_id, r.score) for r in search(idx, query).collect()]
    exp = oracle.search(query)
    assert_rank_identical(got, exp)


def test_sha256_invariant_corpus(built):
    import hashlib

    corpus, idx, _ = built
    # invariant survives the parse/docid pipeline end-to-end
    rows = idx.documents.limit(50).collect()
    src = {r.content_sha256 for r in corpus.select("content_sha256").collect()}
    for r in rows:
        assert r.content_sha256 in src
