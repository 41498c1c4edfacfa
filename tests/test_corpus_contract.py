"""Pin the input-table contract (BASELINE.json ``input_hint``).

The production input is an Iceberg table ``(repo string, path string,
commit string, lang string, content string)``. No Iceberg runtime jar
ships in this sandbox, so these tests are the stated proxy (README
"Input formats"): they pin the exact column names, Spark types, and the
per-row ``content sha256`` invariant on BOTH the synthetic generator and
a Parquet round-trip of it — i.e. the schema an Iceberg scan of the same
table would present to every downstream operator.
"""

import hashlib

import pytest
from pyspark.sql import types as T

from search_engine_spark.corpus import generate_corpus

CONTRACT_COLS = [
    ("repo", T.StringType()),
    ("path", T.StringType()),
    ("commit", T.StringType()),
    ("lang", T.StringType()),
    ("content", T.StringType()),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, 120, n_partitions=3).cache()


def test_schema_matches_input_hint(corpus):
    got = [(f.name, f.dataType) for f in corpus.schema.fields]
    # input_hint columns, in order, then the derived sha column.
    assert got[: len(CONTRACT_COLS)] == CONTRACT_COLS
    assert got[len(CONTRACT_COLS)] == ("content_sha256", T.StringType())


def test_contract_survives_parquet_roundtrip(spark, corpus, tmp_path_factory):
    """Write/read through Parquet (the sandbox stand-in for the Iceberg
    table) and assert the schema and values are byte-identical."""
    out = str(tmp_path_factory.mktemp("contract") / "corpus.parquet")
    corpus.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    got = [(f.name, f.dataType) for f in back.schema.fields]
    assert sorted(n for n, _ in got) == sorted(
        [n for n, _ in CONTRACT_COLS] + ["content_sha256"]
    )
    for name, dt in got:
        assert dt == T.StringType(), name
    a = sorted(corpus.collect())
    b = sorted(back.collect())
    assert a == b


def test_content_sha256_invariant(corpus):
    """input_hint: 'per-row invariant vs the reference: content sha256
    equality' — the column must equal hashlib over the content bytes."""
    for r in corpus.select("content", "content_sha256").limit(50).collect():
        assert r.content_sha256 == hashlib.sha256(r.content.encode()).hexdigest()


def test_no_nulls_in_contract_columns(corpus):
    cols = [n for n, _ in CONTRACT_COLS]
    conds = " OR ".join(f"{c} IS NULL" for c in cols)
    assert corpus.filter(conds).count() == 0


def test_downstream_accepts_external_table_shape(spark, corpus):
    """An externally-supplied DataFrame with ONLY the five contract
    columns (no sha column — real Iceberg tables won't carry ours) must
    flow through build_documents_from_corpus unchanged."""
    from search_engine_spark.operators.postings import build_documents_from_corpus

    bare = corpus.select("repo", "path", "commit", "lang", "content")
    docs = build_documents_from_corpus(bare)
    assert docs.count() > 0
    names = set(docs.columns)
    assert {"doc_id", "url", "title", "body"} <= names
