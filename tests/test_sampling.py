"""Deterministic sampling / split operators (operators/sampling.py).

Membership must be a pure function of (seed, doc_id): identical across
runs and repartitionings, independent between seeds, exact-rate in the
bucket sense, and value-identical to the DuckDB oracle (checked via the
driver gate; here we pin the engine-side invariants).
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import sampling as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_split_exhaustive_and_stable(spark, docs):
    out = S.hash_split(docs).cache()
    n = docs.count()
    assert out.count() == n  # every row lands in exactly one split
    by = {
        r["split"]: r["cnt"]
        for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(by) <= {"train", "val", "test"}
    # 90/5/5 within bucket-granularity tolerance on 500 docs
    assert by["train"] > 0.8 * n
    # stable under repartitioning: same assignment per doc_id
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in S.hash_split(docs.repartition(13)).collect()
    }
    assert a == b


def test_hash_split_growth_stability(spark, docs):
    """Adding rows never moves an existing row between splits."""
    full = {r["doc_id"]: r["split"] for r in S.hash_split(docs).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in S.hash_split(docs.filter("doc_id % 2 = 0")).collect()
    }
    assert all(full[d] == s for d, s in half.items())


def test_hash_split_seed_redeals(spark, docs):
    a = {r["doc_id"]: r["split"] for r in S.hash_split(docs, seed=0).collect()}
    b = {r["doc_id"]: r["split"] for r in S.hash_split(docs, seed=1).collect()}
    assert a != b  # a different seed deals differently ...
    assert set(a) == set(b)  # ... over the same rows


def test_hash_split_validates_weights(spark, docs):
    with pytest.raises(ValueError):
        S.hash_split(docs, weights={"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        S.hash_split(docs, weights={"a": -0.1, "b": 0.5})


def test_stratified_sample_rates_and_determinism(spark, docs):
    frac = {"en": 0.25, "zh": 0.8}
    out = S.stratified_sample(docs, frac, default_fraction=0.0).cache()
    strata = {r["stratum"] for r in out.select("stratum").distinct().collect()}
    assert strata <= {"en", "zh"}  # default 0.0 drops everything else
    # per-stratum rate ~ fraction (bucket-exact: bucket < frac*10000)
    assert out.filter("bucket >= 2500 and stratum = 'en'").count() == 0
    assert out.filter("bucket >= 8000 and stratum = 'zh'").count() == 0
    # determinism across invocations and partitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in S.stratified_sample(
            docs.repartition(7), frac, default_fraction=0.0
        ).collect()
    )
    assert a == b


def test_stratified_sample_consistent_with_split_hash(spark, docs):
    """Same (seed, doc_id) hash family: a stratum sampled at 1.0 keeps
    every row of that stratum."""
    out = S.stratified_sample(docs, {"en": 1.0}, default_fraction=0.0)
    n_en = docs.filter("lang = 'en'").count()
    assert out.count() == n_en


def test_null_doc_id_matches_oracle_semantics(spark, docs):
    """ADVICE r4: NULL doc_id must behave identically in Spark and the
    DuckDB oracle. With null-propagating concat the bucket is NULL, so
    hash_split's CASE falls to the ELSE (last) split in BOTH engines and
    stratified_sample's bucket<thr filter drops the row in BOTH."""
    import duckdb
    import pandas as pd

    from search_engine_spark.oracle import sqlgen

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, None], "lang": ["en", "zh", "en"],
         "text": ["a", "b", "c"]}
    )
    null_docs = spark.createDataFrame(pdf)

    out = {r["doc_id"]: (r["bucket"], r["split"])
           for r in S.hash_split(null_docs).collect()}
    assert out[None] == (None, "test")  # ELSE arm = last weight name

    con = duckdb.connect()
    con.register("documents", pdf)
    ora = {r[0]: (r[1], r[2])
           for r in con.execute(sqlgen.hash_split_sql()).fetchall()}
    assert ora[None] == (None, "test")
    assert out == {k: v for k, v in ora.items()}

    # stratified: NULL bucket < thr is NULL -> dropped in both engines
    strat = S.stratified_sample(null_docs, {"en": 1.0}).collect()
    assert sorted(r["doc_id"] for r in strat) == [1]
    ora_strat = con.execute(
        sqlgen.stratified_sample_sql({"en": 1.0})
    ).fetchall()
    assert sorted(r[0] for r in ora_strat) == [1]


def test_sqlgen_escapes_quotes():
    """ADVICE r4: caller-supplied names containing a single quote must
    not break the generated oracle SQL."""
    import duckdb
    import pandas as pd

    from search_engine_spark.oracle import sqlgen

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [1, 2], "lang": ["o'brien", "en"],
                      "text": ["a", "b"]}),
    )
    # hash_split with a quoted split name parses and runs
    rows = con.execute(
        sqlgen.hash_split_sql({"tr'ain": 0.5, "rest": 0.5})
    ).fetchall()
    assert {r[2] for r in rows} <= {"tr'ain", "rest"}
    # stratified with a quoted stratum key parses and runs
    con.execute(sqlgen.stratified_sample_sql({"o'brien": 1.0})).fetchall()
