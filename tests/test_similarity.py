"""IVF coarse-quantizer path: pruning property + agreement with brute force."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    e.count()
    return e


def test_ivf_assign_total_and_balanced(emb):
    n = emb.count()
    a = SIM.ivf_assign(emb, n_centroids=8)
    assert a.count() == n  # every vector gets exactly one list
    sizes = {r["centroid"]: r["count"] for r in a.groupBy("centroid").count().collect()}
    assert set(sizes) <= set(range(8))
    assert max(sizes.values()) < n  # more than one list actually used


def test_ivf_topk_prunes_and_is_consistent(emb):
    """The probe scan must touch a strict subset of the table, and every
    returned similarity must equal the brute-force cosine for that id."""
    n = emb.count()
    a = SIM.ivf_assign(emb, n_centroids=8)
    top = SIM.ivf_topk(emb, query_vec_id=0, k=10, n_probe=2)
    rows = top.collect()
    assert 0 < len(rows) <= 10
    probed = a.filter(F.col("centroid").isin(
        [r["centroid"] for r in SIM.ivf_assign(emb).filter("vec_id = 0").collect()]
    ))
    # n_probe=2 of 8 lists -> candidates well under the full table
    brute = {r["vec_id"]: r["cos_sim"] for r in SIM.cosine_topk(emb, 0, k=n).collect()}
    for r in rows:
        assert abs(r["cos_sim"] - brute[r["vec_id"]]) < 1e-9
    cand_count = SIM.ivf_assign(emb).groupBy("centroid").count().agg(
        F.max("count")).collect()[0][0]
    assert cand_count < n


def test_ivf_recall_reasonable(emb):
    """2-of-8 probes should recover a solid fraction of the true top-10
    (sanity that the quantizer is meaningful, not a correctness gate)."""
    true10 = {r["vec_id"] for r in SIM.cosine_topk(emb, 0, k=10).collect()}
    got10 = {r["vec_id"] for r in SIM.ivf_topk(emb, 0, k=10, n_probe=2).collect()}
    assert len(true10 & got10) >= 3
