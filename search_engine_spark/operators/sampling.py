"""Deterministic sampling / dataset-split operators for training-data
pipelines.

At 100 TB, train/val/test membership must be (a) reproducible across
runs and engines, (b) computable per row with no global state, and (c)
stable under repartitioning — so membership is a pure function of the
row's identity, not of partition order or an RNG stream. Both operators
here hash the doc_id with a seed through the same portable md5
construction the dedup family uses (``porthash60`` — first 15 hex chars
of md5, identical in Spark and DuckDB), then decide membership from the
hash alone:

- ``hash_split``: bucket = H(seed, doc_id) mod 10_000; cumulative
  weight ranges over the buckets name the split. Adding rows never
  moves an existing row between splits; changing the seed re-deals.
- ``stratified_sample``: keep a row iff bucket < frac(stratum)·10_000 —
  an exact-rate Bernoulli per stratum, deterministic per row. The
  stratum→fraction map is a tiny CASE expression (driver literal), not
  a join.

Scale shape: both are single codegen'd projections/filters over the
scan — no shuffle, no UDF, no state. The reference has no sampling
plane (its corpus is whatever the crawler fetched); these are the
training-data operators the 100-TB pipeline needs (brief: dataset ops
beyond the reference's own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import porthash60

_BUCKETS = 10_000


def _bucket(id_col: str, seed: int) -> F.Column:
    """Deterministic bucket in [0, 10000): porthash60 of "<seed>:<id>".

    The seed is INSIDE the hash input, so different seeds produce
    independent deals (same construction as the DuckDB oracle mirrors
    character-for-character).

    NULL ids hash to NULL (ADVICE r4): ``F.concat`` propagates NULL like
    the oracle's ``'seed:' || doc_id::VARCHAR``, so a NULL doc_id yields
    a NULL bucket and both engines then agree structurally — every
    ``bucket < hi`` CASE arm is NULL so hash_split lands in the ELSE
    (last) split in Spark AND DuckDB, and stratified_sample's
    ``bucket < thr`` filter drops the row in both. The previous
    ``concat_ws`` silently skipped the NULL and hashed just the seed
    string — engine and oracle diverged on NULL ids."""
    key = F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))
    return (porthash60(key) % _BUCKETS).cast("int")


def hash_split(
    documents: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row to a named split: (doc_id, bucket, split).

    ``weights`` maps split name → fraction; fractions must sum to ≤ 1.0
    (a remainder falls into the LAST split, so the default 0.9/0.05/0.05
    is exhaustive). Splits are contiguous cumulative ranges over the
    hash bucket — membership is stable under corpus growth and
    repartitioning, and reproducible in any engine that can md5.

    **Order-sensitive by design** (ADVICE r4): the cumulative ranges
    follow the insertion order of ``weights`` — {"train": .9, "val": .1}
    puts train in buckets [0, 9000) while {"val": .1, "train": .9} puts
    val there, so the same weights in a different key order assign rows
    to different splits. The DuckDB oracle (``hash_split_sql``) must be
    called with an identically-ordered dict to agree; callers who need
    order-independence should pass a canonically-sorted dict to both."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    if sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError("weights must sum to <= 1.0")
    b = _bucket(id_col, seed)
    names = list(weights)
    acc = 0.0
    expr = None
    for name in names[:-1]:
        acc += weights[name]
        hi = int(round(acc * _BUCKETS))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        b.alias("bucket"),
        split.alias("split"),
    )


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sample: rows whose hash bucket falls
    under the stratum's fraction, returned as (doc_id, stratum, bucket).

    ``fractions`` maps stratum value → sampling rate in [0, 1]; strata
    absent from the map use ``default_fraction``. Exact-rate in the
    bucket sense (fraction 0.25 keeps buckets 0..2499), deterministic
    per row, stable across runs/partitionings — the reproducible
    downsampling a 100-TB corpus needs (e.g. cap boilerplate languages
    while keeping all of a rare one)."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction out of range for {k!r}: {v}")
    b = _bucket(id_col, seed)
    thr = None
    for k, v in fractions.items():
        hi = F.lit(int(round(v * _BUCKETS)))
        cond = F.col(stratum_col) == k
        thr = F.when(cond, hi) if thr is None else thr.when(cond, hi)
    default_hi = F.lit(int(round(default_fraction * _BUCKETS)))
    thr = default_hi if thr is None else thr.otherwise(default_hi)
    return (
        documents.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            b.alias("bucket"),
            thr.alias("_thr"),
        )
        .filter(F.col("bucket") < F.col("_thr"))
        .drop("_thr")
    )
