"""Deterministic doc_id assignment.

The reference assigns dense sequential int64 docIds in arrival order
(BoltDB NextSequence, index/db/boltdb-index.go:174) — unreproducible in a
parallel system. We define (SURVEY §7.4.1):

    doc_id = row_number() OVER (ORDER BY repo, path, commit)   -- 1-based

A single global sort by a natural key. At 10^12-file scale a single-window
row_number over one partition would bottleneck on one task, so we use
``zipWithIndex``-style two-phase assignment: sort → per-partition local
ranks + a tiny driver-side prefix-sum of partition counts (one extra pass,
no single-task global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOC_KEY = ["repo", "path", "commit"]


def assign_doc_ids(
    df: DataFrame,
    key_cols: list[str] | None = None,
    scalable: bool | None = None,
    persist_input: bool = True,
) -> DataFrame:
    """Add 1-based deterministic ``doc_id`` ordered by ``key_cols``.

    ``scalable=True`` (default for >1 partition inputs) uses range
    partitioning + per-partition offsets instead of a global single-task
    window. The input is persisted (memory-and-disk) so the range-sampling
    pass doesn't recompute an expensive upstream (corpus parse), and the
    sampled boundaries stay pinned (measured: 13.5 s → ~5 s at local[32]
    for an 80k-doc corpus). The post-shuffle ranked intermediate is ALSO
    persisted, so the input is touched by exactly TWO jobs — range
    sampling and the shuffle/rank materialization (which the offsets
    aggregate triggers); the final assignment join reads the persisted
    intermediate instead of re-running the shuffle+window (was a third
    full pass — the dominant fixed cost in the 2-vs-8-core scaling gap).
    """
    key_cols = key_cols or DOC_KEY
    if scalable is None:
        scalable = df.rdd.getNumPartitions() > 1

    if not scalable:
        w = Window.orderBy(*[F.col(c) for c in key_cols])
        return df.withColumn("doc_id", F.row_number().over(w).cast("long"))

    if persist_input:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)

    # Range-partition on the key so partition i holds a contiguous key range;
    # local row_number + exclusive prefix sum of partition sizes = global rank.
    sorted_df = df.repartitionByRange(*[F.col(c) for c in key_cols]).sortWithinPartitions(*key_cols)
    with_pid = sorted_df.withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in key_cols])
    local = with_pid.withColumn("_local_rn", F.row_number().over(w_local).cast("long"))
    if persist_input:
        from pyspark import StorageLevel as _SL

        # persist the RANKED intermediate: the offsets aggregate below
        # materializes it, and the final assignment join then reads the
        # cache instead of re-running shuffle+window (job 3 -> cache read)
        local = local.persist(_SL.MEMORY_AND_DISK)
    # Tiny aggregate (one row per partition) → broadcast join back.
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
    out = (
        local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn("doc_id", (F.col("_off") + F.col("_local_rn")).cast("long"))
        .drop("_pid", "_local_rn", "_off")
    )
    return out
