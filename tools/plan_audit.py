"""Reproduce the PLANS.md physical-plan audit.

Run: python tools/plan_audit.py   (prints formatted plans for the key
operators over the sf0.001 testdata)."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from search_engine_spark.functions.tokenizer import term_to_id
    from search_engine_spark.functions.xxhash import bucket_of_term
    from search_engine_spark.operators import events as E
    from search_engine_spark.operators.postings import (
        build_documents_from_testdata,
        build_index,
    )
    from search_engine_spark.operators.search import search
    from search_engine_spark.operators.segments import load_index, write_index
    from search_engine_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = build_documents_from_testdata(spark, sf_dir)
    d = tempfile.mkdtemp() + "/idx"
    write_index(docs, d, n_buckets=8, n_shards=2, n_salts=2, salt_threshold=50)
    di = load_index(spark, d)

    def cap(tag: str, df) -> None:
        print(f"\n======== {tag} ========")
        df.explain("formatted")

    tid = term_to_id("ta")
    b = bucket_of_term(tid, 8)
    cap(
        "segment fetch (bucket+term pushdown)",
        di.segments.filter(
            F.col("bucket").isin([b]) & F.col("term_id").isin([tid])
        ).select("term_id", "df", "blob"),
    )
    idx = build_index(docs)
    cap("search DataFrame path", search(idx, "table scan"))
    cap(
        "events hourly agg",
        E.hourly_event_stats(spark.read.parquet(f"{sf_dir}/events.parquet")),
    )

    # round-3: the executor-side score-ordered plan and the explode-free
    # dedup plans (PLANS.md "Round-3 additions")
    from search_engine_spark.operators import dedup as D
    from search_engine_spark.operators.wand import topk_scores_distributed

    cap(
        "distributed BM25 top-k (decode -> dl join -> sum -> TakeOrdered)",
        topk_scores_distributed(di, "table spark", 10, "bm25"),
    )
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cap("simhash (bit-sliced, 1 Generate)", D.simhash(raw))
    cap("minhash band keys (1 shuffle, no distinct)", D.minhash_band_keys(raw))


if __name__ == "__main__":
    main()
