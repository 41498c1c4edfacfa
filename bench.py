"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Extra keys (informational): docs_per_sec for the index build, n_docs,
noise_probe (pure-Python spin rate, Mop/s — this host shows up-to-3x
CPU-steal swings; see BASELINE.md host-noise protocol).

Every timed entry is an adaptive min-of-N (stop when two consecutive
samples agree within 30%, max 4): the host's CPU steal arrives in
multi-second storms, so a single sample can be 10-50x off (same protocol
as tools/scale_bench.py). Index queries are reported twice: ``q_*`` =
COLD (DiskIndex LRUs cleared before every rep) and ``q_*_warm`` = cached
steady-state serving latency (ADVICE r2 — prior rounds mixed the two).

Run: python bench.py  [--sf-dir DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.operators import dedup as D
    from search_engine_spark.operators import similarity as SIM
    from search_engine_spark.operators import textstats as TS
    from search_engine_spark.operators.postings import (
        build_documents_from_testdata,
        build_index,
    )
    from search_engine_spark.operators.search import search
    from search_engine_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf = args.sf_dir.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}

    def spin_probe(n: int = 2_000_000) -> float:
        t0 = time.time()
        x = 0
        for i in range(n):
            x += i * i
        return round(n / (time.time() - t0) / 1e6, 2)

    probe_before = spin_probe()

    def timed(name: str, fn, max_reps: int = 4, reset=None):
        # adaptive min: stop at the first pair of consecutive samples that
        # agree within 30% (a quiet window) AND sit within 30% of the
        # running best — a SUSTAINED steal storm produces consecutive
        # samples that agree with each other while all being inflated
        # (measured: two ~57 s samples of a 2 s query), so agreement alone
        # is not evidence of a clean window.
        # ``reset`` (untimed) runs before EVERY rep — for index queries it
        # clears the DiskIndex LRUs so each sample is a COLD query; without
        # it, reps 2+ would hit segment/df caches and report warm-cache
        # latencies as if they were cold (ADVICE r2).
        best, prev, out = None, None, None
        for _ in range(max_reps):
            if reset is not None:
                reset()
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            if (
                prev is not None
                and abs(dt - prev) <= 0.3 * max(dt, prev)
                and dt <= 1.3 * best
            ):
                break
            prev = dt
        timings[name] = round(best, 3)
        return out

    # --- index build: the full persisted product (tokenize -> map-side
    # postings -> salted segments + manifest + lexicon on disk) ------------
    import shutil
    import tempfile

    from search_engine_spark.operators.segments import load_index, write_index
    from search_engine_spark.operators.wand import search_segments, topk_wand

    docs = build_documents_from_testdata(spark, args.sf_dir).cache()
    n_docs = docs.count()
    build_secs = []
    index_dir = None
    for rep in range(2):  # min-of-2, fresh dir each (manifest resume would
        d = tempfile.mkdtemp(prefix="bench_index_") + "/idx"  # skip shards)
        t0 = time.time()
        write_index(
            docs,
            d,
            n_buckets=32,
            n_shards=2,
            n_salts=4,
            salt_threshold=max(n_docs // 8, 100),
            collect_stats=False,
        )
        build_secs.append(time.time() - t0)
        if index_dir is None:
            index_dir = d
        else:
            shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    build_sec = min(build_secs)
    timings["index_build"] = round(build_sec, 3)
    di = load_index(spark, index_dir)

    # in-memory logical index (DataFrame query path, for comparison)
    t0 = time.time()
    index = build_index(docs)
    n_postings = index.postings.count()
    index.lexicon.count()
    timings["index_build_logical"] = round(time.time() - t0, 3)

    # --- query side: compressed blob path (the product query engine) -------
    # Protocol (ADVICE r2): cold and warm are timed SEPARATELY. q_* = cold
    # (the DiskIndex LRUs are cleared before every rep, so min-of-N never
    # reads a prior rep's segment/df cache); q_*_warm = the same query with
    # the caches primed (the steady-state serving latency, the number the
    # reference's LRU-fronted read path reports). Round-1/2 q_* values mixed
    # the two (warm reps inside min-of-N), closest to today's _warm column.
    search_segments(di, "table").collect()  # JVM/codegen warmup (then cleared)

    def timed_query(name: str, fn):
        timed(name, fn, reset=di.clear_caches)  # cold: LRUs dropped per rep
        timed(f"{name}_warm", fn)  # warm: caches left primed from above

    for qname, q in [
        ("q_single", "table"),
        ("q_and", "table spark"),
        ("q_not", "table -dup"),
        ("q_site", "spark site:src3"),
        ("q_rare", "dup"),
    ]:
        timed_query(qname, lambda q=q: search_segments(di, q).collect())
    timed_query("q_wand_topk", lambda: topk_wand(di, "customer query", 10))
    from search_engine_spark.operators.wand import topk_bm25_wand

    timed_query("q_bm25_topk", lambda: topk_bm25_wand(di, "customer query", 10))
    # executor-side plans, forced — the latency an off-driver-budget query
    # pays (everything stays in Spark; driver holds only the winners)
    timed_query(
        "q_dist_and",
        lambda: search_segments(di, "table spark", max_driver_postings=0).collect(),
    )
    timed_query(
        "q_dist_bm25_topk",
        lambda: topk_bm25_wand(di, "customer query", 10, max_driver_postings=0),
    )
    timed("q_df_single", lambda: search(index, "table").collect())

    # --- training-data ops ----------------------------------------------------
    # repartition: the single-file local parquet otherwise pins every
    # narrow stage (shingle explode, token hash) to ONE core
    raw = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .repartition(int(args.cpus))
        .cache()
    )
    raw.count()
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").cache()
    emb.count()
    # Plan warmup on a tiny slice before each timed op: the index builds
    # above flood the C2 compile queue with generated classes, so the
    # FIRST execution of each new whole-stage-codegen plan runs largely
    # interpreted (measured: the shingle-explode stage 44 s cold vs 3 s
    # once JIT'd, in the same JVM). Steady-state is the metric (a
    # long-lived cluster doesn't re-JIT per job — same rationale as
    # tools/scale_bench.py's warmup build); the warmup is outside the
    # timed region.
    small = raw.limit(50).cache()
    small.count()
    ops = [
        ("dedup_minhash", lambda df=raw: D.minhash_candidate_pairs(df)),
        ("dedup_jaccard", lambda df=raw: D.ngram_jaccard_pairs(df)),
        ("dedup_simhash", lambda df=raw: D.simhash(df)),
        ("text_quality", lambda df=raw: TS.quality_score(df)),
    ]
    for _name, op in ops:
        op(small).collect()
    SIM.cosine_topk(emb.limit(50), query_vec_id=0).collect()
    for name, op in ops:
        timed(name, lambda op=op: op(raw).collect())
    timed("embed_knn", lambda: SIM.cosine_topk(emb, query_vec_id=0).collect())

    # --- streaming ingest throughput (informational, single rep: the
    # foreachBatch generations path over the same corpus in 4 arrivals) ---
    from search_engine_spark.operators.wand import search_segments as _ss
    from search_engine_spark.streaming.ingest import (
        start_incremental_index,
        stream_documents,
    )

    sroot = tempfile.mkdtemp(prefix="bench_stream_")
    arrivals = os.path.join(sroot, "arrivals")
    docs.repartition(4).write.parquet(arrivals)
    sdir = os.path.join(sroot, "idx")
    t0 = time.time()
    q = start_incremental_index(
        stream_documents(spark, arrivals), sdir, n_buckets=16, n_salts=2
    )
    q.awaitTermination(600)
    timings["streaming_index_build"] = round(time.time() - t0, 3)
    _ss(load_index(spark, sdir), "table").collect()  # searchable check
    shutil.rmtree(sroot, ignore_errors=True)

    shutil.rmtree(os.path.dirname(index_dir), ignore_errors=True)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "n_postings": n_postings,
                "docs_per_sec": round(n_docs / build_sec, 1),
                "cpus": int(args.cpus),
                "timing_protocol": "adaptive_min_stable_pair_max4",
                "noise_probe_mops": [probe_before, spin_probe()],
            }
        )
    )


if __name__ == "__main__":
    main()
