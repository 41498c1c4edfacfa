"""Compressed global index: salted segment build, disk layout, manifest,
resume.

Pipeline (SURVEY §3.1 re-architecture):

    postings (term_id, doc_id, title_end, positions)
      → bucket = murmur3(term_id) % n_buckets     (term-partitioned index)
      → salt   = murmur3(doc_id) % n_salts for hot terms (df > threshold)
                 else 0                            (skew defeat, north rule)
      → groupBy(bucket, salt).applyInPandas(encode kernel)
           kernel sorts (term_id, doc_id), flattens positions, and calls
           codec.encode_bucket — ONE vectorized varint pass per group
      → segments rows (term_id, salt, df, ctf, blob, block_* sidecar)
      → merge pass: hot terms' sub-segments sort-merged into one blob

Disk layout (all parquet + a JSON manifest):

    index_dir/meta.json            n_docs, n_buckets, n_salts, fingerprint
    index_dir/documents/           doc store
    index_dir/lexicon/             term_id, term, df, ctf, bucket
    index_dir/segments/shard=K/    bucket, term_id, df, ctf, n_docs, blob,
                                   block_last, block_max_tf, block_offsets
    index_dir/manifest.jsonl       one row per completed shard: lineage
                                   (input fingerprint) + metrics

Shards are the resume unit: ``write_index`` skips shards whose manifest
row is complete AND matches the input fingerprint, so an interrupted
build restarts without recomputing finished work (north rule:
checkpointed per-partition segment manifests with lineage + metrics).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from .docids import release_assign_cache

SEGMENT_SCHEMA = (
    "bucket int, term_id long, salt int, df long, ctf long, n_docs long, "
    "blob binary, block_last array<long>, block_max_tf array<int>, "
    "block_offsets array<long>"
)


def _encode_kernel_arrow(table: pa.Table) -> pa.Table:
    """applyInArrow kernel for one (bucket, salt) group.

    Arrow-native on purpose: a pandas kernel materializes one Python list
    object PER ROW for the ``positions`` column (30M rows → 30M objects →
    GC collapse); the Arrow ListArray exposes the same data as two flat
    numpy arrays (values + offsets) with zero object churn. (The real
    type hints are REQUIRED — applyInArrow infers its eval type from
    them.)
    """
    t = table.combine_chunks()
    term = t.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64)
    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    te = t.column("title_end").to_numpy(zero_copy_only=False).astype(np.int64)
    la = t.column("positions")
    la = la.combine_chunks() if isinstance(la, pa.ChunkedArray) else la
    offsets = la.offsets.to_numpy().astype(np.int64)
    values = la.values.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]

    order = np.lexsort((doc, term))
    starts = offsets[:-1][order]
    counts_o = counts[order]
    total = int(counts_o.sum())
    if total:
        # ragged gather: flat positions in (term, doc) sorted row order
        shift = np.repeat(
            starts - np.concatenate(([0], np.cumsum(counts_o)[:-1])), counts_o
        )
        flat = values[shift + np.arange(total)]
    else:
        flat = np.empty(0, np.int64)

    eb = codec.encode_bucket(term[order], doc[order], te[order], counts_o, flat)
    n_terms = len(eb.term_ids)
    bucket = int(t.column("bucket")[0].as_py()) if n_terms else 0
    salt = int(t.column("salt")[0].as_py()) if n_terms else 0
    return pa.table(
        {
            "bucket": pa.array(np.full(n_terms, bucket, np.int32), pa.int32()),
            "term_id": pa.array(eb.term_ids, pa.int64()),
            "salt": pa.array(np.full(n_terms, salt, np.int32), pa.int32()),
            "df": pa.array(eb.dfs, pa.int64()),
            "ctf": pa.array(eb.ctfs, pa.int64()),
            "n_docs": pa.array(eb.dfs, pa.int64()),
            "blob": pa.array(eb.blobs, pa.binary()),
            "block_last": pa.array([a.tolist() for a in eb.block_last], pa.list_(pa.int64())),
            "block_max_tf": pa.array([a.tolist() for a in eb.block_max_tf], pa.list_(pa.int32())),
            "block_offsets": pa.array([a.tolist() for a in eb.block_offsets], pa.list_(pa.int64())),
        }
    )


def _encode_kernel_packed(table: pa.Table) -> pa.Table:
    """applyInArrow kernel for PRE-PACKED postings (pos_blob binary).

    Positions arrived as per-doc delta+varint byte strings (packed
    map-side in the tokenizer kernel), so this kernel only varint-encodes
    the small integer streams and splices the position bytes — no
    position re-encoding, no list materialization. Output blobs are
    byte-identical to the list-path kernel (tested)."""
    t = table.combine_chunks()
    term = t.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64)
    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    te = t.column("title_end").to_numpy(zero_copy_only=False).astype(np.int64)
    npos = t.column("npos").to_numpy(zero_copy_only=False).astype(np.int64)
    ba = t.column("pos_blob")
    ba = ba.combine_chunks() if isinstance(ba, pa.ChunkedArray) else ba
    bufs = ba.buffers()  # [validity, int32 offsets, data]
    raw_off = np.frombuffer(bufs[1], np.int32)
    boffsets = raw_off[ba.offset : ba.offset + len(ba) + 1].astype(np.int64)
    bvalues = (
        np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )

    order = np.lexsort((doc, term))
    # gather the per-doc byte strings into sorted order
    src_starts = boffsets[:-1][order]
    lens = (boffsets[1:] - boffsets[:-1])[order]
    off_sorted = np.zeros(order.size + 1, np.int64)
    np.cumsum(lens, out=off_sorted[1:])
    sorted_bytes = np.empty(int(off_sorted[-1]), np.uint8)
    codec._scatter_spans(sorted_bytes, off_sorted[:-1], bvalues, src_starts, lens)

    eb = codec.encode_bucket_packed(
        term[order], doc[order], te[order], npos[order], off_sorted, sorted_bytes
    )
    n_terms = len(eb.term_ids)
    bucket = int(t.column("bucket")[0].as_py()) if n_terms else 0
    salt = int(t.column("salt")[0].as_py()) if n_terms else 0
    return pa.table(
        {
            "bucket": pa.array(np.full(n_terms, bucket, np.int32), pa.int32()),
            "term_id": pa.array(eb.term_ids, pa.int64()),
            "salt": pa.array(np.full(n_terms, salt, np.int32), pa.int32()),
            "df": pa.array(eb.dfs, pa.int64()),
            "ctf": pa.array(eb.ctfs, pa.int64()),
            "n_docs": pa.array(eb.dfs, pa.int64()),
            "blob": pa.array(eb.blobs, pa.binary()),
            "block_last": pa.array([a.tolist() for a in eb.block_last], pa.list_(pa.int64())),
            "block_max_tf": pa.array([a.tolist() for a in eb.block_max_tf], pa.list_(pa.int32())),
            "block_offsets": pa.array([a.tolist() for a in eb.block_offsets], pa.list_(pa.int64())),
        }
    )


def build_segments(
    postings: DataFrame,
    n_buckets: int = 64,
    n_salts: int = 8,
    salt_threshold: int = 250_000,
) -> DataFrame:
    """postings -> compressed per-term segment rows.

    Hot terms (df > salt_threshold) are split into ``n_salts``
    sub-segments by hashed doc_id so no single task encodes an entire
    pathological posting list; ``merge_salted`` fuses them afterwards.
    The groupBy keys (bucket, salt) give ~n_buckets×n_salts groups —
    size n_buckets so groups ≈ 2-4× parallelism at the target scale.

    Accepts BOTH postings flavors: list form (``positions array<int>``,
    from ``build_postings``) and packed form (``pos_blob binary`` from
    ``build_postings_packed``) — the packed flavor shuffles ~4× fewer
    bytes and splices instead of re-encoding. Output blobs are
    byte-identical either way.
    """
    packed = "pos_blob" in postings.columns
    df_per_term = postings.groupBy("term_id").agg(F.count("*").alias("_df"))
    hot = df_per_term.filter(F.col("_df") > salt_threshold).select("term_id")
    salted = (
        postings.join(F.broadcast(hot.withColumn("_hot", F.lit(True))), "term_id", "left")
        .withColumn("bucket", F.pmod(F.xxhash64("term_id"), F.lit(n_buckets)).cast("int"))
        .withColumn(
            "salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    kernel = _encode_kernel_packed if packed else _encode_kernel_arrow
    return salted.groupBy("bucket", "salt").applyInArrow(kernel, SEGMENT_SCHEMA)


def merge_decoded_parts(
    parts: list[tuple],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Sort-merge several decoded postings parts of ONE term by doc_id.

    Each part is ``(doc_ids, title_ends, npos, positions_flat)`` (the
    ``codec.decode_term_postings`` shape). Returns the same shape, merged.
    Used by the salted-segment merge and by the multi-generation read path
    of the streaming index (LSM-style read-merge).
    """
    doc_ids = np.concatenate([p[0] for p in parts])
    te = np.concatenate([p[1] for p in parts])
    npos = np.concatenate([p[2] for p in parts])
    order = np.argsort(doc_ids, kind="mergesort")
    pos_parts = []
    starts_all = []
    off = 0
    for p in parts:
        s = np.zeros(p[2].size, np.int64)
        np.cumsum(p[2][:-1], out=s[1:])
        starts_all.append(s + off)
        off += p[3].size
        pos_parts.append(p[3])
    flat = np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int64)
    starts = np.concatenate(starts_all)
    gather = (
        np.concatenate([flat[starts[i] : starts[i] + npos[i]] for i in order])
        if flat.size
        else flat
    )
    return doc_ids[order], te[order], npos[order], gather


def _merge_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Merge one term's salted sub-segments (partition-local sort-merge:
    decode each, argsort-merge by doc_id, re-encode)."""
    if len(pdf) == 1:
        return pdf
    parts = [codec.decode_term_postings(b) for b in pdf["blob"]]
    doc_ids, te, npos, gather = merge_decoded_parts(parts)
    term = np.full(doc_ids.size, int(pdf["term_id"].iloc[0]), np.int64)
    eb = codec.encode_bucket(term, doc_ids, te, npos, gather)
    return pd.DataFrame(
        {
            "bucket": [int(pdf["bucket"].iloc[0])],
            "term_id": eb.term_ids,
            "salt": np.zeros(1, np.int32),
            "df": eb.dfs,
            "ctf": eb.ctfs,
            "n_docs": eb.dfs,
            "blob": eb.blobs,
            "block_last": [eb.block_last[0].tolist()],
            "block_max_tf": [eb.block_max_tf[0].tolist()],
            "block_offsets": [eb.block_offsets[0].tolist()],
        }
    )


def merge_salted(segments: DataFrame) -> DataFrame:
    """Fuse multi-salt terms into single global blobs.

    Only terms with >1 sub-segment (the hot, salted ones — a handful)
    pass through the merge kernel; everything else is a zero-cost
    passthrough, so this stage costs one broadcast semi/anti join."""
    multi = (
        segments.groupBy("term_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .select("term_id")
    )
    singles = segments.join(F.broadcast(multi), "term_id", "left_anti")
    multis = segments.join(F.broadcast(multi), "term_id", "left_semi")
    merged = multis.groupBy("term_id").applyInPandas(_merge_kernel, SEGMENT_SCHEMA)
    return singles.unionByName(merged)


@dataclass
class IndexMeta:
    n_docs: int
    n_buckets: int
    n_shards: int
    fingerprint: str
    avgdl: float = 0.0  # mean token (bigram) count per doc — BM25 length norm


def doc_length_expr(title_col: str = "title", body_col: str = "body") -> F.Column:
    """Token (bigram) count of a document — pure column expression, exactly
    the vectorized tokenizer's emission count: for each maximal CJK/alnum
    run of length L, L-1 bigrams, summed over title + body.

    Computed as len(text) - len(text with each run collapsed to one
    char): ONE regexp_replace per field - the regexp_extract_all +
    higher-order-aggregate form materialized an array per row and
    added ~120 CPU-seconds to a 160k-doc build. Rides the
    doc-store write (no extra job, no Python)."""

    def _count(col: str) -> F.Column:
        c = F.col(col)
        return (
            F.length(c) - F.length(F.regexp_replace(c, "[\u4e00-\u9fa5A-Za-z0-9]+", "X"))
        ).cast("long")

    return (_count(title_col) + _count(body_col)).alias("dl")


def corpus_fingerprint(documents: DataFrame) -> str:
    """Order-independent corpus lineage id: count + XOR-free sum of 60-bit
    sha256 prefixes of content (the per-row invariant column)."""
    return _fingerprint_and_count(documents)[0]


def _fingerprint_and_count(documents: DataFrame) -> tuple[str, int]:
    """Fingerprint + row count in ONE job (each Spark job costs fixed
    scheduling time that otherwise lands in the serial fraction)."""
    row = documents.agg(
        F.count("*").alias("n"),
        F.sum(F.conv(F.substring("content_sha256", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return f"{row['n']}:{row['s']}", int(row["n"])


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.jsonl")


def read_manifest(index_dir: str) -> dict[int, dict]:
    out: dict[int, dict] = {}
    p = _manifest_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                row = json.loads(line)
                out[row["shard"]] = row
    return out


def write_index(
    documents: DataFrame,
    index_dir: str,
    n_buckets: int = 64,
    n_shards: int = 4,
    n_salts: int = 8,
    salt_threshold: int = 250_000,
    with_title: bool = True,
    merge_hot: bool = False,
    collect_stats: bool = True,
) -> IndexMeta:
    """Full persisted index build with shard-level resume.

    Each shard covers buckets {b : b % n_shards == shard}; a shard whose
    manifest row is complete with a matching fingerprint is skipped on
    re-run (kill-and-resume without recomputation).

    ``merge_hot=True`` fuses each hot term's salted sub-segments into one
    blob at build time (explicit compaction); the default leaves them
    segmented and lets the query path read-merge.
    """
    from .postings import build_postings

    spark = documents.sparkSession
    os.makedirs(index_dir, exist_ok=True)

    profile = os.environ.get("SPARK_GRAFT_PROFILE") == "1"
    _t = [time.time()]

    def _mark(label: str) -> None:
        if profile:
            now = time.time()
            print(f"[write_index] {label}: {now - _t[0]:.1f}s", flush=True)
            _t[0] = now

    def _phase(label: str) -> None:
        # labels jobs in the Spark UI / event log (profiling self-ID)
        spark.sparkContext.setJobDescription(f"write_index:{label}")

    # Write the doc store FIRST, then fingerprint from the written parquet:
    # fingerprinting the logical input would recompute the whole upstream
    # pipeline (corpus gen + parse + doc_id assignment — measured 22 s at
    # 80k docs), while the parquet scan prunes to the content_sha256
    # column. The manifest fingerprint therefore guards the doc STORE's
    # lineage; re-running against a changed input with a stale index_dir
    # requires clearing the directory (documented resume contract).
    docs_path = os.path.join(index_dir, "documents")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        # fingerprint+count ride on the write job via observe() — one job
        # instead of two (every job is fixed driver time in the serial
        # fraction of the 2-vs-8-core scaling measurement)
        from pyspark.sql import Observation

        obs = Observation("fp")
        _phase("doc-store write")
        # Even doc-store files sized to the CLUSTER: the postings map
        # stage reads these files as its splits (parquet row-groups don't
        # sub-split), so few/uneven files = few/straggler map tasks no
        # matter how many cores exist (measured: a range-partitioned
        # 8-file store gave a 7-task map with one 40 s straggler at 160k
        # docs — the dominant term in the 2-vs-8-core scaling gap). The
        # count scales with parallelism, not a constant: a fixed 256 made
        # a local[2] build pay ~700 task overheads for nothing.
        n_doc_files = max(4 * spark.sparkContext.defaultParallelism, 16)
        documents = documents.repartition(n_doc_files)
        writer = documents.withColumn("dl", doc_length_expr()).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.conv(F.substring("content_sha256", 1, 15), 16, 10).cast(
                    "decimal(38,0)"
                )
            ).alias("s"),
            F.sum("dl").alias("sdl"),  # BM25 avgdl, same job
        )
        # 8 MB parquet row groups: later map stages split files at
        # row-group granularity, so split sizing stays data-adaptive even
        # if the file count is wrong for a future cluster size
        writer.write.mode("overwrite").option(
            "parquet.block.size", str(8 * 1024 * 1024)
        ).parquet(docs_path)
        fp, n_docs = f"{obs.get['n']}:{obs.get['s']}", int(obs.get["n"])
        avgdl = float(obs.get["sdl"] or 0) / max(n_docs, 1)
        docs = spark.read.parquet(docs_path)
        _mark("documents write (+observed fingerprint/avgdl)")
    else:
        docs = spark.read.parquet(docs_path)
        fp, n_docs = _fingerprint_and_count(docs)
        if "dl" in docs.columns:
            avgdl = (docs.agg(F.sum("dl")).collect()[0][0] or 0) / max(n_docs, 1)
        else:  # pre-dl index dir
            avgdl = 0.0
        _mark("fingerprint+count (resume)")
    done = {
        s: m for s, m in read_manifest(index_dir).items()
        if m.get("status") == "complete" and m.get("fingerprint") == fp
    }

    from .postings import build_postings_packed

    postings = build_postings_packed(docs, with_title=with_title).withColumn(
        "_bucket", F.pmod(F.xxhash64("term_id"), F.lit(n_buckets)).cast("int")
    )
    # NOT cached: the map-side tokenize recomputes in ~seconds, while
    # caching 10^7+ list-column rows costs far more than the recompute
    # (measured 21.5 s to fill vs 2.7 s to recompute at 320k docs) and
    # reading the row-format cache back is slower than the Arrow pipeline.
    _mark("postings plan")

    # The encode shuffle must be partitioned by DATA VOLUME, not core
    # count: at shuffle.partitions == 8 a 320k-doc build spills every
    # reduce task (291 s); at >= n_buckets each (bucket, salt) group lands
    # in its own small task (70 s). AQE coalesces the excess on small
    # inputs, so over-partitioning is free.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = spark.conf.get("spark.sql.files.openCostInBytes")

    # --- task granularity, adaptive to cluster size AND data size --------
    # Both knobs below were measured to dominate 2-vs-8-core scaling when
    # fixed: a 128 MB split target serializes the tokenize map into ~9
    # tasks (one 35-40 s straggler each pass), while a constant 256-way
    # everything makes a 2-core build pay ~700 task overheads. Targets:
    # ~4 waves of map tasks per core, and encode partitions sized by
    # positions volume (spill safety at scale) but floored by parallelism.
    cores = spark.sparkContext.defaultParallelism
    docs_bytes = 0
    for root, _dirs, files in os.walk(docs_path):
        docs_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    split_bytes = min(max(docs_bytes // max(4 * cores, 1), 4 << 20), 128 << 20)
    # Upper bound: one (bucket, salt) group is the unsplittable encode
    # unit, so partitions beyond n_buckets*n_salts cannot add parallelism.
    n_enc = int(
        min(
            max(4 * cores, (docs_bytes * 2) >> 26),  # ~2x text bytes / 64 MB
            max(n_buckets * n_salts, 4 * cores),
        )
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n_enc))
    # The encode shuffle is deliberately partitioned as computed above; AQE
    # coalescing would fold it back to ~core-count partitions (measured: 9
    # tasks from 256 configured at 160k docs, one 28 s straggler), which
    # destroys scaling. Skew-join splitting stays on.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
    # low open-cost so many small files pack densely instead of inflating
    # the split count on tiny corpora
    spark.conf.set("spark.sql.files.openCostInBytes", str(256 << 10))
    try:
        for shard in range(n_shards):
            if shard in done:
                continue
            t0 = time.time()
            _phase(f"shard {shard} encode")
            part = postings.filter(F.col("_bucket") % n_shards == shard).drop("_bucket")
            encoded = build_segments(part, n_buckets, n_salts, salt_threshold)
            # Layout shuffle before the write: the encode runs WIDE
            # (hundreds of partitions — see the conf block above), but a
            # point-lookup query pays a parquet footer read per segment
            # FILE (measured: 256 files pushed query p50 from 25 ms to
            # 230 ms). Re-shuffle the (compact, already-compressed) blobs
            # into a few files keyed by CONTIGUOUS bucket ranges, sorted
            # by (bucket, term_id), so bucket-pruned fetches touch one
            # file and row-group/page stats stay tight. At real scale this
            # becomes a bucketed table (bucketBy) instead.
            n_files = max(8, min(32, n_buckets))
            fid = F.expr(f"int(bucket * {n_files} / {n_buckets})")

            def _layout(df: DataFrame) -> DataFrame:
                return df.repartition(n_files, fid).sortWithinPartitions(
                    "bucket", "term_id"
                )

            out = os.path.join(index_dir, "segments", f"shard={shard}")
            if merge_hot:
                # persist between encode and merge: merge_salted's plan
                # refers to its input three times (multi-term detection
                # aggregate + both join sides) — without the persist the
                # encode kernel runs 3x. Layout applies to the MERGED rows
                # (the written form), not the pre-merge intermediate.
                from pyspark import StorageLevel

                encoded = encoded.persist(StorageLevel.MEMORY_AND_DISK)
                _layout(merge_salted(encoded)).write.mode("overwrite").parquet(out)
                encoded.unpersist()
            else:
                # Default: salted sub-segments stay on disk as-is
                # (Lucene-style — indexes need not be fully fused). With
                # this engine's bigram vocabulary (~4k ASCII pairs), at
                # corpus scale EVERY term is hot, and fusing a term's
                # sub-segments is a single task of O(df) — the one
                # non-parallelizable step. The query path read-merges a
                # term's parts at fetch (LRU-cached), so skipping the fuse
                # trades a per-term constant at query time for a fully
                # parallel build.
                _layout(encoded).write.mode("overwrite").parquet(out)
            _mark(f"shard {shard} segments write")
            entry = {
                "shard": shard,
                "status": "complete",
                "fingerprint": fp,
                "wall_ms": int((time.time() - t0) * 1000),
            }
            if collect_stats:
                # one extra job per shard — skipped on the fast path, the
                # resume contract only needs status+fingerprint
                stats = spark.read.parquet(out).agg(
                    F.count("*").alias("n_terms"),
                    F.sum("df").alias("n_postings"),
                    F.sum(F.length("blob")).alias("blob_bytes"),
                ).collect()[0]
                entry.update(
                    n_terms=stats["n_terms"],
                    n_postings=int(stats["n_postings"] or 0),
                    blob_bytes=int(stats["blob_bytes"] or 0),
                )
            with open(_manifest_path(index_dir), "a") as f:
                f.write(json.dumps(entry) + "\n")
        # lexicon derives from final segments; hot terms may have one row
        # per salt, so aggregate (exact: a doc lives in exactly one salt)
        seg_all = spark.read.option("basePath", os.path.join(index_dir, "segments")).parquet(
            os.path.join(index_dir, "segments")
        )
        from .postings import _term_str

        _phase("lexicon")
        lex = (
            seg_all.groupBy("term_id", "bucket")
            .agg(F.sum("df").alias("df"), F.sum("ctf").alias("ctf"))
            .withColumn("term", _term_str(F.col("term_id")))
        )
        lex.write.mode("overwrite").parquet(os.path.join(index_dir, "lexicon"))
        _mark("lexicon write")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce
        )
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_open)

    meta = {
        "n_docs": n_docs,
        "n_buckets": n_buckets,
        "n_shards": n_shards,
        "fingerprint": fp,
        "avgdl": avgdl,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    # Everything (doc store, segments, lexicon, manifest) is durable now:
    # release the doc-id assignment's persisted intermediates so repeated
    # builds in one app don't accumulate executor storage (ADVICE r2).
    # Re-consuming the in-memory documents DF afterwards recomputes the
    # rank instead of reading cache — correct, just slower.
    release_assign_cache()
    return IndexMeta(n_docs, n_buckets, n_shards, fp, avgdl)


def empty_result_df(spark: SparkSession) -> DataFrame:
    """Empty (doc_id, score, rank) as limit(0) over a 1-row Arrow
    LocalRelation. Both ``createDataFrame([], schema)`` and an
    empty-pandas source compile to parallelized-RDD plans whose every
    collect() runs a real multi-task job (~300 ms measured); the folded
    local relation collects driver-side (~20 ms)."""
    pdf = pd.DataFrame(
        {
            "doc_id": np.zeros(1, np.int64),
            "score": np.zeros(1, np.float64),
            "rank": np.zeros(1, np.int64),
        }
    )
    return spark.createDataFrame(pdf).limit(0)


class LruCache:
    """Minimal LRU (reference: util/buffer.go:13-49, 100k entries). No TTL —
    entries are keyed to an immutable index handle, so they never go stale
    (an improvement over the reference's 60 s TTL, which exists only
    because its store mutates in place)."""

    def __init__(self, maxsize: int = 100_000) -> None:
        from collections import OrderedDict

        self._d: "OrderedDict[object, object]" = OrderedDict()
        self._maxsize = maxsize

    def __contains__(self, k) -> bool:
        return k in self._d

    def get(self, k):
        if k not in self._d:
            return None
        self._d.move_to_end(k)
        return self._d[k]

    def put(self, k, v) -> None:
        self._d[k] = v
        self._d.move_to_end(k)
        if len(self._d) > self._maxsize:
            self._d.popitem(last=False)


def _lexicon_dir(index_dir: str) -> str:
    """Resolve the live lexicon directory. Streaming indexes publish
    snapshot-safe versioned dirs (``lexicon_v<N>``) behind an atomically
    flipped ``LEXICON`` pointer file (``streaming.ingest.
    _write_gen_lexicon``); batch ``write_index`` dirs keep the flat
    ``lexicon`` layout (single writer, written once)."""
    ptr = os.path.join(index_dir, "LEXICON")
    if os.path.exists(ptr):
        with open(ptr) as f:
            return os.path.join(index_dir, f.read().strip())
    return os.path.join(index_dir, "lexicon")


@dataclass
class DiskIndex:
    """Handle to a persisted index. DataFrame handles are created once
    (file listing + schema resolution are not free); term segments and
    site-filter results are LRU-cached — the disk analog of the
    reference's LRU-fronted BoltDB accessors (boltdb-index.go:82-113)."""

    spark: SparkSession
    index_dir: str
    meta: IndexMeta

    def __post_init__(self) -> None:
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "documents"))
        if "gen" in docs.columns:  # streaming doc store: generation-keyed dirs
            docs = docs.drop("gen")
        self._documents = docs
        self._lexicon = self.spark.read.parquet(_lexicon_dir(self.index_dir))
        self._segments = self.spark.read.option(
            "basePath", os.path.join(self.index_dir, "segments")
        ).parquet(os.path.join(self.index_dir, "segments"))
        self.segment_cache = LruCache(100_000)
        self.df_cache = LruCache(1_000_000)  # term_id -> df (metadata only)
        self.site_cache = LruCache(10_000)
        self.site_count_cache = LruCache(100_000)  # site -> doc count (one long)
        self.result_cache = LruCache(10_000)
        self._empty_result = None
        self._dl = None

    def clear_caches(self) -> None:
        """Drop the per-query LRUs (segments, df metadata, site filters,
        results) so the next query pays the cold fetch path. Load-time
        state survives: the DataFrame handles, meta, and the dl sidecar
        (``_dl``) are index-load costs, not per-query costs. Used by
        bench.py to time COLD queries between reps (ADVICE r2)."""
        self.segment_cache = LruCache(100_000)
        self.df_cache = LruCache(1_000_000)
        self.site_cache = LruCache(10_000)
        self.site_count_cache = LruCache(100_000)
        self.result_cache = LruCache(10_000)

    def prime(self, term_ids: list[int] | None = None) -> int:
        """Prefetch term df metadata into the driver LRU in ONE
        metadata-only job (verdict r4 #7 — the cold-query floor).

        A cold query pays two Spark jobs: the df metadata scan
        (``wand._df_of_terms``) and the blob fetch; both are dominated by
        fixed job overhead at serving latency. Priming moves the first
        one to index-load time, so a cold query's critical path is the
        blob fetch alone.

        ``term_ids=None`` primes the ENTIRE lexicon's (term_id, df)
        pairs — one groupBy over the segment METADATA columns (the
        parquet reader never touches blob bytes). Viable while the
        lexicon fits the 1M-entry LRU (sf0.1: ~100k bigrams; the CJK
        bigram space itself is bounded); at a 100-TB lexicon pass the
        term_ids of the serving query log instead, which routes through
        the same bucket-pruned scan as a query. Returns the number of
        terms primed. Absent terms still miss (only present terms have
        metadata rows); ``clear_caches`` drops primed state like any
        other cache."""
        if term_ids is not None:
            from .wand import _df_of_terms

            return len(_df_of_terms(self, term_ids))
        rows = (
            self._segments.groupBy("term_id")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        for r in rows:
            self.df_cache.put(int(r["term_id"]), int(r["df"]))
        return len(rows)

    def doc_length_df(self) -> DataFrame:
        """(doc_id, dl) as a DataFrame — the doc-partitioned BM25 length
        sidecar. This is what the EXECUTOR-SIDE scoring path joins against
        (never collected); reads the ``dl`` column written by
        ``write_index``, falling back to the token-count expression for
        pre-dl index dirs."""
        docs = self._documents
        if "dl" in docs.columns:
            return docs.select("doc_id", "dl")
        return docs.select("doc_id", doc_length_expr())

    def doc_lengths(self):
        """(doc_ids sorted asc, dl) int64 arrays — BM25 length norm.

        Reads the ``dl`` column written by ``write_index`` (falls back to
        computing the token-count expression for pre-dl index dirs). The
        whole column is held driver-side (16 bytes/doc) — which is why the
        score-ordered query family only uses this below the
        ``wand.MAX_DRIVER_DOCS`` valve; above it the distributed twin
        joins ``doc_length_df`` executor-side and the driver never holds
        more than the k winners.
        """
        if self._dl is None:
            import numpy as _np

            docs = self._documents
            if "dl" in docs.columns:
                sel = docs.select("doc_id", "dl")
            else:
                sel = docs.select("doc_id", doc_length_expr())
            rows = sel.collect()
            ids = _np.array([r["doc_id"] for r in rows], _np.int64)
            dl = _np.array([r["dl"] for r in rows], _np.int64)
            order = _np.argsort(ids)
            self._dl = (ids[order], dl[order])
        return self._dl

    def avgdl(self) -> float:
        if self.meta.avgdl > 0:
            return self.meta.avgdl
        if self._dl is not None:  # driver sidecar already resident — free
            dl = self._dl[1]
            return float(dl.mean()) if dl.size else 0.0
        # pre-avgdl meta dirs: ONE scalar to the driver. The old fallback
        # went through doc_lengths(), collecting the whole dl column —
        # exactly the O(n_docs) driver cost the distributed scoring route
        # exists to avoid (ADVICE r3).
        row = self.doc_length_df().agg(F.avg("dl").alias("_a")).collect()[0]
        return float(row["_a"] or 0.0)

    def empty_result(self) -> DataFrame:
        """Shared empty (doc_id, score, rank).

        See ``empty_result_df`` for why it is NOT ``createDataFrame([],
        schema)``."""
        if self._empty_result is None:
            self._empty_result = empty_result_df(self.spark)
        return self._empty_result

    @property
    def documents(self) -> DataFrame:
        return self._documents

    @property
    def lexicon(self) -> DataFrame:
        return self._lexicon

    @property
    def segments(self) -> DataFrame:
        return self._segments


def load_index(spark: SparkSession, index_dir: str) -> DiskIndex:
    with open(os.path.join(index_dir, "meta.json")) as f:
        m = json.load(f)
    return DiskIndex(
        spark,
        index_dir,
        IndexMeta(
            m["n_docs"],
            m["n_buckets"],
            m["n_shards"],
            m["fingerprint"],
            float(m.get("avgdl", 0.0)),
        ),
    )


def index_stats(di: DiskIndex) -> DataFrame:
    """Monitor stats from index METADATA only — the Spark analog of the
    reference's ``/monitor`` endpoint (index/api/api.go:31-40:
    ``IndexedDocCount`` / ``TokenCount`` / ``IndexFileSize``; the host
    CPU/memory gauges there are the cluster manager's job under Spark).

    Everything is served off control-plane artifacts, never posting
    blobs: ``meta.json`` (n_docs, avgdl, layout), ``manifest.jsonl``
    per-shard metrics (n_postings / blob_bytes, written by
    ``write_index(collect_stats=True)``), and the lexicon table
    (n_terms / total_ctf / max_df — a parquet metadata-sized aggregate),
    plus one executor-side SUM over the doc store's ``dl`` column for
    total_dl. At 10^12 docs this is one column scan + three O(1) folds;
    nothing scales with postings size.

    Returns a single row:
      n_docs, n_terms, n_postings, total_ctf, max_df, total_dl  (BIGINT —
        all recountable from the raw corpus, which is how the driver
        oracle value-checks the monitor path end to end)
      avgdl (DOUBLE), n_buckets, n_shards, shards_complete, blob_bytes
        (layout/codec facts — asserted internally by pytest instead:
        blob_bytes matches the manifest, avgdl == total_dl / n_docs).
    """
    man = read_manifest(di.index_dir)
    complete = [m for m in man.values() if m.get("status") == "complete"]
    if complete and all("n_postings" in m for m in complete):
        n_postings = sum(int(m["n_postings"]) for m in complete)
        blob_bytes = sum(int(m.get("blob_bytes", 0)) for m in complete)
    else:  # index built with collect_stats=False: same number via the
        # lexicon (df is salt-aggregated, a doc lives in exactly one salt)
        n_postings = int(
            di.lexicon.agg(F.sum("df").alias("s")).collect()[0]["s"] or 0
        )
        blob_bytes = 0
    lex = di.lexicon.agg(
        F.count("*").alias("n_terms"),
        F.sum("ctf").alias("total_ctf"),
        F.max("df").alias("max_df"),
    ).collect()[0]
    total_dl = int(
        di.doc_length_df().agg(F.sum("dl").alias("s")).collect()[0]["s"] or 0
    )
    row = (
        int(di.meta.n_docs),
        int(lex["n_terms"]),
        int(n_postings),
        int(lex["total_ctf"] or 0),
        int(lex["max_df"] or 0),
        total_dl,
        float(di.meta.avgdl),
        int(di.meta.n_buckets),
        int(di.meta.n_shards),
        len(complete),
        blob_bytes,
    )
    return di.spark.createDataFrame(
        [row],
        "n_docs bigint, n_terms bigint, n_postings bigint, total_ctf bigint, "
        "max_df bigint, total_dl bigint, avgdl double, n_buckets bigint, "
        "n_shards bigint, shards_complete bigint, blob_bytes bigint",
    )
