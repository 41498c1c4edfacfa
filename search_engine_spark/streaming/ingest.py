"""Structured Streaming ingest: continuous index build + windowed events.

The reference's ingest is an unbounded HTTP push feed consumed by worker
pools with a batched flush every 1000 docs (``index/core/indexer.go:
224-283``, SURVEY §2.10) — operationally a micro-batch stream. This module
is the Spark-idiomatic twin:

- ``stream_documents`` + ``start_incremental_index``: readStream →
  foreachBatch. Every micro-batch becomes an immutable segment
  GENERATION under ``segments/gen=<batch_id>/`` (the LSM analog of the
  reference's flush; its read-merge-write BoltDB upsert becomes
  append-only writes + read-merge at query time + explicit compaction).
  The query path (``wand.fetch_term_segments``) merges a term's
  generations on fetch, so the index is searchable at any moment without
  blocking ingest.
- ``compact_index``: fold all generations into one (periodic maintenance
  job — the analog of a full merge; bounded by groupBy(term_id) +
  partition-local sort-merge, same kernel as the salted-segment merge).
- ``windowed_event_counts``: watermarked tumbling-window aggregation —
  the streaming twin of ``operators/events.hourly_event_stats`` (same
  output schema, late rows beyond the watermark dropped).
- ``sessionize_stream``: custom stateful operator
  (``applyInPandasWithState`` + event-time timeout) — the streaming twin
  of ``operators/events.sessionize`` with O(active users) state.

Exactly-once notes: foreachBatch gives at-least-once; the per-generation
directory is keyed by ``batch_id``, so a replayed batch OVERWRITES its own
generation (idempotent), and ``meta.json`` is recomputed from the
manifest rather than incremented (no double counting).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.postings import build_postings
from ..operators.segments import (
    build_segments,
    corpus_fingerprint,
    merge_salted,
    _manifest_path,
)

DOCUMENTS_SCHEMA = (
    "doc_id long, url string, title string, body string, content_sha256 string"
)


def stream_documents(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-arrival document stream in the engine's documents shape.

    Each newly arriving parquet file under ``source_dir`` is one (or part
    of one) micro-batch — the stand-in for the reference's HTTP PUT feed
    (``index/api/api.go:68-91``)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def _write_meta(index_dir: str, n_buckets: int) -> None:
    """Recompute meta.json from the generation manifest (idempotent)."""
    gens: dict[int, dict] = {}
    if os.path.exists(_manifest_path(index_dir)):
        with open(_manifest_path(index_dir)) as f:
            for line in f:
                row = json.loads(line)
                if "gen" in row:
                    gens[row["gen"]] = row  # last write per gen wins
    n_docs = sum(g["n_docs"] for g in gens.values())
    meta = {
        "n_docs": n_docs,
        "n_buckets": n_buckets,
        "n_shards": 1,
        "fingerprint": "streaming:" + ":".join(
            g.get("fingerprint", "?") for _, g in sorted(gens.items())
        ),
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)


def _check_doc_store_layout(index_dir: str) -> None:
    """Reject pre-round-2 FLAT doc stores (part files directly under
    ``documents/``): mixing them with the gen=N generation directories
    makes Spark partition discovery fail with a conflicting-structure
    error mid-read. Failing eagerly with a rebuild message is the
    recoverable behavior (ADVICE r2)."""
    docs_dir = os.path.join(index_dir, "documents")
    if not os.path.isdir(docs_dir):
        return
    flat = [
        f
        for f in os.listdir(docs_dir)
        if f.startswith("part-") and os.path.isfile(os.path.join(docs_dir, f))
    ]
    if flat:
        raise ValueError(
            f"{docs_dir} uses the legacy flat doc-store layout "
            f"({len(flat)} part files, e.g. {flat[0]}); streaming ingest "
            "now writes generation-keyed documents/gen=N/ directories and "
            "cannot mix with flat files. Rebuild the index directory, or "
            "move the existing part files into documents/gen=0/."
        )


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    n_buckets: int = 16,
    n_salts: int = 4,
    salt_threshold: int = 250_000,
) -> None:
    """foreachBatch body: one micro-batch -> one segment generation."""
    _check_doc_store_layout(index_dir)
    spark = batch_df.sparkSession
    t0 = time.time()
    batch_df = batch_df.cache()
    n = batch_df.count()
    if n == 0:
        batch_df.unpersist()
        return
    fp = corpus_fingerprint(batch_df)
    from pyspark import StorageLevel

    # persist between encode and merge — merge_salted references its input
    # 3x (see write_index); without this the encode kernel runs per branch
    from ..operators.postings import build_postings_packed

    encoded = build_segments(
        build_postings_packed(batch_df), n_buckets, n_salts, salt_threshold
    ).persist(StorageLevel.MEMORY_AND_DISK)
    seg = merge_salted(encoded)
    gen_dir = os.path.join(index_dir, "segments", f"gen={batch_id}")
    from pyspark.sql import Observation

    obs = Observation(f"seg_stats_{batch_id}")
    # manifest stats ride the segment write (no separate re-read job)
    seg.observe(
        obs, F.count(F.lit(1)).alias("n_terms"), F.sum("df").alias("n_postings")
    ).write.mode("overwrite").parquet(gen_dir)  # replay-idempotent
    encoded.unpersist()
    # doc store is generation-keyed like the segments: a replayed batch
    # OVERWRITES its own generation instead of appending duplicate rows
    # (exactly-once for the doc store too; readers drop the gen column)
    batch_df.write.mode("overwrite").parquet(
        os.path.join(index_dir, "documents", f"gen={batch_id}")
    )
    stats = obs.get
    os.makedirs(index_dir, exist_ok=True)
    with open(_manifest_path(index_dir), "a") as f:
        f.write(
            json.dumps(
                {
                    "gen": batch_id,
                    "status": "complete",
                    "fingerprint": fp,
                    "n_docs": n,
                    "n_terms": stats["n_terms"],
                    "n_postings": int(stats["n_postings"] or 0),
                    "wall_ms": int((time.time() - t0) * 1000),
                }
            )
            + "\n"
        )
    _write_meta(index_dir, n_buckets)
    _write_gen_lexicon(spark, index_dir)
    batch_df.unpersist()


def _write_gen_lexicon(spark: SparkSession, index_dir: str) -> None:
    """Global lexicon = per-term sum over generations (small: one row per
    distinct term).

    Scale note: this rescans every generation's segment METADATA columns
    (term_id/bucket/df/ctf — parquet-pruned, blobs untouched) per batch,
    so per-batch cost grows with the number of live generations, not with
    index bytes. Compaction (``compact_index``) folds generations and
    bounds that number — the standard LSM answer; with compaction every K
    batches the rescan is O(compacted base + K gens) of metadata rows.
    A replayed batch overwrites its own gen and the recompute stays
    exactly-once (an incremental old⊕new merge would double-count
    replays, which is why the full fold is the replay-safe choice)."""
    from ..operators.postings import _term_str

    seg_all = spark.read.option(
        "basePath", os.path.join(index_dir, "segments")
    ).parquet(os.path.join(index_dir, "segments"))
    lex = (
        seg_all.groupBy("term_id", "bucket")
        .agg(F.sum("df").alias("df"), F.sum("ctf").alias("ctf"))
        .withColumn("term", _term_str(F.col("term_id")))
    )
    tmp = os.path.join(index_dir, "_lexicon_tmp")
    final = os.path.join(index_dir, "lexicon")
    lex.write.mode("overwrite").parquet(tmp)
    import shutil

    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def start_incremental_index(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str | None = None,
    n_buckets: int = 16,
    n_salts: int = 4,
    salt_threshold: int = 250_000,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the continuous index build. ``available_now=True`` drains the
    current backlog then stops (batch-test mode); False runs forever."""
    os.makedirs(index_dir, exist_ok=True)
    writer = docs_stream.writeStream.foreachBatch(
        lambda bdf, bid: ingest_batch(
            bdf, bid, index_dir, n_buckets, n_salts, salt_threshold
        )
    ).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(index_dir, "_checkpoint"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_index(spark: SparkSession, index_dir: str) -> None:
    """Fold all generations into generation 0 (LSM compaction).

    groupBy(term_id) → partition-local sort-merge re-encode (the same
    kernel as the salted merge). Afterward every term has exactly one
    segment row, so query fetches stop paying the read-merge."""
    import shutil

    from ..operators.segments import SEGMENT_SCHEMA, _merge_kernel

    seg_root = os.path.join(index_dir, "segments")
    seg_all = spark.read.option("basePath", seg_root).parquet(seg_root)
    merged = seg_all.drop("gen").groupBy("term_id").applyInPandas(
        _merge_kernel, SEGMENT_SCHEMA
    )
    tmp = os.path.join(index_dir, "_segments_tmp")
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "gen=0"))
    shutil.rmtree(seg_root)
    os.rename(tmp, seg_root)
    _write_gen_lexicon(spark, index_dir)


def windowed_event_counts(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling 1-hour window per event_type — streaming twin
    of ``operators/events.hourly_event_stats`` (same columns; countDistinct
    is replaced by approx_count_distinct, the streaming-legal form)."""
    # watermarks require TIMESTAMP (testdata ts is TIMESTAMP_NTZ; the
    # session tz is UTC so the cast is representation-stable)
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("_w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("_w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, session_start string, n_events long"
)
# open-session state per user: ordinal of the OPEN session, its start and
# last-event micros, its event count
SESSION_STATE_SCHEMA = "sid long, start_us long, last_us long, n long"


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming sessionization — the custom-stateful-operator
    twin of ``operators/events.sessionize`` (same output schema and the
    same gap rule), built on ``applyInPandasWithState``.

    State per ``user_id`` is ONE open session (ordinal, start, last-event
    time, count). A batch's events for the user are folded in (ts,
    event_id) order: an event whose gap from the open session's last
    event exceeds ``gap_minutes`` EMITS the open session (append mode)
    and opens the next; an event-time timeout (watermark passing
    last_ts + gap) emits a session no further event can ever join —
    late rows beyond the watermark are dropped by the engine, which is
    exactly the invariant that makes the emitted session final.

    Scale shape: state is O(active users) × one row; each micro-batch
    shuffles only that batch's events on user_id. Session ordinals match
    the batch operator's when arrivals are time-ordered per user (the
    deterministic-replay case; out-of-order arrivals WITHIN the watermark
    still sessionize correctly against the open session, but an event
    older than an already-emitted session boundary cannot reopen it —
    the streaming-vs-batch divergence every gap-sessionizer has).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        out = []

        def emit(sid, start_us, n):
            out.append(
                (
                    user_id,
                    sid,
                    pd.Timestamp(start_us, unit="us").strftime("%Y-%m-%d %H:%M:%S"),
                    n,
                )
            )

        if state.hasTimedOut:
            sid, start_us, last_us, n = state.get
            emit(sid, start_us, n)
            # keep the ordinal so the NEXT session continues the count;
            # n=0 marks "no open session"
            state.update((sid, start_us, last_us, 0))
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["ts", "event_id"])
            ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
            if state.exists:
                sid, start_us, last_us, n = state.get
            else:
                sid, start_us, last_us, n = 0, 0, 0, 0
            for t in ts_us:
                if n == 0:  # no open session
                    sid, start_us, last_us, n = sid + 1, int(t), int(t), 1
                elif t - last_us > gap_us:
                    emit(sid, start_us, n)
                    sid, start_us, last_us, n = sid + 1, int(t), int(t), 1
                else:
                    last_us, n = int(t), n + 1
            state.update((sid, start_us, last_us, n))
            if n > 0:
                # close the open session once no in-watermark event can
                # extend it (timeout timestamps are in ms)
                state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "session_start", "n_events"]
        )

    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
