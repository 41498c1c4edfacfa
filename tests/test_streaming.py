"""Streaming ingest: incremental generations == one-shot batch index;
compaction preserves results; windowed event stream matches batch aggs."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.postings import build_documents_from_testdata
from search_engine_spark.operators.segments import load_index, write_index
from search_engine_spark.operators.wand import search_segments
from search_engine_spark.streaming.ingest import (
    compact_index,
    start_incremental_index,
    stream_documents,
    windowed_event_counts,
)

QUERIES = ["table", "table spark", "dup", "table -dup"]


@pytest.fixture(scope="module")
def tmp_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("streaming"))


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_root):
    docs = build_documents_from_testdata(spark, sf_dir)
    arrivals = os.path.join(tmp_root, "arrivals")
    docs.repartition(3).write.parquet(arrivals)

    stream_dir = os.path.join(tmp_root, "stream_index")
    q = start_incremental_index(
        stream_documents(spark, arrivals), stream_dir, n_buckets=8, n_salts=2
    )
    q.awaitTermination(300)

    batch_dir = os.path.join(tmp_root, "batch_index")
    write_index(docs, batch_dir, n_buckets=8, n_shards=1, n_salts=2)
    return stream_dir, batch_dir


def _results(spark, index_dir, query):
    di = load_index(spark, index_dir)
    return [
        (r.doc_id, round(r.score, 9), r.rank)
        for r in search_segments(di, query).collect()
    ]


def test_stream_has_generations(spark, built):
    stream_dir, _ = built
    gens = [d for d in os.listdir(os.path.join(stream_dir, "segments")) if d.startswith("gen=")]
    assert len(gens) == 3  # maxFilesPerTrigger=1 over 3 files


@pytest.mark.parametrize("query", QUERIES)
def test_incremental_equals_batch(spark, built, query):
    stream_dir, batch_dir = built
    assert _results(spark, stream_dir, query) == _results(spark, batch_dir, query)


def test_meta_counts(spark, built, sf_dir):
    stream_dir, _ = built
    di = load_index(spark, stream_dir)
    n = build_documents_from_testdata(spark, sf_dir).count()
    assert di.meta.n_docs == n
    assert di.documents.count() == n


def test_compaction_preserves_results(spark, built):
    stream_dir, batch_dir = built
    compacted = stream_dir + "_compacted"
    if os.path.exists(compacted):
        shutil.rmtree(compacted)
    shutil.copytree(stream_dir, compacted)
    compact_index(spark, compacted)
    seg = load_index(spark, compacted).segments
    # exactly one row per term after compaction
    assert seg.groupBy("term_id").count().filter(F.col("count") > 1).count() == 0
    for query in QUERIES:
        assert _results(spark, compacted, query) == _results(spark, batch_dir, query)


def test_replayed_batch_is_idempotent(spark, built, sf_dir):
    """Re-running a generation (at-least-once replay) must not change
    results or double-count docs."""
    from search_engine_spark.streaming.ingest import ingest_batch

    stream_dir, batch_dir = built
    docs = build_documents_from_testdata(spark, sf_dir)
    # replay generation 0 with the same docs subset it originally got is
    # not reconstructible; instead replay the WHOLE corpus as gen 99 twice
    replay_dir = stream_dir + "_replay"
    if os.path.exists(replay_dir):
        shutil.rmtree(replay_dir)
    os.makedirs(replay_dir)
    ingest_batch(docs, 0, replay_dir, n_buckets=8, n_salts=2)
    before = _results(spark, replay_dir, "table")
    ingest_batch(docs, 0, replay_dir, n_buckets=8, n_salts=2)  # replay
    di = load_index(spark, replay_dir)
    assert di.meta.n_docs == docs.count()  # manifest keyed by gen: no double count
    # doc store is generation-keyed too: the replay overwrites its own
    # gen dir instead of appending duplicate rows
    assert di.documents.count() == docs.count()
    assert _results(spark, replay_dir, "table") == before


def test_windowed_event_stream_matches_batch(spark, sf_dir, tmp_root):
    from search_engine_spark.operators.events import hourly_event_stats

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev_dir = os.path.join(tmp_root, "events_src")
    if not os.path.exists(ev_dir):
        os.makedirs(ev_dir)
        shutil.copy(f"{sf_dir}/events.parquet", os.path.join(ev_dir, "part-0.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(ev_dir)
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ev_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp_root, "ev_ck"))
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value, r.n_users)
        for r in spark.sql("select * from ev_stream").collect()
    }
    exp = {
        (r.hour, r.event_type): (r.n_events, r.sum_value, r.n_users)
        for r in hourly_event_stats(batch).collect()
    }
    # append mode only emits windows CLOSED by the watermark: windows whose
    # end > max(ts) - 2h stay in state when an availableNow run drains.
    import datetime

    max_ts = batch.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    threshold = max_ts - datetime.timedelta(hours=2)
    closed = {
        k
        for k in exp
        if datetime.datetime.fromisoformat(k[0]) + datetime.timedelta(hours=1)
        <= threshold
    }
    assert set(got) == closed
    assert len(closed) > 0
    for k in closed:
        n, s, u = exp[k]
        gn, gs, gu = got[k]
        assert gn == n and abs(gs - s) < 1e-6
        assert abs(gu - u) <= max(1, 0.15 * u)  # approx_count_distinct


def test_legacy_flat_doc_store_rejected(spark, sf_dir, tmp_root):
    """A pre-generation (flat part files under documents/) index dir must
    be rejected EAGERLY with a rebuild message — mixing flat files with
    gen=N subdirectories breaks Spark partition discovery mid-read
    (ADVICE r2)."""
    from search_engine_spark.streaming.ingest import ingest_batch

    legacy = os.path.join(tmp_root, "legacy_idx")
    docs_dir = os.path.join(legacy, "documents")
    os.makedirs(docs_dir, exist_ok=True)
    with open(os.path.join(docs_dir, "part-00000-legacy.parquet"), "wb") as f:
        f.write(b"PAR1")
    batch = build_documents_from_testdata(spark, sf_dir).limit(5)
    with pytest.raises(ValueError, match="legacy flat doc-store layout"):
        ingest_batch(batch, 0, legacy, n_buckets=4, n_salts=2)


def test_stateful_sessionize_stream_matches_batch(spark, sf_dir, tmp_root):
    """applyInPandasWithState sessionizer vs the batch gap rule.

    Events arrive time-ordered in 3 files; every session CLOSED by a
    successor session must be emitted, every emitted row must match the
    batch semantics exactly (same ordinals, starts, counts), and the
    pandas-derived oracle must itself agree with operators.events.
    sessionize (tying stream == pandas == batch)."""
    import pandas as pd

    from search_engine_spark.operators.events import sessionize
    from search_engine_spark.streaming.ingest import sessionize_stream

    gap_min = 30
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    src = os.path.join(tmp_root, "sess_src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(
        [pdf.iloc[: len(pdf) // 3], pdf.iloc[len(pdf) // 3 : 2 * len(pdf) // 3],
         pdf.iloc[2 * len(pdf) // 3 :]]
    ):
        chunk.to_parquet(os.path.join(src, f"part-{i}.parquet"))

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=gap_min)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmp_root, "sess_ck"))
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_id): (r.session_start, r.n_events)
        for r in spark.sql("select * from sess_stream").collect()
    }

    # pandas oracle: gap rule per user over the full data
    oracle: dict[tuple[int, int], tuple[str, int]] = {}
    last_sid: dict[int, int] = {}
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        sid, start, last, n = 0, None, None, 0
        for t in g["ts"]:
            if start is None or (t - last).total_seconds() > gap_min * 60:
                if start is not None:
                    oracle[(uid, sid)] = (start.strftime("%Y-%m-%d %H:%M:%S"), n)
                sid, start, last, n = sid + 1, t, t, 1
            else:
                last, n = t, n + 1
        oracle[(uid, sid)] = (start.strftime("%Y-%m-%d %H:%M:%S"), n)
        last_sid[uid] = sid

    # the pandas oracle IS the batch operator's output
    exp_batch = {
        (r.user_id, r.session_id): (r.session_start, r.n_events)
        for r in sessionize(batch, gap_minutes=gap_min).collect()
    }
    assert exp_batch == oracle

    closed = {k for k in oracle if k[1] < last_sid[k[0]]}
    assert len(closed) > 0
    assert closed <= set(got)  # every successor-closed session emitted
    assert set(got) <= set(oracle)  # nothing invented
    for k in got:
        assert got[k] == oracle[k], (k, got[k], oracle[k])
