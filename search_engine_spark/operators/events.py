"""Event-table operators: time-windowed aggregation (batch form).

The reference has no streaming surface (SURVEY §2.10) — its ingest is a
push feed with batched flush. We provide the batch windowed aggregation
here (oracle-checkable) and the Structured Streaming twin in
``streaming/ingest.py`` (same logic under readStream + watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type:
    (hour string, event_type, n_events, sum_value, n_users).

    The hour is formatted as a string so the oracle comparison is
    timezone-representation-proof. One shuffle on (hour, event_type);
    partial aggregation is map-side (Catalyst).
    """
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        events.groupBy(hour.alias("hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session assignment per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``.

    (user_id, session_id, session_start string, n_events).
    Window over (user_id ORDER BY ts) — partitioned by user, so the state
    per task is one user's timeline; no skew for uniform user activity.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts = F.col("ts").cast("timestamp")  # testdata ts is TIMESTAMP_NTZ; session tz is UTC
    prev_ts = F.lag(ts).over(w)
    gap_us = F.unix_micros(ts) - F.unix_micros(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    with_sess = events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(wsum).cast("long")
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count("*").alias("n_events"),
        )
    )
