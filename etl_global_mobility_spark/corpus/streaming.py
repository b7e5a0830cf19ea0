"""Streaming corpus: Structured Streaming queries run to completion
(availableNow) so the final memory-sink table equals the batch answer —
each is oracle-checked against plain SQL over the same events.

These exercise: file-source streaming scan, watermarks, tumbling
windows, session windows, and stateful dedup within the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_global_mobility_spark.corpus.base import QuerySpec
from etl_global_mobility_spark.streaming.ops import (
    interval_join_streams,
    run_stream_to_memory,
    session_window_counts,
    sliding_window_counts,
    stream_events,
    streaming_dedup_keys,
    tumbling_window_counts,
)


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(tumbling_window_counts(ev), "complete")


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(session_window_counts(ev), "complete")


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(sliding_window_counts(ev), "complete")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(
        streaming_dedup_keys(ev, ["user_id", "event_type"]), "append"
    )


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: view events joined to the same
    user's purchase events within 6 hours (two independent file-source
    streams; watermark + range condition bound the join state)."""
    a = stream_events(spark, sf_dir).filter("event_type = 'view'")
    b = stream_events(spark, sf_dir).filter("event_type = 'purchase'")
    return run_stream_to_memory(interval_join_streams(a, b), "append")


def q_stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running profile carried across micro-batches."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.streaming.stateful import user_profile_stream

    ev = stream_events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    return run_stream_to_memory(user_profile_stream(ev), "update")


def q_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source STREAM (sources/pysource.py): the
    deterministic generator read as offset-tracked micro-batches and
    drained; complete-mode aggregation equals the batch answer —
    values are dyadic rationals (k/8), so the sums are exact under any
    batch split."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.sources.pysource import register
    from etl_global_mobility_spark.streaming.ops import run_stream_until_idle

    register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 10_000)
        .option("batch_size", 2_500)
        .load()
    )
    return run_stream_until_idle(
        sdf.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        ),
        "complete",
    )


SPECS = [
    QuerySpec(
        "stream_tumbling_counts",
        q_stream_tumbling,
        """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
               CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS win_end,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2, 3""",
        doc="watermarked tumbling-window streaming aggregation",
    ),
    QuerySpec(
        "stream_session_windows",
        q_stream_session,
        """WITH flagged AS (
             SELECT user_id, ts,
                    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                              >= INTERVAL 5 MINUTE OR
                              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         THEN 1 ELSE 0 END AS new_sess
             FROM events
           ), sessioned AS (
             SELECT user_id, ts,
                    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sess_id
             FROM flagged
           )
           SELECT CAST(min(ts) AS TIMESTAMP) AS sess_start, user_id,
                  count(*) AS n_events
           FROM sessioned GROUP BY user_id, sess_id""",
        doc="session windows (5 min gap) vs SQL sessionization",
    ),
    QuerySpec(
        "stream_sliding_counts",
        q_stream_sliding,
        """WITH starts AS (
             SELECT event_type,
                    unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                            date_trunc('hour', ts)]) AS win_start
             FROM events)
           SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
                  count(*) AS n
           FROM starts GROUP BY 1, 2""",
        doc="sliding 2h/1h windows (each event in 2 windows)",
    ),
    QuerySpec(
        "stream_dedup_keys",
        q_stream_dedup,
        "SELECT DISTINCT user_id, event_type FROM events",
        doc="dropDuplicatesWithinWatermark stateful dedup",
    ),
    QuerySpec(
        "stream_stream_join",
        q_stream_stream_join,
        """SELECT a.user_id,
               CAST(a.ts AS TIMESTAMP) AS a_ts,
               CAST(b.ts AS TIMESTAMP) AS b_ts
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND a.event_type = 'view' AND b.event_type = 'purchase'
             AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR""",
        doc="watermarked stream-stream interval join (state bounded by gap)",
    ),
    QuerySpec(
        "stream_stateful_profile",
        q_stream_stateful_profile,
        """SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_value_millis,
               min(epoch_ns(ts) // 1000) AS first_us,
               max(epoch_ns(ts) // 1000) AS last_us
            FROM events GROUP BY user_id""",
        doc="custom stateful operator via applyInPandasWithState",
    ),
    QuerySpec(
        "stream_python_source",
        q_stream_python_source,
        """SELECT CAST(i % 8 AS INT) AS bucket,
               count(*) AS n_events,
               sum(CAST((i * 31) % 1000 AS DOUBLE) / 8.0) AS sum_value
           FROM range(10000) t(i) GROUP BY 1""",
        doc="custom Python streaming source (offset-tracked micro-batches, "
        "replayable readBetweenOffsets) drained to its batch answer",
    ),
]
