"""Tier C EXT — event-time windowing on the events table (SURVEY.md §2.C E6).

Batch formulations here (tumbling windows via ``F.window``, sessionization
via lag/cumsum); the Structured Streaming equivalents live in
``oss_data_lake_spark/streaming/`` (same logical result, incremental
execution). The reference has no streaming at all — its ingest DAG is a
manually-triggered batch (reference dags/yfinance_to_minio.py:99
``schedule_interval=None``) — so these are pure extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import davg, dsum, sql_davg, sql_dsum
from oss_data_lake_spark.sources.loaders import load_table

SESSION_GAP_SECONDS = 1800


def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: 1-hour tumbling window counts/sums per event type. ``F.window``
    assigns epoch-aligned buckets — identical to date_trunc('hour') for a
    1-hour tumble, which is what the DuckDB oracle uses."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("hour_start", "event_type")
    )


def sessionize(
    events: DataFrame, key: str = "user_id", gap_s: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Gap-based sessionization: new session when the micro-exact gap to the
    previous event exceeds ``gap_s``. Returns events + session_id.

    One shuffle (window on key); session_id = running sum of boundary flags —
    the standard lag/cumsum composition, fully JVM-side."""
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    boundary = F.when(gap > gap_s * 1_000_000, 1).otherwise(0)
    running = Window.partitionBy(key).orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn("__b", boundary).withColumn(
        "session_id", F.sum("__b").over(running)
    ).drop("__b")


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 sessionization query: per-user session count + avg session length
    (in events)."""
    events = load_table(spark, sf_dir, "events")
    sess = sessionize(events)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            davg("n_events", "avg_session_events"),
        )
        .orderBy("user_id")
    )


QUERIES = {
    "e50_tumbling_hourly": tumbling_hourly,
    "e51_session_stats": session_stats,
}

ORACLES = {
    "e50_tumbling_hourly": f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, COUNT(*) AS n, {sql_dsum("value")} AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type
    """,
    "e51_session_stats": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                             - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                             > {SESSION_GAP_SECONDS} * 1000000
                        THEN 1 ELSE 0 END AS b
            FROM events),
        sessions AS (
            SELECT user_id, event_id,
                   SUM(b) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged),
        per_session AS (
            SELECT user_id, session_id, COUNT(*) AS n_events
            FROM sessions GROUP BY 1, 2)
        SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
               {sql_davg("n_events")} AS avg_session_events
        FROM per_session GROUP BY user_id ORDER BY user_id
    """,
}
