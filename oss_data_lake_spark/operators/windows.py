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


def gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E6 time-series resample + gap-fill (the classic finance shape the
    reference's OHLCV model implies: a trading series with holes, carried
    forward). Per user: collapse purchase events to one value per day
    (latest wins, event_id tiebreak), expand each user's [first, last] day
    range into a dense daily calendar (``sequence`` + ``explode``), forward-
    fill missing days with ``last(value, ignorenulls)``, and report
    per-user coverage + the decimal-exact sum of the filled series.

    At 100 TB: two key-partitioned shuffles (per-day collapse, per-user
    fill window) — the calendar explode multiplies rows only by the date
    span, stays distributed, and never touches the driver. A hot user is
    AQE-skew-splittable because the fill window needs only per-user
    ordering."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day_w = Window.partitionBy("user_id", "d").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        events.select(
            "user_id", F.to_date("ts").alias("d"), "ts", "event_id", "value"
        )
        .withColumn("rn", F.row_number().over(day_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "d", "value")
        .alias("daily")
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
        .alias("cal")
    )
    fill_w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = cal.join(
        daily,
        (F.col("cal.user_id") == F.col("daily.user_id"))
        & (F.col("cal.day") == F.col("daily.d")),
        "left",
    ).select(
        F.col("cal.user_id").alias("user_id"),
        "day",
        "value",
    ).withColumn("filled_value", F.last("value", ignorenulls=True).over(fill_w))
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.col("value").isNotNull().cast("long")).alias("n_event_days"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_gap_days"),
            dsum("filled_value", "sum_filled"),
        )
        .orderBy("user_id")
    )


QUERIES = {
    "e50_tumbling_hourly": tumbling_hourly,
    "e51_session_stats": session_stats,
    "e31_gapfill_daily": gapfill_daily,
}

ORACLES = {
    "e31_gapfill_daily": f"""
        WITH src AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tts,
                   CAST(ts AS DATE) AS d, value
            FROM events WHERE event_type = 'purchase'),
        ranked AS (
            SELECT user_id, d, value,
                   row_number() OVER (PARTITION BY user_id, d
                                      ORDER BY tts DESC, event_id DESC) AS rn
            FROM src),
        daily AS (SELECT user_id, d, value FROM ranked WHERE rn = 1),
        bounds AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1
                   FROM daily GROUP BY user_id),
        cal AS (SELECT user_id,
                       CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                                   CAST(d1 AS TIMESTAMP),
                                                   INTERVAL 1 DAY)) AS DATE) AS day
                FROM bounds),
        filled AS (
            SELECT c.user_id, c.day, d.value,
                   last_value(d.value IGNORE NULLS)
                     OVER (PARTITION BY c.user_id ORDER BY c.day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS filled_value
            FROM cal c LEFT JOIN daily d
              ON c.user_id = d.user_id AND c.day = d.d)
        SELECT user_id, COUNT(*) AS n_days,
               CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_event_days,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_gap_days,
               {sql_dsum("filled_value")} AS sum_filled
        FROM filled GROUP BY user_id ORDER BY user_id
    """,
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
