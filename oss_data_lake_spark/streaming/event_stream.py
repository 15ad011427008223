"""Streaming re-expression of the batch event-window operators (E6 stretch,
SURVEY.md §2.B "Streaming").

``readStream`` over a parquet landing directory → watermarked tumbling-window
aggregation → sink. The batch query ``e50_tumbling_hourly`` and this
streaming query compute the same logical result; streaming executes it
incrementally with state eviction at the watermark.

At scale: the landing dir becomes a Kafka/queue source; the window state
lives in the state store keyed by (window, event_type) — bounded by
watermark horizon × key cardinality, independent of total stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.schemas import EVENTS

# Explicit stream schema (file streams require one): ``ts timestamp`` makes
# the reader truncate the fixture's TIMESTAMP(NANOS) to microsecond LTZ —
# same values the batch loaders produce under a UTC session. (An explicit
# ``ts long`` is reader-generation-dependent: older readers surface raw
# nanos, newer ones micros — never declare it.)
_EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def hourly_counts_stream(
    spark: SparkSession,
    landing_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling 1-hour counts per event type with late-data bound.

    The fixture's ns-grain ``ts`` is declared ``timestamp`` in the stream
    schema: the parquet reader truncates TIMESTAMP(NANOS) to microseconds
    and, with the session pinned to UTC, yields the same wall-clock values
    as the batch loaders — no post-read conversion column.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.readStream.schema(_EVENTS_STREAM_SCHEMA).parquet(landing_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drive a bounded streaming query to completion against a memory sink
    (test/dev harness; production uses a real sink + trigger)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


__all__ = ["hourly_counts_stream", "run_to_completion", "EVENTS"]


def dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the ingestion-time dedup stage of a streaming LLM-data pipeline
    (at-least-once sources redeliver; this makes the landed stream
    effectively exactly-once per key).

    ``dropDuplicatesWithinWatermark`` keeps one state row per key and
    EVICTS it once the watermark passes — bounded state, unlike plain
    ``dropDuplicates`` on a stream, whose key state grows forever. At
    100 TB/day the state store holds only horizon × arrival-rate keys,
    sharded by key hash across executors."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.readStream.schema(_EVENTS_STREAM_SCHEMA).parquet(landing_dir)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def attribution_join_stream(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    horizon: str = "30 minutes",
) -> DataFrame:
    """STREAM-STREAM inner join with a time-range condition (the canonical
    Structured Streaming attribution shape): every purchase joined to the
    same user's clicks in the preceding ``horizon``.

    Both sides carry watermarks and the join condition bounds click_ts to
    a window ending at purchase_ts, so Spark derives state-eviction
    bounds for BOTH buffers: each side's state holds only horizon-deep
    rows per user — bounded by horizon x arrival rate, independent of
    stream length. Without the time bound a stream-stream join must
    buffer one side forever; this formulation is the scale-safe one.

    Output (append-mode): one row per (purchase, attributed click)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def _side(path: str, etype: str, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(_EVENTS_STREAM_SCHEMA)
            .parquet(path)
            .filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("value").alias(f"{prefix}_value"),
            )
            .withWatermark(f"{prefix}_ts", "2 hours")
        )

    clicks = _side(clicks_dir, "click", "click")
    purchases = _side(purchases_dir, "purchase", "purchase")
    cond = (
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return purchases.join(clicks, on=cond, how="inner").select(
        "purchase_id", "purchase_user", "purchase_ts", "purchase_value",
        "click_id", "click_ts", "click_value",
    )


def run_to_completion_append(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Append-mode twin of ``run_to_completion`` (stream-stream joins and
    per-row stages emit in append mode, never complete)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
