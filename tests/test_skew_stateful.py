"""Skew helpers (result-identical to unsalted ops) and stateful streaming
sessionization (cross-batch state continuity, pinned to batch sessionize)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oss_data_lake_spark.functions.skew import (
    salted_agg_count_sum,
    salted_broadcast_join,
)
from oss_data_lake_spark.operators.windows import sessionize
from oss_data_lake_spark.sources.loaders import load_table
from oss_data_lake_spark.streaming.stateful import sessionize_stateful


def test_salted_agg_equals_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: (r.n, round(r.sum_value, 6))
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    salted = {
        r.event_type: (r.n, round(r.sum_value, 6))
        for r in salted_agg_count_sum(events, "event_type", "value").collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = sorted(
        (r.o_orderkey, r.c_mktsegment)
        for r in orders.join(cust, "o_custkey").select("o_orderkey", "c_mktsegment").collect()
    )
    salted = sorted(
        (r.o_orderkey, r.c_mktsegment)
        for r in salted_broadcast_join(orders, cust, "o_custkey")
        .select("o_orderkey", "c_mktsegment")
        .collect()
    )
    assert plain == salted


def test_stateful_sessionization_across_batches(spark, sf_dir, tmp_path):
    """Feed events in two micro-batches; final state must equal the batch
    sessionization of the full dataset (cross-batch session continuity)."""
    events = load_table(spark, sf_dir, "events")
    half = events.approxQuantile("event_id", [0.5], 0.0)[0]

    landing = tmp_path / "landing"
    landing.mkdir()
    events.filter(F.col("event_id") <= half).coalesce(1).write.parquet(
        str(landing / "b1.parquet")
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing) + "/*/")
    )
    out = sessionize_stateful(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_state")
        .start()
    )
    try:
        q.processAllAvailable()
        events.filter(F.col("event_id") > half).coalesce(1).write.parquet(
            str(landing / "b2.parquet")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    # latest emitted row per user
    got_rows = spark.sql("SELECT * FROM sess_state").collect()
    got: dict[int, tuple[int, int]] = {}
    for r in got_rows:  # memory sink appends update rows in batch order
        got[r.user_id] = (r.n_events, r.n_sessions)

    batch = sessionize(events)
    want = {
        r.user_id: (r.n, r.n_sessions)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("session_id") + 1).alias("n_sessions"),
        )
        .collect()
    }
    assert got == want
