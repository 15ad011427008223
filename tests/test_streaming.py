"""Streaming-vs-batch equivalence: the streaming hourly windows must produce
the same result as the batch e50 query over the same files."""

from __future__ import annotations

import os
import shutil

from oss_data_lake_spark.operators.windows import tumbling_hourly
from oss_data_lake_spark.streaming.event_stream import (
    hourly_counts_stream,
    run_to_completion,
)


def test_streaming_ingest_exactly_once(spark, tmp_path):
    """Streaming ingest picks up files incrementally; restarting with the
    same checkpoint never re-ingests processed input (exactly-once per
    file)."""
    from pyspark.sql import functions as F

    from oss_data_lake_spark.sources.ohlcv import generate_ohlcv
    from oss_data_lake_spark.streaming.ingest_stream import start_ingest_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    src = generate_ohlcv(spark, n_days=4)
    batch1 = src.filter(F.dayofmonth("ts") <= 3)
    batch2 = src.filter(F.dayofmonth("ts") > 3)
    batch1.coalesce(1).write.parquet(str(landing / "b1.parquet"))

    # Spark's df.write.parquet creates a DIRECTORY per batch; the file-stream
    # source needs a glob to see files one level down
    glob_path = str(landing) + "/*/"
    q = start_ingest_stream(spark, glob_path, out, ckpt, ingest_date="2025-07-01")
    try:
        q.processAllAvailable()
        n1 = spark.read.parquet(out).count()
        batch2.coalesce(1).write.parquet(str(landing / "b2.parquet"))
        q.processAllAvailable()
        n2 = spark.read.parquet(out).count()
    finally:
        q.stop()
    assert n1 == batch1.count()
    assert n2 == src.count()

    # restart with same checkpoint: nothing re-ingested
    q2 = start_ingest_stream(spark, glob_path, out, ckpt, ingest_date="2025-07-01")
    try:
        q2.processAllAvailable()
        n3 = spark.read.parquet(out).count()
    finally:
        q2.stop()
    assert n3 == n2, "restart must not duplicate rows"

    # partitioned layout + schema parity with the batch job
    back = spark.read.parquet(out)
    assert "date" in back.columns
    assert back.select("date").distinct().count() == 4


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), landing / "events.parquet"
    )
    stream = hourly_counts_stream(spark, str(landing))
    got = {
        (r.hour_start.strftime("%Y-%m-%d %H:%M:%S"), r.event_type): (
            r.n,
            round(r.sum_value, 6),
        )
        for r in run_to_completion(stream, "hourly_test").collect()
    }
    want = {
        (r.hour_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in tumbling_hourly(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Streaming exact dedup: redelivered (duplicated) events collapse to
    one row per event_id, matching batch dropDuplicates on the same input."""
    from pyspark.sql import functions as F

    from oss_data_lake_spark.streaming.event_stream import dedup_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(200)
    # simulate at-least-once redelivery: every event lands twice
    src.write.mode("append").parquet(str(landing))
    src.write.mode("append").parquet(str(landing))

    out = dedup_stream(spark, str(landing))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_sink")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT event_id FROM dedup_sink").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)) == src.select("event_id").distinct().count()


def test_stream_stream_attribution_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner join (watermarked, time-range-bounded): the
    streaming attribution result must equal the identical BATCH join on
    the same landed files — inner joins emit exactly the matched rows
    once both sides have arrived."""
    from pyspark.sql import functions as F

    from oss_data_lake_spark.streaming.event_stream import (
        attribution_join_stream,
        run_to_completion_append,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks_dir = str(tmp_path / "clicks")
    purchases_dir = str(tmp_path / "purchases")
    # land each side in two files to exercise multi-batch arrival
    events.filter("event_type = 'click'").repartition(2).write.parquet(
        clicks_dir
    )
    events.filter("event_type = 'purchase'").repartition(2).write.parquet(
        purchases_dir
    )
    got = run_to_completion_append(
        attribution_join_stream(spark, clicks_dir, purchases_dir),
        "attrib_join",
    )
    c = (
        spark.read.parquet(clicks_dir)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
    )
    p = (
        spark.read.parquet(purchases_dir)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    want = p.join(
        c,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts")
           - F.expr("INTERVAL 30 minutes")),
    ).select(*got.columns)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w
    assert g  # the fixture produces attributed purchases
