"""Engine facade + CSV/JSON sources + compaction job."""

from __future__ import annotations

from pyspark.sql import functions as F

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.files import (
    compact_partitions,
    read_csv,
    read_json,
)
from oss_data_lake_spark.sources.ingest import ingest, read_curated
from oss_data_lake_spark.sources.ohlcv import generate_ohlcv


def test_engine_sql_surface(spark, sf_dir):
    eng = Engine(spark=spark)
    eng.register_fixtures(sf_dir)
    df = eng.sql(
        "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type "
        "ORDER BY event_type"
    )
    rows = df.collect()
    assert [r.event_type for r in rows] == ["click", "error", "purchase", "signup", "view"]
    plan = eng.explain(df)
    assert "HashAggregate" in plan


def test_engine_read_write_roundtrip(spark, sf_dir, tmp_path):
    eng = Engine(spark=spark)
    events = eng.read(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_by_type")
    eng.write(
        events.withColumn("d", F.to_date("ts")),
        out,
        partition_by=["event_type"],
        mode="overwrite",
    )
    back = eng.read(out)
    assert back.count() == events.count()
    assert "event_type" in back.columns  # recovered from partition dirs


def test_csv_json_roundtrip(spark, tmp_path):
    df = generate_ohlcv(spark).select("ticker", "ts", "close")
    csv_path = str(tmp_path / "prices_csv")
    json_path = str(tmp_path / "prices_json")
    df.write.option("header", "true").csv(csv_path)
    df.write.json(json_path)

    csv_back = read_csv(
        spark, csv_path, schema="ticker string, ts timestamp, close double"
    )
    json_back = read_json(
        spark, json_path, schema="ticker string, ts timestamp, close double"
    )
    want = {(r.ticker, r.ts) for r in df.collect()}
    assert {(r.ticker, r.ts) for r in csv_back.collect()} == want
    assert {(r.ticker, r.ts) for r in json_back.collect()} == want


def test_compaction_merges_small_files(spark, tmp_path):
    out = str(tmp_path / "curated")
    # two append runs → 2 files per partition
    src = generate_ohlcv(spark, n_days=5)
    ingest(spark, src, out, ingest_date="2025-07-01")
    ingest(spark, src, out, ingest_date="2025-07-02")
    before = read_curated(spark, out)
    before_rows = before.count()
    before_sum = before.agg(F.sum("close")).collect()[0][0]

    stats = compact_partitions(spark, out)
    assert stats["files_before"] == 10
    assert stats["files_after"] == 5
    assert stats["rows"] == before_rows

    after = read_curated(spark, out)
    assert after.count() == before_rows
    assert abs(after.agg(F.sum("close")).collect()[0][0] - before_sum) < 1e-9
