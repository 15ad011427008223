"""Partitioned-lake fixture builder: build-once protocol + layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oss_data_lake_spark.sources.lake import (
    events_by_date,
    lineitem_by_month,
    read_lake,
)


def test_lake_builds_once_and_prunes(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LAKE_DIR", str(tmp_path / "lake"))
    path = events_by_date(spark, sf_dir)
    assert os.path.exists(os.path.join(path, "_SOURCE_STAMP"))
    date_dirs = [d for d in os.listdir(path) if d.startswith("date=")]
    assert len(date_dirs) == 30  # one dir per fixture day
    # one file per partition (repartition-by-key before partitionBy)
    files = [
        f
        for f in os.listdir(os.path.join(path, date_dirs[0]))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1
    mtime = os.path.getmtime(os.path.join(path, "_SOURCE_STAMP"))
    # second call must be a no-op (build-once)
    assert events_by_date(spark, sf_dir) == path
    assert os.path.getmtime(os.path.join(path, "_SOURCE_STAMP")) == mtime
    # round-trip row count and partition-column recovery
    ev = read_lake(spark, path)
    assert "date" in ev.columns
    n_raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert ev.count() == n_raw
    one_day = ev.filter(F.col("date") == "2024-01-05")
    assert 0 < one_day.count() < n_raw


def test_lineitem_lake_monthly_grain(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LAKE_DIR", str(tmp_path / "lake"))
    path = lineitem_by_month(spark, sf_dir)
    months = [d for d in os.listdir(path) if d.startswith("ship_month=")]
    # sf0.001 spans the full 1995-2001 TPC-H ship range → ~83 months
    assert 80 <= len(months) <= 90
