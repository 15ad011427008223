"""Legacy v1 layout (finance/yahoo/daily/ingest_date=*/TICKER.parquet):
reader, overlap resolution, and migration into the v2 curated layout.

Mirrors reference dags/yfinance_to_minio_v1.py semantics: every run
re-wrote a full lookback window, so the same (ticker, ts) exists under
multiple ingest_date dirs and the migrator must keep the newest."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oss_data_lake_spark.sources.ingest import read_curated
from oss_data_lake_spark.sources.legacy_v1 import (
    latest_per_key,
    migrate_v1_to_curated,
    read_v1,
    write_v1_fixture,
)
from oss_data_lake_spark.sources.ohlcv import generate_ohlcv

TICKERS = ("AAPL", "MSFT")


def _fixture(spark, tmp_path) -> str:
    """Two overlapping v1 ingests: day windows overlap and the second uses
    a different seed, so overlap rows DIFFER — latest-wins is observable."""
    root = str(tmp_path / "v1lake")
    d1 = generate_ohlcv(
        spark, TICKERS, start_date="2025-06-02", n_days=10, seed=1
    )
    d2 = generate_ohlcv(
        spark, TICKERS, start_date="2025-06-09", n_days=10, seed=2
    )
    assert write_v1_fixture(d1, root, "2025-06-13") == len(TICKERS)
    assert write_v1_fixture(d2, root, "2025-06-20") == len(TICKERS)
    return root


def test_read_v1_normalizes_and_discovers_ingest_date(spark, tmp_path):
    root = _fixture(spark, tmp_path)
    v1 = read_v1(spark, root)
    assert set(v1.columns) == {
        "ticker", "ts", "open", "high", "low", "close", "volume",
        "ingest_date",
    }
    # both ingest generations present, full row count (overlaps included)
    ingests = {str(r[0]) for r in v1.select("ingest_date").distinct().collect()}
    assert ingests == {"2025-06-13", "2025-06-20"}
    assert v1.count() == 2 * 10 * len(TICKERS)


def test_latest_per_key_keeps_newest_ingest(spark, tmp_path):
    root = _fixture(spark, tmp_path)
    v1 = read_v1(spark, root)
    resolved = latest_per_key(v1)
    # distinct (ticker, ts) keys survive exactly once
    assert resolved.count() == resolved.select("ticker", "ts").distinct().count()
    # on the overlap, the kept row must be the 2025-06-20 re-ingest
    overlap_keys = (
        v1.groupBy("ticker", "ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    assert overlap_keys.count() > 0, "fixture must actually overlap"
    kept = resolved.join(overlap_keys.select("ticker", "ts"), ["ticker", "ts"])
    assert {
        str(r[0]) for r in kept.select("ingest_date").distinct().collect()
    } == {"2025-06-20"}
    # and its VALUES are the newest generation's (seed=2), not the old ones
    new_vals = v1.filter(F.col("ingest_date") == "2025-06-20").select(
        "ticker", "ts", F.col("open").alias("open_new")
    )
    joined = kept.join(new_vals, ["ticker", "ts"])
    assert joined.filter(F.col("open") != F.col("open_new")).count() == 0


def test_migrate_v1_lands_in_curated_layout(spark, tmp_path):
    root = _fixture(spark, tmp_path)
    out = str(tmp_path / "curated")
    metrics = migrate_v1_to_curated(spark, root, out)
    resolved_keys = latest_per_key(read_v1(spark, root)).count()
    assert metrics["rows_written"] == resolved_keys
    back = read_curated(spark, out)
    assert back.count() == resolved_keys
    # curated layout is date= partitioned (discovered partition column)
    assert "date" in back.columns
    assert metrics["partitions"] == back.select("date").distinct().count()


def test_incremental_migration_prunes_ingest_dirs(spark, tmp_path):
    """A migration restricted to one ingest_date range must prune the other
    generation's directories at the file index."""
    from oss_data_lake_spark.plans.audit import partition_filters
    from oss_data_lake_spark.sources.legacy_v1 import V1_PREFIX  # noqa: F401

    root = _fixture(spark, tmp_path)
    v1 = read_v1(spark, root).filter(
        F.col("ingest_date").between("2025-06-20", "2025-06-20")
    )
    assert partition_filters(v1), "ingest_date range must be a PartitionFilter"
    assert v1.count() == 10 * len(TICKERS)


def test_incremental_migration_merges_waves(spark, tmp_path):
    """Two migration waves (one ingest generation each) must MERGE: the
    second wave may not wipe the first (static overwrite would), and on
    overlapping (ticker, ts) keys the newer generation wins. The migrated
    rows carry the DISCOVERED v1 ingest_date, not the migration day."""
    root = _fixture(spark, tmp_path)
    out = str(tmp_path / "curated_inc")

    migrate_v1_to_curated(spark, root, out, ingest_dates=("2025-06-13", "2025-06-13"))
    wave1 = read_curated(spark, out).collect()
    assert {str(r.ingest_date) for r in wave1} == {"2025-06-13"}

    migrate_v1_to_curated(spark, root, out, ingest_dates=("2025-06-20", "2025-06-20"))
    merged = read_curated(spark, out)
    full = latest_per_key(read_v1(spark, root))
    assert merged.count() == full.count()
    # wave-1-only days survive; overlap days carry wave-2 provenance
    by_ingest = {
        str(r.ingest_date): r.n
        for r in merged.groupBy("ingest_date").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(by_ingest) == {"2025-06-13", "2025-06-20"}
    want = {
        str(r.ingest_date): r.n
        for r in full.groupBy("ingest_date").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_ingest == want
