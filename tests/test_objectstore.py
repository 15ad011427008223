"""Object-store (s3a) path: config plumbing always tested; the end-to-end
ingest smoke runs only when an S3/MinIO endpoint is provided via env
(SPARK_GRAFT_S3_ENDPOINT / _KEY / _SECRET / _BUCKET) AND the s3a connector
jars are on the classpath — mirrors reference dags/yfinance_to_minio.py."""

from __future__ import annotations

import os

import pytest

from oss_data_lake_spark.sources.objectstore import configure_s3a, s3a_available


def test_configure_s3a_sets_hadoop_conf(spark):
    configure_s3a(spark, "http://localhost:9000", "ak", "sk")
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert conf.get("fs.s3a.path.style.access") == "true"
    assert conf.get("fs.s3a.committer.name") == "magic"


def test_s3a_probe_is_safe(spark):
    # must never raise, whatever the classpath
    assert s3a_available(spark) in (True, False)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_S3_ENDPOINT"),
    reason="no S3/MinIO endpoint configured (SPARK_GRAFT_S3_ENDPOINT unset)",
)
def test_ingest_to_s3a_roundtrip(spark):
    """Same ingest job, s3a:// URI — the reference's MinIO write path."""
    from oss_data_lake_spark.sources.ingest import ingest, read_curated
    from oss_data_lake_spark.sources.ohlcv import generate_ohlcv

    if not s3a_available(spark):
        pytest.skip("s3a connector jars not on classpath")
    configure_s3a(
        spark,
        os.environ["SPARK_GRAFT_S3_ENDPOINT"],
        os.environ.get("SPARK_GRAFT_S3_KEY", "minioadmin"),
        os.environ.get("SPARK_GRAFT_S3_SECRET", "minioadmin"),
    )
    bucket = os.environ.get("SPARK_GRAFT_S3_BUCKET", "warehouse")
    out = f"s3a://{bucket}/smoke/curated_prices"
    metrics = ingest(
        spark, generate_ohlcv(spark), out, ingest_date="2024-06-01",
        mode="overwrite",
    )
    assert metrics["rows_written"] > 0
    back = read_curated(spark, out)
    assert back.count() == metrics["rows_written"]


def test_lake_remote_routing_classifier():
    """URI classes: bare/file = local (atomic-rename branch), any other
    scheme = remote (direct write + marker-last branch)."""
    from oss_data_lake_spark.sources.lake import _is_remote

    assert not _is_remote("/tmp/lake")
    assert not _is_remote("file:///tmp/lake")
    assert _is_remote("s3a://bucket/lake")
    assert _is_remote("hdfs://nn/lake")


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_S3_ENDPOINT"),
    reason="no S3/MinIO endpoint configured (SPARK_GRAFT_S3_ENDPOINT unset)",
)
def test_lake_build_once_on_s3a(spark, monkeypatch):
    """Lake cache build on an object store: routes through the direct-write
    + stamp-marker-last branch (no directory rename), round-trips the
    partitioned read, and the second call is a cache hit."""
    from oss_data_lake_spark.sources import lake as lake_mod

    if not s3a_available(spark):
        pytest.skip("s3a connector jars not on classpath")
    configure_s3a(
        spark,
        os.environ["SPARK_GRAFT_S3_ENDPOINT"],
        os.environ.get("SPARK_GRAFT_S3_KEY", "minioadmin"),
        os.environ.get("SPARK_GRAFT_S3_SECRET", "minioadmin"),
    )
    bucket = os.environ.get("SPARK_GRAFT_S3_BUCKET", "warehouse")
    monkeypatch.setenv("SPARK_GRAFT_LAKE_DIR", f"s3a://{bucket}/lake_cache")
    sf_dir = "/root/testdata/sf0.001"
    path = lake_mod.events_by_date(spark, sf_dir)
    assert path.startswith("s3a://")
    back = lake_mod.read_lake(spark, path)
    assert back.count() > 0
    assert "date" in back.columns
    # second call: stamp matches -> no rebuild (returns immediately)
    assert lake_mod.events_by_date(spark, sf_dir) == path


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_S3_ENDPOINT"),
    reason="no S3/MinIO endpoint configured (SPARK_GRAFT_S3_ENDPOINT unset)",
)
def test_snapshot_table_on_s3a_with_cas_catalog(spark):
    """The object-store deployment shape the CommitProtocol seam exists
    for: DATA files under s3a:// (multipart-commit writes, no rename),
    ALL metadata through a CAS catalog — the Iceberg REST-catalog split
    the reference realizes with MinIO + Lakekeeper. Commits, appends and
    time travel must work with no POSIX metadata operation on the store."""
    from oss_data_lake_spark.sources.catalog import (
        CasCommitProtocol,
        InMemoryCasCatalog,
    )
    from oss_data_lake_spark.sources.objectstore import configure_s3a, s3a_available
    from oss_data_lake_spark.sources.snapshots import SnapshotTable
    from pyspark.sql import Row

    if not s3a_available(spark):
        pytest.skip("s3a connector jars not on classpath")
    configure_s3a(
        spark,
        os.environ["SPARK_GRAFT_S3_ENDPOINT"],
        os.environ.get("SPARK_GRAFT_S3_KEY", "minioadmin"),
        os.environ.get("SPARK_GRAFT_S3_SECRET", "minioadmin"),
    )
    bucket = os.environ.get("SPARK_GRAFT_S3_BUCKET", "warehouse")
    t = SnapshotTable(
        spark,
        f"s3a://{bucket}/smoke/cas_snapshots",
        protocol=CasCommitProtocol(InMemoryCasCatalog(), prefix="cas_smoke/"),
    )
    v1 = t.commit(spark.createDataFrame([Row(k=i) for i in range(5)]))
    v2 = t.commit(
        spark.createDataFrame([Row(k=i) for i in range(5, 10)]), mode="append"
    )
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 10
    assert t.read(version=1).count() == 5
