"""Object-store (s3a://) configuration — the MinIO/S3 path of the reference
stack (reference dags/yfinance_to_minio.py:77-91 writes parquet to MinIO
over S3; docker-compose.yaml:129-150 runs the MinIO service; Lakekeeper
warehouses point at bucket+prefix, create-yfinance-warehouse.json:2-8).

Every repo path (ingest, Warehouse, SnapshotTable, compaction) takes a URI
string, so pointing them at ``s3a://bucket/prefix`` needs ONLY the Hadoop
filesystem configuration below — no code changes. The s3a connector jars
(hadoop-aws + AWS SDK) are not bundled in this environment, so
``s3a_available`` gates the smoke test; on a real cluster they ship with
the distribution.

At 100 TB, the settings that matter (all exposed here):
- ``fs.s3a.fast.upload`` + committer ``magic``: direct multipart upload, no
  rename-based commit (S3 renames are copies — the classic output-committer
  trap at scale).
- ``fs.s3a.connection.maximum`` sized to executor-core fan-out.
- path-style access for MinIO-compatible endpoints.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def s3a_available(spark: SparkSession) -> bool:
    """Probe the JVM classpath for the s3a connector."""
    try:
        spark._jvm.Class.forName(  # type: ignore[union-attr]
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    max_connections: int = 128,
) -> None:
    """Point Hadoop's s3a filesystem at an S3/MinIO-compatible endpoint —
    the Spark-side equivalent of the reference DAG's boto3/s3fs client
    setup (reference dags/yfinance_to_minio.py:77-84)."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()  # type: ignore[union-attr]
    conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.access.key", access_key)
    conf.set("fs.s3a.secret.key", secret_key)
    conf.set("fs.s3a.path.style.access", str(path_style).lower())
    conf.set("fs.s3a.connection.maximum", str(max_connections))
    conf.set("fs.s3a.fast.upload", "true")
    # magic committer: commit via multipart-upload completion, never rename
    conf.set("fs.s3a.committer.name", "magic")
    conf.set(
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a",
        "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
    )
