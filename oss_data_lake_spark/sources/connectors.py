"""Optional table-format connectors (Delta Lake / Apache Iceberg), gated
behind import-probes — never a hard dependency (SURVEY.md §7 design stance:
plain partitioned Parquet + session catalog reproduces every exercised
reference behavior; connectors upgrade the same `Warehouse` API to hidden
partitioning / snapshots when their jars are present).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def delta_available() -> bool:
    try:
        import delta  # type: ignore  # noqa: F401

        return True
    except ImportError:
        return False


def iceberg_available(spark: SparkSession | None = None) -> bool:
    """Iceberg ships as a Spark runtime jar, not a pip package — probe the
    JVM classpath."""
    if spark is None:
        return False
    try:
        spark._jvm.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def preferred_table_format(spark: SparkSession | None = None) -> str:
    """'delta' > 'iceberg' > 'parquet' by availability. The v1 environment
    bundles neither connector, so this resolves to 'parquet' — the fallback
    every code path is tested against."""
    if delta_available():
        return "delta"
    if iceberg_available(spark):
        return "iceberg"
    return "parquet"
