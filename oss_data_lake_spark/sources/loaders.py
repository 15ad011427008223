"""Fixture-table loaders: partition-pruned, column-prunable Parquet scans.

Replaces the reference's glob-scan-and-concat pattern
(reference notebooks/test_airflow_yfinance.ipynb:58,79-83 — ``fs.glob`` +
``pd.concat`` per file) with a single ``spark.read.parquet`` per table:
Spark's file index subsumes the glob, and Catalyst gets predicate pushdown +
column pruning for free (SURVEY.md §2.A A9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oss_data_lake_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from parquet footers (no full-file
    inference pass); we do NOT pass an explicit schema so that partition-column
    discovery and footer evolution behave like a production lake scan."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not _exists(spark, path):
        raise FileNotFoundError(f"fixture table not found: {path}")
    # Set here (runtime-settable), not only in session.py: the driver calls
    # queries() with ITS OWN SparkSession, which lacks our session defaults.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Two parquet-reader generations for TIMESTAMP(NANOS) (events.ts):
    # older readers honor nanosAsLong (ts arrives long, converted below);
    # newer readers ignore it and infer TIMESTAMP_NTZ unless NTZ inference
    # is off. Disabling inference yields TimestampType (session-tz = UTC,
    # set below) on both, keeping ts LTZ — required by unix_micros() and
    # identical in wall-clock value to the NTZ reading under UTC.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # UTC is an engine semantic, not a host preference: the reference coerces
    # every timestamp with utc=True (reference dags/yfinance_to_minio.py:66);
    # a non-UTC session would silently shift day-grain aggregations.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _normalize(spark.read.parquet(path))


def _normalize(df: DataFrame) -> DataFrame:
    """Fixture normalization: Parquet TIMESTAMP(NANOS) columns arrive as
    nanos-since-epoch longs (spark.sql.legacy.parquet.nanosAsLong) — convert
    to microsecond TimestampType so downstream operators see real timestamps
    (matches DuckDB's ns→us comparison grain used by the oracles)."""
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer div: float division would lose precision on ~1.7e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view so Spark SQL text (the
    reference's Trino-facing entry point, SURVEY.md §3.2) can address them
    by name, mirroring DuckDB's pre-registered oracle views."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def _exists(spark: SparkSession, path: str) -> bool:
    # Local fs is the test medium; on a real lake this is an S3 HEAD via the
    # Hadoop FileSystem API. os.path keeps it cheap for local[N].
    return os.path.exists(path)
