"""Streaming re-expression of the OHLCV ingestion pipeline (the optional
streaming EXT reserved in SURVEY.md §2.B: the reference's manually-triggered
batch DAG becomes a continuously-running ``readStream`` over a landing
directory).

Semantics: same normalize/cast/derive logic as the batch job
(``sources/ingest.py`` — one code path, applied to a streaming DF), written
as partitioned parquet through a checkpointed file sink. The checkpoint
gives exactly-once per input file: restarting the query with the same
checkpoint directory never re-ingests processed files (pinned in
tests/test_streaming.py).

At 100 TB: the landing dir becomes an object-store prefix fed by an
upstream queue; the file-source maxFilesPerTrigger bounds per-batch work,
and the parquet sink's transactional log (the checkpoint + _spark_metadata)
replaces the reference's at-least-once s3fs loop.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from oss_data_lake_spark.sources.ingest import normalize_ohlcv

LANDING_SCHEMA = (
    "ticker string, ts timestamp, open double, high double, low double, "
    "close double, volume long"
)


def start_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    out_path: str,
    checkpoint_dir: str,
    ingest_date: str | None = None,
) -> StreamingQuery:
    """Start the continuous ingest: landing parquet → tidy → partitioned
    parquet sink with exactly-once checkpointing."""
    raw = spark.readStream.schema(LANDING_SCHEMA).parquet(landing_dir)
    tidy = normalize_ohlcv(raw, ingest_date=ingest_date).withColumn(
        "date", F.date_format("ts", "yyyy-MM-dd")
    )
    return (
        tidy.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
        .outputMode("append")
        .start()
    )
