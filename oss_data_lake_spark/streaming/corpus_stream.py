"""Streaming front-end for incremental corpus ingestion.

``readStream`` over a document landing directory → ``foreachBatch`` →
:class:`IncrementalCorpus.ingest`: every micro-batch runs the full
quality-gate + cross-corpus-dedup + snapshot-append loop, so the corpus
table is continuously deduplicated against everything that arrived before
— across batches AND across stream restarts (the LSH band index is
persisted state, not stream state).

Exactly-once composition: the file source tracks consumed files in the
checkpoint; `foreachBatch` may re-deliver a batch after a crash, but
re-ingesting a delivered batch is a NO-OP by construction — every doc in it
is now a cross-corpus duplicate (pytest pins this idempotence on the batch
path). This turns at-least-once delivery into exactly-once corpus contents
without a transactional sink.

At 100 TB: ``maxFilesPerTrigger`` bounds per-batch work; each trigger's
cost is O(batch + candidates) as documented in ``operators/incremental``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from oss_data_lake_spark.operators.incremental import IncrementalCorpus

DOC_SCHEMA = "doc_id long, text string, source string"


def start_corpus_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start (or resume) the continuous corpus builder.

    ``available_now=True`` drains everything currently in the landing dir
    and stops — the batch-backfill mode; False runs continuously."""
    corpus = IncrementalCorpus(spark, corpus_path)

    def _ingest_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        corpus.ingest(batch)

    raw = spark.readStream.schema(DOC_SCHEMA).parquet(landing_dir)
    writer = (
        raw.writeStream.foreachBatch(_ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
