"""Streaming sink into a versioned SnapshotTable — exactly-once appends.

The missing piece between the streaming front-ends (checkpointed file
sources, ``streaming/ingest_stream.py``) and the table layer
(``sources/snapshots.py``): landing micro-batches in a VERSIONED table
whose readers get snapshot isolation, time travel, file-skipping stats —
everything a plain parquet-directory sink lacks.

Exactly-once protocol (the Delta ``txnAppId``/``txnVersion`` design):
Structured Streaming's ``foreachBatch`` is AT-LEAST-ONCE — after a crash
between the sink write and the checkpoint commit, the same ``batch_id`` is
re-delivered. The sink therefore commits every batch with
``txn_app=<sink id>, txn_version=batch_id``; the writer identity is stored
IN the snapshot manifest, published by the same atomic pointer swap as the
data, so "was this batch applied?" and "apply this batch" cannot diverge.
A re-delivered batch finds its transaction version already recorded and
no-ops. Idempotence is pinned by tests at three levels: direct double
commit, simulated crash re-delivery, and a full stream restart from the
same checkpoint.

At 100 TB: each micro-batch append is one partition-parallel parquet
write + an O(#snapshots) driver-side metadata check (bounded by
``expire_snapshots``); per-batch file-skipping stats cost one footer pass
over just that batch's files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from oss_data_lake_spark.sources.snapshots import SnapshotTable


def start_snapshot_sink(
    spark: SparkSession,
    source: DataFrame,
    table_path: "str | SnapshotTable",
    checkpoint_dir: str,
    sink_id: str = "snapshot_sink",
    stats_for: list[str] | None = None,
    refresh_views: list | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Append a streaming DataFrame into ``SnapshotTable(table_path)``,
    one idempotent snapshot commit per micro-batch.

    ``sink_id`` is the transactional writer identity — two different
    streams appending to one table must use distinct ids (each id's batch
    numbering is independent). ``stats_for`` harvests file-skipping
    bounds for each batch's files. ``available_now=True`` drains the
    currently-available input and stops (backfill mode); False runs
    continuously.

    ``refresh_views`` takes ``IncrementalAggregate``s over this table:
    each is refreshed AFTER the batch commit, making them continuously-
    maintained streaming materialized views. The composition inherits
    exactly-once end to end: a re-delivered batch no-ops the table commit,
    so the MV's incremental refresh sees no new source version and no-ops
    too (the MV watermark IS its refresh commit's txn version, so data and
    watermark publish atomically and a stale racing refresh no-ops in the
    ledger); a crash between commit and refresh just means the next
    batch's refresh folds two deltas at once — the incremental scan is
    cumulative, not per-batch.

    ``table_path`` also accepts an existing ``SnapshotTable`` handle, so
    a table on a non-default commit protocol (``CasCommitProtocol`` for
    object stores) streams through the same sink unchanged."""
    table = (
        table_path
        if isinstance(table_path, SnapshotTable)
        else SnapshotTable(spark, table_path)
    )

    def _commit(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        commit_batch(table, batch, batch_id, sink_id, stats_for=stats_for)
        # auto-compaction policy: a no-op unless the table's
        # compact.tombstone-ratio / compact.max-eq-deletes properties are
        # set AND crossed — merge-on-read debt self-heals under load
        table.auto_compact(stats_for=stats_for)
        for mv in refresh_views or []:
            mv.refresh()

    writer = (
        source.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def commit_batch(
    table: SnapshotTable,
    batch: DataFrame,
    batch_id: int,
    sink_id: str,
    stats_for: list[str] | None = None,
) -> int:
    """One micro-batch append with the idempotent writer identity —
    factored out of the closure so tests (and manual backfills) can
    exercise re-delivery without a running stream. Batches adopt the
    table's current partition layout (identity or hidden transform) so
    streaming accretion never erodes pruning; identity partition
    columns get path-segment (not footer) stats."""
    pb = table.current_partition_by()
    identity = {c for c in pb if "(" not in c}
    return table.commit(
        batch,
        mode="append" if table.current_version() else "overwrite",
        partition_by=pb or None,
        stats_for=(
            sorted(set(stats_for) - identity) if stats_for else None
        ),
        txn_app=sink_id,
        txn_version=batch_id,
    )
