"""File-format sources/sinks beyond Parquet (SURVEY.md §2.B "CSV/JSON read")
and lake maintenance: the small-file compaction job the reference lacks
(SURVEY.md §4 flags its one-file-per-partition-per-run append pattern as a
known anti-pattern — this is the OPTIMIZE-style rewrite).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **opts
) -> DataFrame:
    """CSV scan; explicit schema preferred (inference is a full extra pass —
    never at 100 TB)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.options(**opts).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **opts
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**opts).json(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "date",
    files_per_partition: int = 1,
) -> dict[str, int]:
    """Rewrite a partitioned-parquet dataset to ``files_per_partition`` files
    per partition (append-mode ingestion accumulates one file per run).

    Write-to-sibling-then-swap: never reads and overwrites the same path in
    one job (Spark cannot do that safely). At 100 TB this runs per-partition-
    subset with a manifest swap instead of a directory rename; same shape.

    Returns {files_before, files_after, rows}.
    """
    backup = path.rstrip("/") + "__pre_compact"
    if os.path.exists(backup):
        if not os.path.exists(path):
            # previous run crashed between the two renames: the data lives
            # only in the backup — restore it before doing anything else
            os.rename(backup, path)
        else:
            raise RuntimeError(
                f"stale compaction backup at {backup}; a previous run may "
                f"have crashed — inspect and remove it before compacting"
            )
    before = _count_data_files(path)
    df = spark.read.parquet(path)
    if partition_col not in df.columns:
        raise ValueError(
            f"{path} is not partitioned by '{partition_col}' "
            f"(columns: {df.columns}); compaction needs a partitioned dataset"
        )
    rows = df.count()
    tmp = path.rstrip("/") + "__compacting"
    # repartition on the partition column: each partition value lands wholly
    # in one task → exactly one output file per partition, tasks in parallel.
    # (repartition(1, col) would serialize the whole rewrite through one task.)
    compacted = (
        df.repartition(partition_col)
        if files_per_partition == 1
        else df.repartition(files_per_partition * df.select(partition_col).distinct().count(), partition_col)
    )
    (
        compacted.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    # two renames are not atomic together: a crash in between leaves the
    # data in `backup` only — the recovery branch above restores it on the
    # next invocation. (At lake scale this whole swap is a single atomic
    # manifest pointer flip instead.)
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    after = _count_data_files(path)
    return {"files_before": before, "files_after": after, "rows": rows}


def _count_data_files(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
