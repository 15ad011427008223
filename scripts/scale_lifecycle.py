"""Scaling measurement for the round-7 LIFECYCLE + LAYOUT surfaces.

Three claims, each with the structural term that matters at 100 TB:

1. SHALLOW CLONE is O(1) in table size: clone wall time must stay flat
   while the source grows k x (k = 1, 4, 16) — the clone writes one
   manifest, never data. Contrast: a CTAS copy of the same source grows
   ~k x.

2. SCOPED compaction is O(slice), not O(table): `compact_where` over a
   FIXED date slice of a table that grows k x in waves must stay ~flat
   (it rewrites the slice's files only), while full `compact()` grows
   ~k x.

3. HIDDEN partitioning prunes without reading: a `days(ts)` table's
   one-day query plans k x fewer files than it holds, and the pruned
   read's wall time tracks the SLICE, not the table.

Prints one JSON line per k; record in SCALE.md. Run:
    python scripts/scale_lifecycle.py
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.snapshots import SnapshotTable  # noqa: E402

OUT_ROOT = "/tmp/spark_graft_scale_lifecycle"
BASE_ROWS = 120_000
WAVE_DAYS = 30  # each wave covers one month of synthetic days


def _fact(spark, k: int, wave: int):
    n = BASE_ROWS
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.expr(
                f"timestamp'1996-01-01 00:00:00' + make_interval(0, 0, 0, "
                f"cast(id % {WAVE_DAYS} as int) + {wave * WAVE_DAYS}, 0, 0, 0)"
            ),
        )
        .withColumn("k", F.col("id") + F.lit(wave * n))
        .withColumn("v", (F.col("id") % 97).cast("double"))
        .drop("id")
    )


def main() -> None:
    spark = get_spark(app_name="scale-lifecycle", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    for k in (1, 4, 16):
        root = f"{OUT_ROOT}/k{k}"
        shutil.rmtree(root, ignore_errors=True)

        # build: k waves of one month each, days(ts)-hidden-partitioned
        t = SnapshotTable(spark, f"{root}/t")
        for w in range(k):
            t.commit(
                _fact(spark, k, w),
                mode="append",
                partition_by=["days(ts)"],
            )

        # 1. shallow clone vs CTAS copy
        t0 = time.perf_counter()
        clone = t.shallow_clone_to(f"{root}/clone")
        clone_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.read().write.parquet(f"{root}/ctas")
        ctas_s = time.perf_counter() - t0

        # 1b. WAP publish cost is O(changed files): fixed-slice delete
        # on the clone, then publish back — flat while the table grows
        clone.delete_where(
            "ts >= TIMESTAMP '1996-01-05 00:00:00' AND "
            "ts <= TIMESTAMP '1996-01-09 23:59:59'",
            prune_column="ts",
            prune_lower="1996-01-05",
            prune_upper="1996-01-09 23:59:59",
        )
        t0 = time.perf_counter()
        pub_v = clone.publish()
        publish_s = time.perf_counter() - t0
        t.rollback(pub_v - 1)  # undo for the compaction legs

        # 2. scoped vs full compaction: the FIXED first-month slice
        t0 = time.perf_counter()
        res = t.compact_where(
            prune_column="ts",
            prune_lower="1996-01-01",
            prune_upper="1996-01-30 23:59:59",
            target_partitions=4,
        )
        scoped_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.compact(target_partitions=4 * k)
        full_s = time.perf_counter() - t0

        # 3. hidden-partition pruning on the ORIGINAL layout (clone
        # still references the pre-compaction partitioned files)
        _sel, n_sel, n_skip = clone.plan_range_scan(
            "ts", "1996-01-03", "1996-01-03 23:59:59"
        )
        t0 = time.perf_counter()
        day_rows = (
            clone.read_between("ts", "1996-01-03", "1996-01-03 23:59:59")
            .where("ts >= '1996-01-03' AND ts <= '1996-01-03 23:59:59'")
            .count()
        )
        pruned_read_s = time.perf_counter() - t0

        print(json.dumps({
            "k": k,
            "rows": BASE_ROWS * k,
            "clone_s": round(clone_s, 3),
            "ctas_copy_s": round(ctas_s, 3),
            "publish_s": round(publish_s, 3),
            "scoped_compact_s": round(scoped_s, 3),
            "scoped_files_rewritten": res["files_rewritten"],
            "scoped_files_skipped": res["files_skipped"],
            "full_compact_s": round(full_s, 3),
            "day_files_kept": n_sel,
            "day_files_skipped": n_skip,
            "day_rows": day_rows,
            "pruned_day_read_s": round(pruned_read_s, 3),
        }))


if __name__ == "__main__":
    main()
