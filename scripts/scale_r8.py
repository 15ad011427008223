"""Scaling measurement for the round-8 history/debt surfaces.

Three claims, each targeting a place where cost previously grew with
HISTORY LENGTH or DELETE DEBT instead of answer size (VERDICT r7
"What's missing" #1-#3):

1. The batch CHANGE FEED plans O(schema generations), not O(commits):
   feed plan scan-arm count and planning wall time must stay ~flat as
   an append history grows 10x -> 100x commits (previously one
   union arm per commit).

2. Streaming-CDC planning is reference-only: driver-side partition
   planning time for a micro-batch covering a MoR wave must track the
   FILE COUNT, not the tombstoned-position count, as positions grow
   10x (previously every (file, pos) became a Python object at plan
   time).

3. The COPY INTO ledger manifest entry is O(1) past the spill
   threshold: manifest JSON size must stay flat as ingested-file count
   grows past it (previously the manifest carried every name).

Prints one JSON line per claim; record in SCALE.md. Run:
    python scripts/scale_r8.py
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import Row  # noqa: E402

from oss_data_lake_spark.plans.audit import explain_str  # noqa: E402
from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.snapshots import SnapshotTable  # noqa: E402

OUT = "/tmp/spark_graft_scale_r8"


def feed_plan_curve(spark):
    out = []
    for n_commits in (10, 50, 100):
        path = f"{OUT}/feed{n_commits}"
        shutil.rmtree(path, ignore_errors=True)
        t = SnapshotTable(spark, path)
        for w in range(n_commits):
            t.commit(
                spark.createDataFrame([Row(k=w, v=float(w))]),
                mode="append",
            )
        t0 = time.perf_counter()
        feed = t.read_change_feed(0)
        scans = explain_str(feed, "simple").count("Scan parquet")
        plan_s = time.perf_counter() - t0
        assert feed.count() == n_commits
        out.append(
            {
                "claim": "feed_plan",
                "commits": n_commits,
                "scan_arms": scans,
                "plan_s": round(plan_s, 3),
            }
        )
        print(json.dumps(out[-1]), flush=True)
    return out


def cdc_reference_curve(spark):
    from oss_data_lake_spark.streaming.snapshot_source import (
        SnapshotStreamSource,
    )

    out = []
    for n_rows in (20_000, 200_000):
        path = f"{OUT}/cdc{n_rows}"
        shutil.rmtree(path, ignore_errors=True)
        t = SnapshotTable(spark, path)
        t.commit(
            spark.range(n_rows)
            .selectExpr("id AS k", "CAST(id % 7 AS DOUBLE) AS v")
            .repartition(8),
            stats_for=["k"],
        )
        t.delete_where_mor("k % 2 = 0")  # n_rows/2 positions
        src = SnapshotStreamSource(
            options={"path": t.path, "changeFeed": "true"}
        )
        reader = src.streamReader(None)
        t0 = time.perf_counter()
        parts = reader.partitions(
            {"version": 0}, {"version": t.current_version()}
        )
        plan_s = time.perf_counter() - t0
        out.append(
            {
                "claim": "cdc_plan",
                "positions": n_rows // 2,
                "partitions": len(parts),
                "plan_s": round(plan_s, 3),
            }
        )
        print(json.dumps(out[-1]), flush=True)
    return out


def ledger_curve(spark):
    out = []
    SnapshotTable._COPY_LEDGER_SPILL = 50  # keep file counts test-sized
    for n_files in (40, 400):
        path = f"{OUT}/led{n_files}"
        land = f"{OUT}/land{n_files}"
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(land, ignore_errors=True)
        t = SnapshotTable(spark, path)
        t.commit(spark.createDataFrame([Row(k=0, v=0.0)]))
        spark.range(n_files).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).repartition(n_files).write.parquet(land)
        t0 = time.perf_counter()
        info = t.copy_into(land)
        load_s = time.perf_counter() - t0
        v = t.current_version()
        msize = os.path.getsize(
            os.path.join(t.path, "_snapshots", f"v{v}.json")
        )
        out.append(
            {
                "claim": "ledger",
                "files": info["files_loaded"],
                "manifest_bytes": msize,
                "load_s": round(load_s, 3),
            }
        )
        print(json.dumps(out[-1]), flush=True)
    return out


if __name__ == "__main__":
    spark = get_spark()
    feed_plan_curve(spark)
    cdc_reference_curve(spark)
    ledger_curve(spark)
