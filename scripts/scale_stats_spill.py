"""Scaling measurement for the per-file stats sidecar spill.

Claim: manifest byte size and commit-tail time stay FLAT in per-dir
file count once stats spill to a parquet sidecar — previously the
manifest carried every file's bounds (and base64 blooms) inline, so a
manifest grew O(files) and every later commit re-serialized it.

For file counts N in (64, 256, 1024): commit one N-file dir with
bounds+bloom stats under (a) inline (threshold above N) and (b) spill
(threshold 1), then append one tiny commit and measure ITS manifest
size and wall time — the cost every FUTURE commit pays for the big
dir's stats. Also measures a pruned plan through both, pinning equal
skip counts.

Prints one JSON line per N; record in SCALE.md. Run:
    python scripts/scale_stats_spill.py
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

from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.snapshots import SnapshotTable  # noqa: E402

OUT = "/tmp/spark_graft_scale_stats"


def build(spark, path, n_files, threshold):
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable(spark, path)
    t.commit(spark.range(1).selectExpr("id AS k", "id AS g"))
    t.set_properties({"stats.spill.file-threshold": str(threshold)})
    t.commit(
        spark.range(n_files * 100)
        .selectExpr("id AS k", "id % 97 AS g")
        .repartitionByRange(n_files, "k"),
        mode="append",
        stats_for=["k"],
        bloom_for=["g"],
    )
    t0 = time.perf_counter()
    v = t.commit(
        spark.range(1).selectExpr("id + 1000000 AS k", "id AS g"),
        mode="append",
        stats_for=["k"],
    )
    tail_s = time.perf_counter() - t0
    size = os.path.getsize(os.path.join(path, "_snapshots", f"v{v}.json"))
    t0 = time.perf_counter()
    _sel, n_sel, n_skip = t.plan_range_scan("k", 0, 150)
    plan_s = time.perf_counter() - t0
    return size, tail_s, n_sel, n_skip, plan_s


def main():
    spark = get_spark(app_name="scale-stats", cpus="8")
    for n in (64, 256, 1024):
        si, ti, seli, skipi, pi = build(spark, f"{OUT}/inline{n}", n, 10**9)
        ss, ts, sels, skips, ps = build(spark, f"{OUT}/spill{n}", n, 1)
        assert (seli, skipi) == (sels, skips), "pruning must be identical"
        print(
            json.dumps(
                {
                    "n_files": n,
                    "manifest_bytes_inline": si,
                    "manifest_bytes_spill": ss,
                    "append_tail_s_inline": round(ti, 3),
                    "append_tail_s_spill": round(ts, 3),
                    "plan_s_spill": round(ps, 3),
                    "plan_s_inline": round(pi, 3),
                    "files_selected": sels,
                    "files_skipped": skips,
                }
            )
        )


if __name__ == "__main__":
    main()
