"""Scaling measurement for the round-8 sort-order + branch surfaces.

Two claims:

1. WRITE ORDERED BY buys file skipping that GROWS with table size: on
   the sf0.1 orders fixture, a narrow o_totalprice range probe against
   an unordered multi-file table opens every file (each file spans the
   full range); against the same rows committed under a declared sort
   order it opens O(answer) files. The shuffle paid at write time is
   reported next to the read-side win.

2. Branch creation and fast_forward are O(1) in table size: across
   16x growth, create_branch stays ~ms (zero-copy clone) and
   fast_forward of a FIXED-SLICE branch change stays flat (the WAP
   publish curve, reached through the branch surface).

Prints one JSON line per claim; record in SCALE.md. Run:
    python scripts/scale_sort_branch.py
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import Row  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.loaders import load_table  # noqa: E402
from oss_data_lake_spark.sources.snapshots import SnapshotTable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sort_order_curve(spark):
    """Unordered vs WRITE ORDERED BY on sf0.1 orders: files opened and
    wall time for a narrow o_totalprice range probe."""
    orders = load_table(spark, SF_DIR, "orders")
    root = tempfile.mkdtemp(prefix="scale_sort_")
    out = {"claim": "sort_order_skipping", "sf_dir": SF_DIR}
    try:
        # unordered: 32 hash-scattered files, stats recorded
        t0 = time.perf_counter()
        un = SnapshotTable(spark, os.path.join(root, "un"))
        un.commit(
            orders.repartition(32),
            mode="overwrite",
            stats_for=["o_totalprice"],
        )
        out["unordered_write_s"] = round(time.perf_counter() - t0, 3)
        # ordered: declared sort order, same rows
        so = SnapshotTable(spark, os.path.join(root, "so"))
        so.commit(orders.limit(1), mode="overwrite")  # seed schema
        so.set_sort_order(["o_totalprice"])
        t0 = time.perf_counter()
        so.commit(orders.repartition(32), mode="overwrite")
        out["ordered_write_s"] = round(time.perf_counter() - t0, 3)

        lo, hi = 1000.0, 2000.0
        for tag, t in (("unordered", un), ("ordered", so)):
            _sel, n_sel, n_skip = t.plan_range_scan("o_totalprice", lo, hi)
            t0 = time.perf_counter()
            n = t.read_between("o_totalprice", lo, hi).count()
            out[f"{tag}_files_opened"] = n_sel
            out[f"{tag}_files_skipped"] = n_skip
            out[f"{tag}_probe_s"] = round(time.perf_counter() - t0, 3)
            out[f"{tag}_rows"] = n
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def branch_curve(spark):
    """create_branch + fixed-slice fast_forward across 16x growth."""
    root = tempfile.mkdtemp(prefix="scale_branch_")
    out = {"claim": "branch_o1", "points": []}
    try:
        t = SnapshotTable(spark, os.path.join(root, "t"))
        rows = 0
        for mult in (1, 4, 16):
            target = 40_000 * mult
            add = target - rows
            df = spark.range(add).select(
                (F.col("id") + rows).alias("k"),
                (F.rand(7) * 100).alias("v"),
            )
            t.commit(df, mode="append" if rows else "overwrite")
            rows = target
            t0 = time.perf_counter()
            t.create_branch("b")
            create_s = time.perf_counter() - t0
            bt = t.branch("b")
            bt.commit(
                spark.createDataFrame(
                    [Row(k=10_000_000 + i, v=1.0) for i in range(100)]
                ),
                mode="append",
            )
            t0 = time.perf_counter()
            t.fast_forward("b")
            ff_s = time.perf_counter() - t0
            # undo the landed slice so the next point measures the same
            # fixed-size change against a bigger base
            t.delete_where("k >= 10000000")
            rows_now = t.read().count()
            out["points"].append(
                {
                    "table_rows": rows_now,
                    "create_branch_ms": round(create_s * 1000, 1),
                    "fast_forward_ms": round(ff_s * 1000, 1),
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


if __name__ == "__main__":
    spark = get_spark(app_name="scale_sort_branch")
    print(json.dumps(sort_order_curve(spark)))
    print(json.dumps(branch_curve(spark)))
