"""Scaling measurement for MERGE-ON-READ debt (VERDICT r6 asks #3/#5):

1. READ AMPLIFICATION vs accumulated tombstones: the MoR read path pays
   an anti-join per read until compaction. Protocol: one table, waves of
   position deletes accumulating 0% → 20% tombstones, read wall time at
   each level, then one compaction and a final read — the curve quantifies
   the pay-later cost and the policy's payoff.

2. EQUALITY-DELETE WRITE COST vs table size: the claim is O(keys),
   independent of table AND file size (no scan). Protocol: tables of
   k × BASE_ROWS rows (k = 1, 4, 16), time `delete_where_eq` of a fixed
   100-key batch at each k; flat curve = evidence. For contrast, the
   position-delete (`delete_where_mor`, pruned scan) and CoW
   (`delete_where`, pruned rewrite) costs for an equivalent keyed
   predicate at each k.

3. MoR MERGE (scan-free CDC upsert) vs CoW merge at each k with a fixed
   2k-row source: `merge_rows_mor` writes O(source); `merge_rows`
   rewrites candidate files.

Prints one JSON line per section; record in SCALE.md. Run:
    python scripts/scale_mor.py [ks...]
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

OUT_ROOT = "/tmp/spark_graft_scale_mor"
BASE_ROWS = 200_000
N_FILES = 16
KS = tuple(int(a) for a in sys.argv[1:]) or (1, 4, 16)


def gen(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 0.37).alias("v")
    )


def timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return time.perf_counter() - t0, r


def read_amp(spark) -> None:
    path = f"{OUT_ROOT}/amp"
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable(spark, path)
    n = BASE_ROWS * 4
    t.commit_clustered(gen(spark, n), cluster_by="k", n_files=N_FILES,
                       stats_for=["k"])
    levels = [0.0, 0.02, 0.05, 0.1, 0.2]
    out = []
    done = 0.0
    for lv in levels:
        if lv > done:
            lo, hi = int(done * n), int(lv * n) - 1
            t.delete_where_mor(
                f"k BETWEEN {lo} AND {hi}", prune_column="k",
                prune_lower=lo, prune_upper=hi,
            )
            done = lv
        sec, cnt = timed(lambda: t.read().count())
        # second read re-measures without first-touch noise
        sec2, _ = timed(lambda: t.read().count())
        out.append({
            "tombstone_frac": lv,
            "tombstone_rows": int(lv * n),
            "read_sec": round(min(sec, sec2), 3),
            "rows": cnt,
        })
    csec, _ = timed(lambda: t.compact(target_partitions=N_FILES,
                                      cluster_by="k", stats_for=["k"]))
    rsec, cnt = timed(lambda: t.read().count())
    print(json.dumps({
        "section": "read_amplification", "table_rows": n,
        "curve": out, "compact_sec": round(csec, 3),
        "read_after_compact_sec": round(rsec, 3), "rows_after": cnt,
    }))


def delete_costs(spark) -> None:
    for k in KS:
        n = BASE_ROWS * k
        rows = []
        for kind in ("eq", "pos", "cow"):
            path = f"{OUT_ROOT}/del_{kind}_{k}"
            shutil.rmtree(path, ignore_errors=True)
            t = SnapshotTable(spark, path)
            t.commit_clustered(gen(spark, n), cluster_by="k",
                               n_files=N_FILES * k, stats_for=["k"])
            keys = list(range(1000, 1100))  # fixed 100-key batch
            if kind == "eq":
                sec, info = timed(lambda: t.delete_where_eq("k", keys))
            elif kind == "pos":
                sec, info = timed(lambda: t.delete_where_mor(
                    f"k BETWEEN {keys[0]} AND {keys[-1]}",
                    prune_column="k", prune_lower=keys[0],
                    prune_upper=keys[-1],
                ))
            else:
                sec, info = timed(lambda: t.delete_where(
                    f"k BETWEEN {keys[0]} AND {keys[-1]}",
                    prune_column="k", prune_lower=keys[0],
                    prune_upper=keys[-1], stats_for=["k"],
                ))
            rows.append({"kind": kind, "sec": round(sec, 3)})
            assert t.read().count() == n - 100
        print(json.dumps({
            "section": "keyed_delete_cost", "k": k, "table_rows": n,
            "n_files": N_FILES * k, "deletes": rows,
        }))


def merge_costs(spark) -> None:
    src_n = 2_000
    for k in KS:
        n = BASE_ROWS * k
        out = {}
        for kind in ("mor", "cow"):
            path = f"{OUT_ROOT}/mrg_{kind}_{k}"
            shutil.rmtree(path, ignore_errors=True)
            t = SnapshotTable(spark, path)
            t.commit_clustered(gen(spark, n), cluster_by="k",
                               n_files=N_FILES * k, stats_for=["k"])
            # half updates (keys spread across the table), half inserts
            src = spark.range(src_n).select(
                F.when(F.col("id") % 2 == 0,
                       F.col("id") * (n // src_n))
                .otherwise(F.col("id") + n).alias("k"),
                F.lit(-1.0).alias("v"),
            )
            if kind == "mor":
                sec, _ = timed(lambda: t.merge_rows_mor(src, keys=["k"]))
            else:
                sec, _ = timed(lambda: t.merge_rows(src, keys=["k"]))
            out[kind] = round(sec, 3)
        print(json.dumps({
            "section": "merge_cost", "k": k, "table_rows": n,
            "source_rows": src_n, **out,
        }))


def main() -> None:
    spark = get_spark()
    read_amp(spark)
    delete_costs(spark)
    merge_costs(spark)
    spark.stop()


if __name__ == "__main__":
    main()
