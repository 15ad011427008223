"""Scaling measurement for the MAINTENANCE surfaces (VERDICT r5 ask #5):

1. Incremental MV refresh (`operators/matview.py`): the claim is
   O(delta + groups), NOT O(fact). Protocol: build a fact table of
   k x BASE_ROWS rows (k = 1, 4, 16), fully refresh the MV once (that
   cost legitimately grows with k), then append a FIXED-size delta and
   time the incremental refresh. A flat incremental curve across k while
   the full-build curve grows ~k x is the evidence; group count is held
   constant (the state merge is O(groups)).

2. Exactly-once sink commit overhead (`snapshots.commit` with a txn
   identity): per-batch metadata-tail cost must be flat in TABLE SIZE
   (same fixed batch appended to a k x table) and must AMORTIZE in batch
   size (fixed tail over a growing write). Measured: txn-append seconds
   for a constant 5k-row batch at each k, and for growing batches at
   k = 1 the tail share = (commit - bare parquet write of the same
   frame) / commit.

Prints one JSON line per k; record in SCALE.md. Run:
    python scripts/scale_maintenance.py
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

from oss_data_lake_spark.operators.matview import IncrementalAggregate  # noqa: E402
from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.snapshots import SnapshotTable  # noqa: E402

OUT_ROOT = "/tmp/spark_graft_scale_maint"
BASE_ROWS = 200_000
DELTA_ROWS = 20_000
SINK_BATCH = 5_000
N_GROUPS = 1_000
KS = tuple(int(a) for a in sys.argv[1:]) or (1, 4, 16)


def gen(spark, n: int, start: int = 0):
    return (
        spark.range(start, start + n)
        .select(
            (F.col("id") % N_GROUPS).alias("g"),
            (F.col("id") * 0.37).alias("v"),
        )
    )


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="scale_maintenance")
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    # warm the whole machinery (JVM codegen, parquet writer, MV merge
    # plan) on a throwaway table so k=1 doesn't absorb first-run costs
    w = SnapshotTable(spark, f"{OUT_ROOT}/warm/fact")
    w.commit(gen(spark, 10_000))
    wmv = IncrementalAggregate(
        w, f"{OUT_ROOT}/warm/mv", group_by=["g"], measures={"sum_v": "v"}
    )
    wmv.refresh()
    w.commit(gen(spark, 1_000, start=10_000), mode="append")
    wmv.refresh()
    for k in KS:
        base = k * BASE_ROWS
        t = SnapshotTable(spark, f"{OUT_ROOT}/k{k}/fact")
        t.commit(gen(spark, base).repartition(8))
        mv = IncrementalAggregate(
            t, f"{OUT_ROOT}/k{k}/mv", group_by=["g"], measures={"sum_v": "v"}
        )
        t_full = timed(mv.refresh)  # grows with k (whole-fact aggregate)
        t.commit(gen(spark, DELTA_ROWS, start=base), mode="append")
        t_incr = timed(mv.refresh)  # must stay ~flat across k
        # sink: constant batch, txn identity, table already k x big
        batch = gen(spark, SINK_BATCH, start=base + DELTA_ROWS)
        t_sink = timed(
            lambda: t.commit(batch, mode="append", txn_app="m", txn_version=1)
        )
        # row-level DML: delete a FIXED-size key slice from a clustered
        # table whose PER-FILE size is constant across k (file count grows
        # with the table) — copy-on-write cost must track the matched
        # slice, not the table
        d = SnapshotTable(spark, f"{OUT_ROOT}/k{k}/dml")
        d.commit_clustered(
            spark.range(0, base).select(
                F.col("id").alias("key"), (F.col("id") * 0.1).alias("v")
            ),
            cluster_by="key",
            n_files=10 * k,
            stats_for=["key"],
        )
        t0 = time.perf_counter()
        info = d.delete_where(
            f"key BETWEEN 0 AND {DELTA_ROWS - 1}",
            prune_column="key", prune_lower=0, prune_upper=DELTA_ROWS - 1,
            stats_for=["key"],
        )
        t_dml = round(time.perf_counter() - t0, 3)
        # CoW vs MoR with GROWING file sizes (file COUNT fixed at 10, so
        # at k=16 each file holds 16x the rows): a fixed 20k-key delete
        # forces CoW to rewrite one ever-bigger file, while MoR writes a
        # constant 20k tombstones — the separation that justifies
        # merge-on-read at 100 TB
        def big_file_table(tag):
            bt = SnapshotTable(spark, f"{OUT_ROOT}/k{k}/{tag}")
            bt.commit_clustered(
                spark.range(0, base).select(
                    F.col("id").alias("key"), (F.col("id") * 0.1).alias("v")
                ),
                cluster_by="key",
                n_files=10,
                stats_for=["key"],
            )
            return bt

        cow_t = big_file_table("cow")
        t_cow = timed(
            lambda: cow_t.delete_where(
                f"key BETWEEN 0 AND {DELTA_ROWS - 1}",
                prune_column="key", prune_lower=0, prune_upper=DELTA_ROWS - 1,
                stats_for=["key"],
            )
        )
        mor_t = big_file_table("mor")
        t_mor = timed(
            lambda: mor_t.delete_where_mor(
                f"key BETWEEN 0 AND {DELTA_ROWS - 1}",
                prune_column="key", prune_lower=0, prune_upper=DELTA_ROWS - 1,
            )
        )
        row = {
            "k": k,
            "fact_rows": base,
            "mv_full_refresh_s": t_full,
            "mv_incr_refresh_s": t_incr,
            "sink_commit_5k_s": t_sink,
            "dml_delete_fixed_slice_s": t_dml,
            "dml_files_rewritten": info["files_rewritten"],
            "dml_files_skipped": info["files_skipped"],
            "cow_delete_bigfile_s": t_cow,
            "mor_delete_bigfile_s": t_mor,
        }
        if k == KS[0]:
            # amortization at fixed table size: txn commit vs a bare
            # parquet write of an INDEPENDENT same-shape frame (separate
            # lineages — a shared frame would let the second action reuse
            # the first's shuffle and bias the comparison)
            amort = {}
            for n in (5_000, 50_000, 500_000):
                bare_frame = gen(spark, n, start=10_000_000).repartition(4)
                commit_frame = gen(spark, n, start=20_000_000).repartition(4)
                bare = timed(
                    lambda f=bare_frame, n=n: f.write.mode(
                        "overwrite"
                    ).parquet(f"{OUT_ROOT}/bare_{n}")
                )
                commit = timed(
                    lambda f=commit_frame, n=n: t.commit(
                        f, mode="append", txn_app="a", txn_version=n
                    )
                )
                amort[str(n)] = {
                    "bare_write_s": bare,
                    "txn_commit_s": commit,
                    "tail_share": round(max(0.0, commit - bare) / commit, 3),
                }
            row["amortization"] = amort
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
