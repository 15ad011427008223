"""Planner-side file skipping for Hive PARTITION columns: their values
live in path segments, not footers, so the planners derive synthetic
per-file bounds from the paths (`_partition_stats_entry`). This is what
keeps `WHERE p = x` from opening every file once partitioned dirs fold
into one explicit-leaf-file scan (which bypasses Spark's native partition
pruning), and it works with zero footer stats recorded."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    # 12 partitioned append commits, NO stats_for anywhere: the only
    # pruning power is the partition segment itself
    for wave in range(12):
        t.commit(
            spark.createDataFrame(
                [Row(k=wave * 10 + j, p=f"g{j % 4}", v=float(j))
                 for j in range(8)]
            ),
            mode="append",
            partition_by=["p"],
        )
    return t


def test_eq_and_range_prune_by_partition_segment(spark, tbl):
    sel, n_sel, n_skip = tbl.plan_eq_scan("p", "g1")
    assert n_skip > 0 and n_sel * 3 == n_skip  # 1 of 4 values kept
    got = tbl.read_eq("p", "g1")
    assert got.count() == 24  # 12 waves x 2 rows per value
    assert got.where("p <> 'g1'").count() == 0
    # string range: lexical bounds from the segments
    sel, n_sel, n_skip = tbl.plan_range_scan("p", "g2", "g3")
    assert n_skip > 0
    assert tbl.read_between("p", "g2", "g3").count() == 48


def test_in_list_and_null_prune_by_partition_segment(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "n"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, p=("gA" if i % 3 == 0 else ("gB" if i % 3 == 1 else None)))
             for i in range(30)]
        ),
        partition_by=["p"],
    )
    # NULL partition values land in __HIVE_DEFAULT_PARTITION__; the
    # synthetic entry is all-null, so IS NULL keeps ONLY that segment
    sel, n_sel, n_skip = t.plan_null_scan("p", want_null=True)
    assert n_sel >= 1 and n_skip >= 2
    rows = t._read_selection(1, sel)
    assert rows.where("p IS NULL").count() == 10
    sel, n_sel2, n_skip2 = t.plan_null_scan("p", want_null=False)
    assert n_skip2 >= 1  # the null segment provably cannot match
    # IN list unions the per-value plans
    sel, n_sel3, n_skip3 = t.plan_pruned([{"col": "p", "in": ["gA", "gB"]}])
    assert n_skip3 >= 1
    got = t._read_selection(1, sel).where("p IN ('gA','gB')")
    assert got.count() == 20


def test_sql_text_where_prunes_partition_column(spark, tbl):
    """The SQL persona: `WHERE p = 'g1'` over a registered snapshot table
    must reach the partition-segment skipping (stats_columns now reports
    partition columns)."""
    assert "p" in tbl.stats_columns()
    eng = Engine(spark=spark)
    eng._snapshot_tables["pt"] = tbl
    got = eng.sql("SELECT count(*) AS n FROM pt WHERE p = 'g1'").collect()
    assert got[0]["n"] == 24
    # and the DML path: a partition-keyed CoW delete rewrites only the
    # admitted files
    res = eng.sql("DELETE FROM pt WHERE p = 'g0'").collect()[0]
    assert res["files_skipped"] > 0
    assert eng.sql("SELECT count(*) AS n FROM pt").collect()[0]["n"] == 72


def test_partition_pruning_survives_rename_and_typed_values(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "r"))
    for wave in range(3):
        t.commit(
            spark.createDataFrame(
                [Row(k=wave * 10 + j, day=10 + j) for j in range(4)],
                "k long, day int",
            ),
            mode="append",
            partition_by=["day"],
        )
    # INT-typed partition values: the synthetic bound encodes numerically
    sel, n_sel, n_skip = t.plan_range_scan("day", 12, 13)
    assert n_skip > 0
    assert t.read_between("day", 12, 13).count() == 6
    # rename the partition column: the spec keeps the write-time name,
    # the planner translates through the field id
    t.rename_column("day", "d")
    sel, n_sel2, n_skip2 = t.plan_range_scan("d", 12, 13)
    assert (n_sel2, n_skip2) == (n_sel, n_skip)
    assert t.read_between("d", 12, 13).count() == 6
    assert "d" in t.stats_columns() and "day" not in t.stats_columns()


def test_partition_pruning_composes_with_footer_stats(spark, tmp_path):
    """A predicate on a partition column AND one on a stats column
    intersect their plans."""
    t = SnapshotTable(spark, str(tmp_path / "c"))
    for wave in range(4):
        t.commit(
            spark.createDataFrame(
                [Row(k=wave * 100 + j, p=f"g{j % 2}") for j in range(20)]
            ),
            mode="append",
            partition_by=["p"],
            stats_for=["k"],
        )
    sel, n_sel, n_skip = t.plan_pruned([("p", "g1", "g1"), ("k", 0, 99)])
    # only wave-0's g1 files survive both
    assert n_sel >= 1
    got = t._read_selection(t.current_version(), sel).where(
        "p = 'g1' AND k BETWEEN 0 AND 99"
    )
    assert got.count() == 10
    total = sum(len(f) for f in sel.values() if f is not None)
    assert total == n_sel and n_skip > n_sel
