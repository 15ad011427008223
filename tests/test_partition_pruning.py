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


# ------------------------------------------------- hidden partitioning
#
# Iceberg partition transforms: the table partitions by a DERIVED value
# (days(ts) / bucket(n, k) / truncate(w, s)) held in a hidden _p_*
# column that readers never see; planners prune on the SOURCE column's
# predicates by pushing bounds through the transform.


def _mk_days(spark, path, n=120):
    import datetime

    t = SnapshotTable(spark, str(path))
    rows = [
        Row(
            k=i,
            ts=datetime.datetime(1996, 1 + i % 6, 1 + i % 28, i % 24),
            s=f"s{i:03d}",
        )
        for i in range(n)
    ]
    rows.append(Row(k=-1, ts=None, s=None))
    t.commit(spark.createDataFrame(rows), partition_by=["days(ts)"])
    return t


def test_hidden_days_invisible_and_prunes(spark, tmp_path):
    t = _mk_days(spark, tmp_path / "d")
    df = t.read()
    assert df.columns == ["k", "ts", "s"], "hidden column must not leak"
    assert df.count() == 121
    sel, n_sel, n_skip = t.plan_range_scan(
        "ts", "1996-03-01", "1996-03-31 23:59:59"
    )
    assert n_skip > 0 and n_sel > 0
    pruned = t.read_between("ts", "1996-03-01", "1996-03-31 23:59:59")
    cond = "ts >= '1996-03-01' AND ts <= '1996-03-31 23:59:59'"
    assert pruned.filter(cond).count() == df.filter(cond).count()
    # point probe isolates one day's files
    _sel, n_sel2, n_skip2 = t.plan_eq_scan("ts", "1996-02-02 00:00:00")
    assert n_skip2 > n_skip
    # NULL source rows live in the null partition and prune to it
    _sel, n_null, skip_null = t.plan_null_scan("ts", True)
    assert n_null == 1
    assert t.read().where("ts IS NULL").count() == 1


def test_hidden_bucket_eq_prunes_range_does_not(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "b"))
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(100)]),
        partition_by=["bucket(8, k)"],
    )
    assert t.read().columns == ["k", "v"]
    sel, n_sel, n_skip = t.plan_eq_scan("k", 42)
    assert n_skip > 0, "point probe must isolate one bucket"
    got = t.read_eq("k", 42).where("k = 42")
    assert got.count() == 1
    # bucket is not monotone: a range must NOT claim pruning power
    sel, n_sel, n_skip = t.plan_range_scan("k", 10, 20)
    assert n_skip == 0
    assert t.read_between("k", 10, 20).where(
        "k BETWEEN 10 AND 20"
    ).count() == 11


def test_hidden_truncate_string_and_int(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tr"))
    t.commit(
        spark.createDataFrame(
            [Row(g=f"grp{i % 4}x{i}", k=i * 10) for i in range(80)]
        ),
        partition_by=["truncate(4, g)", "truncate(200, k)"],
    )
    assert t.read().columns == ["g", "k"]
    _sel, n_sel, n_skip = t.plan_eq_scan("g", "grp2x2")
    assert n_skip > 0
    assert t.read_eq("g", "grp2x2").where("g = 'grp2x2'").count() == 1
    _sel, n_sel, n_skip = t.plan_range_scan("k", 0, 150)
    assert n_skip > 0
    assert t.read_between("k", 0, 150).where(
        "k BETWEEN 0 AND 150"
    ).count() == 16


def test_hidden_partitioning_sql_routing_and_show_create(spark, tmp_path):
    """SQL-text WHERE on the SOURCE column routes through the hidden
    transform (stats_columns reports the source), and SHOW CREATE TABLE
    displays the transform, not the hidden column."""
    t = _mk_days(spark, tmp_path / "s")
    assert "ts" in t.stats_columns()
    e = Engine(spark=spark)
    e._snapshot_tables["h"] = t
    got = e.sql(
        "SELECT count(*) AS c FROM h "
        "WHERE ts BETWEEN TIMESTAMP '1996-03-01 00:00:00'"
        " AND TIMESTAMP '1996-03-31 23:59:59'"
    ).collect()[0]["c"]
    want = t.read().where(
        "ts >= '1996-03-01' AND ts <= '1996-03-31 23:59:59'"
    ).count()
    assert got == want
    stmt = e.sql("SHOW CREATE TABLE h").collect()[0]["createtab_stmt"]
    assert "PARTITIONED BY (days(ts))" in stmt
    assert "_p_days_ts" not in stmt


def test_hidden_partitioning_dml_and_history(spark, tmp_path):
    """Copy-on-write DML prunes through the transform and rewrites
    correctly; rollback and appends carry the transform spec."""
    t = _mk_days(spark, tmp_path / "m")
    import datetime

    t.commit(
        spark.createDataFrame(
            [Row(k=1000, ts=datetime.datetime(1997, 1, 1), s="late")]
        ),
        mode="append",
        partition_by=["days(ts)"],
    )
    res = t.delete_where(
        "ts >= TIMESTAMP '1996-03-01 00:00:00' AND "
        "ts <= TIMESTAMP '1996-03-31 23:59:59'",
        prune_column="ts",
        prune_lower="1996-03-01",
        prune_upper="1996-03-31 23:59:59",
    )
    assert res["files_skipped"] > 0
    assert t.read().where(
        "ts >= '1996-03-01' AND ts <= '1996-03-31 23:59:59'"
    ).count() == 0
    assert t.read().where("s = 'late'").count() == 1
    t.rollback(2)
    assert t.read().where(
        "ts >= '1996-03-01' AND ts <= '1996-03-31 23:59:59'"
    ).count() > 0
    # the transform survives rollback: the pre-delete files still prune
    _sel, n_sel, n_skip = t.plan_eq_scan("ts", "1996-02-02 00:00:00")
    assert n_skip > 0


def test_hidden_transform_survives_source_rename(spark, tmp_path):
    t = _mk_days(spark, tmp_path / "r")
    t.rename_column("ts", "event_ts")
    assert "event_ts" in t.stats_columns()
    _sel, n_sel, n_skip = t.plan_range_scan(
        "event_ts", "1996-03-01", "1996-03-31 23:59:59"
    )
    assert n_skip > 0, "renamed source must keep pruning via field id"
    got = t.read_between(
        "event_ts", "1996-03-01", "1996-03-31 23:59:59"
    ).where("event_ts >= '1996-03-01' AND event_ts <= '1996-03-31 23:59:59'")
    assert got.count() == t.read().where(
        "event_ts >= '1996-03-01' AND event_ts <= '1996-03-31 23:59:59'"
    ).count()


def test_transform_parse_errors():
    from oss_data_lake_spark.sources.snapshots import parse_partition_entry

    assert parse_partition_entry("p") == ("p", None)
    pcol, tr = parse_partition_entry("days(ts)")
    assert pcol == "_p_days_ts" and tr["kind"] == "days"
    pcol, tr = parse_partition_entry("bucket(16, user_id)")
    assert pcol == "_p_bucket16_user_id" and tr["param"] == 16
    with pytest.raises(ValueError, match="positive"):
        parse_partition_entry("truncate(0, s)")


def test_insert_and_copy_adopt_current_layout(spark, tmp_path):
    """SQL INSERT INTO and COPY INTO write under the table's CURRENT
    partition spec (identity and hidden transform) — appends must not
    accrete unpartitioned dirs that erode pruning."""
    import datetime
    import glob as _glob

    e = Engine(spark=spark)
    # identity layout
    t = SnapshotTable(spark, str(tmp_path / "i"))
    t.commit(
        spark.createDataFrame([Row(k=i, p=i % 2) for i in range(8)]),
        partition_by=["p"],
    )
    e._snapshot_tables["i"] = t
    e.sql("INSERT INTO i VALUES (100, 1), (101, 0)")
    m = t._manifest(t.current_version())
    new_dir = m["data_dirs"][-1]
    assert m["partition_specs"][new_dir] == ["p"]
    assert _glob.glob(
        str(tmp_path / "i" / new_dir / "p=1" / "*.parquet")
    ), "insert must write Hive segments under the adopted spec"
    _sel, n_sel, n_skip = t.plan_eq_scan("p", 1)
    assert n_skip > 0 and t.read_eq("p", 1).count() == 5

    # hidden days(ts) layout, through COPY INTO
    h = SnapshotTable(spark, str(tmp_path / "h"))
    h.commit(
        spark.createDataFrame(
            [Row(k=i, ts=datetime.datetime(1996, 1, 1 + i % 4))
             for i in range(8)]
        ),
        partition_by=["days(ts)"],
    )
    e._snapshot_tables["h"] = h
    land = tmp_path / "land"
    spark.createDataFrame(
        [Row(k=100, ts=datetime.datetime(1996, 2, 1))]
    ).coalesce(1).write.parquet(str(land / "b1"))
    e.sql(f"COPY INTO h FROM '{land}'")
    m = h._manifest(h.current_version())
    new_dir = m["data_dirs"][-1]
    assert "_p_days_ts" in (m["partition_transforms"].get(new_dir) or {})
    assert h.read().columns == ["k", "ts"]
    # the copied day prunes alongside the original commit's days
    _sel, n_sel, n_skip = h.plan_eq_scan("ts", "1996-02-01 00:00:00")
    assert n_sel >= 1 and n_skip > 0
    assert h.read().where("ts = '1996-02-01'").count() == 1


def test_cow_rewrite_keeps_partition_layout(spark, tmp_path):
    """CoW DELETE/UPDATE replacement dirs stay under the table's spec —
    DML must not erode a partitioned table into unpartitioned dirs, and
    the rewritten rows must keep pruning."""
    import datetime
    import glob as _glob

    t = _mk_days(spark, tmp_path / "c")
    # delete only the AFTERNOON rows of February: candidate files (the
    # February day-partitions) keep morning survivors, which must be
    # rewritten back under day segments
    t.delete_where(
        "ts >= TIMESTAMP '1996-02-01 00:00:00' AND "
        "ts <= TIMESTAMP '1996-02-28 23:59:59' AND hour(ts) >= 6",
        prune_column="ts",
        prune_lower="1996-02-01",
        prune_upper="1996-02-28 23:59:59",
    )
    m = t._manifest(t.current_version())
    new_dir = m["data_dirs"][-1]
    assert new_dir.startswith("data/r")
    assert "_p_days_ts" in (m["partition_transforms"].get(new_dir) or {})
    assert _glob.glob(
        str(tmp_path / "c" / new_dir / "_p_days_ts=*")
    ), "replacement must carry Hive day segments"
    assert t.read().columns == ["k", "ts", "s"]
    # the rewritten survivors still prune by day
    _sel, n_sel, n_skip = t.plan_eq_scan("ts", "1996-01-02 00:00:00")
    assert n_skip > 0
    feb = t.read().where("ts >= '1996-02-01' AND ts <= '1996-02-28 23:59:59'")
    assert feb.count() > 0 and feb.where("hour(ts) >= 6").count() == 0

    # identity layout through SQL UPDATE
    e = Engine(spark=spark)
    ti = SnapshotTable(spark, str(tmp_path / "iu"))
    ti.commit(
        spark.createDataFrame([Row(k=i, p=i % 2, v=float(i))
                               for i in range(10)]),
        partition_by=["p"],
    )
    e._snapshot_tables["iu"] = ti
    e.sql("UPDATE iu SET v = v + 100 WHERE k >= 0")
    m = ti._manifest(ti.current_version())
    new_dir = m["data_dirs"][-1]
    assert m["partition_specs"][new_dir] == ["p"]
    _sel, n_sel, n_skip = ti.plan_eq_scan("p", 1)
    assert n_skip > 0
    assert ti.read_eq("p", 1).count() == 5
    assert ti.read().where("v < 100").count() == 0
