"""Declared write sort order — Iceberg's ``WRITE ORDERED BY`` / table
write.distribution-mode=range.

Reference parity: Iceberg sort-order metadata (SortOrder in table
metadata; writers range-distribute + locally sort so footer stats give
tight per-file bounds). Metadata-only at ALTER time; ``compact()``
restores the clustered layout for generations written before the
declaration.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@contextlib.contextmanager
def _small_files(spark):
    """AQE coalesces the range shuffle's partitions up toward its
    advisory/minimum partition size — at 100 TB that sizes output files
    near the ~64 MB advisory target (the behavior we WANT); KB-scale
    test data all sits under the 1 MB minPartitionSize floor and folds
    into ONE file, hiding the layout — so the pins disable coalescing."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _rows(n, shuffle=True):
    ks = list(range(n))
    if shuffle:
        # deterministic scramble: bit-reverse-ish interleave so every
        # write task sees the full range (worst case for file bounds)
        ks = sorted(ks, key=lambda i: (i * 2654435761) % n)
    return [Row(k=i, v=float(i), cat="even" if i % 2 == 0 else "odd")
            for i in ks]


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(400)).repartition(8),
             mode="overwrite")
    return t


def test_set_sort_order_validation(spark, table):
    with pytest.raises(ValueError, match="not in table schema"):
        table.set_sort_order(["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        table.set_sort_order(["k", "k"])
    v = table.set_sort_order(["k"])
    assert v == table.current_version()
    assert table.current_sort_order() == ["k"]
    table.set_sort_order([])
    assert table.current_sort_order() == []


def test_ordered_append_gets_disjoint_file_bounds(spark, table):
    """After WRITE ORDERED BY, an append of scrambled rows lands as
    range-disjoint files with auto-harvested stats, and a narrow
    read_between opens a strict subset of the commit's files."""
    table.set_sort_order(["k"])
    with _small_files(spark):
        table.commit(
            spark.createDataFrame(_rows(400)).repartition(8), mode="append"
        )
    # stats were harvested for the sort column without being asked for
    assert "k" in table.stats_columns()
    sel, n_sel, n_skip = table.plan_range_scan("k", 10, 20)
    assert n_skip > 0, "sorted files must let a narrow range skip files"
    # correctness unchanged: the multiset survives the range shuffle
    assert table.read().count() == 800
    got = sorted(
        r["k"] for r in table.read_between("k", 10, 20).collect()
    )
    assert got == sorted(list(range(10, 21)) * 2)


def test_ordered_files_are_near_disjoint(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(50, shuffle=False)),
             mode="overwrite")
    t.set_sort_order(["k"])
    with _small_files(spark):
        t.commit(spark.createDataFrame(_rows(1000)).repartition(8),
                 mode="append")
    m = t._manifest(t.current_version())
    new_dir = m["data_dirs"][-1]
    stats = m["file_stats"][new_dir]
    spans = sorted(
        (s["k"]["min"], s["k"]["max"]) for s in stats.values()
    )
    assert len(spans) > 1, "range write should produce multiple files"
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {spans}"


def test_unordered_table_unchanged(spark, table):
    """No declared order → the write path is byte-identical to before
    (no extra shuffle, no auto stats)."""
    table.commit(spark.createDataFrame(_rows(100)), mode="append")
    assert table.stats_columns() == set() or "k" not in {
        c for c in table.stats_columns()
    }


def test_sort_order_sticky_through_dml_and_rollback(spark, table):
    table.set_sort_order(["k"])
    v_set = table.current_version()
    table.delete_where("k < 10")
    assert table.current_sort_order() == ["k"], "CoW DML must not erase it"
    table.commit(spark.createDataFrame(_rows(50)), mode="append")
    assert table.current_sort_order() == ["k"]
    table.rollback(v_set - 1)
    # layout declarations are the HEAD's operator decision (like
    # constraints): rolling data back keeps the declared order
    assert table.current_sort_order() == ["k"]


def test_rename_follows_sort_order(spark, table):
    table.set_sort_order(["k", "v"])
    table.rename_column("k", "key")
    assert table.current_sort_order() == ["key", "v"]


def test_compact_adopts_declared_order(spark, tmp_path):
    """A table that accreted unordered commits regains the clustered
    layout from a plain compact() once an order is declared."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.commit(
            spark.createDataFrame(_rows(200)).repartition(4),
            mode="append" if i else "overwrite",
        )
    t.set_sort_order(["k"])
    with _small_files(spark):
        t.compact(target_partitions=4)
    _sel, n_sel, n_skip = t.plan_range_scan("k", 0, 40)
    assert n_skip > 0
    assert t.read().count() == 800
    m = t._manifest(t.current_version())
    assert m["mode"] == "compact"  # dataChange=false is preserved


def test_clone_carries_sort_order(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(40)), mode="overwrite")
    t.set_sort_order(["k"])
    c = t.shallow_clone_to(str(tmp_path / "c"))
    assert c.current_sort_order() == ["k"]


def test_sql_surface(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(40)), mode="overwrite")
    eng = Engine(spark=spark)
    eng._snapshot_tables["t"] = t
    v = eng.sql("ALTER TABLE t WRITE ORDERED BY (k, v)").collect()[0]
    assert v["version"] == t.current_version()
    assert t.current_sort_order() == ["k", "v"]
    ddl = eng.sql("SHOW CREATE TABLE t").collect()[0]["createtab_stmt"]
    assert "WRITE ORDERED BY (k, v)" in ddl
    d = eng.sql("DESCRIBE DETAIL t").collect()[0]
    assert d["sort_order"] == "k, v"
    eng.sql("ALTER TABLE t WRITE UNORDERED")
    assert t.current_sort_order() == []
    d = eng.sql("DESCRIBE DETAIL t").collect()[0]
    assert d["sort_order"] is None
    with pytest.raises(ValueError, match="at least one column"):
        eng.sql("ALTER TABLE t WRITE ORDERED BY ()")


def test_missing_sort_column_skips_quietly(spark, table):
    """Stale metadata must not brick writes: a sort column the incoming
    frame lacks (schema changed under the declaration) is skipped."""
    table.add_columns({"extra": "double"})
    table.set_sort_order(["extra", "k"])
    # overwrite with a frame that no longer carries 'extra': the write
    # sorts on the surviving column and succeeds
    table.commit(spark.createDataFrame(_rows(30)), mode="overwrite")
    assert table.read().count() == 30
    assert table.current_sort_order() == ["extra", "k"]


def test_compact_survives_dropped_sort_column(spark, table):
    """Review finding r8: plain compact() must sort on the surviving
    columns when the schema lost a declared sort column."""
    table.add_columns({"extra": "double"})
    table.set_sort_order(["extra", "k"])
    table.commit(spark.createDataFrame(_rows(10)), mode="overwrite")
    # the overwrite's schema has no 'extra'; compact must not raise
    table.compact(target_partitions=2)
    assert table.read().count() == 10


def test_streaming_sink_adopts_sort_order(spark, tmp_path):
    """Micro-batches committed through the sink's commit_batch ride the
    declared order: accreted files carry auto-harvested sort-column
    stats, so streaming accretion never erodes range skipping."""
    from oss_data_lake_spark.streaming.snapshot_sink import commit_batch

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(50)), mode="overwrite")
    t.set_sort_order(["k"])
    with _small_files(spark):
        for b in range(3):
            commit_batch(
                t, spark.createDataFrame(_rows(400)).repartition(4), b, "s1"
            )
    assert "k" in t.stats_columns()
    _sel, n_sel, n_skip = t.plan_range_scan("k", 0, 10)
    assert n_skip > 0, "accreted batches must keep range skipping alive"
    assert t.read().count() == 1250


def test_cow_rewrite_honors_sort_order(spark, tmp_path):
    """CoW DML's replacement dir comes back range-clustered with stats:
    DML never erodes the WRITE ORDERED BY layout."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(400)).repartition(8),
             mode="overwrite")
    t.set_sort_order(["k"])
    with _small_files(spark):
        t.update_where("k >= 0", {"v": "v + 0.5"})  # rewrites every row
    m = t._manifest(t.current_version())
    new_dir = m["data_dirs"][-1]
    stats = m.get("file_stats", {}).get(new_dir) or {}
    assert stats, "rewritten dir must carry auto-harvested sort stats"
    spans = sorted((s["k"]["min"], s["k"]["max"]) for s in stats.values())
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"replacement files overlap: {spans}"
    assert t.read().count() == 400
