"""Cherry-pick — Iceberg's ``cherrypick_snapshot``: re-apply a
pure-append commit's delta onto head with zero data copy.

The canonical flow: rollback drops a run of commits; cherry_pick
re-lands the good ones without replaying their writes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


def _rows(lo, hi, extra=None):
    return [Row(k=i, v=float(i)) for i in range(lo, hi)]


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(0, 50)), mode="overwrite")   # v1
    t.commit(spark.createDataFrame(_rows(50, 80)), mode="append")     # v2
    t.commit(spark.createDataFrame(_rows(80, 100)), mode="append")    # v3
    return t


def test_cherry_pick_after_rollback(spark, table):
    table.rollback(1)                      # v4: back to 50 rows
    assert table.read().count() == 50
    v = table.cherry_pick(3)               # re-land v3's 20 rows only
    assert v == table.current_version()
    assert table.read().count() == 70
    got = sorted(r["k"] for r in table.read().collect())
    assert got == list(range(0, 50)) + list(range(80, 100))
    m = table._manifest(v)
    assert m["mode"] == "cherry_pick_3"
    # the feed sees it as a plain insert step
    feed = table.read_change_feed(v - 1, v)
    assert feed.count() == 20
    assert {r["_change_type"] for r in feed.collect()} == {"insert"}


def test_cherry_pick_refusals(spark, table):
    # non-append commits refuse
    table.delete_where("k < 5")            # v4: CoW delete
    with pytest.raises(ValueError, match="pure-append"):
        table.cherry_pick(4)
    with pytest.raises(ValueError, match="pure-append"):
        table.cherry_pick(1)               # overwrite
    # the CoW delete rewrote the base into new dirs: v2's rows live on
    # in the rewrite's output, so re-adding its dirs would duplicate —
    # the lineage guard refuses
    with pytest.raises(ValueError, match="consumed by a"):
        table.cherry_pick(2)
    # ...and after a rollback to the intact base the same pick lands
    table.rollback(1)
    v = table.cherry_pick(2)
    assert table.read(version=v).count() == 80
    # picking the same commit twice duplicates — dir-visibility refusal
    with pytest.raises(ValueError, match="already visible"):
        table.cherry_pick(2)


def test_cherry_pick_refuses_after_vacuum(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(0, 10)), mode="overwrite")  # v1
    t.commit(spark.createDataFrame(_rows(10, 20)), mode="append")    # v2
    t.rollback(1)                                                    # v3
    t.expire_snapshots(keep_last=2)  # v1's manifest (v2's parent) expires
    with pytest.raises(ValueError, match="expired"):
        t.cherry_pick(2)


def test_cherry_pick_sql(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(0, 10)), mode="overwrite")  # v1
    t.commit(spark.createDataFrame(_rows(10, 20)), mode="append")    # v2
    t.rollback(1)                                                    # v3
    eng = Engine(spark=spark)
    eng._snapshot_tables["t"] = t
    v = eng.sql("ALTER TABLE t CHERRY PICK VERSION 2").collect()[0]
    assert v["version"] == t.current_version()
    assert eng.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"] == 20


def test_cherry_pick_field_id_guard(spark, tmp_path):
    """A column dropped since the commit makes its data unlabelable —
    the pick must refuse, not silently NULL."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([Row(k=1, v=1.0, extra="x")]),
        mode="overwrite",
    )                                                               # v1
    t.commit(
        spark.createDataFrame([Row(k=2, v=2.0, extra="y")]),
        mode="append",
    )                                                               # v2
    t.rollback(1)                                                   # v3
    t.drop_columns(["extra"])                                       # v4
    t.commit(spark.createDataFrame(_rows(10, 12)), mode="overwrite")  # v5
    with pytest.raises(ValueError, match="field ids"):
        t.cherry_pick(2)


def test_cherry_pick_refuses_when_rewrite_output_visible_via_rollback(
    spark, tmp_path
):
    """Review finding r8: a rollback may DROP the picked dir while an
    earlier rewrite's output (holding the same rows) is visible at head
    — every consuming rewrite must be checked, not just the most
    recent drop."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(_rows(0, 10)), mode="overwrite")   # v1
    t.commit(spark.createDataFrame(_rows(10, 20)), mode="append")     # v2: dir d
    t.compact()                                                       # v3: d -> o
    t.rollback(2)                                                     # v4: d back
    t.rollback(3)                                                     # v5: o back, d gone
    with pytest.raises(ValueError, match="still\\s+visible|consumed"):
        t.cherry_pick(2)
