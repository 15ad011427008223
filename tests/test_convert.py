"""CONVERT TO SNAPSHOT — adopt a foreign plain-parquet directory
zero-copy (Delta's CONVERT TO DELTA / Iceberg's migrate), expressed as
an external-dir reference so every shallow-clone rule carries over.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


def _listing(root):
    return sorted(
        os.path.join(dp, f)
        for dp, _dn, fs in os.walk(root)
        for f in fs
    )


@pytest.fixture()
def foreign(spark, tmp_path):
    src = str(tmp_path / "legacy")
    spark.createDataFrame(
        [Row(k=i, v=float(i), cat="even" if i % 2 == 0 else "odd")
         for i in range(100)]
    ).repartition(4).write.parquet(src)
    return src


def test_convert_reads_and_never_touches_source(spark, foreign, tmp_path):
    before = _listing(foreign)
    t = SnapshotTable.convert_parquet(spark, foreign, str(tmp_path / "t"))
    assert t.current_version() == 1
    assert t._manifest(1)["mode"] == "convert"
    assert t.read().count() == 100
    assert sorted(r["k"] for r in t.read().collect()) == list(range(100))
    # conversion is metadata-only: not one source byte moved
    assert _listing(foreign) == before
    # CoW DML diverges into the NEW root; the foreign dir is untouched
    t.delete_where("k < 10")
    assert t.read().count() == 90
    assert _listing(foreign) == before
    # vacuum never crosses into the foreign dir
    t.expire_snapshots(keep_last=1)
    t.vacuum()
    assert _listing(foreign) == before
    assert t.read().count() == 90


def test_convert_mor_refuses_until_compacted(spark, foreign, tmp_path):
    t = SnapshotTable.convert_parquet(spark, foreign, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="compact"):
        t.delete_where_mor("k < 5")
    t.compact()
    t.delete_where_mor("k < 5")
    assert t.read().count() == 95


def test_convert_partitioned_dir_prunes(spark, tmp_path):
    src = str(tmp_path / "hive")
    spark.createDataFrame(
        [Row(k=i, v=float(i), cat="even" if i % 2 == 0 else "odd")
         for i in range(100)]
    ).write.partitionBy("cat").parquet(src)
    t = SnapshotTable.convert_parquet(
        spark, src, str(tmp_path / "t"), partition_by=["cat"]
    )
    assert t.read().count() == 100
    assert set(t.read().columns) == {"k", "v", "cat"}
    got = t.read().filter("cat = 'even'").count()
    assert got == 50
    # the adopted layout is the CURRENT layout: future writes keep it
    assert t.current_partition_by() == ["cat"]
    with pytest.raises(ValueError, match="not discovered"):
        SnapshotTable.convert_parquet(
            spark, src, str(tmp_path / "t2"), partition_by=["nope"]
        )


def test_convert_sql_route(spark, foreign, tmp_path):
    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    r = eng.sql(
        f"CONVERT TO SNAPSHOT PARQUET '{foreign}' AS legacy "
        f"STATS FOR (k)"
    ).collect()[0]
    assert (r["table"], r["n_files"]) == ("legacy", 4)
    # STATS FOR harvested footer bounds: the adopted table file-skips
    t = eng._snapshot_tables["legacy"]
    _sel, n_sel, n_skip = t.plan_range_scan("k", 0, 0)
    assert n_sel + n_skip == 4 and n_sel < 4
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM legacy WHERE k < 10"
    ).collect()[0]["n"] == 10
    # the converted table carries the full statement surface
    eng.sql("DELETE FROM legacy WHERE k < 10")
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM legacy"
    ).collect()[0]["n"] == 90
    with pytest.raises(ValueError, match="already registered"):
        eng.sql(f"CONVERT TO SNAPSHOT PARQUET '{foreign}' AS legacy")


def test_convert_refuses_existing_destination(spark, foreign, tmp_path):
    SnapshotTable.convert_parquet(spark, foreign, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="already exists"):
        SnapshotTable.convert_parquet(spark, foreign, str(tmp_path / "t"))


def test_convert_then_order_then_branch_compose(spark, foreign, tmp_path):
    """The round-8 surfaces compose: a converted table declares a sort
    order (localizing compact comes back clustered), branches, and
    fast-forwards — the full modernization path for a legacy dir."""
    t = SnapshotTable.convert_parquet(spark, foreign, str(tmp_path / "t"))
    t.set_sort_order(["k"])
    t.compact(target_partitions=4)           # localize + cluster
    assert "k" in t.stats_columns()
    b = t.create_branch("fix")
    b.delete_where("k >= 90")
    t.fast_forward("fix")
    assert t.read().count() == 90
    assert t.current_sort_order() == ["k"]
