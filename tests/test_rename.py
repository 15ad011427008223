"""ALTER TABLE ... RENAME COLUMN via field-ID indirection (Iceberg's
column-identity model): a metadata-only commit renames in the snapshot
schema + name→id map; data files keep their written names and every read
path re-labels them by id. Stats and blooms (keyed by write-time names)
keep pruning through the id translation; time travel shows old names at
old versions; drop-then-readd burns the id so old data does not
resurface."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k=i, v=float(i), s=f"g{i % 4}") for i in range(100)]
    )
    t.commit_clustered(
        df, cluster_by="k", n_files=10, stats_for=["k"], bloom_for=["k"]
    )
    return t


def test_rename_is_metadata_only_and_reads_by_id(spark, tbl):
    import os

    from oss_data_lake_spark.sources.skipping import _iter_parquet_files

    files = sorted(
        p
        for d in tbl._manifest(1)["data_dirs"]
        for p in _iter_parquet_files(os.path.join(tbl.path, d))
    )
    mtimes = {p: os.path.getmtime(p) for p in files}
    v = tbl.rename_column("k", "key_id")
    assert v == 2
    # no data file touched
    assert {p: os.path.getmtime(p) for p in files} == mtimes
    # head reads under the new name, with the OLD data
    df = tbl.read()
    assert df.columns == ["key_id", "v", "s"]
    assert df.agg({"key_id": "sum"}).collect()[0][0] == sum(range(100))
    # time travel shows the old name
    assert tbl.read(version=1).columns == ["k", "v", "s"]


def test_renamed_column_still_prunes(spark, tbl):
    tbl.rename_column("k", "key_id")
    # range pruning through the id → write-name translation
    sel, n_sel, n_skip = tbl.plan_range_scan("key_id", 10, 19)
    assert n_skip > 0 and n_sel < 10
    got = tbl.read_between("key_id", 10, 19)
    assert sorted(r["key_id"] for r in got.collect()) == list(range(10, 20))
    # bloom-powered point pruning survives the rename too
    sel, n_sel, n_skip = tbl.plan_eq_scan("key_id", 55)
    assert n_skip > 0
    assert tbl.read_eq("key_id", 55).count() == 1
    # and the CURRENT name is what stats_columns reports (SQL extraction)
    assert "key_id" in tbl.stats_columns()
    assert "k" not in tbl.stats_columns()


def test_append_and_dml_after_rename(spark, tbl):
    tbl.rename_column("v", "val")
    tbl.commit(
        spark.createDataFrame(
            [Row(k=100, val=100.0, s="g0")],
            "k long, val double, s string",
        ),
        mode="append",
    )
    assert tbl.read().count() == 101
    # CoW delete prunes on the renamed key column across BOTH generations
    info = tbl.delete_where(
        "k BETWEEN 10 AND 19", prune_column="k",
        prune_lower=10, prune_upper=19, stats_for=["k"],
    )
    assert info["files_skipped"] > 0
    assert tbl.read().count() == 91
    # MoR delete on a predicate over the renamed value column
    tbl.delete_where_mor("val >= 95.0")
    got = tbl.read()
    assert got.count() == 85
    assert got.where("val >= 95.0").count() == 0


def test_rename_then_change_feed_projects_current_names(spark, tbl):
    tbl.rename_column("k", "key_id")
    tbl.commit(
        spark.createDataFrame(
            [Row(key_id=500, v=1.0, s="x")],
            "key_id long, v double, s string",
        ),
        mode="append",
    )
    feed = tbl.read_change_feed(1)
    assert feed.columns[:3] == ["key_id", "v", "s"]
    assert feed.count() == 1  # the rename itself contributes nothing
    assert feed.collect()[0]["key_id"] == 500


def test_drop_then_readd_does_not_resurface(spark, tbl):
    tbl.drop_columns(["v"])
    tbl.add_columns({"v": "double"})
    # same name, FRESH field id: pre-drop doubles stay invisible
    assert tbl.read().where("v IS NOT NULL").count() == 0
    # time travel before the drop still shows the old values
    assert tbl.read(version=1).where("v IS NOT NULL").count() == 100


def test_rename_rejects_bad_names_and_rename_back(spark, tbl):
    with pytest.raises(ValueError, match="no such column"):
        tbl.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        tbl.rename_column("k", "v")
    tbl.rename_column("k", "kk")
    tbl.rename_column("kk", "k")  # rename back: full circle
    assert tbl.read().columns == ["k", "v", "s"]
    assert tbl.read_between("k", 0, 4).count() == 5


def test_rename_sql_routed_and_prunes_via_sql(spark, tmp_path):
    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(50)]
    ).createOrReplaceTempView("feed_r")
    eng.sql("CREATE TABLE rn USING snapshot AS SELECT k, v FROM feed_r")
    t = eng._snapshot_tables["rn"]
    t.compact(target_partitions=5, cluster_by="k", stats_for=["k"])
    v = eng.sql("ALTER TABLE rn RENAME COLUMN k TO key_id").collect()[0]
    assert v["version"] == 3
    rows = eng.sql(
        "SELECT count(*) AS n FROM rn WHERE key_id BETWEEN 10 AND 19"
    ).collect()
    assert rows[0]["n"] == 10
    # old name is gone from the head surface
    assert "key_id" in eng.sql("SELECT * FROM rn").columns
    # (no session-catalog fallthrough check: Spark's parquet catalog
    # itself refuses RENAME COLUMN — the snapshot table is the one
    # surface here that CAN)


def test_streaming_source_resolves_renames_by_id(spark, tmp_path):
    from oss_data_lake_spark.streaming.snapshot_source import (
        FORMAT_NAME,
        SnapshotStreamSource,
    )

    spark.dataSource.register(SnapshotStreamSource)
    t = SnapshotTable(spark, str(tmp_path / "st"))
    t.commit(spark.createDataFrame([Row(k=1, v=10.0)]))
    t.rename_column("k", "key_id")
    t.commit(
        spark.createDataFrame([Row(key_id=2, v=20.0)],
                              "key_id long, v double"),
        mode="append",
    )
    got: list[tuple] = []

    def sink(batch, _bid):
        got.extend(tuple(r) for r in batch.collect())

    q = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", t.path)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the PRE-rename file's k resolves to key_id by field id — no NULLs
    assert sorted(got) == [(1, 10.0), (2, 20.0)]
