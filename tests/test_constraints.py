"""Table CHECK constraints (Delta ALTER TABLE ... ADD CONSTRAINT parity):
commit-time quality gates on snapshot tables, surviving every commit kind
and enforced across the whole write surface (commits, streaming-sink
batches, UPDATE/MERGE rewrites, SQL INSERT)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(10)]))
    return t


def test_add_validates_existing_and_gates_commits(spark, tbl):
    v = tbl.add_constraint("v_nonneg", "v >= 0")
    assert v == 2 and tbl.constraints() == {"v_nonneg": "v >= 0"}
    # adding a constraint current rows violate refuses
    with pytest.raises(ValueError, match="violated by existing rows"):
        tbl.add_constraint("v_big", "v > 5")
    # a violating append refuses BEFORE any data lands
    with pytest.raises(ValueError, match="v_nonneg"):
        tbl.commit(
            spark.createDataFrame([Row(k=99, v=-1.0)]), mode="append"
        )
    assert tbl.current_version() == 2
    assert tbl.read().count() == 10
    # satisfying appends pass; NULL satisfies (SQL CHECK semantics)
    tbl.commit(
        spark.createDataFrame(
            [Row(k=100, v=None)], "k long, v double"
        ),
        mode="append",
    )
    assert tbl.read().count() == 11


def test_constraints_survive_overwrite_rollback_and_gate_dml(spark, tbl):
    tbl.add_constraint("v_nonneg", "v >= 0")
    tbl.commit(spark.createDataFrame([Row(k=1, v=5.0)]))  # overwrite
    assert tbl.constraints() == {"v_nonneg": "v >= 0"}
    tbl.rollback(2)
    assert tbl.constraints() == {"v_nonneg": "v >= 0"}
    # an UPDATE that would write violating rows refuses atomically
    with pytest.raises(ValueError, match="v_nonneg"):
        tbl.update_where("k < 5", {"v": "v - 100.0"})
    assert tbl.read().filter("v < 0").count() == 0
    # DELETE needs no validation pass and still works
    tbl.delete_where("k = 0")
    assert tbl.read().filter("k = 0").count() == 0
    # drop lifts the gate
    tbl.drop_constraint("v_nonneg")
    tbl.update_where("k = 1", {"v": "v - 100.0"})
    assert tbl.read().filter("v < 0").count() == 1
    with pytest.raises(ValueError, match="no such constraint"):
        tbl.drop_constraint("v_nonneg")


def test_constraints_through_sql_text(spark, tmp_path):
    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(10)]
    ).createOrReplaceTempView("feed")
    eng.sql("CREATE TABLE gated USING snapshot AS SELECT k, v FROM feed")
    eng.sql("ALTER TABLE gated ADD CONSTRAINT v_small CHECK (v < 100)")
    with pytest.raises(ValueError, match="v_small"):
        eng.sql("INSERT INTO gated VALUES (50, CAST(500.0 AS DOUBLE))")
    eng.sql("INSERT INTO gated VALUES (50, CAST(50.0 AS DOUBLE))")
    assert eng.sql("SELECT count(*) AS n FROM gated").collect()[0]["n"] == 11
    with pytest.raises(ValueError, match="v_small"):
        eng.sql("UPDATE gated SET v = v * 100 WHERE k = 1")
    eng.sql("ALTER TABLE gated DROP CONSTRAINT v_small")
    eng.sql("UPDATE gated SET v = v * 100 WHERE k = 1")
    # unregistered ALTERs still fall through to the session catalog
    spark.sql("CREATE TABLE IF NOT EXISTS plain_alter (a INT) USING parquet")
    eng.sql("ALTER TABLE plain_alter ADD COLUMNS (b INT)")
    spark.sql("DROP TABLE plain_alter")


def test_streaming_sink_batches_are_gated(spark, tmp_path):
    from oss_data_lake_spark.streaming.snapshot_sink import commit_batch

    t = SnapshotTable(spark, str(tmp_path / "s"))
    t.commit(spark.createDataFrame([Row(k=1, v=1.0)]))
    t.add_constraint("v_pos", "v > 0")
    with pytest.raises(ValueError, match="v_pos"):
        commit_batch(
            t, spark.createDataFrame([Row(k=2, v=-5.0)]), 1, "sink"
        )
    commit_batch(t, spark.createDataFrame([Row(k=2, v=5.0)]), 2, "sink")
    assert t.read().count() == 2


def test_schema_ddl_add_and_drop_columns(spark, tmp_path):
    """Metadata-only ADD COLUMNS / DROP COLUMN: no data file is touched,
    reads project (NULL-fill / hide), time travel shows the old shape,
    and subsequent appends follow the evolved schema. (RENAME — a
    field-id-resolved metadata commit since round 7 — is covered by
    tests/test_rename.py.)"""
    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(5)]
    ).createOrReplaceTempView("feed0")
    eng.sql("CREATE TABLE evo USING snapshot AS SELECT k, v FROM feed0")
    t = eng._snapshot_tables["evo"]

    v = eng.sql(
        "ALTER TABLE evo ADD COLUMNS (tag STRING, score DECIMAL(10,2))"
    ).collect()[0]["version"]
    assert v == 2
    assert [f.name for f in t.schema().fields] == ["k", "v", "tag", "score"]
    rows = eng.sql("SELECT * FROM evo").collect()
    assert all(r["tag"] is None and r["score"] is None for r in rows)
    # appends follow the evolved schema
    eng.sql(
        "INSERT INTO evo VALUES (100, CAST(1.0 AS DOUBLE), 'x', CAST(2.5 AS DECIMAL(10,2)))"
    )
    got = {r["k"]: r["tag"] for r in eng.sql("SELECT k, tag FROM evo").collect()}
    assert got[100] == "x" and got[0] is None

    eng.sql("ALTER TABLE evo DROP COLUMN v")
    assert [f.name for f in t.schema().fields] == ["k", "tag", "score"]
    assert "v" not in eng.sql("SELECT * FROM evo").columns
    # time travel still shows v
    assert "v" in eng.sql("SELECT * FROM evo FOR VERSION AS OF 1").columns

    with pytest.raises(ValueError, match="already exist"):
        t.add_columns({"tag": "string"})
    with pytest.raises(ValueError, match="no such columns"):
        t.drop_columns(["nope"])
    # session-catalog ALTER still falls through untouched
    spark.sql("CREATE TABLE IF NOT EXISTS plain_evo (a INT) USING parquet")
    eng.sql("ALTER TABLE plain_evo ADD COLUMNS (b INT)")
    assert "b" in spark.table("plain_evo").columns
    spark.sql("DROP TABLE plain_evo")


def test_add_constraint_revalidates_on_concurrent_parent_drift(spark, tbl):
    """ADVICE r6: a row committed concurrently between add_constraint's
    validation and its commit claim must still be checked — the build
    callback re-validates whenever the claimed parent differs from the
    validated version."""
    cur = tbl.current_version()
    # simulate the race: a violating row lands AFTER the validation read
    tbl.commit(spark.createDataFrame([Row(k=99, v=-1.0)]), mode="append")
    with pytest.raises(ValueError, match="committed concurrently"):
        tbl._commit_constraints(
            lambda cons: {**cons, "v_nonneg": "v >= 0"},
            "add_constraint_v_nonneg",
            revalidate=(cur, {"v_nonneg": "v >= 0"}),
        )
    # no constraint published
    assert tbl.constraints() == {}
    # and the normal path (no drift) still works
    tbl.delete_where("v < 0")
    assert tbl.add_constraint("v_nonneg", "v >= 0") > 0
