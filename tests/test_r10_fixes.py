"""Round-10 regression pins for the round-9 advisor findings: a failed
CREATE in a fresh process must never delete a pre-existing on-disk
table (the rollback's rmtree only ever runs over a path that held zero
snapshots); BEGIN's auto-recovery leaves young, live-owner transaction
records alone (and both record removals tolerate a concurrent
recovery); a missing intermediate manifest cannot brick recovery;
column-list INSERT applies DEFAULTs in a first projection so GENERATED
expressions can reference default-filled columns; and Engine.sql binds
dispatched/time-travel results before dropping expanded views."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))


# ------------------------------------------------------------------ high:
# failed CREATE over a pre-existing on-disk table must not delete data


def test_create_in_fresh_process_never_deletes_existing_table(
    spark, tmp_path
):
    """Round-9 advisor (high): a fresh process (empty registry) running
    CREATE TABLE over a warehouse where the table already exists on
    disk used to reach the failure rollback's rmtree — a failed DDL
    silently destroying the table. Now the on-disk table is ADOPTED
    first: plain CREATE refuses with 'already exists', IF NOT EXISTS
    no-ops, and the data survives both."""
    wh = str(tmp_path / "wh")
    e1 = Engine(spark=spark, warehouse_dir=wh)
    e1.sql("CREATE TABLE facts (k INT, v DOUBLE) USING snapshot")
    e1.sql("INSERT INTO facts VALUES (1, 1.5), (2, 2.5)")
    data_dir = e1._snapshot_tables["facts"].path

    # a FRESH process: empty registry, same warehouse
    e2 = Engine(spark=spark, warehouse_dir=wh)
    assert "facts" not in e2._snapshot_tables
    # a CREATE that would previously fail mid-commit (bad partition
    # transform) now refuses up front — and deletes nothing
    with pytest.raises(ValueError, match="already exists"):
        e2.sql(
            "CREATE TABLE facts (k INT, v DOUBLE) USING snapshot "
            "PARTITIONED BY (days(k))"
        )
    assert os.path.isdir(data_dir)
    t = SnapshotTable(spark, data_dir)
    assert {r["k"] for r in t.read().collect()} == {1, 2}

    # plain CREATE with a VALID body also refuses (no silent append)
    e3 = Engine(spark=spark, warehouse_dir=wh)
    with pytest.raises(ValueError, match="already exists"):
        e3.sql("CREATE TABLE facts (k INT, v DOUBLE) USING snapshot")
    assert {r["k"] for r in t.read().collect()} == {1, 2}

    # IF NOT EXISTS no-ops and adopts the table into the registry
    e4 = Engine(spark=spark, warehouse_dir=wh)
    e4.sql("CREATE TABLE IF NOT EXISTS facts (k INT, v DOUBLE) USING snapshot")
    assert {r["k"] for r in e4.sql("SELECT k FROM facts").collect()} == {
        Row(k=1), Row(k=2),
    } or {r["k"] for r in e4.sql("SELECT k FROM facts").collect()} == {1, 2}


def test_ctas_in_fresh_process_never_deletes_existing_table(spark, tmp_path):
    """Same hazard on the CTAS arm (advisor's 'same pattern at 1372'):
    a fresh process's CREATE ... AS over an existing on-disk table
    refuses (or replaces, under OR REPLACE) — never rmtrees on failure."""
    wh = str(tmp_path / "wh")
    e1 = Engine(spark=spark, warehouse_dir=wh)
    e1.sql("CREATE TABLE dim (k INT, s STRING) USING snapshot")
    e1.sql("INSERT INTO dim VALUES (1, 'a')")
    path = e1._snapshot_tables["dim"].path

    e2 = Engine(spark=spark, warehouse_dir=wh)
    with pytest.raises(ValueError, match="already exists"):
        e2.sql("CREATE TABLE dim USING snapshot AS SELECT 1 AS k, 'b' AS s")
    assert os.path.isdir(path)
    assert SnapshotTable(spark, path).read().count() == 1

    # OR REPLACE in the fresh process takes the REGISTERED-replace path:
    # an overwrite commit that keeps the version history time-travelable
    e3 = Engine(spark=spark, warehouse_dir=wh)
    e3.sql(
        "CREATE OR REPLACE TABLE dim USING snapshot "
        "AS SELECT 9 AS k, 'z' AS s"
    )
    t = SnapshotTable(spark, path)
    assert [r["s"] for r in t.read().collect()] == ["z"]
    assert [r["s"] for r in t.read(2).collect()] == ["a"]


def test_create_refuses_tailless_nonempty_managed_path(spark, tmp_path):
    """Round-11 (round-10 ADVICE low): a managed path that HOLDS DATA
    but no readable local snapshot tail (a REST-attached table keeps
    its metadata tail in the catalog service) must refuse CREATE — the
    old probe read current_version()=None, treated the path as absent,
    and a failed CREATE's rollback rmtree'd the table's data files."""
    wh = str(tmp_path / "wh")
    e = Engine(spark=spark, warehouse_dir=wh)
    p = e.snapshot_table_path("restish")
    os.makedirs(p)
    spark.createDataFrame([Row(k=1, v=1.0)]).write.parquet(
        os.path.join(p, "data-000.parquet")
    )
    # valid body, bad body: both refuse up front, neither deletes
    for ddl in (
        "CREATE TABLE restish (k INT, v DOUBLE) USING snapshot",
        "CREATE TABLE restish (k INT, v DOUBLE) USING snapshot "
        "PARTITIONED BY (days(k))",
        "CREATE TABLE restish USING snapshot AS SELECT 1 AS k",
    ):
        with pytest.raises(ValueError, match="no readable local snapshot"):
            Engine(spark=spark, warehouse_dir=wh).sql(ddl)
    assert os.path.isdir(p)
    assert spark.read.parquet(os.path.join(p, "data-000.parquet")).count() == 1


def test_failed_create_on_fresh_name_still_cleans_up(spark, eng):
    """The legitimate rollback still works: a failing CREATE on a name
    with nothing on disk unregisters, deletes its partial dir, and a
    corrected retry succeeds (the round-8 pin, re-asserted over the
    adoption path)."""
    with pytest.raises(Exception):
        eng.sql(
            "CREATE TABLE fresh (k INT, v DOUBLE) USING snapshot "
            "PARTITIONED BY (days(k))"  # days() needs a timestamp
        )
    assert "fresh" not in eng._snapshot_tables
    assert not os.path.isdir(eng.snapshot_table_path("fresh"))
    eng.sql("CREATE TABLE fresh (k INT, v DOUBLE) USING snapshot")
    eng.sql("INSERT INTO fresh VALUES (1, 1.0)")
    assert eng.sql("SELECT * FROM fresh").count() == 1


# ---------------------------------------------------------------- medium:
# recovery must not race a live owner through phase 3


def _stage_pending_record(e, t1, t2):
    """BEGIN + stage writes + write the commit record, as _commit_multi
    does right before phase 3."""
    e.sql("BEGIN TRANSACTION ON t1, t2")
    e.sql("INSERT INTO t1 VALUES (900, 9.0)")
    gid = e._txns["t1"][1]
    e._txn_record_write(
        gid,
        [
            {"name": "t1", "path": t1.path, "branch": gid,
             "parent": t1.current_version()},
            {"name": "t2", "path": t2.path, "branch": gid,
             "parent": t2.current_version()},
        ],
    )
    return gid


@pytest.fixture()
def two_tables(spark, tmp_path):
    e = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    t1 = SnapshotTable(spark, str(tmp_path / "t1"))
    t1.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(3)]))
    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame([Row(k=i, s=f"s{i}") for i in range(3)]))
    e._snapshot_tables["t1"] = t1
    e._snapshot_tables["t2"] = t2
    return e, t1, t2


def test_begin_recovery_skips_young_live_owner_record(spark, two_tables):
    """A txn record is LIVE while its owner is mid-phase-3: another
    process's BEGIN must not roll it forward concurrently (duplicate
    application / spurious conflicts). The record here is young and its
    owner pid (this process) is alive — but from ANOTHER engine's
    perspective, so the BEGIN hook leaves it alone."""
    e, t1, t2 = two_tables
    gid = _stage_pending_record(e, t1, t2)
    rec_path = os.path.join(e._txns_dir(), f"{gid}.json")
    # fake a DIFFERENT live owner process (pid 1 is always alive)
    with open(rec_path) as fh:
        rec = json.load(fh)
    assert rec["owner"]["pid"] == os.getpid()  # the write stamps us
    rec["owner"]["pid"] = 1
    with open(rec_path, "w") as fh:
        json.dump(rec, fh)

    e2 = Engine(spark=spark, warehouse_dir=e._warehouse_dir)
    e2._snapshot_tables["t2"] = SnapshotTable(spark, t2.path)
    e2.sql("BEGIN TRANSACTION ON t2")  # auto-recovery runs here
    e2.sql("ROLLBACK TRANSACTION ON t2")
    assert os.path.exists(rec_path)  # the live owner's record survived
    # a DEAD young owner forfeits the lease immediately
    with open(rec_path) as fh:
        rec = json.load(fh)
    rec["owner"]["pid"] = 2 ** 22 + 77777  # beyond pid_max: never alive
    with open(rec_path, "w") as fh:
        json.dump(rec, fh)
    assert e2.recover_transactions(min_age_s=60.0) == [gid]
    assert not os.path.exists(rec_path)
    assert [r["k"] for r in t1.read().filter("k = 900").collect()] == [900]
    # clean up the still-open transaction on the owner engine
    e._txns.clear()
    e._snapshot_tables["t1"] = t1
    e._snapshot_tables["t2"] = t2


def test_begin_recovery_defers_to_live_owner_beyond_lease(spark, two_tables):
    """Round-11 (round-10 ADVICE medium): owner liveness is the
    ownership test at ANY record age. A phase-3 landing can outlast the
    60s lease (fast_forward over several large tables); another
    process's BEGIN hook must still leave the live owner's record alone
    — the old age-gated check re-exposed the duplicate-application race
    exactly when commits were slowest."""
    e, t1, t2 = two_tables
    gid = _stage_pending_record(e, t1, t2)
    rec_path = os.path.join(e._txns_dir(), f"{gid}.json")
    with open(rec_path) as fh:
        rec = json.load(fh)
    rec["owner"]["pid"] = 1            # a different, always-alive owner
    rec["owner"]["ts"] = 0.0           # stamped eons beyond the lease
    with open(rec_path, "w") as fh:
        json.dump(rec, fh)

    e2 = Engine(spark=spark, warehouse_dir=e._warehouse_dir)
    e2._snapshot_tables["t2"] = SnapshotTable(spark, t2.path)
    e2.sql("BEGIN TRANSACTION ON t2")  # auto-recovery runs here
    e2.sql("ROLLBACK TRANSACTION ON t2")
    assert os.path.exists(rec_path)    # live owner kept it, however old
    # the explicit statement still overrides (the operator's lever)
    got = [r["txn"] for r in e2.sql("RECOVER TRANSACTIONS").collect()]
    assert got == [gid]
    assert not os.path.exists(rec_path)
    e._txns.clear()
    e._snapshot_tables["t1"] = t1
    e._snapshot_tables["t2"] = t2


def test_explicit_recovery_ignores_the_lease(spark, two_tables):
    """RECOVER TRANSACTIONS (and the owner's own in-process retry) must
    recover even YOUNG records — the statement is the operator's 'the
    owner is gone, land it now' lever."""
    e, t1, t2 = two_tables
    gid = _stage_pending_record(e, t1, t2)
    e2 = Engine(spark=spark, warehouse_dir=e._warehouse_dir)
    got = [r["txn"] for r in e2.sql("RECOVER TRANSACTIONS").collect()]
    assert got == [gid]
    assert [r["k"] for r in t1.read().filter("k = 900").collect()] == [900]
    e._txns.clear()
    e._snapshot_tables["t1"] = t1
    e._snapshot_tables["t2"] = t2


def test_owner_remove_tolerates_record_already_recovered(spark, two_tables):
    """The owner's post-phase-3 record delete (and recovery's own) must
    tolerate the file having been removed by a concurrent recovery —
    a fully successful commit must not raise FileNotFoundError."""
    e, t1, t2 = two_tables
    e.sql("BEGIN TRANSACTION ON t1, t2")
    e.sql("INSERT INTO t1 VALUES (901, 9.1)")
    e.sql("INSERT INTO t2 VALUES (901, 'x')")
    gid = e._txns["t1"][1]

    # intercept: as soon as the record is written, delete it + land the
    # members exactly as a racing recovery would
    orig_write = e._txn_record_write

    def write_then_racing_recovery(g, entries):
        path = orig_write(g, entries)
        racer = Engine(spark=spark, warehouse_dir=e._warehouse_dir)
        assert racer.recover_transactions() == [g]
        assert not os.path.exists(path)
        return path

    e._txn_record_write = write_then_racing_recovery
    # fast_forward of an already-landed branch would conflict, so the
    # owner's phase 3 goes through its own recovery path — which must
    # ALSO tolerate the missing record and report success
    e.sql(f"COMMIT TRANSACTION ON t1, t2")
    assert [r["k"] for r in t1.read().filter("k = 901").collect()] == [901]
    assert [r["k"] for r in t2.read().filter("k = 901").collect()] == [901]
    assert e._txns == {}


# ------------------------------------------------------------------- low:
# a missing intermediate manifest must not brick recovery


def test_recovery_tolerates_expired_intermediate_manifest(spark, two_tables):
    """The landed-stamp check walks (parent, head]; expire_snapshots
    may have deleted an intermediate manifest. A vanished version
    cannot prove the stamp — skip it, don't raise."""
    e, t1, t2 = two_tables
    gid = _stage_pending_record(e, t1, t2)  # parent(t1) = 1
    # crash AFTER t1's pointer move: an outside write (v2), the landing
    # (v3, stamped), then expiry punches a hole at v2 — squarely inside
    # the landed-check's (parent, head] walk, below the stamp
    t1.commit(spark.createDataFrame([Row(k=50, v=5.0)]), mode="append")
    t1.fast_forward(gid, require_source_unchanged=False, txn_record=gid)
    t1.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t1._manifest(2)  # the hole is real
    e2 = Engine(spark=spark, warehouse_dir=e._warehouse_dir)
    assert e2.recover_transactions() == [gid]  # no FileNotFoundError
    assert [r["k"] for r in t1.read().filter("k = 900").collect()] == [900]
    assert os.listdir(e2._txns_dir()) == []  # record consumed
    e._txns.clear()
    e._snapshot_tables["t1"] = t1
    e._snapshot_tables["t2"] = t2


# ------------------------------------------------------------------- low:
# GENERATED expressions over DEFAULT-filled columns in column-list INSERT


def test_insert_generated_over_default_filled_column(spark, eng):
    """Round-9 advisor (low): a GENERATED expression referencing a
    column that is itself omitted and DEFAULT-filled used to fail
    analysis (one merged fill projection). Defaults now land in a
    FIRST projection, so the generated expression computes over the
    default VALUE."""
    eng.sql(
        "CREATE TABLE gd (a INT, b INT DEFAULT 7, "
        "c INT GENERATED ALWAYS AS (b * 2)) USING snapshot"
    )
    eng.sql("INSERT INTO gd (a) VALUES (1)")
    row = eng.sql("SELECT * FROM gd").collect()[0]
    assert (row["a"], row["b"], row["c"]) == (1, 7, 14)
    # provided b still drives the generated value
    eng.sql("INSERT INTO gd (a, b) VALUES (2, 10)")
    rows = {r["a"]: (r["b"], r["c"]) for r in eng.sql("SELECT * FROM gd").collect()}
    assert rows == {1: (7, 14), 2: (10, 20)}
    # explicitly-provided generated values still validate at commit
    with pytest.raises(Exception, match="generated"):
        eng.sql("INSERT INTO gd (a, b, c) VALUES (3, 1, 99)")
    # column order stable across the two projections (append files match)
    assert [f.name for f in eng._snapshot_tables["gd"].schema().fields] == [
        "a", "b", "c",
    ]


# ------------------------------------------------------------------- low:
# Engine.sql binds results before dropping expanded views


def test_view_backed_results_survive_view_drop(spark, eng):
    """The snapshot-table branch must bind the plan (force .schema)
    before the finally block drops the expanded temp views — same rule
    the plain-SQL path already followed. Collecting AFTER sql() returns
    (twice) proves the returned DataFrame doesn't depend on the dropped
    views."""
    eng.sql("CREATE TABLE base (k INT, v DOUBLE) USING snapshot")
    eng.sql("INSERT INTO base VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    eng.sql("CREATE VIEW big AS SELECT k, v FROM base WHERE v >= 2.0")
    df = eng.sql("SELECT k FROM big ORDER BY k")
    assert not any(
        v.name == "big" for v in spark.catalog.listTables()
    )  # the expansion was dropped before we collect
    assert [r["k"] for r in df.collect()] == [2, 3]
    assert [r["k"] for r in df.collect()] == [2, 3]  # re-executable


def test_drop_table_works_across_processes(spark, tmp_path):
    """A fresh process can DROP a managed on-disk table it never
    registered — the same adoption rule that protects CREATE."""
    wh = str(tmp_path / "wh")
    e1 = Engine(spark=spark, warehouse_dir=wh)
    e1.sql("CREATE TABLE dropme (k INT) USING snapshot")
    e1.sql("INSERT INTO dropme VALUES (1)")
    path = e1._snapshot_tables["dropme"].path

    e2 = Engine(spark=spark, warehouse_dir=wh)
    assert "dropme" not in e2._snapshot_tables
    out = e2.sql("DROP TABLE dropme").collect()
    assert out[0]["dropped"] == "dropme"
    assert not os.path.isdir(path)
    # and CREATE of the same name now succeeds in ANY process
    e3 = Engine(spark=spark, warehouse_dir=wh)
    e3.sql("CREATE TABLE dropme (k INT) USING snapshot")
    assert e3.sql("SELECT * FROM dropme").count() == 0
