"""Round-7 table-lifecycle surfaces: RESTORE TABLE, SHALLOW CLONE,
COPY INTO, SHOW CREATE TABLE (Delta's RESTORE / CLONE / COPY INTO
statements over the snapshot layer; the reference exposes the analogous
Iceberg rollback + snapshot-ref workflows through Trino procedures)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


def _mk(spark, path, n=100, n_files=5):
    t = SnapshotTable(spark, str(path))
    df = spark.createDataFrame(
        [Row(k=i, v=float(i), g=f"g{i % 4}") for i in range(n)]
    )
    t.commit_clustered(df, cluster_by="k", n_files=n_files, stats_for=["k"])
    return t


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))


# ------------------------------------------------------------- RESTORE


def test_restore_to_version(spark, eng, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.commit(
        spark.createDataFrame([Row(k=i, v=0.0, g="x") for i in range(5)]),
        mode="append",
    )
    eng._snapshot_tables["t"] = t
    row = eng.sql("RESTORE TABLE t TO VERSION AS OF 1").collect()[0]
    assert (row["version"], row["restored_to"]) == (3, 1)
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 100
    # RESTORE is itself a commit: time travel still sees the pre-restore
    # head, and restoring forward again recovers it
    assert t.read(2).count() == 105
    eng.sql("RESTORE TABLE t TO VERSION AS OF 2")
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 105


def test_restore_to_timestamp(spark, eng, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.commit(spark.createDataFrame([Row(k=1, v=1.0, g="x")]), mode="append")
    for v, ms in ((1, 1000), (2, 2000)):
        p = os.path.join(t.path, "_snapshots", f"v{v}.json")
        m = json.load(open(p))
        m["committed_at_ms"] = ms
        json.dump(m, open(p, "w"))
    eng._snapshot_tables["t"] = t
    row = eng.sql(
        "RESTORE TABLE t TO TIMESTAMP AS OF '1970-01-01T00:00:01.500'"
    ).collect()[0]
    assert row["restored_to"] == 1
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 100


def test_restore_unregistered_raises(spark, eng):
    with pytest.raises(ValueError, match="not a registered"):
        eng.sql("RESTORE TABLE nope TO VERSION AS OF 1")


# ------------------------------------------------------- SHALLOW CLONE


def test_shallow_clone_is_zero_copy_and_reads_equal(spark, eng, tmp_path):
    t = _mk(spark, tmp_path / "src")
    eng._snapshot_tables["src"] = t
    eng.sql("CREATE TABLE c SHALLOW CLONE src")
    clone = eng._snapshot_tables["c"]
    # zero-copy: no parquet under the clone's root at clone time
    assert glob.glob(os.path.join(clone.path, "data", "**", "*.parquet"),
                     recursive=True) == []
    assert sorted(r["k"] for r in eng.sql("SELECT k FROM c").collect()) == \
        list(range(100))
    # manifest lineage
    m1 = clone._manifest(1)
    assert m1["mode"] == "shallow_clone"
    assert m1["clone_source"] == {"path": t.path, "version": 1}
    eng.sql("DROP TABLE c")


def test_shallow_clone_version_as_of_and_divergence(spark, eng, tmp_path):
    t = _mk(spark, tmp_path / "src")
    t.commit(
        spark.createDataFrame([Row(k=100, v=100.0, g="x")]), mode="append"
    )
    eng._snapshot_tables["src"] = t
    eng.sql("CREATE TABLE c SHALLOW CLONE src VERSION AS OF 1")
    assert eng.sql("SELECT count(*) AS c FROM c").collect()[0]["c"] == 100
    # clone-side CoW DML rewrites into the clone; the source is untouched
    res = eng.sql("DELETE FROM c WHERE k BETWEEN 0 AND 19").collect()[0]
    assert res["files_skipped"] > 0  # cloned stats prune across the root move
    assert eng.sql("SELECT count(*) AS c FROM c").collect()[0]["c"] == 80
    assert t.read().count() == 101
    # source-side DML doesn't reach the clone (immutable files + own manifest)
    t.delete_where("k >= 50")
    assert eng.sql("SELECT count(*) AS c FROM c").collect()[0]["c"] == 80
    eng.sql("DROP TABLE c")


def test_shallow_clone_refuses_mor_debt_and_mor_on_clone(
    spark, eng, tmp_path
):
    t = _mk(spark, tmp_path / "src")
    t.set_properties({"delete.mode": "merge-on-read"})
    eng._snapshot_tables["src"] = t
    eng.sql("DELETE FROM src WHERE k BETWEEN 0 AND 4")
    with pytest.raises(ValueError, match="merge-on-read"):
        eng.sql("CREATE TABLE c SHALLOW CLONE src")
    # a pre-debt version clones fine
    eng.sql("CREATE TABLE c SHALLOW CLONE src VERSION AS OF 1")
    clone = eng._snapshot_tables["c"]
    # MoR writers refuse while external refs remain...
    with pytest.raises(ValueError, match="compact"):
        clone.delete_where_mor("k = 60")
    with pytest.raises(ValueError, match="compact"):
        clone.delete_where_eq("k", [60])
    # ...and unlock once compaction localizes the data
    clone.compact(target_partitions=2)
    clone.delete_where_mor("k = 60")
    assert clone.read().count() == 99
    eng.sql("DROP TABLE c")


def test_clone_of_clone_and_vacuum_never_crosses_roots(
    spark, eng, tmp_path
):
    t = _mk(spark, tmp_path / "src")
    eng._snapshot_tables["src"] = t
    eng.sql("CREATE TABLE c1 SHALLOW CLONE src")
    eng.sql("CREATE TABLE c2 SHALLOW CLONE c1")
    c2 = eng._snapshot_tables["c2"]
    assert c2.read().count() == 100
    # both clones reference the ORIGINAL source files (no chain reads)
    assert all(d.startswith(t.path) for d in c2._manifest(1)["data_dirs"])
    # CoW rewrite in the clone, then drop every snapshot that saw the
    # external refs: vacuum may only reclaim CLONE-LOCAL storage
    c2.delete_where("k < 50")
    c2.expire_snapshots(keep_last=1)
    removed = c2.vacuum()
    assert all(not os.path.isabs(p) for p in removed)
    src_files = glob.glob(
        os.path.join(t.path, "data", "**", "*.parquet"), recursive=True
    )
    assert len(src_files) == 5  # source storage intact
    assert t.read().count() == 100
    eng.sql("DROP TABLE c2")
    eng.sql("DROP TABLE c1")
    assert t.read().count() == 100  # DROP of clones never deletes source data


def test_clone_if_not_exists_and_existing_name(spark, eng, tmp_path):
    t = _mk(spark, tmp_path / "src", n=10, n_files=1)
    eng._snapshot_tables["src"] = t
    eng.sql("CREATE TABLE c SHALLOW CLONE src")
    assert eng.sql("CREATE TABLE IF NOT EXISTS c SHALLOW CLONE src").count() == 0
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE TABLE c SHALLOW CLONE src")
    eng.sql("DROP TABLE c")


# ------------------------------------------------------------ COPY INTO


def test_copy_into_idempotent_delta_loads(spark, eng, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10, n_files=1)
    eng._snapshot_tables["t"] = t
    land = tmp_path / "landing"
    spark.createDataFrame(
        [Row(k=i, v=float(i), g="a") for i in range(3)]
    ).coalesce(1).write.parquet(str(land / "b1"))
    r1 = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert (r1["files_loaded"], r1["rows_loaded"]) == (1, 3)
    # re-run: file-level no-op, head version unchanged
    r2 = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert (r2["files_loaded"], r2["rows_loaded"]) == (0, 0)
    assert r2["version"] == r1["version"]
    # an unrelated commit between runs must not disturb the ledger
    eng.sql("INSERT INTO t VALUES (99, 99.0, 'z')")
    spark.createDataFrame(
        [Row(k=i, v=float(i), g="b") for i in range(5)]
    ).coalesce(1).write.parquet(str(land / "b2"))
    r3 = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert (r3["files_loaded"], r3["rows_loaded"]) == (1, 5)
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 19
    # the ledger is real table metadata: visible as a property and
    # carried by every commit kind
    ledger = json.loads(t.properties()[SnapshotTable._COPY_LEDGER_PROP])
    (entries,) = ledger.values()
    assert len(entries) == 2


def test_copy_into_pattern_filters_files(spark, eng, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5, n_files=1)
    eng._snapshot_tables["t"] = t
    land = tmp_path / "landing"
    spark.createDataFrame([Row(k=1, v=1.0, g="a")]).coalesce(1).write.parquet(
        str(land / "keep")
    )
    os.makedirs(land / "skip", exist_ok=True)
    with open(land / "skip" / "notes.txt", "w") as fh:
        fh.write("not parquet")
    r = eng.sql(f"COPY INTO t FROM '{land}' PATTERN = '*.parquet'").collect()[0]
    assert r["files_loaded"] == 1
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 6


def test_copy_into_ledger_is_monotone_across_restore_force_reloads(
    spark, eng, tmp_path
):
    """Delta's COPY INTO × RESTORE interaction: the ledger follows the
    HEAD (properties survive rollback), so files once loaded stay
    skipped even after RESTORE rolled their rows away — the documented
    Delta gotcha — and ``FORCE`` is the explicit reload escape."""
    t = _mk(spark, tmp_path / "t", n=10, n_files=1)
    eng._snapshot_tables["t"] = t
    land = tmp_path / "landing"
    spark.createDataFrame([Row(k=77, v=7.0, g="q")]).coalesce(1).write.parquet(
        str(land / "b1")
    )
    eng.sql(f"COPY INTO t FROM '{land}'")
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 11
    eng.sql("RESTORE TABLE t TO VERSION AS OF 1")
    r = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert (r["files_loaded"], r["rows_loaded"]) == (0, 0)
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 10
    r = eng.sql(f"COPY INTO t FROM '{land}' FORCE").collect()[0]
    assert (r["files_loaded"], r["rows_loaded"]) == (1, 1)
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 11


# ---------------------------------------------------- SHOW CREATE TABLE


def test_show_create_table_reconstructs_ddl(spark, eng, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k=i, v=float(i), g=f"g{i % 2}") for i in range(10)]
    )
    t.commit(df, partition_by=["g"])
    t.add_constraint("v_nonneg", "v >= 0")
    t.set_properties({"delete.mode": "merge-on-read"})
    eng._snapshot_tables["t"] = t
    stmt = eng.sql("SHOW CREATE TABLE t").collect()[0]["createtab_stmt"]
    assert "CREATE TABLE t (" in stmt
    assert "k BIGINT" in stmt and "v DOUBLE" in stmt and "g STRING" in stmt
    assert "USING snapshot" in stmt
    assert "PARTITIONED BY (g)" in stmt
    assert f"LOCATION '{t.path}'" in stmt
    assert "'delete.mode' = 'merge-on-read'" in stmt
    assert "ADD CONSTRAINT v_nonneg CHECK (v >= 0)" in stmt


def test_clone_drops_source_tags(spark, eng, tmp_path):
    """Source tags name SOURCE versions — they must not travel to the
    clone (whose history is its own); other properties do."""
    t = _mk(spark, tmp_path / "src", n=10, n_files=1)
    t.set_properties({"delete.mode": "merge-on-read"})
    t.commit(
        spark.createDataFrame([Row(k=100, v=1.0, g="x")]), mode="append"
    )
    t.create_tag("rel1", version=3)
    eng._snapshot_tables["src"] = t
    eng.sql("CREATE TABLE c SHALLOW CLONE src")
    clone = eng._snapshot_tables["c"]
    assert clone.tags() == {}
    assert clone.properties()["delete.mode"] == "merge-on-read"
    eng.sql("DROP TABLE c")


# ------------------------------------------------ WAP publish loop


def test_wap_clone_write_audit_publish(spark, eng, tmp_path):
    """The full write-audit-publish loop: clone prod, run DML + add a
    constraint on the clone (the audit), publish back — ONE atomic
    source commit; untouched data is never copied, rewritten data moves
    once, and the source's history and tags survive."""
    t = _mk(spark, tmp_path / "prod")
    t.create_tag("baseline")
    eng._snapshot_tables["prod"] = t
    eng.sql("CREATE TABLE wap SHALLOW CLONE prod")
    clone = eng._snapshot_tables["wap"]
    # the "write": CoW DML on the clone (prod untouched)
    eng.sql("DELETE FROM wap WHERE k BETWEEN 0 AND 19")
    eng.sql("UPDATE wap SET v = v * 2 WHERE k >= 90")
    # the "audit": the cleaned data satisfies a new contract
    clone.add_constraint("k_floor", "k >= 20")
    assert t.read().count() == 100  # prod still pristine
    # the "publish"
    new_v = clone.publish()
    assert new_v == 3  # v1 data, v2 tag commit, v3 publish
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert set(got) == set(range(20, 100))
    assert got[95] == 190.0 and got[50] == 50.0
    # one commit, history + tags intact, contract adopted
    assert t.current_version() == 3
    assert t.read(1).count() == 100
    assert t.tags() == {"baseline": 1}
    assert "k_floor" in t.constraints()
    # untouched source files were NOT duplicated: only the rewrite dirs
    # (delete + update) copied over
    pub = t._manifest(3)
    local_new = [d for d in pub["data_dirs"] if d.startswith("data/r")]
    assert local_new, "the audited rewrite dirs must have moved over"
    # the untouched original commit is RE-REFERENCED relatively, never
    # copied (the zero-copy half of publish)
    assert any(d.startswith("data/c1") for d in pub["data_dirs"])
    assert all(not os.path.isabs(d) for d in pub["data_dirs"])
    eng.sql("DROP TABLE wap")
    assert t.read().count() == 80  # publish survives clone teardown


def test_wap_publish_refuses_moved_source(spark, eng, tmp_path):
    from oss_data_lake_spark.sources.catalog import CommitConflict

    t = _mk(spark, tmp_path / "prod", n=20, n_files=2)
    eng._snapshot_tables["prod"] = t
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    clone.delete_where("k < 5")
    # source moves underneath the clone
    t.commit(
        spark.createDataFrame([Row(k=100, v=1.0, g="z")]), mode="append"
    )
    with pytest.raises(CommitConflict, match="re-clone"):
        clone.publish()
    assert t.read().count() == 21  # source unharmed
    # a plain (non-clone) table refuses publish outright
    with pytest.raises(ValueError, match="not a clone"):
        t.publish()


def test_wap_publish_carries_localized_mor_debt(spark, eng, tmp_path):
    """Clone → compact (localize) → MoR delete on the clone → publish:
    the tombstone dir travels with its data dirs and the coordinates
    hold in the source root."""
    t = _mk(spark, tmp_path / "prod", n=50, n_files=5)
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    clone.compact(target_partitions=2)
    clone.delete_where_mor("k BETWEEN 10 AND 14")
    new_v = clone.publish()
    assert sorted(r["k"] for r in t.read(new_v).collect()) == [
        k for k in range(50) if not 10 <= k <= 14
    ]


def test_wap_publish_chain_to_middle_clone(spark, eng, tmp_path):
    """Publishing a clone-of-clone back to the MIDDLE clone: refs into
    the ORIGINAL root stay external (the middle clone already holds
    such refs), local rewrites move — the chain publishes correctly."""
    t = _mk(spark, tmp_path / "orig")
    c1 = t.shallow_clone_to(str(tmp_path / "c1"))
    c2 = c1.shallow_clone_to(str(tmp_path / "c2"))
    c2.delete_where("k < 20")
    v = c2.publish()
    assert c1.read(v).count() == 80
    assert t.read().count() == 100   # original untouched
    assert c2.read().count() == 80


def test_copy_into_ledger_spills_to_sidecar_past_threshold(
    spark, eng, tmp_path, monkeypatch
):
    """VERDICT r7 'What's missing' #3: past _COPY_LEDGER_SPILL names per
    source the ledger spills to a parquet sidecar referenced from the
    manifest property — idempotence, delta loads, FORCE, and
    RESTORE-monotonicity all survive the spill, the manifest entry stays
    O(1), and vacuum reclaims superseded sidecars."""
    monkeypatch.setattr(SnapshotTable, "_COPY_LEDGER_SPILL", 5)
    t = _mk(spark, tmp_path / "t", n=4, n_files=1)
    eng._snapshot_tables["t"] = t
    land = tmp_path / "landing"
    for i in range(8):
        spark.createDataFrame([Row(k=100 + i, v=float(i), g="s")]).coalesce(
            1
        ).write.parquet(str(land / f"b{i}"))
    r1 = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert (r1["files_loaded"], r1["rows_loaded"]) == (8, 8)
    entry = json.loads(t.properties()[SnapshotTable._COPY_LEDGER_PROP])[
        str(land)
    ]
    assert isinstance(entry, dict) and entry["count"] == 8
    assert entry["sidecar"].startswith("ledgers/")
    first_sidecar = entry["sidecar"]
    assert os.path.exists(os.path.join(t.path, first_sidecar))

    # idempotence reads THROUGH the sidecar
    r2 = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert (r2["files_loaded"], r2["version"]) == (0, r1["version"])

    # a delta load merges into a NEW sidecar; the old one becomes vacuum
    # garbage; the manifest entry stays one {sidecar, count} dict
    for i in range(8, 11):
        spark.createDataFrame([Row(k=100 + i, v=float(i), g="s")]).coalesce(
            1
        ).write.parquet(str(land / f"b{i}"))
    r3 = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert (r3["files_loaded"], r3["rows_loaded"]) == (3, 3)
    entry = json.loads(t.properties()[SnapshotTable._COPY_LEDGER_PROP])[
        str(land)
    ]
    assert entry["count"] == 11 and entry["sidecar"] != first_sidecar
    assert eng.sql("SELECT count(*) AS c FROM t").collect()[0]["c"] == 15

    # RESTORE-monotonicity through a spilled ledger
    eng.sql("RESTORE TABLE t TO VERSION AS OF 1")
    r4 = eng.sql(f"COPY INTO t FROM '{land}'").collect()[0]
    assert r4["files_loaded"] == 0

    # FORCE reloads everything regardless of the sidecar
    r5 = eng.sql(f"COPY INTO t FROM '{land}' FORCE").collect()[0]
    assert r5["files_loaded"] == 11

    # superseded sidecars are garbage once their manifests expire
    # (expire_snapshots vacuums internally)
    t.expire_snapshots(keep_last=1)
    assert not os.path.exists(os.path.join(t.path, first_sidecar))
    live = json.loads(t.properties()[SnapshotTable._COPY_LEDGER_PROP])[
        str(land)
    ]["sidecar"]
    assert os.path.exists(os.path.join(t.path, live))


def test_spilled_ledger_travels_with_clone_and_publish(
    spark, eng, tmp_path, monkeypatch
):
    """A spilled ledger's sidecar file follows the properties across a
    shallow clone (clone-local idempotence) and a WAP publish back."""
    monkeypatch.setattr(SnapshotTable, "_COPY_LEDGER_SPILL", 3)
    t = _mk(spark, tmp_path / "src", n=4, n_files=1)
    land = tmp_path / "landing"
    for i in range(5):
        spark.createDataFrame([Row(k=200 + i, v=float(i), g="s")]).coalesce(
            1
        ).write.parquet(str(land / f"b{i}"))
    t.copy_into(str(land))
    entry = json.loads(t.properties()[SnapshotTable._COPY_LEDGER_PROP])[
        os.path.abspath(str(land))
    ]
    assert isinstance(entry, dict)

    clone = t.shallow_clone_to(str(tmp_path / "clone"))
    assert os.path.exists(os.path.join(clone.path, entry["sidecar"]))
    # clone-local idempotence reads the carried sidecar
    r = clone.copy_into(str(land))
    assert r["files_loaded"] == 0

    # clone ingests MORE files (re-spilling under ITS root), publishes:
    # the source adopts the ledger and the new sidecar must resolve
    for i in range(5, 7):
        spark.createDataFrame([Row(k=200 + i, v=float(i), g="s")]).coalesce(
            1
        ).write.parquet(str(land / f"b{i}"))
    assert clone.copy_into(str(land))["files_loaded"] == 2
    clone.publish()
    r = t.copy_into(str(land))
    assert r["files_loaded"] == 0
    assert t.read().count() == 4 + 7


# ------------------------------------------------ WAP publish rebase


def test_wap_publish_rebases_disjoint_source_append(spark, eng, tmp_path):
    """VERDICT r7 'What's missing' #4 (WAP corner): when the source
    advanced with commits disjoint from the clone's audited changes,
    publish(require_source_unchanged=False) re-parents the clone's diff
    onto the new head — BOTH lands land in one commit."""
    t = _mk(spark, tmp_path / "prod", n=20, n_files=2)
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    clone.delete_where("k < 5")
    # disjoint concurrent source change: a plain append
    t.commit(
        spark.createDataFrame([Row(k=100 + i, v=1.0, g="z") for i in range(3)]),
        mode="append",
    )
    new_v = clone.publish(require_source_unchanged=False)
    assert t._manifest(new_v)["mode"] == "publish_rebase"
    got = sorted(r["k"] for r in t.read().collect())
    assert got == list(range(5, 20)) + [100, 101, 102]
    # history intact on both sides of the rebase
    assert t.read(1).count() == 20
    # default strict mode still refuses a moved source
    c2 = t.shallow_clone_to(str(tmp_path / "wap2"))
    c2.delete_where("k >= 18")
    t.commit(spark.createDataFrame([Row(k=200, v=2.0, g="q")]), mode="append")
    from oss_data_lake_spark.sources.catalog import CommitConflict

    with pytest.raises(CommitConflict, match="re-clone"):
        c2.publish()


def test_wap_publish_rebase_refuses_overlapping_changes(
    spark, eng, tmp_path
):
    from oss_data_lake_spark.sources.catalog import CommitConflict

    t = _mk(spark, tmp_path / "prod", n=20, n_files=2)
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    clone.delete_where("k < 5")
    # the source rewrites the SAME base dir's files underneath
    t.delete_where("k >= 15")
    with pytest.raises(CommitConflict, match="both (changed|rewrote)"):
        clone.publish(require_source_unchanged=False)
    # the source is unharmed and still at ITS truth
    assert sorted(r["k"] for r in t.read().collect()) == list(range(15))


def test_wap_publish_rebase_refuses_source_schema_evolution(
    spark, eng, tmp_path
):
    from oss_data_lake_spark.sources.catalog import CommitConflict

    t = _mk(spark, tmp_path / "prod", n=10, n_files=1)
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    clone.delete_where("k < 2")
    t.add_columns({"extra": "STRING"})
    with pytest.raises(CommitConflict, match="schema evolved"):
        clone.publish(require_source_unchanged=False)


def test_wap_publish_rebase_with_source_mor_debt(spark, eng, tmp_path):
    """Source adds MoR tombstones on base dirs the clone never touched;
    the clone appends audited data — the rebase merges the source's
    delete state with the clone's additions."""
    t = _mk(spark, tmp_path / "prod", n=20, n_files=2)
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    clone.commit(
        spark.createDataFrame([Row(k=500, v=5.0, g="new")]), mode="append"
    )
    t.delete_where_mor("k IN (3, 7)")
    new_v = clone.publish(require_source_unchanged=False)
    got = sorted(r["k"] for r in t.read(new_v).collect())
    assert got == [k for k in range(20) if k not in (3, 7)] + [500]


def test_wap_publish_rebase_merges_file_disjoint_cow_deletes(
    spark, eng, tmp_path
):
    """Visibility shrinks are FILE-granular in the rebase: two pruned
    CoW deletes that rewrote DIFFERENT files of the same base dir merge
    (survivor-set intersection); overlapping files still refuse."""
    t = _mk(spark, tmp_path / "prod", n=20, n_files=2)  # k-clustered
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    # each side's bounds prune to ONE of the two clustered files
    r = clone.delete_where(
        "k BETWEEN 0 AND 4", prune_column="k", prune_lower=0, prune_upper=4
    )
    assert r["files_skipped"] >= 1  # clone touched only file 1
    r = t.delete_where(
        "k BETWEEN 15 AND 19", prune_column="k",
        prune_lower=15, prune_upper=19,
    )
    assert r["files_skipped"] >= 1  # source touched only file 2
    new_v = clone.publish(require_source_unchanged=False)
    assert t._manifest(new_v)["mode"] == "publish_rebase"
    assert sorted(r["k"] for r in t.read().collect()) == list(range(5, 15))


def test_rebase_preserves_source_side_property_updates(
    spark, eng, tmp_path
):
    """Round-8 review finding: a rebase must keep the SOURCE head's
    property changes (e.g. its COPY INTO ledger advanced after the
    clone) unless the clone itself changed that property — otherwise
    the next COPY INTO re-ingests and duplicates rows."""
    t = _mk(spark, tmp_path / "prod", n=10, n_files=1)
    clone = t.shallow_clone_to(str(tmp_path / "wap"))
    # source ingests AFTER the clone (new dir + ledger property)
    land = tmp_path / "landing"
    spark.createDataFrame([Row(k=700, v=7.0, g="z")]).coalesce(1).write.parquet(
        str(land / "b1")
    )
    assert t.copy_into(str(land))["files_loaded"] == 1
    # clone's audited, disjoint change
    clone.commit(
        spark.createDataFrame([Row(k=800, v=8.0, g="w")]), mode="append"
    )
    new_v = clone.publish(require_source_unchanged=False)
    assert t._manifest(new_v)["mode"] == "publish_rebase"
    assert sorted(r["k"] for r in t.read().collect()) == (
        list(range(10)) + [700, 800]
    )
    # the ledger survived the rebase: re-ingest is a no-op
    assert t.copy_into(str(land))["files_loaded"] == 0
    assert t.read().count() == 12


def test_copy_into_fileformat_csv_and_json(spark, tmp_path):
    """COPY INTO FILEFORMAT = CSV | JSON (Databricks grammar): non-
    parquet landings read under the TABLE's schema — COPY INTO is the
    format-conversion point, so landed files are parquet with the
    table's types; idempotence ledgers work per format exactly like
    parquet sources."""
    import json as _json
    import os

    from oss_data_lake_spark.engine import Engine
    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(0, 0.0, "seed")], "k bigint, v double, s string")
    )
    eng = Engine(spark=spark)
    eng._snapshot_tables["cfmt"] = t

    csv_dir = tmp_path / "landing_csv"
    csv_dir.mkdir()
    (csv_dir / "a.csv").write_text("k,v,s\n1,1.5,x\n2,2.5,y\n")
    res = eng.sql(
        f"COPY INTO cfmt FROM '{csv_dir}' FILEFORMAT = CSV"
    ).collect()[0]
    assert (res["files_loaded"], res["rows_loaded"]) == (1, 2)
    # idempotent: re-run loads nothing
    res2 = eng.sql(
        f"COPY INTO cfmt FROM '{csv_dir}' FILEFORMAT = CSV"
    ).collect()[0]
    assert res2["files_loaded"] == 0
    # delta: only the new file loads
    (csv_dir / "b.csv").write_text("k,v,s\n3,3.5,z\n")
    res3 = eng.sql(
        f"COPY INTO cfmt FROM '{csv_dir}' FILEFORMAT = CSV"
    ).collect()[0]
    assert (res3["files_loaded"], res3["rows_loaded"]) == (1, 1)

    json_dir = tmp_path / "landing_json"
    json_dir.mkdir()
    with open(json_dir / "a.json", "w") as fh:
        for rec in ({"k": 10, "v": 1.0, "s": "j"}, {"k": 11, "v": 2.0, "s": "j"}):
            fh.write(_json.dumps(rec) + "\n")
    res4 = eng.sql(
        f"COPY INTO cfmt FROM '{json_dir}' FILEFORMAT = JSON"
    ).collect()[0]
    assert (res4["files_loaded"], res4["rows_loaded"]) == (1, 2)

    got = {r["k"]: (r["v"], r["s"]) for r in t.read().collect()}
    assert got == {
        0: (0.0, "seed"), 1: (1.5, "x"), 2: (2.5, "y"), 3: (3.5, "z"),
        10: (1.0, "j"), 11: (2.0, "j"),
    }
    # landed files are PARQUET under the table root regardless of source
    m = t._manifest(t.current_version())
    for d in m["data_dirs"]:
        for dp, _dn, fs in os.walk(os.path.join(t.path, d)):
            assert all(
                f.endswith(".parquet")
                for f in fs
                if not f.startswith(("_", "."))  # _SUCCESS / .crc
            )
    # unsupported format refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported FILEFORMAT"):
        t.copy_into(str(csv_dir), fileformat="orc")


def test_copy_into_csv_maps_by_header_name(spark, tmp_path):
    """Review finding: a CSV whose header order differs from the table
    schema must land each value in the RIGHT column (by-name mapping,
    the Databricks semantics), and headerless junk refuses."""
    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(0, "seed")], "a bigint, b string"))
    land = tmp_path / "land"
    land.mkdir()
    (land / "swapped.csv").write_text("b,a\nx,1\ny,2\n")
    res = t.copy_into(str(land), fileformat="csv")
    assert res["rows_loaded"] == 2
    got = {r["a"]: r["b"] for r in t.read().collect()}
    assert got == {0: "seed", 1: "x", 2: "y"}
    # a CSV whose header shares nothing with the schema refuses loudly
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "positional.csv").write_text("1,x\n2,y\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no header column"):
        t.copy_into(str(bad), fileformat="csv")
