"""Per-file stats sidecar spill — the manifest's metadata-scale valve.

A manifest is dir-granular JSON, but ``file_stats`` is per-FILE (bounds +
blooms): at millions of files it would dominate every manifest the driver
parses, merges, and re-serializes per commit. Iceberg keeps file-level
metadata in avro manifest files referenced from a manifest list; Delta
checkpoints stats into parquet. Past a threshold a dir's stats spill to
one immutable parquet sidecar under ``stats/`` and the manifest carries
an O(1) reference; a dir's file set never changes after creation (CoW
shrinks visibility via ``dir_files``), so the sidecar is written once and
later manifests copy only the reference.

These tests pin: identical pruning through a spilled reference, O(1)
manifest growth as spilled dirs accrete, reference survival through
append/rollback/CoW-DML/clone/publish, vacuum keeping referenced sidecars
and reclaiming orphans, and the aggregate fast paths (stats_columns,
DESCRIBE DETAIL) answering without a sidecar read."""

from __future__ import annotations

import json
import os

import pytest

from oss_data_lake_spark.sources.snapshots import (
    _STATS_SIDECAR_KEY,
    SnapshotTable,
    _is_stats_ref,
)


def _rows(spark, n, offset=0):
    return spark.range(offset, offset + n).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id % 7 AS INT) AS g"
    )


@pytest.fixture()
def spilled(spark, tmp_path):
    """A table whose every stats-bearing commit spills (threshold 1)."""
    t = SnapshotTable(spark, str(tmp_path / "sp"))
    t.commit(_rows(spark, 10), stats_for=["k"])  # v1 inline (no props yet)
    t.set_properties({"stats.spill.file-threshold": "1"})
    return t


def test_spill_reference_replaces_inline_stats(spark, spilled):
    t = spilled
    v = t.commit(
        _rows(spark, 40, 10).repartition(4), mode="append",
        stats_for=["k"], bloom_for=["g"],
    )
    m = t._manifest(v)
    new_dir = m["data_dirs"][-1]
    entry = m["file_stats"][new_dir]
    assert _is_stats_ref(entry)
    assert entry["files"] == 4
    assert entry["rows"] == 40
    # bloom-only columns are not range-prunable: excluded, exactly like
    # the inline stats_columns rule
    assert entry["cols"] == ["k"]
    assert os.path.isfile(os.path.join(t.path, entry[_STATS_SIDECAR_KEY]))
    # read-through resolves to the same shape an inline dict has
    resolved = t.dir_stats(m, new_dir)
    assert set(resolved) == {
        f for f in os.listdir(os.path.join(t.path, new_dir))
        if f.endswith(".parquet")
    }
    assert all("k" in cols for cols in resolved.values())
    assert any("bloom:g" in cols for cols in resolved.values())


def test_pruning_identical_through_spilled_reference(spark, tmp_path):
    """The same data committed inline vs spilled must plan the same
    selection and skip the same files."""
    a = SnapshotTable(spark, str(tmp_path / "inline"))
    b = SnapshotTable(spark, str(tmp_path / "spill"))
    b.commit(_rows(spark, 1), stats_for=["k"])  # seed so props can set
    b.set_properties({"stats.spill.file-threshold": "1"})
    for t in (a, b):
        for g in range(3):
            t.commit(
                _rows(spark, 20, 100 * g).repartition(2),
                # first generation overwrites (clears b's seed row), the
                # rest accrete — identical data both sides
                mode="overwrite" if g == 0 else "append",
                stats_for=["k"],
            )
    for lo, hi in ((0, 15), (100, 140), (250, 260), (None, 50)):
        sa, na, ka = a.plan_range_scan("k", lo, hi)
        sb, nb, kb = b.plan_range_scan("k", lo, hi)
        assert (na, ka) == (nb, kb)
        assert sorted(
            a.read_between("k", lo, hi).select("k").toPandas()["k"]
        ) == sorted(
            b.read_between("k", lo, hi).select("k").toPandas()["k"]
        )
    # b's spilled generations actually skip files
    _sel, n_sel, n_skip = b.plan_range_scan("k", 0, 15)
    assert n_skip > 0


def test_manifest_stays_o1_as_spilled_dirs_accrete(spark, spilled):
    """The 100-TB pin: manifest byte size grows by O(1) per spilled
    commit (one small reference), not O(files) — and nothing re-reads
    sidecars at commit time."""
    t = spilled
    sizes = []
    for i in range(6):
        v = t.commit(
            _rows(spark, 64, 1000 * i).repartition(8), mode="append",
            stats_for=["k"], bloom_for=["g"],
        )
        mp = os.path.join(t.path, "_snapshots", f"v{v}.json")
        sizes.append(os.path.getsize(mp))
    deltas = [b - a for a, b in zip(sizes, sizes[1:])]
    # every spilled commit adds a CONSTANT sliver (reference + dir
    # bookkeeping: schema/spec/field-id entries), far below one dir's
    # real stats payload — the manifest no longer scales with files
    m = t._manifest(t.current_version())
    d = m["data_dirs"][-1]
    ref_bytes = len(json.dumps({d: m["file_stats"][d]}))
    inline_bytes = len(json.dumps({d: t.dir_stats(m, d)}))
    assert inline_bytes > 10 * ref_bytes  # blooms dominate inline
    assert max(deltas) < inline_bytes / 5
    assert max(deltas) - min(deltas) <= 64  # flat, not growing


def test_reference_survives_append_rollback_dml_and_gc(spark, spilled):
    t = spilled
    v2 = t.commit(
        _rows(spark, 30, 100).repartitionByRange(3, "k"),
        mode="append", stats_for=["k"],
    )
    big = t._manifest(v2)["data_dirs"][-1]
    sidecar = t._manifest(v2)["file_stats"][big][_STATS_SIDECAR_KEY]
    t.commit(                                                # append carries
        _rows(spark, 5, 500), mode="append", stats_for=["k"]
    )
    res = t.delete_where(                                    # CoW shrinks vis
        "k = 105",
        prune_column="k",
        prune_lower=105,
        prune_upper=105,
        stats_for=["k"],
    )
    assert res["files_skipped"] > 0, (
        "the CoW planner must prune through the spilled reference"
    )
    v = t.current_version()
    m = t._manifest(v)
    assert m["file_stats"][big][_STATS_SIDECAR_KEY] == sidecar
    # pruning on the spilled dir still plans per file under visibility
    assert t.read().where("k BETWEEN 100 AND 129").count() == 29
    t.rollback(v2)
    assert t.read().count() == 40
    # vacuum with every manifest alive keeps the sidecar
    t.vacuum()
    assert os.path.isfile(os.path.join(t.path, sidecar))
    # expire everything down to head: v2's dir is still referenced by
    # the rollback head, so its sidecar must survive
    t.expire_snapshots(keep_last=1)
    assert os.path.isfile(os.path.join(t.path, sidecar))
    assert t.read().count() == 40


def test_vacuum_reclaims_orphaned_sidecars(spark, spilled):
    t = spilled
    v2 = t.commit(
        _rows(spark, 30, 100).repartition(3), mode="append",
        stats_for=["k"],
    )
    sidecar = t._manifest(v2)["file_stats"][
        t._manifest(v2)["data_dirs"][-1]
    ][_STATS_SIDECAR_KEY]
    t.commit(_rows(spark, 5, 500), mode="overwrite", stats_for=["k"])
    t.expire_snapshots(keep_last=1)
    assert not os.path.exists(os.path.join(t.path, sidecar))
    assert t.read().count() == 5


def test_clone_and_publish_carry_spilled_stats(spark, tmp_path):
    src = SnapshotTable(spark, str(tmp_path / "src"))
    src.commit(_rows(spark, 10), stats_for=["k"])
    src.set_properties({"stats.spill.file-threshold": "1"})
    v = src.commit(
        _rows(spark, 30, 100).repartition(3), mode="append",
        stats_for=["k"],
    )
    src_dir = src._manifest(v)["data_dirs"][-1]

    clone = src.shallow_clone_to(str(tmp_path / "clone"))
    cm = clone._manifest(clone.current_version())
    abs_dir = os.path.join(src.path, src_dir)
    entry = cm["file_stats"][abs_dir]
    assert _is_stats_ref(entry)
    assert os.path.isabs(entry[_STATS_SIDECAR_KEY])
    # clone prunes through the source's sidecar without copying it
    assert not os.path.isdir(os.path.join(clone.path, "stats"))
    _sel, n_sel, n_skip = clone.plan_range_scan("k", 100, 105)
    assert n_skip > 0

    # clone writes its own spilled commit, then publishes: the clone-
    # local sidecar must copy under the source root and keep pruning
    clone.set_properties({"stats.spill.file-threshold": "1"})
    cv = clone.commit(
        _rows(spark, 20, 900).repartition(2), mode="append",
        stats_for=["k"],
    )
    c_dir = clone._manifest(cv)["data_dirs"][-1]
    c_sidecar = clone._manifest(cv)["file_stats"][c_dir][_STATS_SIDECAR_KEY]
    clone.publish()
    sm = src._manifest(src.current_version())
    pe = sm["file_stats"][c_dir]
    assert _is_stats_ref(pe)
    assert pe[_STATS_SIDECAR_KEY] == c_sidecar
    assert os.path.isfile(os.path.join(src.path, c_sidecar))
    _sel, n_sel, n_skip = src.plan_range_scan("k", 900, 905)
    assert n_skip > 0
    assert src.read().count() == 60


def test_aggregate_fast_paths_answer_without_sidecar_read(spark, spilled):
    from oss_data_lake_spark.sources import snapshots as S

    t = spilled
    t.commit(
        _rows(spark, 40, 100).repartition(4), mode="append",
        stats_for=["k", "v"],
    )
    S._STATS_CACHE.clear()
    assert {"k", "v"} <= t.stats_columns()
    amp = t.maintenance_status()
    assert amp["table_rows_known"] == 50
    assert S._STATS_CACHE == {}, (
        "stats_columns / read_amplification must use the reference's "
        "aggregates, not resolve the sidecar"
    )


def test_compact_localizes_and_orphans_old_sidecars(spark, spilled):
    t = spilled
    t.commit(
        _rows(spark, 30, 100).repartition(3), mode="append",
        stats_for=["k"],
    )
    t.compact(stats_for=["k"])
    t.expire_snapshots(keep_last=1)
    # all pre-compact sidecars unreferenced -> swept; post-compact state
    # still prunes (compact re-harvested, spilling afresh past threshold)
    m = t._manifest(t.current_version())
    live = {
        e[_STATS_SIDECAR_KEY]
        for e in m["file_stats"].values()
        if _is_stats_ref(e)
    }
    on_disk = {
        f"stats/{n}" for n in os.listdir(os.path.join(t.path, "stats"))
    } if os.path.isdir(os.path.join(t.path, "stats")) else set()
    assert on_disk == live
    assert t.read().count() == 40


def test_spilled_dirs_plan_without_directory_listing(spark, spilled, monkeypatch):
    """The sidecar's key set is the writer's complete file universe: a
    pruned plan over a spilled dir must not pay the defensive O(#files)
    directory listing (inline-stats dirs still get it)."""
    from oss_data_lake_spark.sources import skipping as sk

    t = spilled
    t.commit(
        _rows(spark, 30, 100).repartitionByRange(3, "k"),
        mode="append", stats_for=["k"],
    )
    m = t._manifest(t.current_version())
    spilled_dir = m["data_dirs"][-1]
    inline_dir = m["data_dirs"][0]
    real = sk._iter_parquet_files
    listed: list[str] = []

    def spy(root):
        listed.append(root)
        return real(root)

    monkeypatch.setattr(sk, "_iter_parquet_files", spy)
    _sel, n_sel, n_skip = t.plan_range_scan("k", 100, 105)
    assert n_skip > 0
    assert not any(spilled_dir in p for p in listed), (
        "spilled dir planned from metadata alone"
    )
    assert any(inline_dir in p for p in listed), (
        "inline dirs keep the defensive listing"
    )
    # and the plan is still row-exact
    assert t.read_between("k", 100, 105).count() == 6


def test_publish_rebase_carries_spilled_stats_both_sides(spark, tmp_path):
    """Publish REBASE with spilled stats on BOTH sides: the source
    advanced with its own spilled commit while the clone staged one —
    the rebased manifest carries the source's refs (still source-
    relative) and localizes the clone's, and pruning works through
    both afterward."""
    src = SnapshotTable(spark, str(tmp_path / "src"))
    src.commit(_rows(spark, 10), stats_for=["k"])
    src.set_properties({"stats.spill.file-threshold": "1"})
    clone = src.shallow_clone_to(str(tmp_path / "clone"))
    clone.set_properties({"stats.spill.file-threshold": "1"})
    clone.commit(
        _rows(spark, 20, 900).repartition(2), mode="append",
        stats_for=["k"],
    )
    # concurrent DISJOINT source append (its own spilled sidecar)
    src.commit(
        _rows(spark, 20, 500).repartition(2), mode="append",
        stats_for=["k"],
    )
    clone.publish(require_source_unchanged=False)
    assert src.read().count() == 50
    for lo, hi in ((900, 905), (500, 505)):
        _sel, n_sel, n_skip = src.plan_range_scan("k", lo, hi)
        assert n_skip > 0, f"pruning dead through rebase for {lo}-{hi}"
    # every live ref resolves (no dangling sidecar paths)
    m = src._manifest(src.current_version())
    for d in m["data_dirs"]:
        st = src.dir_stats(m, d)
        assert st is None or len(st) >= 1
    # vacuum keeps them all
    src.vacuum()
    for lo, hi in ((900, 905), (500, 505)):
        assert src.read_between("k", lo, hi).count() == 6


def test_branch_refs_keep_main_sidecars_alive_through_vacuum(spark, tmp_path):
    """A branch references main's spilled sidecars absolutely: main's
    expire+vacuum must treat them as live (like its data dirs), and
    dropping the branch releases them."""
    t = SnapshotTable(spark, str(tmp_path / "m"))
    t.commit(_rows(spark, 5), stats_for=["k"])
    t.set_properties({"stats.spill.file-threshold": "1"})
    v = t.commit(
        _rows(spark, 30, 100).repartition(3), mode="append",
        stats_for=["k"],
    )
    sidecar = t._manifest(v)["file_stats"][
        t._manifest(v)["data_dirs"][-1]
    ][_STATS_SIDECAR_KEY]
    t.create_branch("keepme")
    # main moves on: overwrite + expire everything but head
    t.commit(_rows(spark, 3, 900), mode="overwrite", stats_for=["k"])
    t.expire_snapshots(keep_last=1)
    assert os.path.isfile(os.path.join(t.path, sidecar)), (
        "branch-referenced sidecar must survive main's retention"
    )
    # the branch still prunes through it
    bt = t.branch("keepme")
    _sel, n_sel, n_skip = bt.plan_range_scan("k", 100, 105)
    assert n_skip > 0
    # releasing the branch releases the sidecar
    t.drop_branch("keepme")
    t.vacuum()
    assert not os.path.exists(os.path.join(t.path, sidecar))
