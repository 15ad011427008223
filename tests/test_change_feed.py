"""Change data feed (Delta CDF / Iceberg changelog-scan parity,
``SnapshotTable.read_change_feed``): typed insert/delete change rows
derived post-hoc from manifests, valid across EVERY commit kind.

The invariant every test leans on:

    visible(parent) ⊎ inserts ∖ deletes == visible(child)   (as multisets)

so an incremental consumer that adds inserts and retracts deletes tracks
the table exactly through appends, overwrites, copy-on-write DML,
merge-on-read DML, and rollbacks — the capability VERDICT r6 named as the
missing tier between the DML surface and the incremental consumers.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from oss_data_lake_spark.sources.snapshots import SnapshotTable


def _counter(df, cols):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def _check_feed(t, from_v, to_v):
    """Assert the multiset equation and return the feed rows."""
    cols = [f.name for f in t.schema(to_v).fields]
    feed = t.read_change_feed(from_v, to_v)
    ins = _counter(feed.where("_change_type = 'insert'"), cols)
    dels = _counter(feed.where("_change_type = 'delete'"), cols)
    if from_v == 0:
        base = Counter()
    else:
        bdf = t.read(version=from_v)
        for c in cols:
            if c not in bdf.columns:  # project onto the END schema,
                bdf = bdf.withColumn(c, F.lit(None))  # like the feed does
        base = _counter(bdf, cols)
    child = _counter(t.read(version=to_v), cols)
    derived = base.copy()
    derived.update(ins)
    derived.subtract(dels)
    derived = Counter({k: n for k, n in derived.items() if n})
    assert derived == child, (
        f"feed {from_v}..{to_v} does not reproduce the child snapshot"
    )
    return feed


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k=i, v=float(i), g=i % 3) for i in range(60)]
    )
    t.commit_clustered(df, cluster_by="k", n_files=6, stats_for=["k"])
    return t


def test_append_only_feed(spark, tbl):
    tbl.commit(
        spark.createDataFrame([Row(k=100 + i, v=1.0, g=0) for i in range(5)]),
        mode="append",
    )
    feed = _check_feed(tbl, 1, 2)
    rows = feed.collect()
    assert all(r["_change_type"] == "insert" for r in rows)
    assert all(r["_commit_version"] == 2 for r in rows)
    assert len(rows) == 5
    # from 0: the whole table is inserts, versions attributed per commit
    full = _check_feed(tbl, 0, 2)
    assert full.where("_commit_version = 1").count() == 60
    assert full.where("_commit_version = 2").count() == 5


def test_cow_delete_feed_is_retraction_correct(spark, tbl):
    tbl.delete_where("k BETWEEN 10 AND 19", prune_column="k",
                     prune_lower=10, prune_upper=19)
    feed = _check_feed(tbl, 1, 2)
    # the net effect: 10 rows fewer; candidate survivors appear as
    # delete+insert pairs (coarse but net-correct)
    dels = feed.where("_change_type = 'delete'").count()
    ins = feed.where("_change_type = 'insert'").count()
    assert dels - ins == 10
    assert feed.where(
        "_change_type = 'delete' AND k BETWEEN 10 AND 19"
    ).count() == 10


def test_mor_delete_feed_is_exact(spark, tbl):
    tbl.delete_where_mor("k BETWEEN 20 AND 29", prune_column="k",
                         prune_lower=20, prune_upper=29)
    feed = _check_feed(tbl, 1, 2)
    rows = feed.collect()
    # MoR: the tombstones ARE the delta — exactly the deleted rows, no
    # insert noise
    assert all(r["_change_type"] == "delete" for r in rows)
    assert sorted(r["k"] for r in rows) == list(range(20, 30))


def test_mor_update_feed_pre_and_post_images(spark, tbl):
    tbl.update_where_mor(
        "k BETWEEN 0 AND 4", {"v": "v + 1000"},
        prune_column="k", prune_lower=0, prune_upper=4,
    )
    feed = _check_feed(tbl, 1, 2)
    dels = feed.where("_change_type = 'delete'").collect()
    ins = feed.where("_change_type = 'insert'").collect()
    assert sorted(r["k"] for r in dels) == [0, 1, 2, 3, 4]
    assert sorted(r["k"] for r in ins) == [0, 1, 2, 3, 4]
    assert all(r["v"] >= 1000 for r in ins)
    assert all(r["v"] < 1000 for r in dels)


def test_merge_and_overwrite_feed(spark, tbl):
    src = spark.createDataFrame(
        [Row(k=1, v=-1.0, g=9), Row(k=200, v=2.0, g=9)]
    )
    tbl.merge_rows(src, keys=["k"])
    _check_feed(tbl, 1, 2)
    tbl.commit(
        spark.createDataFrame([Row(k=0, v=0.0, g=0)]), mode="overwrite"
    )
    feed = _check_feed(tbl, 2, 3)
    assert feed.where("_change_type = 'insert'").count() == 1
    assert feed.where("_change_type = 'delete'").count() == 61
    _check_feed(tbl, 1, 3)  # across both commits


def test_feed_spans_mixed_dml_wave(spark, tbl):
    """The VERDICT done-bar: one feed across append + CoW DELETE + MoR
    UPDATE + MERGE reproduces the final snapshot."""
    tbl.commit(
        spark.createDataFrame([Row(k=60 + i, v=9.0, g=1) for i in range(10)]),
        mode="append",
    )
    tbl.delete_where("k BETWEEN 5 AND 9", prune_column="k",
                     prune_lower=5, prune_upper=9)
    tbl.update_where_mor("g = 2", {"v": "v * 2"})
    src = spark.createDataFrame([Row(k=3, v=0.5, g=0), Row(k=300, v=3.0, g=3)])
    tbl.merge_rows(src, keys=["k"])
    _check_feed(tbl, 1, tbl.current_version())
    _check_feed(tbl, 2, tbl.current_version())
    _check_feed(tbl, 3, tbl.current_version())


def test_rollback_past_mor_delete_resurrects(spark, tbl):
    tbl.delete_where_mor("k < 10")
    assert tbl.read().count() == 50
    tbl.rollback(1)
    feed = _check_feed(tbl, 2, 3)
    rows = feed.collect()
    assert all(r["_change_type"] == "insert" for r in rows)
    assert sorted(r["k"] for r in rows) == list(range(10))


def test_compaction_contributes_nothing(spark, tbl):
    tbl.delete_where_mor("k < 10")
    tbl.compact(target_partitions=2)
    assert tbl._manifest(3)["mode"] == "compact"
    feed = _check_feed(tbl, 2, 3)
    assert feed.count() == 0
    # and a feed ACROSS the compaction still reproduces the table
    _check_feed(tbl, 1, 3)


def test_metadata_only_commits_contribute_nothing(spark, tbl):
    tbl.set_properties({"owner": "me"})
    tbl.add_constraint("v_ok", "v >= 0")
    feed = _check_feed(tbl, 1, 3)
    assert feed.count() == 0


def test_schema_evolution_projects_onto_end_schema(spark, tbl):
    tbl.add_columns({"note": "string"})
    tbl.commit(
        spark.createDataFrame(
            [Row(k=500, v=5.0, g=0, note="new")],
            "k long, v double, g long, note string",
        ),
        mode="append",
    )
    feed = _check_feed(tbl, 1, 3)
    assert feed.where("k = 500").collect()[0]["note"] == "new"
    # pre-evolution rows (fed from before the first commit) project with
    # NULL note onto the end schema
    full = _check_feed(tbl, 0, 3)
    assert full.where("k = 0").collect()[0]["note"] is None


def test_expired_manifest_refuses(spark, tbl):
    tbl.commit(spark.createDataFrame([Row(k=100, v=1.0, g=0)]), mode="append")
    tbl.commit(spark.createDataFrame([Row(k=101, v=1.0, g=0)]), mode="append")
    tbl.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        tbl.read_change_feed(1)


def test_empty_range_and_bad_range(spark, tbl):
    v = tbl.current_version()
    feed = tbl.read_change_feed(v, v)
    assert feed.count() == 0
    assert feed.columns[-2:] == ["_change_type", "_commit_version"]
    with pytest.raises(ValueError, match="bad version range"):
        tbl.read_change_feed(5, 1)


def test_change_feed_over_partitioned_table(spark, tmp_path):
    """Round 7: the batch change feed works over Hive-partitioned dirs
    — partition values ride the basePath recovery in both CoW
    retraction pairs and MoR tombstone deltas."""
    t = SnapshotTable(spark, str(tmp_path / "p"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, p=i % 2, v=float(i)) for i in range(8)]
        ),
        partition_by=["p"],
    )
    t.delete_where("k >= 6")
    t.commit(
        spark.createDataFrame([Row(k=100, p=0, v=1.0)]),
        mode="append", partition_by=["p"],
    )
    feed = t.read_change_feed(1)
    # replay the delta onto the v1 state: base + feed == head
    state = Counter(
        (r["k"], r["p"], r["v"]) for r in t.read(1).collect()
    )
    for r in feed.collect():
        assert r["p"] == (r["k"] % 2 if r["k"] < 100 else 0)
        state[(r["k"], r["p"], r["v"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    want = Counter(
        (r["k"], r["p"], r["v"]) for r in t.read().collect()
    )
    assert +state == want and (100, 0, 1.0) in want

    t2 = SnapshotTable(spark, str(tmp_path / "m"))
    t2.commit(
        spark.createDataFrame(
            [Row(k=i, p=i % 2, v=float(i)) for i in range(8)]
        ),
        partition_by=["p"],
    )
    t2.delete_where_mor("k = 3")
    rows = t2.read_change_feed(1).collect()
    assert [(r["k"], r["p"], r["_change_type"]) for r in rows] == [
        (3, 1, "delete")
    ]


def _scan_count(df) -> int:
    from oss_data_lake_spark.plans.audit import explain_str

    return explain_str(df, "simple").count("Scan parquet")


def test_feed_plan_stays_flat_across_many_appends(spark, tmp_path):
    """VERDICT r7 'What's missing' #1: a batch read_change_feed over a
    long append history must fold into O(schema generations) scans, not
    one per commit — the per-commit arms remain only for steps that touch
    visibility, delete vectors, or equality deletes."""
    t = SnapshotTable(spark, str(tmp_path / "flat"))
    for wave in range(50):
        t.commit(
            spark.createDataFrame([Row(k=wave, v=float(wave))]),
            mode="append",
        )
    feed = t.read_change_feed(0)
    assert _scan_count(feed) <= 3
    rows = feed.collect()
    assert len(rows) == 50
    assert all(r["_change_type"] == "insert" for r in rows)
    # the folded arm stamps each row with the commit that added it
    assert sorted(r["_commit_version"] for r in rows) == list(range(1, 51))
    assert all(r["_commit_version"] == r["k"] + 1 for r in rows)
    _check_feed(t, 0, 50)


def test_feed_fold_spans_mixed_history(spark, tmp_path):
    """Appends fold; the MoR delete and CoW update steps keep their own
    arms; the multiset equation still holds end-to-end and versions stamp
    correctly on both sides of the non-foldable steps."""
    t = SnapshotTable(spark, str(tmp_path / "mixed"))
    for wave in range(10):
        t.commit(
            spark.createDataFrame(
                [Row(k=wave * 10 + j, v=float(wave)) for j in range(5)]
            ),
            mode="append",
            stats_for=["k"],
        )
    t.delete_where_mor("k % 10 = 3")                       # v11
    for wave in range(10, 15):
        t.commit(
            spark.createDataFrame(
                [Row(k=wave * 10 + j, v=float(wave)) for j in range(5)]
            ),
            mode="append",
            stats_for=["k"],
        )                                                   # v12..v16
    t.update_where("k = 41", {"v": F.lit(99.0)}, stats_for=["k"])  # v17
    feed = _check_feed(t, 0, 17)
    by_ver = {}
    for r in feed.collect():
        by_ver.setdefault(r["_commit_version"], []).append(r)
    # appends stamped at their own commits
    assert {r["k"] for r in by_ver[1] if r["_change_type"] == "insert"} == {0, 1, 2, 3, 4}
    assert {r["k"] for r in by_ver[12] if r["_change_type"] == "insert"} == set(range(100, 105))
    # the MoR delete arm carries exactly the tombstoned keys
    assert {r["k"] for r in by_ver[11]} == {3, 13, 23, 33, 43, 53, 63, 73, 83, 93}
    assert all(r["_change_type"] == "delete" for r in by_ver[11])
    # the CoW update emits retraction pairs for its candidate rows
    ups = by_ver[17]
    assert any(r["_change_type"] == "insert" and r["k"] == 41 and r["v"] == 99.0 for r in ups)
    assert any(r["_change_type"] == "delete" and r["k"] == 41 and r["v"] == 4.0 for r in ups)
    # plan: 15 foldable appends -> 1 folded arm; only the two DML steps
    # and the update's replacement-dir arm add scans
    assert _scan_count(t.read_change_feed(0)) <= 8


def test_feed_fold_respects_partitioned_dirs(spark, tmp_path):
    """Partitioned append dirs fold through the pgroup path past the
    threshold and stamp versions from the dir, not the partition."""
    import datetime

    t = SnapshotTable(spark, str(tmp_path / "part"))
    for wave in range(12):
        t.commit(
            spark.createDataFrame(
                [
                    Row(
                        k=wave * 2 + j,
                        cat="even" if j == 0 else "odd",
                    )
                    for j in range(2)
                ]
            ),
            mode="append",
            partition_by=["cat"],
        )
    feed = t.read_change_feed(0)
    rows = feed.collect()
    assert len(rows) == 24
    assert sorted({r["_commit_version"] for r in rows}) == list(range(1, 13))
    assert all(r["_commit_version"] == r["k"] // 2 + 1 for r in rows)
    _check_feed(t, 0, 12)


def test_feed_fold_handles_dir_readded_by_rollback(spark, tmp_path):
    """Round-8 review finding: a dir re-entering visibility (rollback
    past its removal) must NOT overwrite its earlier folded insert arm —
    the step keeps per-commit arms and every event survives."""
    t = SnapshotTable(spark, str(tmp_path / "readd"))
    t.commit(spark.createDataFrame([Row(k=1)]), mode="append")     # v1: A
    t.commit(spark.createDataFrame([Row(k=2)]), mode="append")     # v2: B
    t.rollback(1)                                                  # v3: B out
    t.rollback(2)                                                  # v4: B back
    rows = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in t.read_change_feed(0, 4).collect()
    )
    assert rows == [
        (1, "insert", 1),
        (2, "delete", 3),
        (2, "insert", 2),
        (2, "insert", 4),
    ]
    _check_feed(t, 0, 4)


def test_table_changes_sql_tvf(spark, tmp_path):
    """Delta's table_changes('t', start[, end]) TVF: the change feed as
    plain SQL through Engine.sql, with Delta's INCLUSIVE version bounds
    and timestamp bounds via version_as_of."""
    import json
    import os as _os

    from oss_data_lake_spark.engine import Engine

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=1), Row(k=2)]))          # v1
    t.commit(spark.createDataFrame([Row(k=3)]), mode="append")     # v2
    t.delete_where("k = 1")                                        # v3
    eng = Engine(spark=spark)
    eng._snapshot_tables["t"] = t

    rows = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in eng.sql("SELECT * FROM table_changes('t', 1)").collect()
    )
    # the unpruned CoW delete rewrote BOTH dirs: retraction pairs for
    # every surviving row (k=2, k=3), plus the true delete of k=1
    assert rows == [
        (1, "delete", 3),
        (1, "insert", 1),
        (2, "delete", 3),
        (2, "insert", 1),
        (2, "insert", 3),
        (3, "delete", 3),
        (3, "insert", 2),
        (3, "insert", 3),
    ]
    # INCLUSIVE start=2, explicit end=2: exactly the v2 commit
    rows = eng.sql("SELECT * FROM table_changes('t', 2, 2)").collect()
    assert [(r["k"], r["_change_type"]) for r in rows] == [(3, "insert")]
    # aggregation over the TVF composes with plain SQL
    n = eng.sql(
        "SELECT count(*) AS n FROM table_changes('t', 1) "
        "WHERE _change_type = 'insert'"
    ).collect()[0]["n"]
    assert n == 5

    # timestamp bounds: pin commit times, then ask for changes since v2's
    for v, ms in ((1, 1000), (2, 2000), (3, 3000)):
        p = _os.path.join(t.path, "_snapshots", f"v{v}.json")
        mm = json.load(open(p))
        mm["committed_at_ms"] = ms
        json.dump(mm, open(p, "w"))
    rows = sorted(
        (r["k"], r["_change_type"])
        for r in eng.sql(
            "SELECT * FROM table_changes('t', '1970-01-01T00:00:02')"
        ).collect()
    )
    assert rows == [
        (1, "delete"), (2, "delete"), (2, "insert"),
        (3, "delete"), (3, "insert"), (3, "insert"),
    ]
    # unregistered table refuses loudly
    with pytest.raises(ValueError, match="unregistered"):
        eng.sql("SELECT * FROM table_changes('nope', 1)")


def test_feed_rollback_past_cow_hide_plus_eq_delete(spark, tmp_path):
    """Differential-found double-count: CoW-hide a row's file, equality-
    delete the SAME (already invisible) key, then roll back past both.
    The restored file's rows ride the file-level diff; the departing
    equality delete's resurrection arm must NOT re-emit rows whose file
    was invisible on the parent side — each arm owns only rows visible
    on BOTH sides of its step."""
    from collections import Counter

    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(100)], "k long, v double"
    )
    t.commit(base, partition_by=["bucket(4, k)"], stats_for=["k"])
    t.delete_where(
        "k BETWEEN 0 AND 0", prune_column="k", prune_lower=0,
        prune_upper=0, stats_for=["k"],
    )
    t.delete_where_eq("k", [0])
    t.rollback(1)
    net: Counter = Counter()
    for r in t.read_change_feed(0).collect():
        net[(r["k"], r["v"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    assert all(c in (0, 1) for c in net.values()), {
        kv: c for kv, c in net.items() if c not in (0, 1)
    }
    assert {k: v for (k, v), c in net.items() if c == 1} == {
        r.k: r.v for r in t.read().collect()
    }
    # the MoR-delete-vector twin of the same shape: hide the file via
    # CoW, tombstone the same key, roll back past both
    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.commit(base, partition_by=["bucket(4, k)"], stats_for=["k"])
    t2.delete_where_mor(
        "k BETWEEN 3 AND 3", prune_column="k", prune_lower=3,
        prune_upper=3,
    )
    t2.delete_where(
        "k BETWEEN 4 AND 4", prune_column="k", prune_lower=4,
        prune_upper=4, stats_for=["k"],
    )
    t2.rollback(1)
    net2: Counter = Counter()
    for r in t2.read_change_feed(0).collect():
        net2[(r["k"], r["v"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    assert all(c in (0, 1) for c in net2.values()), {
        kv: c for kv, c in net2.items() if c not in (0, 1)
    }
    assert {k: v for (k, v), c in net2.items() if c == 1} == {
        r.k: r.v for r in t2.read().collect()
    }


def test_feed_rollback_to_version_with_outstanding_eq_deletes(spark, tmp_path):
    """Differential-found: roll back TO a version whose equality deletes
    are outstanding, with tombstone vectors departing in the same step —
    the dv-resurrection arm must apply the child's (resurrected) eq
    state, or rows the eq suppresses re-enter the net."""
    from collections import Counter

    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_clustered(
        spark.createDataFrame(
            [(k, float(k)) for k in range(100)], "k long, v double"
        ),
        cluster_by="k", n_files=5, stats_for=["k"],
    )
    t.merge_rows_mor(
        spark.createDataFrame(
            [(k, -7.5) for k in (1, 64, 83, 97, 133)], "k long, v double"
        ),
        ["k"],
    )                                          # v2: eq-delete + append
    t.rollback(1)                              # v3: eq gone
    t.delete_where_mor(
        "k BETWEEN 0 AND 59", prune_column="k", prune_lower=0,
        prune_upper=59,
    )                                          # v4: tombstones
    t.rollback(2)                              # v5: eq BACK, dvs gone
    net: Counter = Counter()
    for r in t.read_change_feed(0).collect():
        net[(r["k"], r["v"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    assert all(c in (0, 1) for c in net.values()), {
        kv: c for kv, c in net.items() if c not in (0, 1)
    }
    assert {k: v for (k, v), c in net.items() if c == 1} == {
        r.k: r.v for r in t.read().collect()
    }


def test_feed_single_ownership_across_same_step_arms(spark, tmp_path):
    """Differential-audit shapes: the SAME key equality-deleted twice,
    and a key both tombstoned AND equality-deleted, rolled back past in
    one step — each resurrected row must be emitted by exactly ONE arm
    (dv arms and earlier eq arms outrank later eq arms)."""
    from collections import Counter

    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    base = spark.createDataFrame(
        [(k, float(k)) for k in range(20)], "k long, v double"
    )

    def net_check(t):
        net: Counter = Counter()
        for r in t.read_change_feed(0).collect():
            net[(r["k"], r["v"])] += (
                1 if r["_change_type"] == "insert" else -1
            )
        assert all(c in (0, 1) for c in net.values()), {
            kv: c for kv, c in net.items() if c not in (0, 1)
        }
        assert {k: v for (k, v), c in net.items() if c == 1} == {
            r.k: r.v for r in t.read().collect()
        }

    t = SnapshotTable(spark, str(tmp_path / "ee"))
    t.commit_clustered(base, cluster_by="k", n_files=2, stats_for=["k"])
    t.delete_where_eq("k", [5])
    t.delete_where_eq("k", [5, 6])   # same key again (scan-free, legal)
    t.rollback(1)
    net_check(t)
    # forward direction too: rollback TO the version with both entries
    t.rollback(3)
    net_check(t)

    t2 = SnapshotTable(spark, str(tmp_path / "de"))
    t2.commit_clustered(base, cluster_by="k", n_files=2, stats_for=["k"])
    t2.delete_where_mor("k = 5", prune_column="k", prune_lower=5, prune_upper=5)
    t2.delete_where_eq("k", [5])     # key already tombstoned
    t2.rollback(1)
    net_check(t2)
    t2.rollback(3)
    net_check(t2)


def test_feed_rollback_brings_vector_with_unseen_files(spark, tmp_path):
    """Differential-found: mor-delete, compact (clears the vector),
    then roll back — the vector ARRIVES alongside files the compacted
    parent never had. Its rows were never inserted (the file-insert arm
    applies the child's vectors), so the arriving-vector arm must clip
    to parent-visible files and emit nothing for them."""
    from collections import Counter

    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "cv"))
    t.commit_clustered(
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k long, v double"
        ),
        cluster_by="k", n_files=2, stats_for=["k"],
    )
    t.delete_where_mor("k = 0", prune_column="k", prune_lower=0, prune_upper=0)
    t.compact()
    t.rollback(2)
    net: Counter = Counter()
    for r in t.read_change_feed(0).collect():
        net[(r["k"], r["v"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    assert all(c in (0, 1) for c in net.values()), {
        kv: c for kv, c in net.items() if c not in (0, 1)
    }
    assert {k: v for (k, v), c in net.items() if c == 1} == {
        r.k: r.v for r in t.read().collect()
    }
