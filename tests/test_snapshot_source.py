"""SnapshotTable as a streaming SOURCE (streaming/snapshot_source.py) —
versions as offsets, manifest diffs as micro-batches, checkpoint-exact
resume. Delta readStream parity on the Spark 4 Python DataSource API."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.sources.snapshots import SnapshotTable
from oss_data_lake_spark.streaming.snapshot_source import (
    FORMAT_NAME,
    SnapshotStreamSource,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SnapshotStreamSource)
    return spark


def _drain(spark, path: str, ck: str) -> list[tuple]:
    got: list[tuple] = []

    def sink(batch, _bid):
        got.extend(tuple(r) for r in batch.collect())

    q = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", path)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_stream_reads_appends_and_resumes_from_checkpoint(
    registered, spark, tmp_path
):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(5)]))

    first = _drain(spark, t.path, ck)
    assert sorted(first) == [(i, float(i)) for i in range(5)]

    # two more commits while the stream is down; resume drains ONLY them
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(5, 8)]),
        mode="append",
    )
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(8, 10)]),
        mode="append",
    )
    second = _drain(spark, t.path, ck)
    assert sorted(second) == [(i, float(i)) for i in range(5, 10)]

    # nothing new: the next drain is empty (no replay)
    assert _drain(spark, t.path, ck) == []


def test_stream_projects_evolved_schema(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "evo"))
    ck = str(tmp_path / "ck")
    t.commit(spark.createDataFrame([Row(k=1)]))
    _drain(spark, t.path, ck)
    t.commit(
        spark.createDataFrame([Row(k=2, tag="x")]), mode="append"
    )
    got = _drain(spark, t.path, ck)
    # the batch projects onto the HEAD schema (k, tag)
    assert got == [(2, "x")]


def test_stream_refuses_rewritten_history(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "rw"))
    ck = str(tmp_path / "ck")
    t.commit(
        spark.createDataFrame([Row(k=i) for i in range(10)]),
        stats_for=["k"],
    )
    _drain(spark, t.path, ck)
    t.delete_where("k < 3", prune_column="k", prune_lower=0, prune_upper=2)
    with pytest.raises(Exception, match="not an append"):
        _drain(spark, t.path, ck)


def test_start_version_skips_history(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "sv"))
    t.commit(spark.createDataFrame([Row(k=1)]))
    t.commit(spark.createDataFrame([Row(k=2)]), mode="append")
    got: list[tuple] = []

    def sink(batch, _bid):
        got.extend(tuple(r) for r in batch.collect())

    q = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", t.path)
        .option("startVersion", "1")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert got == [(2,)]


def test_lakehouse_streaming_hub(registered, spark, tmp_path):
    """The versioned table as a streaming HUB: appends stream OUT of
    table A (snapshot_stream source), land exactly-once IN table B (txn
    sink protocol), and an incremental MV over B refreshes per batch —
    sink, source, and MV compose end-to-end with checkpoint-exact resume
    and no duplicates across restarts."""
    from pyspark.sql import functions as F

    from oss_data_lake_spark.functions.deterministic import dsum
    from oss_data_lake_spark.operators.matview import IncrementalAggregate
    from oss_data_lake_spark.streaming.snapshot_sink import commit_batch

    a = SnapshotTable(spark, str(tmp_path / "a"))
    b = SnapshotTable(spark, str(tmp_path / "b"))
    mv = IncrementalAggregate(
        b, str(tmp_path / "mv"), group_by=["g"], measures={"sum_v": "v"}
    )
    ck = str(tmp_path / "ck")

    def pump():
        def sink(batch, bid):
            if batch.isEmpty():
                return
            commit_batch(b, batch, bid, "hub")
            mv.refresh()

        q = (
            spark.readStream.format(FORMAT_NAME)
            .option("path", a.path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def gen(lo, hi):
        return spark.createDataFrame(
            [Row(g=f"g{i % 3}", v=float(i)) for i in range(lo, hi)]
        )

    a.commit(gen(0, 50))
    pump()
    assert b.read().count() == 50

    a.commit(gen(50, 80), mode="append")
    pump()
    assert b.read().count() == 80
    # replay with no new upstream data: nothing lands twice
    pump()
    assert b.read().count() == 80

    # MV over B equals the full recompute over A's data
    got = {
        (r["g"]): (r["n_rows"], r["sum_v"])
        for r in mv.read().collect()
    }
    want = {
        r["g"]: (r["n"], r["s"])
        for r in a.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), dsum("v", "s"))
        .collect()
    }
    assert got == want


def _drain_opts(spark, path: str, ck: str, **opts) -> list[tuple]:
    got: list[tuple] = []

    def sink(batch, _bid):
        got.extend(tuple(r) for r in batch.collect())

    reader = spark.readStream.format(FORMAT_NAME).option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_skip_change_commits_passes_over_dml(registered, spark, tmp_path):
    """Delta's skipChangeCommits: a stream survives a DML commit by
    contributing NOTHING for it — appends before and after still arrive
    exactly once, per-commit (not base-vs-head) diffing."""
    t = SnapshotTable(spark, str(tmp_path / "sc"))
    ck = str(tmp_path / "ck")
    t.commit(
        spark.createDataFrame([Row(k=i) for i in range(10)]),
        stats_for=["k"],
    )
    got = _drain_opts(spark, t.path, ck, skipChangeCommits="true")
    assert sorted(got) == [(i,) for i in range(10)]
    # a wave: append + CoW delete + MoR delete + append, all undrained
    t.commit(spark.createDataFrame([Row(k=100)]), mode="append")
    t.delete_where("k < 3", prune_column="k", prune_lower=0, prune_upper=2)
    t.delete_where_mor("k = 5")
    t.commit(spark.createDataFrame([Row(k=101)]), mode="append")
    got = _drain_opts(spark, t.path, ck, skipChangeCommits="true")
    # ONLY the two appends arrive; the DML commits (including the CoW
    # rewrite's replacement files) are skipped whole
    assert sorted(got) == [(100,), (101,)]
    # compaction is dataChange=false: nothing arrives, no flag needed
    t.compact(target_partitions=1)
    assert _drain_opts(spark, t.path, ck, skipChangeCommits="true") == []


def test_without_skip_flag_dml_still_refuses(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "nf"))
    ck = str(tmp_path / "ck")
    t.commit(spark.createDataFrame([Row(k=i) for i in range(5)]))
    _drain(spark, t.path, ck)
    t.delete_where_mor("k = 1")
    with pytest.raises(Exception, match="skipChangeCommits"):
        _drain(spark, t.path, ck)


def test_compaction_alone_streams_as_noop(registered, spark, tmp_path):
    """A compact commit must not error OR replay rows even WITHOUT
    skipChangeCommits — it is dataChange=false by tag."""
    t = SnapshotTable(spark, str(tmp_path / "cp"))
    ck = str(tmp_path / "ck")
    t.commit(spark.createDataFrame([Row(k=i) for i in range(6)]))
    _drain(spark, t.path, ck)
    t.compact(target_partitions=1)
    assert _drain(spark, t.path, ck) == []
    t.commit(spark.createDataFrame([Row(k=99)]), mode="append")
    assert _drain(spark, t.path, ck) == [(99,)]


def _drain_feed(spark, path: str, ck: str) -> list[tuple]:
    return _drain_opts(spark, path, ck, changeFeed="true")


def test_change_feed_stream_survives_dml(registered, spark, tmp_path):
    """Delta's streaming readChangeFeed: the stream emits typed
    insert/delete rows for EVERY commit kind and never refuses on DML —
    the multiset of streamed changes reproduces the table."""
    from collections import Counter

    t = SnapshotTable(spark, str(tmp_path / "cf"))
    ck = str(tmp_path / "ck")
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(20)]),
        stats_for=["k"],
    )
    got = _drain_feed(spark, t.path, ck)
    assert len(got) == 20
    assert all(r[2] == "insert" and r[3] == 1 for r in got)

    # a DML wave, all undrained: MoR delete + MoR update + CoW delete +
    # append + eq delete
    t.delete_where_mor("k BETWEEN 0 AND 2")
    t.update_where_mor("k = 5", {"v": "v + 100"})
    t.delete_where("k BETWEEN 10 AND 12", prune_column="k",
                   prune_lower=10, prune_upper=12)
    t.commit(spark.createDataFrame([Row(k=100, v=1.0)]), mode="append")
    t.delete_where_eq("k", [7, 100])
    changes = _drain_feed(spark, t.path, ck)

    # applying the streamed changes to the v1 state reproduces the head
    state = Counter((r[0], r[1]) for r in got)
    for k, v, ct, _ver in changes:
        if ct == "insert":
            state[(k, v)] += 1
        else:
            state[(k, v)] -= 1
    state = Counter({kv: n for kv, n in state.items() if n})
    head = Counter((r["k"], r["v"]) for r in t.read().collect())
    assert state == head

    # per-kind spot checks
    by = {}
    for k, v, ct, ver in changes:
        by.setdefault((ver, ct), []).append((k, v))
    assert sorted(by[(2, "delete")]) == [(0, 0.0), (1, 1.0), (2, 2.0)]
    assert by[(3, "delete")] == [(5, 5.0)]
    assert by[(3, "insert")] == [(5, 105.0)]
    assert sorted(k for k, _ in by[(4, "delete")] if 10 <= k <= 12) == [10, 11, 12]
    assert by[(5, "insert")] == [(100, 1.0)]
    assert sorted(by[(6, "delete")]) == [(7, 7.0), (100, 1.0)]

    # nothing new: empty; then compaction streams as nothing
    assert _drain_feed(spark, t.path, ck) == []
    t.compact(target_partitions=1)
    assert _drain_feed(spark, t.path, ck) == []


def test_change_feed_stream_resumes_mid_wave(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "cfr"))
    ck = str(tmp_path / "ck")
    t.commit(spark.createDataFrame([Row(k=i) for i in range(6)]))
    _drain_feed(spark, t.path, ck)
    t.delete_where_mor("k < 2")
    first = _drain_feed(spark, t.path, ck)
    assert sorted(r[0] for r in first) == [0, 1]
    t.commit(spark.createDataFrame([Row(k=50)]), mode="append")
    second = _drain_feed(spark, t.path, ck)  # only the new commit
    assert second == [(50, "insert", 3)]


def test_change_feed_excludes_skip_flag(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "cfx"))
    t.commit(spark.createDataFrame([Row(k=1)]))
    with pytest.raises(Exception, match="exclusive"):
        _drain_opts(
            spark, t.path, str(tmp_path / "ck"),
            changeFeed="true", skipChangeCommits="true",
        )


def test_start_timestamp_option(registered, spark, tmp_path):
    """Delta's startingTimestamp: the stream begins at the first commit
    AT OR AFTER the timestamp (exclusive with startVersion)."""
    import json
    import os

    t = SnapshotTable(spark, str(tmp_path / "ts"))
    t.commit(spark.createDataFrame([Row(k=1)]))
    t.commit(spark.createDataFrame([Row(k=2)]), mode="append")
    t.commit(spark.createDataFrame([Row(k=3)]), mode="append")
    # pin manifest timestamps so the cutoff is deterministic
    for v, ms in ((1, 1000), (2, 2000), (3, 3000)):
        p = os.path.join(t.path, "_snapshots", f"v{v}.json")
        m = json.load(open(p))
        m["committed_at_ms"] = ms
        json.dump(m, open(p, "w"))
    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"),
        startTimestamp="1970-01-01T00:00:02",
    )
    assert sorted(got) == [(2,), (3,)]
    with pytest.raises(Exception, match="exclusive"):
        _drain_opts(
            spark, t.path, str(tmp_path / "ck2"),
            startTimestamp="1970-01-01T00:00:02", startVersion="1",
        )


def test_stream_over_identity_partitioned_table(registered, spark, tmp_path):
    """Round 7: partitioned layouts stream — identity partition values
    are recovered TYPED from the path segments at plan time (previously
    a loud refusal)."""
    t = SnapshotTable(spark, str(tmp_path / "p"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, p=i % 3, s=f"s{i}") for i in range(9)]
        ),
        partition_by=["p"],
    )
    t.commit(
        spark.createDataFrame(
            [(99, None, "null-part")], "k long, p long, s string"
        ),
        mode="append",
        partition_by=["p"],
    )
    got = _drain(spark, t.path, str(tmp_path / "ck"))
    want = [(i, i % 3, f"s{i}") for i in range(9)] + [(99, None, "null-part")]
    assert sorted(got, key=str) == sorted(want, key=str)
    # typed: the partition column must come back as int, not string
    assert all(isinstance(r[1], int) for r in got if r[1] is not None)


def test_stream_over_hidden_partitioned_table(registered, spark, tmp_path):
    """days(ts)-partitioned tables stream: the hidden _p_* segment is
    ignored (it exists in no read schema), rows come back whole."""
    import datetime

    t = SnapshotTable(spark, str(tmp_path / "h"))
    rows = [
        Row(k=i, ts=datetime.datetime(1996, 1 + i % 3, 1 + i % 5))
        for i in range(10)
    ]
    t.commit(spark.createDataFrame(rows), partition_by=["days(ts)"])
    got = _drain(spark, t.path, str(tmp_path / "ck"))
    assert len(got) == 10
    assert sorted(r[0] for r in got) == list(range(10))
    assert all(isinstance(r[1], datetime.datetime) for r in got)


def test_change_feed_over_partitioned_dml(registered, spark, tmp_path):
    """The streaming CHANGE FEED over a partitioned table with DML:
    partition values ride the recovered constants through insert AND
    retraction batches."""
    t = SnapshotTable(spark, str(tmp_path / "cf"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, p=i % 2, v=float(i)) for i in range(8)]
        ),
        partition_by=["p"],
    )
    t.delete_where("k >= 6")  # CoW rewrite inside partitioned dirs
    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"), changeFeed="true"
    )
    # replay the multiset: inserts minus deletes == final state
    from collections import Counter

    state: Counter = Counter()
    for r in got:
        body, ctype = tuple(r[:-2]), r[-2]
        state[body] += 1 if ctype == "insert" else -1
    want = Counter(
        tuple(r) for r in [(i, i % 2, float(i)) for i in range(6)]
    )
    assert +state == want
    assert all(r[1] in (0, 1) for r in got), "partition value must ride"


def test_stream_over_shallow_clone(registered, spark, tmp_path):
    """The snapshot stream source works on a SHALLOW CLONE: external
    (source-absolute) dirs resolve in the file planner, and the clone's
    own appends stream alongside them."""
    src = SnapshotTable(spark, str(tmp_path / "src"))
    src.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(5)]))
    clone = src.shallow_clone_to(str(tmp_path / "c"))
    clone.commit(spark.createDataFrame([Row(k=9, v=9.0)]), mode="append")
    got = _drain(spark, clone.path, str(tmp_path / "ck"))
    assert sorted(got) == [(i, float(i)) for i in range(5)] + [(9, 9.0)]


def test_change_feed_partitioned_mor_positions(registered, spark, tmp_path):
    """MoR position tombstones over a PARTITIONED table stream as exact
    per-row deltas: the tombstone coordinates include the partition
    segments, and the recovered partition constants ride the rows."""
    t = SnapshotTable(spark, str(tmp_path / "pm"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, p=i % 2, v=float(i)) for i in range(8)]
        ),
        partition_by=["p"],
    )
    t.delete_where_mor("k IN (2, 5)")
    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"), changeFeed="true"
    )
    deletes = [r for r in got if r[-2] == "delete"]
    assert sorted((r[0], r[1]) for r in deletes) == [(2, 0), (5, 1)]


def test_change_feed_partitioned_eq_delete_on_partition_key(
    registered, spark, tmp_path
):
    """An equality delete keyed on the PARTITION column itself: the
    executor matches the key against the path-recovered constant (the
    column isn't in the file bytes at all)."""
    t = SnapshotTable(spark, str(tmp_path / "pe"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, p=i % 3, v=float(i)) for i in range(9)]
        ),
        partition_by=["p"],
    )
    t.delete_where_eq("p", [1])
    assert sorted(r["k"] for r in t.read().collect()) == [
        i for i in range(9) if i % 3 != 1
    ]
    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"), changeFeed="true"
    )
    deletes = sorted(r[0] for r in got if r[-2] == "delete")
    assert deletes == [1, 4, 7]


def test_large_tombstone_wave_plans_by_reference(registered, spark, tmp_path):
    """VERDICT r7 'What's missing' #2: a wave with >=1e5 tombstoned
    positions must stream with driver-side planning touching only FILE
    LISTS — partitions carry delete-file references (paths), never
    materialized position lists or key rows — and the replayed feed
    still matches the batch change feed as a multiset."""
    from collections import Counter

    t = SnapshotTable(spark, str(tmp_path / "big"))
    n = 100_000
    t.commit(
        spark.range(n).selectExpr("id AS k", "CAST(id % 7 AS DOUBLE) AS v")
        .repartition(4),
        stats_for=["k"],
    )
    t.delete_where_mor("k % 2 = 0")          # 50k positions
    t.delete_where_mor("k % 7 = 1 AND k % 2 = 1")  # ~7k more, 2nd vector
    t.delete_where_eq("v", [3.0])            # an equality wave on top

    src = SnapshotStreamSource(
        options={"path": t.path, "changeFeed": "true"}
    )
    reader = src.streamReader(None)
    parts = reader.partitions(
        {"version": 0}, {"version": t.current_version()}
    )
    assert parts
    for pt in parts:
        assert all(isinstance(r, str) for r in pt.skip_dv_refs)
        assert all(isinstance(r, str) for r in pt.only_dv_refs)
        if pt.eq_only is not None:
            names, ref, cols = pt.eq_only
            assert isinstance(ref, str) and isinstance(cols, list)
        for names, ref, cols in pt.eq_skip:
            assert isinstance(ref, str)

    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"), changeFeed="true"
    )
    want = Counter(
        tuple(r) for r in t.read_change_feed(0).collect()
    )
    assert Counter(got) == want
    # the surviving multiset is exact: base minus both waves
    survive = Counter()
    for r in got:
        key = r[:-2]
        if r[-2] == "insert":
            survive[key] += 1
        else:
            survive[key] -= 1
    live = {k for k, cnt in survive.items() if cnt > 0}
    assert live == {
        (i, float(i % 7))
        for i in range(n)
        if i % 2 == 1 and not (i % 7 == 1) and i % 7 != 3
    }


def _drain_paced(spark, path: str, ck: str, n_rows: int, **opts):
    """Drain with a PROCESSING-TIME trigger until n_rows arrive (the
    availableNow wrapper snapshots latestOffset once, so admission
    control paces only polling triggers) and return the non-empty
    batches."""
    import time as _time

    batches: list[list[tuple]] = []

    def sink(batch, _bid):
        rows = [tuple(r) for r in batch.collect()]
        if rows:
            batches.append(rows)

    reader = spark.readStream.format(FORMAT_NAME).option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if sum(len(b) for b in batches) >= n_rows:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert sum(len(b) for b in batches) == n_rows, batches
    return batches


def test_max_versions_per_trigger_paces_batches(registered, spark, tmp_path):
    """Round 8 (Delta admission-control parity): maxVersionsPerTrigger
    splits a 6-commit backlog into paced micro-batches; the union is
    exactly-once identical to the unpaced drain."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for w in range(6):
        t.commit(
            spark.createDataFrame([Row(k=w * 10 + j) for j in range(3)]),
            mode="append",
        )
    batches = _drain_paced(
        spark, t.path, str(tmp_path / "ck"), 18,
        maxVersionsPerTrigger="2",
    )
    assert len(batches) == 3  # 6 versions / 2 per trigger
    assert all(len(b) == 6 for b in batches)  # 2 commits x 3 rows
    flat = sorted(r for b in batches for r in b)
    assert flat == sorted((w * 10 + j,) for w in range(6) for j in range(3))


def test_max_files_per_trigger_paces_by_file_count(
    registered, spark, tmp_path
):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    # commits with 1, 3, 1, 1 files
    for w, nf in enumerate((1, 3, 1, 1)):
        t.commit(
            spark.createDataFrame(
                [Row(k=w * 10 + j) for j in range(nf)]
            ).repartition(nf),
            mode="append",
        )
    batches = _drain_paced(
        spark, t.path, str(tmp_path / "ck"), 6, maxFilesPerTrigger="2"
    )
    # v1 (1 file) + v2 (3 files) crosses the budget -> batch 1 = v1+v2;
    # then v3+v4 (2 files) = batch 2
    assert len(batches) == 2
    assert sorted(len(b) for b in batches) == [2, 4]


def test_paced_stream_resumes_from_checkpoint(registered, spark, tmp_path):
    """A paced stream's checkpoint restart replays nothing; the first
    post-restart batch is the documented uncapped catch-up."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    for w in range(4):
        t.commit(spark.createDataFrame([Row(k=w)]), mode="append")
    first = _drain_paced(spark, t.path, ck, 4, maxVersionsPerTrigger="1")
    assert len(first) == 4
    assert sorted(r for b in first for r in b) == [(0,), (1,), (2,), (3,)]
    for w in range(4, 7):
        t.commit(spark.createDataFrame([Row(k=w)]), mode="append")
    second = _drain_paced(spark, t.path, ck, 3, maxVersionsPerTrigger="1")
    flat = sorted(r for b in second for r in b)
    assert flat == [(4,), (5,), (6,)]  # no replay, only the new commits


def test_pacing_composes_with_change_feed(registered, spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(6)]))
    t.delete_where_mor("k IN (1, 4)")
    t.commit(spark.createDataFrame([Row(k=10, v=1.0)]), mode="append")
    # rows: 6 inserts + 2 feed deletes + 1 insert = 9
    batches = _drain_paced(
        spark, t.path, str(tmp_path / "ck"), 9,
        changeFeed="true", maxVersionsPerTrigger="1",
    )
    assert len(batches) == 3  # one per commit
    from collections import Counter

    net = Counter()
    for b in batches:
        for r in b:
            net[r[:2]] += 1 if r[2] == "insert" else -1
    live = {k for k, c in net.items() if c > 0}
    assert live == {(i, float(i)) for i in range(6) if i not in (1, 4)} | {
        (10, 1.0)
    }


def test_change_feed_stream_matches_batch_after_rollback_past_hide_and_eq(
    registered, spark, tmp_path
):
    """The streaming twin of the differential-found double-count: CoW-
    hide a file, eq-delete the same key, roll back past both — the
    streamed multiset must equal the batch feed exactly (both clip the
    eq/dv arms to files visible on BOTH sides of each step)."""
    from collections import Counter

    t = SnapshotTable(spark, str(tmp_path / "rb"))
    t.commit(
        spark.createDataFrame(
            [(k, float(k)) for k in range(100)], "k long, v double"
        ),
        partition_by=["bucket(4, k)"],
        stats_for=["k"],
    )
    t.delete_where(
        "k BETWEEN 0 AND 0", prune_column="k", prune_lower=0,
        prune_upper=0, stats_for=["k"],
    )
    t.delete_where_eq("k", [0])
    t.delete_where_mor(
        "k BETWEEN 3 AND 3", prune_column="k", prune_lower=3,
        prune_upper=3,
    )
    t.rollback(1)
    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"), changeFeed="true"
    )
    want = Counter(tuple(r) for r in t.read_change_feed(0).collect())
    assert Counter(got) == want
    net: Counter = Counter()
    for r in got:
        net[r[:-2]] += 1 if r[-2] == "insert" else -1
    assert all(c in (0, 1) for c in net.values())
    assert sum(net.values()) == 100


def test_batch_read_through_datasource(registered, spark, tmp_path):
    """spark.read.format('snapshot_stream') — BATCH reads for a plain
    Spark session: visible files plan as partitions, executors apply
    tombstones/equality deletes from file references, versionAsOf time-
    travels, and the result matches SnapshotTable.read exactly."""
    t = SnapshotTable(spark, str(tmp_path / "b"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, p=i % 3, v=float(i)) for i in range(30)]
        ),
        partition_by=["p"],
        stats_for=["k"],
    )
    t.delete_where_mor("k BETWEEN 4 AND 6")    # position tombstones
    t.delete_where_eq("k", [10, 11])           # equality deletes
    t.commit(
        spark.createDataFrame([Row(k=100, p=9, v=1.5)]),
        mode="append", partition_by=["p"],
    )

    def batch(**opts):
        r = spark.read.format("snapshot_stream").option("path", t.path)
        for k, x in opts.items():
            r = r.option(k, x)
        return r.load()

    got = {(r["k"], r["p"], r["v"]) for r in batch().collect()}
    want = {(r["k"], r["p"], r["v"]) for r in t.read().collect()}
    assert got == want and len(got) == 26
    # no feed columns leak into batch rows
    assert set(batch().columns) == {"k", "p", "v"}
    # versionAsOf time-travels (pre-DML snapshot)
    v1 = {(r["k"],) for r in batch(versionAsOf="1").collect()}
    assert len(v1) == 30
    # changeFeed batch reads route through the TVF, not the reader
    with pytest.raises(Exception, match="table_changes"):
        batch(changeFeed="true").collect()


def test_change_feed_stream_rollback_to_eq_outstanding(
    registered, spark, tmp_path
):
    """Streaming twin of the dv-resurrection-under-resurrected-eq shape:
    stream == batch exactly when rolling back TO a version with
    outstanding equality deletes while tombstone vectors depart."""
    from collections import Counter

    t = SnapshotTable(spark, str(tmp_path / "re"))
    t.commit_clustered(
        spark.createDataFrame(
            [(k, float(k)) for k in range(100)], "k long, v double"
        ),
        cluster_by="k", n_files=5, stats_for=["k"],
    )
    t.merge_rows_mor(
        spark.createDataFrame(
            [(k, -7.5) for k in (1, 64, 83)], "k long, v double"
        ),
        ["k"],
    )
    t.rollback(1)
    t.delete_where_mor(
        "k BETWEEN 0 AND 59", prune_column="k", prune_lower=0,
        prune_upper=59,
    )
    t.rollback(2)
    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"), changeFeed="true"
    )
    want = Counter(tuple(r) for r in t.read_change_feed(0).collect())
    assert Counter(got) == want


def test_change_feed_stream_single_ownership(registered, spark, tmp_path):
    """Streaming twin of the single-ownership shapes: same-key double
    eq-delete and tombstone+eq on one key, rolled back past — stream ==
    batch as an exact multiset in both rollback directions."""
    from collections import Counter

    t = SnapshotTable(spark, str(tmp_path / "so"))
    t.commit_clustered(
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k long, v double"
        ),
        cluster_by="k", n_files=2, stats_for=["k"],
    )
    t.delete_where_mor("k = 5", prune_column="k", prune_lower=5, prune_upper=5)
    t.delete_where_eq("k", [5])
    t.delete_where_eq("k", [5, 6])
    t.rollback(1)
    t.rollback(4)
    got = _drain_opts(
        spark, t.path, str(tmp_path / "ck"), changeFeed="true"
    )
    want = Counter(tuple(r) for r in t.read_change_feed(0).collect())
    assert Counter(got) == want
    net: Counter = Counter()
    for r in got:
        net[r[:-2]] += 1 if r[-2] == "insert" else -1
    assert all(c in (0, 1) for c in net.values())


# ------------------------- round 9: availableNow + byte-based admission


def test_max_bytes_per_trigger_caps_by_size(registered, spark, tmp_path):
    """maxBytesPerTrigger (Delta parity): versions admit until the NEW
    data files' byte total crosses the budget — always >= 1 version.
    Unit-driven for determinism (real parquet sizes vary per commit)."""
    import os as _os

    from oss_data_lake_spark.streaming.snapshot_source import (
        SnapshotStreamSource,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    for w in range(3):
        t.commit(spark.createDataFrame([Row(k=w)]), mode="append")
    # per-version byte sizes from disk
    sizes = []
    for v in (1, 2, 3):
        m = t._manifest(v)
        prev = t._manifest(v - 1) if v > 1 else {"data_dirs": []}
        new = [d for d in m["data_dirs"] if d not in prev.get("data_dirs", [])]
        sizes.append(sum(
            _os.path.getsize(_os.path.join(dp, f))
            for d in new
            for dp, _dn, fs in _os.walk(_os.path.join(t.path, d))
            for f in fs if f.endswith(".parquet")
        ))

    def reader(**opts):
        src = SnapshotStreamSource(options={"path": t.path, **opts})
        r = src.streamReader(None)
        r.initialOffset()
        return r

    # budget = first file's size: stop right after v1
    assert reader(maxBytesPerTrigger=str(sizes[0])).latestOffset() == {
        "version": 1
    }
    # budget = v1+v2 bytes: v2 crosses it -> admit through v2
    assert reader(
        maxBytesPerTrigger=str(sizes[0] + sizes[1])
    ).latestOffset() == {"version": 2}
    # huge budget: uncapped
    assert reader(maxBytesPerTrigger="1000000000").latestOffset() == {
        "version": 3
    }
    # tiny budget still admits one version per batch (progress)
    r = reader(maxBytesPerTrigger="1")
    assert r.latestOffset() == {"version": 1}
    r.commit({"version": 1})
    assert r.latestOffset() == {"version": 2}


def test_end_version_is_a_hard_offer_ceiling(registered, spark, tmp_path):
    from oss_data_lake_spark.streaming.snapshot_source import (
        SnapshotStreamSource,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    for w in range(5):
        t.commit(spark.createDataFrame([Row(k=w)]), mode="append")
    src = SnapshotStreamSource(options={"path": t.path, "endVersion": "3"})
    r = src.streamReader(None)
    r.initialOffset()
    assert r.latestOffset() == {"version": 3}
    r.commit({"version": 3})
    assert r.latestOffset() == {"version": 3}  # never past the pin


def test_drain_available_now_paced_and_bounded(registered, spark, tmp_path):
    """The library-side Trigger.AvailableNow: drains the WHOLE backlog
    in admission-controlled batches in ONE invocation, stops at the
    entry head, and a later invocation picks up exactly the rest."""
    from oss_data_lake_spark.streaming.snapshot_source import (
        drain_available_now,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    for w in range(6):
        t.commit(
            spark.createDataFrame([Row(k=w * 10 + j) for j in range(3)]),
            mode="append",
        )
    batches: list[list[tuple]] = []

    def sink(b, _bid):
        rows = [tuple(r) for r in b.collect()]
        if rows:
            batches.append(rows)

    head = drain_available_now(
        spark, t.path, ck, sink, maxVersionsPerTrigger="2"
    )
    assert head == 6
    flat = sorted(r for b in batches for r in b)
    assert flat == sorted((w * 10 + j,) for w in range(6) for j in range(3))
    assert len(batches) == 3  # paced: 6 versions / 2 per trigger
    # nothing new: the next drain is a fast no-op (checkpoint peek)
    batches.clear()
    assert drain_available_now(
        spark, t.path, ck, sink, maxVersionsPerTrigger="2"
    ) == 6
    assert batches == []
    # two more commits: the next invocation drains exactly those
    for w in (100, 101):
        t.commit(spark.createDataFrame([Row(k=w)]), mode="append")
    assert drain_available_now(
        spark, t.path, ck, sink, maxVersionsPerTrigger="1"
    ) == 8
    assert sorted(r for b in batches for r in b) == [(100,), (101,)]
    assert len(batches) == 2


def test_drain_available_now_replay_safe_across_crash(
    registered, spark, tmp_path
):
    """A drain that dies mid-backlog resumes from the checkpoint and
    delivers the remaining versions exactly once."""
    from oss_data_lake_spark.streaming.snapshot_source import (
        drain_available_now,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    for w in range(4):
        t.commit(spark.createDataFrame([Row(k=w)]), mode="append")
    got: list[tuple] = []

    def crashing(b, bid):
        rows = [tuple(r) for r in b.collect()]
        got.extend(rows)
        if len(got) >= 2:
            raise RuntimeError("simulated sink crash")

    with pytest.raises(Exception, match="simulated sink crash"):
        drain_available_now(
            spark, t.path, ck, crashing, maxVersionsPerTrigger="1"
        )
    crashed_at = len(got)
    assert 2 <= crashed_at < 4

    def sink(b, _bid):
        got.extend(tuple(r) for r in b.collect())

    assert drain_available_now(
        spark, t.path, ck, sink, maxVersionsPerTrigger="1"
    ) == 4
    # the crashed batch replays (its commit never landed); union exact
    from collections import Counter

    c = Counter(got)
    assert set(c) == {(w,) for w in range(4)}
    # every version delivered; only the crashed batch may appear twice
    assert all(n <= 2 for n in c.values())
    assert sum(1 for n in c.values() if n == 2) <= 1


def test_stream_from_rest_attached_table(registered, spark, tmp_path):
    """Round 10: a REST-attached table (metadata tail in the catalog
    service, NO local _snapshots dir) streams through restUrl/restTable
    — offsets from the service's CURRENT, manifests over the wire,
    checkpoint-exact resume like the local layout."""
    from oss_data_lake_spark.sources.rest_catalog import (
        RestCatalogServer,
        RestCommitProtocol,
    )

    server = RestCatalogServer().start()
    try:
        t = SnapshotTable(
            spark,
            str(tmp_path / "rt"),
            protocol=RestCommitProtocol(server.url, "rt"),
        )
        t.commit(spark.createDataFrame([Row(k=i) for i in range(4)]))
        import os

        assert not os.path.isdir(
            os.path.join(t.path, "_snapshots")
        )  # the premise: metadata lives ONLY in the service
        ck = str(tmp_path / "ck")
        got: list[tuple] = []

        def sink(batch, _bid):
            got.extend(tuple(r) for r in batch.collect())

        def drain():
            q = (
                spark.readStream.format(FORMAT_NAME)
                .option("path", t.path)
                .option("restUrl", server.url)
                .option("restTable", "rt")
                .load()
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        assert sorted(got) == [(i,) for i in range(4)]
        got.clear()
        t.commit(
            spark.createDataFrame([Row(k=9)]), mode="append"
        )  # lands via HTTP
        drain()
        assert got == [(9,)]  # resume drains ONLY the new commit
    finally:
        server.stop()


def test_drain_available_now_over_rest_table(registered, spark, tmp_path):
    """drain_available_now on a REST-attached table: the entry-time head
    comes from the catalog service; paced batches drain exactly to it."""
    from oss_data_lake_spark.sources.rest_catalog import (
        RestCatalogServer,
        RestCommitProtocol,
    )
    from oss_data_lake_spark.streaming.snapshot_source import (
        drain_available_now,
    )

    server = RestCatalogServer().start()
    try:
        t = SnapshotTable(
            spark,
            str(tmp_path / "dr"),
            protocol=RestCommitProtocol(server.url, "dr"),
        )
        for i in range(3):
            t.commit(spark.createDataFrame([Row(k=i)]), mode="append")
        got: list[int] = []

        def sink(batch, _bid):
            got.extend(r["k"] for r in batch.collect())

        head = drain_available_now(
            spark, t.path, str(tmp_path / "ck"), sink,
            maxVersionsPerTrigger=1,
            restUrl=server.url, restTable="dr",
        )
        assert head == 3
        assert sorted(got) == [0, 1, 2]
    finally:
        server.stop()
