"""Incremental materialized-view maintenance (operators/matview.py).

The invariant under test: after ANY sequence of source commits and
refreshes, the MV equals the full recompute over the source head —
bit-identical doubles included (both paths fold through the exact decimal
sum), with incremental refreshes consuming only the delta.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import dsum
from oss_data_lake_spark.operators.matview import IncrementalAggregate
from oss_data_lake_spark.sources.snapshots import SnapshotTable


def _rows(lo: int, hi: int):
    return [
        Row(k=f"g{i % 3}", day=f"2024-01-{(i % 5) + 1:02d}", v=i * 0.1)
        for i in range(lo, hi)
    ]


def _full(source: SnapshotTable):
    return (
        source.read()
        .groupBy("k", "day")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("v", "sum_v"))
    )


def _sorted(df):
    return [tuple(r) for r in df.orderBy("k", "day").collect()]


@pytest.fixture()
def source(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "fact"))
    t.commit(spark.createDataFrame(_rows(0, 200)))
    return t


def _mv(source, tmp_path):
    return IncrementalAggregate(
        source,
        str(tmp_path / "mv"),
        group_by=["k", "day"],
        measures={"sum_v": "v"},
    )


def test_incremental_refreshes_match_full_recompute(spark, tmp_path, source):
    mv = _mv(source, tmp_path)
    assert mv.refresh()["mode"] == "full"  # first build
    assert _sorted(mv.read()) == _sorted(_full(source))

    for wave in [(200, 350), (350, 351), (351, 600)]:
        source.commit(spark.createDataFrame(_rows(*wave)), mode="append")
        info = mv.refresh()
        assert info["mode"] == "incremental"
        assert _sorted(mv.read()) == _sorted(_full(source)), (
            f"MV diverged from full recompute after wave {wave}"
        )


def test_noop_refresh_creates_no_new_mv_version(spark, tmp_path, source):
    mv = _mv(source, tmp_path)
    mv.refresh()
    v = mv.mv.current_version()
    assert mv.refresh()["mode"] == "noop"
    assert mv.mv.current_version() == v


def test_source_overwrite_refreshes_via_retraction(spark, tmp_path, source):
    """r6 behavior was a full rebuild; with the change feed an overwrite
    resolves incrementally — the old snapshot retracts, the new inserts —
    and still lands exactly on the recompute."""
    mv = _mv(source, tmp_path)
    mv.refresh()
    source.commit(spark.createDataFrame(_rows(0, 50)), mode="overwrite")
    info = mv.refresh()
    assert info["mode"] == "retract"
    assert _sorted(mv.read()) == _sorted(_full(source))


def test_new_groups_appear_and_avg_derives(spark, tmp_path, source):
    mv = _mv(source, tmp_path)
    mv.refresh()
    source.commit(
        spark.createDataFrame([Row(k="g9", day="2024-02-01", v=4.0)]),
        mode="append",
    )
    mv.refresh()
    got = {(r["k"], r["day"]): r for r in mv.read(with_avg=True).collect()}
    assert got[("g9", "2024-02-01")]["n_rows"] == 1
    assert got[("g9", "2024-02-01")]["sum_v_avg"] == 4.0


def test_mv_is_versioned_and_time_travelable(spark, tmp_path, source):
    mv = _mv(source, tmp_path)
    mv.refresh()
    before = _sorted(mv.read())
    v1 = mv.mv.current_version()
    source.commit(spark.createDataFrame(_rows(200, 300)), mode="append")
    mv.refresh()
    assert _sorted(mv.read()) != before
    assert _sorted(mv.read(version=v1)) == before


def test_watermark_is_atomic_with_mv_data(spark, tmp_path, source):
    """Regression (round-5 review): the watermark rides the MV commit's
    txn version — no side file to desynchronize. A stale racing refresh
    (older source head) must no-op rather than overwrite newer state."""
    mv = _mv(source, tmp_path)
    mv.refresh()
    head1 = source.current_version()
    assert mv.last_source_version() == head1

    source.commit(spark.createDataFrame(_rows(200, 300)), mode="append")
    head2 = source.current_version()
    mv.refresh()
    assert mv.last_source_version() == head2
    after = _sorted(mv.read())

    # a stale writer committing with the OLDER head's txn version no-ops
    stale = mv._partial(source.read(version=head1))
    v = mv.mv.commit(
        stale, mode="overwrite", txn_app=mv._TXN_APP, txn_version=head1
    )
    assert mv.last_source_version() == head2
    assert _sorted(mv.read()) == after


def test_mv_rollback_triggers_forced_full_rebuild(spark, tmp_path, source):
    """Regression (round-5 review): rolling back the MV table desyncs its
    data from the txn ledger; refresh must detect it and force a full
    rebuild rather than folding deltas onto stale state (or no-opping)."""
    mv = _mv(source, tmp_path)
    mv.refresh()
    v_good = mv.mv.current_version()
    source.commit(spark.createDataFrame(_rows(200, 300)), mode="append")
    mv.refresh()
    mv.mv.rollback(v_good)  # operator rewinds the MV
    info = mv.refresh()
    assert info["mode"] == "full"
    assert _sorted(mv.read()) == _sorted(_full(source))
    # and the ledger is coherent again: next refresh is a clean noop
    assert mv.refresh()["mode"] == "noop"


def test_mv_refuses_recreated_source(spark, tmp_path, source):
    """Regression (round-5 review): a source whose version numbering
    restarted (recreated table) must fail loudly, not leave the MV
    silently stale."""
    import shutil

    mv = _mv(source, tmp_path)
    source.commit(spark.createDataFrame(_rows(200, 260)), mode="append")
    source.commit(spark.createDataFrame(_rows(260, 300)), mode="append")
    mv.refresh()
    shutil.rmtree(source.path)
    fresh = SnapshotTable(spark, source.path)
    fresh.commit(spark.createDataFrame(_rows(0, 50)))
    with pytest.raises(ValueError, match="ahead of source head"):
        mv.refresh()


def test_incremental_approx_distinct_matches_full_recompute(spark, tmp_path):
    """Distinct counts are the classic NON-incrementally-maintainable
    aggregate; the MV's mergeable HLL sketches make N incremental
    refreshes estimate IDENTICALLY to the full recompute — including
    heavy cross-wave overlap (where naively summing per-wave distincts
    would wildly overcount)."""
    from pyspark.sql import Row

    src = SnapshotTable(spark, str(tmp_path / "fact"))
    # users overlap heavily across waves: u0..u49 appear in every wave
    def wave(lo, hi):
        return spark.createDataFrame(
            [
                Row(k=f"g{i % 2}", u=f"u{i % 50 if i % 3 else i}", v=1.0)
                for i in range(lo, hi)
            ]
        )

    src.commit(wave(0, 400))
    mv = IncrementalAggregate(
        src,
        str(tmp_path / "mv"),
        group_by=["k"],
        measures={"sum_v": "v"},
        distinct_measures={"n_users": "u"},
    )
    mv.refresh()

    def full_estimates():
        return {
            (r["k"]): r["n"]
            for r in src.read()
            .groupBy("k")
            .agg(F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("n"))
            .collect()
        }

    for lo, hi in [(400, 700), (700, 701), (701, 1000)]:
        src.commit(wave(lo, hi), mode="append")
        assert mv.refresh()["mode"] == "incremental"
        got = {r["k"]: r["n_users"] for r in mv.read().collect()}
        assert got == full_estimates(), f"sketch merge diverged after {lo}"

    # sanity: the estimate reflects dedup across waves (true distincts are
    # far below total rows)
    assert all(v < 500 for v in got.values())
    # exact measures still bit-identical alongside the sketches
    exact = {
        r["k"]: r["n_rows"]
        for r in mv.read().collect()
    }
    truth = {
        r["k"]: r["n"]
        for r in src.read().groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert exact == truth


def test_null_group_keys_merge_null_safely(spark, tmp_path):
    """A NULL grouping value must fold like any other group: Spark's
    equality join never matches NULL keys, so a plain full_outer merge
    would leave the NULL group's state row AND delta row both unmatched —
    the group duplicates on every refresh and the MV permanently diverges
    from the full recompute. The merge joins with eqNullSafe and coalesces
    the key columns (operators/matview.py::_merge)."""
    src = SnapshotTable(spark, str(tmp_path / "fact"))

    def wave(lo, hi):
        return spark.createDataFrame(
            [
                Row(
                    k=(None if i % 4 == 0 else f"g{i % 3}"),
                    day=(None if i % 5 == 0 else f"2024-01-{(i % 5) + 1:02d}"),
                    v=i * 0.1,
                )
                for i in range(lo, hi)
            ],
            schema="k string, day string, v double",
        )

    src.commit(wave(0, 100))
    mv = IncrementalAggregate(
        src, str(tmp_path / "mv"), group_by=["k", "day"], measures={"sum_v": "v"}
    )
    assert mv.refresh()["mode"] == "full"
    for lo, hi in [(100, 250), (250, 251), (251, 500)]:
        src.commit(wave(lo, hi), mode="append")
        assert mv.refresh()["mode"] == "incremental"
        got = _sorted(mv.read())
        want = _sorted(_full(src))
        assert got == want, f"NULL-keyed group diverged after wave ({lo},{hi})"
    # the NULL-keyed groups really exist (the test exercises what it claims)
    assert any(r[0] is None for r in got) and any(r[1] is None for r in got)
    # no duplicated key rows (the failure mode of a non-null-safe merge)
    keys = [(r[0], r[1]) for r in got]
    assert len(keys) == len(set(keys))


def test_mv_survives_mixed_dml_wave_via_retraction(spark, tmp_path, source):
    """The VERDICT r6 done-bar: MV == full recompute after a wave mixing
    append + CoW DELETE + MoR UPDATE + MERGE — r6's refusal-then-rebuild
    becomes an incremental retraction refresh."""
    mv = _mv(source, tmp_path)
    mv.refresh()
    source.commit(spark.createDataFrame(_rows(200, 240)), mode="append")
    source.delete_where("v < 2.0")
    source.update_where_mor("k = 'g1'", {"v": "v + 100"})
    src = spark.createDataFrame(
        [Row(k="g0", day="2024-01-01", v=5.0),
         Row(k="g9", day="2024-02-01", v=9.0)]
    )
    source.merge_rows(src, keys=["k"])
    info = mv.refresh()
    assert info["mode"] == "retract"
    assert _sorted(mv.read()) == _sorted(_full(source))
    # groups fully retracted by the wave carry no ghost zero-rows
    assert mv.read().where("n_rows <= 0").count() == 0
    # a subsequent plain append goes back to the cheap append-only path
    source.commit(spark.createDataFrame(_rows(300, 320)), mode="append")
    info = mv.refresh()
    assert info["mode"] == "incremental"
    assert _sorted(mv.read()) == _sorted(_full(source))


def test_mv_with_distinct_measures_rebuilds_fully_on_dml(spark, tmp_path, source):
    """HLL sketches cannot retract: a DML wave under a distinct measure
    must fall back to the loud full rebuild, not silently mis-estimate."""
    mv = IncrementalAggregate(
        source,
        str(tmp_path / "mv_hll"),
        group_by=["k"],
        measures={"sum_v": "v"},
        distinct_measures={"n_days": "day"},
    )
    mv.refresh()
    source.delete_where("v < 5.0")
    info = mv.refresh()
    assert info["mode"] == "full"
    got = {r["k"]: r["n_days"] for r in mv.read().collect()}
    want = {
        r["k"]: r["n"]
        for r in source.read()
        .groupBy("k")
        .agg(F.countDistinct("day").alias("n"))
        .collect()
    }
    assert got == want  # 5 distinct days: HLL exact at this cardinality
