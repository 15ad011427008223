"""Round-8 regression pins for the round-7 advisor findings: typed
literals through the equality-delete SQL route, the MoR MERGE fast-path
key-name gate, layout-preserving auto-compaction, the 't.'-qualified
NOT MATCHED BY SOURCE condition on the direct API, and Iceberg's
transform-typing rule for time-granularity hidden partitioning."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def typed_tbl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "typed"))
    rows = [
        Row(
            k=i,
            x=float(i * 100),
            ts=datetime.datetime(2024, 1, 1 + i, 0, 0, 0),
            d=datetime.date(2024, 1, 1 + i),
        )
        for i in range(10)
    ]
    t.commit(spark.createDataFrame(rows), stats_for=["k"])
    t.set_properties({"delete.mode": "merge-on-read"})
    return t


def test_typed_literals_route_through_equality_delete(spark, typed_tbl):
    """DELETE ... WHERE <col> = TIMESTAMP/DATE/numeric literal must keep
    the scan-free equality route under merge-on-read — parsed literals
    are raw Python str/int, the column types are timestamp/date/double."""
    eng = Engine(spark=spark)
    eng._snapshot_tables["typed"] = typed_tbl

    res = eng.sql(
        "DELETE FROM typed WHERE ts = TIMESTAMP '2024-01-02 00:00:00'"
    ).collect()[0]
    assert res["mode"] == "equality-delete" and res["n_keys"] == 1
    res = eng.sql("DELETE FROM typed WHERE d = DATE '2024-01-03'").collect()[0]
    assert res["mode"] == "equality-delete"
    # integer literal against a DOUBLE column
    res = eng.sql("DELETE FROM typed WHERE x = 400").collect()[0]
    assert res["mode"] == "equality-delete"
    # string timestamp without the TIMESTAMP keyword (k=5's ts)
    res = eng.sql("DELETE FROM typed WHERE ts = '2024-01-06 00:00:00'").collect()[0]
    assert res["mode"] == "equality-delete"
    got = sorted(r["k"] for r in typed_tbl.read().collect())
    assert got == [0, 3, 6, 7, 8, 9]

    # IN-list of typed literals (k=6, k=7)
    res = eng.sql(
        "DELETE FROM typed WHERE d IN (DATE '2024-01-07', DATE '2024-01-08')"
    ).collect()[0]
    assert res["mode"] == "equality-delete" and res["n_keys"] == 2
    assert sorted(r["k"] for r in typed_tbl.read().collect()) == [0, 3, 8, 9]


def test_unconvertible_literal_falls_back_to_position_path(spark, typed_tbl):
    eng = Engine(spark=spark)
    eng._snapshot_tables["typed"] = typed_tbl
    # 'abc' cannot coerce to double → position-delete path, zero matches
    res = eng.sql("DELETE FROM typed WHERE x = 'abc'").collect()[0]
    assert res["mode"] == "merge-on-read"
    assert typed_tbl.read().count() == 10


def test_api_eq_delete_coerces_string_keys(spark, typed_tbl):
    info = typed_tbl.delete_where_eq("ts", ["2024-01-04 00:00:00"])
    assert info["mode"] == "equality-delete" and info["n_keys"] == 1
    assert typed_tbl.read().where("k = 3").count() == 0
    info = typed_tbl.delete_where_eq("d", ["2024-01-09"])
    assert typed_tbl.read().where("k = 8").count() == 0
    info = typed_tbl.delete_where_eq("x", [100])  # int on double col
    assert typed_tbl.read().where("k = 1").count() == 0


def test_mor_merge_fast_path_requires_matching_key_names(spark, tmp_path):
    """ON t.k = s.nk with star clauses must NOT silently take the
    merge_rows_mor route (which keys on the TARGET name) — it falls
    through to merge_rows and its key-name validation."""
    t = SnapshotTable(spark, str(tmp_path / "m"))
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(5)]),
        stats_for=["k"],
    )
    t.set_properties({"delete.mode": "merge-on-read"})
    eng = Engine(spark=spark)
    eng._snapshot_tables["tm"] = t
    spark.createDataFrame(
        [Row(nk=2, v=200.0)]
    ).createOrReplaceTempView("src_nk")
    with pytest.raises(Exception, match="different target/source|schema mismatch"):
        eng.sql(
            "MERGE INTO tm USING src_nk AS s ON tm.k = s.nk "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    # same-named keys still take the scan-free route
    spark.createDataFrame(
        [Row(k=2, v=200.0)]
    ).createOrReplaceTempView("src_k")
    res = eng.sql(
        "MERGE INTO tm USING src_k AS s ON tm.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert res["mode"] == "merge-on-read"
    assert t.read().where("k = 2").collect()[0]["v"] == 200.0


@pytest.mark.parametrize(
    "spec",
    [["cat"], ["days(ts)"]],
    ids=["identity", "hidden-days"],
)
def test_auto_compact_preserves_partition_layout(spark, tmp_path, spec):
    """Policy-driven compaction keeps the table's partition spec; before
    the fix it rewrote the table unpartitioned and every later commit
    adopting current_partition_by() accreted unpartitioned dirs."""
    t = SnapshotTable(spark, str(tmp_path / "p"))
    rows = [
        Row(
            k=i,
            v=float(i),
            cat="even" if i % 2 == 0 else "odd",
            ts=datetime.datetime(2024, 1, 1 + (i % 3), 0, 0, 0),
        )
        for i in range(40)
    ]
    t.commit(spark.createDataFrame(rows), partition_by=spec, stats_for=["k"])
    assert t.current_partition_by() == spec
    t.set_properties(
        {"delete.mode": "merge-on-read", "compact.tombstone-ratio": "0.1"}
    )
    t.delete_where_mor("k < 10")
    assert t.maintenance_status()["due"]
    v = t.auto_compact(stats_for=["k", "cat"])
    assert v is not None
    assert t._manifest(v)["mode"] == "compact"
    # the layout survived the policy compaction
    assert t.current_partition_by() == spec
    assert sorted(r["k"] for r in t.read().collect()) == list(range(10, 40))
    # and a later engine-level append still follows the spec
    t.commit(
        spark.createDataFrame(
            [Row(k=99, v=9.0, cat="odd", ts=datetime.datetime(2024, 1, 2))]
        ),
        mode="append",
        partition_by=t.current_partition_by(),
    )
    assert t.current_partition_by() == spec
    assert t.read().count() == 31


def test_nmbs_condition_accepts_target_alias_on_direct_api(spark):
    from oss_data_lake_spark.operators.upsert import merge

    target = spark.createDataFrame(
        [Row(k=1, v=5.0), Row(k=2, v=50.0), Row(k=3, v=500.0)]
    )
    source = spark.createDataFrame([Row(k=1, v=6.0)])
    # documented 't.<col>'-qualified condition form, direct API call
    out = merge(
        target,
        source,
        ["k"],
        when_matched="update",
        when_not_matched=None,
        when_not_matched_by_source="delete",
        not_matched_by_source_condition="t.v > 100",
    ).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {1: 6.0, 2: 50.0}  # k=3 fired the delete; k=2 survived


def test_time_transform_rejects_non_temporal_source(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tt"))
    df = spark.createDataFrame([Row(k=1, s="2024-01-01")])
    with pytest.raises(ValueError, match="timestamp/date"):
        t.commit(df, partition_by=["days(s)"])
    # timestamp source still fine
    df2 = spark.createDataFrame(
        [Row(k=1, ts=datetime.datetime(2024, 1, 1))]
    )
    v = t.commit(df2, partition_by=["days(ts)"])
    assert v == 1


def test_bool_literal_delete_never_coerces_garbage_to_false(
    spark, tmp_path
):
    """Round-8 review finding: DELETE ... WHERE flag = 'oops' must NOT
    silently tombstone every flag=false row — the unconvertible literal
    routes to the position-delete path (SQL cast semantics: NULL
    matches nothing)."""
    t = SnapshotTable(spark, str(tmp_path / "b"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, flag=(i % 2 == 0)) for i in range(10)]
        )
    )
    t.set_properties({"delete.mode": "merge-on-read"})
    eng = Engine(spark=spark)
    eng._snapshot_tables["b"] = t
    res = eng.sql("DELETE FROM b WHERE flag = 'oops'").collect()[0]
    assert res["mode"] == "merge-on-read"  # position path, not eq
    assert t.read().count() == 10          # and nothing matched
    # real boolean strings still take the scan-free route
    res = eng.sql("DELETE FROM b WHERE flag = 'true'").collect()[0]
    assert res["mode"] == "equality-delete"
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3, 5, 7, 9]
