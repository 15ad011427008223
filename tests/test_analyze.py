"""ANALYZE TABLE ... COMPUTE STATISTICS (VERDICT r7 'What's missing'
#4, adjacent): stats harvested from parquet footers + the manifest's
delete state, surfaced so broadcast decisions come from the table's
LIVE size instead of static hints. The case Spark's file-size estimate
cannot make: a merge-on-read dimension that tombstoned most of its rows
keeps its file bytes — only ANALYZE knows it is small."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


def _plan(df) -> str:
    from oss_data_lake_spark.plans.audit import explain_str

    return explain_str(df, "simple")


def test_analyze_counts_footer_and_live_rows(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(10_000).selectExpr(
            "id AS k", "CAST(id % 97 AS DOUBLE) AS v"
        ),
        stats_for=["k"],
    )
    st = t.analyze()
    assert st["footer_rows"] == 10_000
    assert st["row_count"] == 10_000
    assert st["size_bytes"] == st["file_bytes"] > 0
    # MoR delete: footer rows unchanged, live rows and size shrink
    t.delete_where_mor("k % 2 = 0")
    st = t.analyze()
    assert st["footer_rows"] == 10_000
    assert st["row_count"] == 5_000
    assert 0 < st["size_bytes"] < st["file_bytes"]
    assert st["size_bytes"] == st["file_bytes"] // 2
    # the stats are manifest state, time-travelable like everything else
    assert t.table_stats()["row_count"] == 5_000


def test_analyze_for_columns_ndv(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(20_000).selectExpr(
            "id AS k", "CAST(id % 37 AS LONG) AS g"
        )
    )
    eng = Engine(spark=spark)
    eng._snapshot_tables["t"] = t
    row = eng.sql(
        "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS g"
    ).collect()[0]
    assert row["row_count"] == 20_000
    ndv = t.table_stats()["ndv"]
    assert abs(ndv["g"] - 37) <= 4  # approx_count_distinct tolerance
    # a second FOR COLUMNS merges, never clears
    eng.sql("ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k")
    ndv = t.table_stats()["ndv"]
    assert set(ndv) == {"g", "k"}
    with pytest.raises(ValueError, match="no such columns"):
        eng.sql("ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS nope")


def test_post_analyze_mor_dimension_broadcasts_without_hint(
    spark, tmp_path
):
    """The Done criterion: pre-ANALYZE the planner sees the dimension's
    FILE bytes (over threshold -> SortMergeJoin); post-ANALYZE the live
    size drives a BroadcastHashJoin with no hand-placed hint."""
    dim = SnapshotTable(spark, str(tmp_path / "dim"))
    dim.commit(
        spark.range(120_000).selectExpr(
            "id AS dk",
            "sha2(CAST(id AS STRING), 256) AS payload",
        ),
        stats_for=["dk"],
    )
    fact = SnapshotTable(spark, str(tmp_path / "fact"))
    fact.commit(
        spark.range(300_000).selectExpr(
            "id % 120000 AS dk", "CAST(id AS DOUBLE) AS x",
            "sha2(CAST(id + 7 AS STRING), 256) AS pad",
        )
    )
    eng = Engine(spark=spark)
    eng._snapshot_tables["dim"] = dim
    eng._snapshot_tables["fact"] = fact

    # tombstone 99%+ of the dimension: file bytes stay, live rows shrink
    dim.delete_where_mor("dk % 128 <> 0")

    raw_bytes = dim.analyze()["file_bytes"]
    live_bytes = dim.table_stats()["size_bytes"]
    assert live_bytes * 8 < raw_bytes  # the gap the test rides

    q = (
        "SELECT f.dk, count(*) AS n FROM fact f JOIN dim d ON f.dk = d.dk "
        "GROUP BY f.dk"
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # threshold between live and raw size
        thr = (live_bytes + raw_bytes) // 2
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))

        # stats say small -> broadcast, no explicit hint anywhere
        plan = _plan(eng.sql(q))
        assert "BroadcastHashJoin" in plan

        # threshold below the live size: stats must NOT force broadcast
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(live_bytes // 2)
        )
        plan = _plan(eng.sql(q))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_commit_carries_stats_and_size_parse_is_robust(spark, tmp_path):
    """Round-8 review findings: a plain commit must not erase ANALYZE
    stats (stale-until-re-analyzed semantics), and size-conf parsing
    accepts fractional values and never KeyErrors."""
    from oss_data_lake_spark.sources.snapshots import _parse_size_bytes

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(100).selectExpr("id AS k"))
    t.analyze()
    t.commit(spark.range(5).selectExpr("id + 100 AS k"), mode="append")
    st = t.table_stats()
    assert st is not None and st["analyzed_version"] == 1  # stale, kept

    assert _parse_size_bytes("1.5g") == int(1.5 * 1024**3)
    assert _parse_size_bytes("-1") == -1
    assert _parse_size_bytes("10MB") == 10 * 1024**2
    with pytest.raises(ValueError):
        _parse_size_bytes("10ki")  # raises ValueError, never KeyError
    # (read_hinted additionally guards with a no-hint fallback should a
    # session conf ever reach it unparseable — Spark validates its own
    # conf.set, so that path is not drivable end-to-end)
    assert t.read_hinted().count() == 105
