"""CREATE / REFRESH / DROP MATERIALIZED VIEW SQL over the existing
IncrementalAggregate (VERDICT r7 'What's missing' #4, MV surface): the
SQL lifecycle — create, DML the base, REFRESH == full recompute,
DESCRIBE HISTORY shows refresh commits — plus the presentation
projection (queries see the SELECT's aliases, never internal state)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def base(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "facts"))
    t.commit(
        spark.createDataFrame(
            [
                Row(sym="a" if i % 2 == 0 else "b", qty=float(i), k=i)
                for i in range(20)
            ]
        ),
        stats_for=["k"],
    )
    eng = Engine(spark=spark)
    eng._warehouse_dir = str(tmp_path / "wh")
    eng._snapshot_tables["facts"] = t
    return t, eng


def _recompute(eng):
    return {
        (r["sym"]): (r["n"], r["total"], round(r["avg_qty"], 9))
        for r in eng.sql(
            "SELECT sym, COUNT(*) AS n, SUM(qty) AS total, "
            "AVG(qty) AS avg_qty FROM facts GROUP BY sym"
        ).collect()
    }


def _mv_state(eng):
    return {
        (r["sym"]): (r["n"], r["total"], round(r["avg_qty"], 9))
        for r in eng.sql("SELECT * FROM mv").collect()
    }


def test_mv_sql_lifecycle_tracks_dml_exactly(spark, base):
    t, eng = base
    row = eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT sym, COUNT(*) AS n, "
        "SUM(qty) AS total, AVG(qty) AS avg_qty FROM facts GROUP BY sym"
    ).collect()[0]
    assert row["mode"] == "full"
    assert _mv_state(eng) == _recompute(eng)

    # appends refresh incrementally
    eng.sql("INSERT INTO facts VALUES ('a', 100.0, 100), ('c', 7.0, 101)")
    row = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert row["mode"] == "incremental"
    assert _mv_state(eng) == _recompute(eng)

    # row-level DML retracts through the change feed
    eng.sql("DELETE FROM facts WHERE k < 5")
    eng.sql("UPDATE facts SET qty = qty + 1.0 WHERE sym = 'b'")
    row = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert row["mode"] == "retract"
    assert _mv_state(eng) == _recompute(eng)

    # an unchanged source no-ops
    assert (
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["mode"]
        == "noop"
    )

    # DESCRIBE HISTORY shows the refresh commits on the MV's own table
    hist = eng.sql("DESCRIBE HISTORY mv").collect()
    ops = [r["operation"] for r in hist]
    assert ops.count("overwrite") >= 3  # initial + two refreshes

    eng.sql("DROP MATERIALIZED VIEW mv")
    assert "mv" not in eng._snapshot_tables


def test_mv_presentation_hides_internal_state(spark, base):
    t, eng = base
    eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT sym, "
        "APPROX_COUNT_DISTINCT(k) AS uniq, SUM(qty) AS total "
        "FROM facts GROUP BY sym"
    )
    cols = eng.sql("SELECT * FROM mv").columns
    assert cols == ["sym", "uniq", "total"]
    got = {r["sym"]: r["uniq"] for r in eng.sql("SELECT * FROM mv").collect()}
    assert got == {"a": 10, "b": 10}
    eng.sql("DROP MATERIALIZED VIEW mv")


def test_mv_grammar_validation(spark, base):
    t, eng = base
    with pytest.raises(ValueError, match="must appear in GROUP BY"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT k, COUNT(*) AS n "
            "FROM facts GROUP BY sym"
        )
    with pytest.raises(ValueError, match="decomposable aggregates only"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT sym, MAX(qty) AS m "
            "FROM facts GROUP BY sym"
        )
    with pytest.raises(ValueError, match="not a materialized view"):
        eng.sql("REFRESH MATERIALIZED VIEW facts")
    with pytest.raises(ValueError, match="use DROP TABLE"):
        eng.sql("DROP MATERIALIZED VIEW facts")


def test_mv_definition_survives_reregistration(spark, base, tmp_path):
    """The definition lives in the MV's own properties, so a FRESH
    engine (new session state) can still REFRESH it."""
    t, eng = base
    eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT sym, SUM(qty) AS total "
        "FROM facts GROUP BY sym"
    )
    mv_path = eng._snapshot_tables["mv"].path
    eng.sql("INSERT INTO facts VALUES ('a', 50.0, 200)")

    eng2 = Engine(spark=spark)
    eng2._snapshot_tables["facts"] = t
    eng2.register_snapshot_table("mv", mv_path)
    row = eng2.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert row["mode"] == "incremental"
    got = {
        r["sym"]: r["total"]
        for r in eng2.sql("SELECT * FROM mv").collect()
    }
    want = {
        r["sym"]: r["total"]
        for r in eng2.sql(
            "SELECT sym, SUM(qty) AS total FROM facts GROUP BY sym"
        ).collect()
    }
    assert got == want


def test_mv_avg_matches_sql_semantics_with_nulls(spark, tmp_path):
    """Round-8 review finding: AVG divides by the count of NON-NULL
    values; an MV over a nullable measure must match the recompute
    through appends and retractions."""
    t = SnapshotTable(spark, str(tmp_path / "facts"))
    t.commit(
        spark.createDataFrame(
            [
                Row(sym="a", qty=10.0, k=0),
                Row(sym="a", qty=None, k=1),
                Row(sym="b", qty=None, k=2),
                Row(sym="b", qty=None, k=3),
            ],
            "sym string, qty double, k long",
        ),
        stats_for=["k"],
    )
    eng = Engine(spark=spark)
    eng._warehouse_dir = str(tmp_path / "wh")
    eng._snapshot_tables["facts"] = t
    eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT sym, AVG(qty) AS a, "
        "COUNT(*) AS n FROM facts GROUP BY sym"
    )

    def both():
        got = {
            r["sym"]: (r["a"], r["n"])
            for r in eng.sql("SELECT * FROM mv").collect()
        }
        want = {
            r["sym"]: (r["a"], r["n"])
            for r in eng.sql(
                "SELECT sym, AVG(qty) AS a, COUNT(*) AS n FROM facts "
                "GROUP BY sym"
            ).collect()
        }
        return got, want

    got, want = both()
    assert got == want and got["a"] == (10.0, 2) and got["b"][0] is None

    eng.sql("INSERT INTO facts VALUES ('a', 30.0, 4), ('b', 6.0, 5)")
    eng.sql("REFRESH MATERIALIZED VIEW mv")
    got, want = both()
    assert got == want and got["a"] == (20.0, 3)

    # retraction wave: delete the only non-null 'a' rows
    eng.sql("DELETE FROM facts WHERE k IN (0, 4)")
    row = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert row["mode"] == "retract"
    got, want = both()
    assert got == want and got["a"][0] is None
    eng.sql("DROP MATERIALIZED VIEW mv")


def test_mv_rejects_internal_alias_collisions(spark, base):
    t, eng = base
    with pytest.raises(ValueError, match="collides with"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT sym, "
            "SUM(qty) AS n_rows FROM facts GROUP BY sym"
        )
    with pytest.raises(ValueError, match="collides with"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT sym, "
            "SUM(qty) AS __s_x FROM facts GROUP BY sym"
        )
    with pytest.raises(ValueError, match="duplicate output"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT sym, "
            "SUM(qty) AS x, COUNT(*) AS x FROM facts GROUP BY sym"
        )
