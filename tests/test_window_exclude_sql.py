"""Window frame EXCLUDE as SQL TEXT through ``Engine.sql``
(`_translate_window_exclude`) — differential against DuckDB, which
evaluates the SQL:2011 clause natively. Covers sum/count/count(*)/avg ×
CURRENT ROW/GROUP/TIES × explicit RANGE frame / default frame, NULL
measures, tie-heavy order keys, NO OTHERS passthrough, and the loud
refusals for the unsupported class (min/max, ROWS+GROUP, DISTINCT)."""

from __future__ import annotations

import duckdb
import pytest

from oss_data_lake_spark.engine import Engine

ROWS = [
    # (g, od, m) — duplicate od values per group force real peer groups;
    # every third m is NULL so count-vs-sum and empty-guards are live
    (g, od, None if (g + od) % 3 == 0 else g * 10 + od)
    for g in (1, 2)
    for od in (0, 1, 1, 2, 4, 4, 4, 7)
]
ROWS = [(i, g, od, m) for i, (g, od, m) in enumerate(ROWS)]


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark=spark)
    spark.createDataFrame(ROWS, "rid long, g long, od long, m long")\
        .createOrReplaceTempView("wx")
    yield e
    spark.catalog.dropTempView("wx")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE wx AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({rid}, {g}, {od}, {'NULL' if m is None else m})"
            for rid, g, od, m in ROWS
        )
        + ") t(rid, g, od, m)"
    )
    return con


FRAMES = [
    "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING",
    "RANGE BETWEEN CURRENT ROW AND 3 FOLLOWING",
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    # the degenerate frame: frame == peer group, so EXCLUDE GROUP
    # empties it (sum -> NULL, count -> 0) and TIES leaves only the
    # current row — the empty-set guards under maximum stress
    "RANGE BETWEEN 0 PRECEDING AND 0 FOLLOWING",
    "RANGE BETWEEN 1 PRECEDING AND 0 FOLLOWING",
]
AGGS = ["sum(m)", "count(m)", "count(*)", "avg(m)"]
MODES = ["CURRENT ROW", "GROUP", "TIES"]


@pytest.mark.parametrize("agg", AGGS)
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("frame", FRAMES)
def test_exclude_sql_matches_duckdb(eng, duck, agg, mode, frame):
    over = f"PARTITION BY g ORDER BY od {frame}".strip()
    sql = (
        f"SELECT rid, CAST({agg} OVER ({over} EXCLUDE {mode}) AS DOUBLE)"
        f" AS v FROM wx ORDER BY rid"
    )
    got = [(r.rid, r.v) for r in eng.sql(sql).collect()]
    want = list(duck.execute(sql).fetchall())
    assert got == want, f"{sql}:\n spark={got}\n duck ={want}"


@pytest.mark.parametrize("agg", AGGS)
@pytest.mark.parametrize("mode", MODES)
def test_default_frame_exclude_extension(eng, duck, agg, mode):
    """The SQL standard ties EXCLUDE to an explicit frame clause (DuckDB's
    parser enforces it); the engine ADDITIONALLY accepts it on the
    default frame as the equivalent of the explicit
    RANGE UNBOUNDED PRECEDING .. CURRENT ROW spelling — pinned here
    against exactly that DuckDB text."""
    got = [(r.rid, r.v) for r in eng.sql(
        f"SELECT rid, CAST({agg} OVER (PARTITION BY g ORDER BY od "
        f"EXCLUDE {mode}) AS DOUBLE) AS v FROM wx ORDER BY rid"
    ).collect()]
    want = list(duck.execute(
        f"SELECT rid, CAST({agg} OVER (PARTITION BY g ORDER BY od "
        f"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW "
        f"EXCLUDE {mode}) AS DOUBLE) AS v FROM wx ORDER BY rid"
    ).fetchall())
    assert got == want


def test_no_others_passthrough_and_rows_current_row(eng, duck):
    for sql in [
        "SELECT rid, CAST(sum(m) OVER (PARTITION BY g ORDER BY od "
        "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE NO OTHERS) "
        "AS DOUBLE) AS v FROM wx ORDER BY rid",
        # EXCLUDE CURRENT ROW is valid over a ROWS frame too
        "SELECT rid, CAST(count(m) OVER (PARTITION BY g ORDER BY od, rid "
        "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) "
        "AS DOUBLE) AS v FROM wx ORDER BY rid",
    ]:
        got = [(r.rid, r.v) for r in eng.sql(sql).collect()]
        want = list(duck.execute(sql).fetchall())
        assert got == want, sql


def test_unsupported_class_refuses_loudly(eng):
    with pytest.raises(ValueError, match="not subtraction-decomposable"):
        eng.sql("SELECT max(m) OVER (PARTITION BY g ORDER BY od "
                "EXCLUDE GROUP) FROM wx")
    with pytest.raises(ValueError, match="only RANGE frames"):
        eng.sql("SELECT sum(m) OVER (PARTITION BY g ORDER BY od "
                "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) "
                "FROM wx")
    with pytest.raises(ValueError, match="ORDER BY"):
        eng.sql("SELECT sum(m) OVER (PARTITION BY g EXCLUDE GROUP) "
                "FROM wx")
    with pytest.raises(ValueError, match="DISTINCT"):
        eng.sql("SELECT count(DISTINCT m) OVER (PARTITION BY g "
                "ORDER BY od EXCLUDE GROUP) FROM wx")
    with pytest.raises(ValueError, match="current row"):
        eng.sql("SELECT sum(m) OVER (PARTITION BY g ORDER BY od "
                "RANGE BETWEEN 5 FOLLOWING AND 9 FOLLOWING "
                "EXCLUDE CURRENT ROW) FROM wx")


def test_literal_exclude_stays_data(eng):
    s = eng.sql("SELECT 'sum(x) OVER (ORDER BY y EXCLUDE TIES)' AS s")\
        .collect()[0]["s"]
    assert s == "sum(x) OVER (ORDER BY y EXCLUDE TIES)"


def test_three_translators_compose_with_duckdb(eng, duck):
    """Quantified comparison + frame EXCLUDE + ANSI FETCH in ONE
    statement — the translator chain composes, differentially against
    DuckDB evaluating all three natively."""
    sql = (
        "SELECT rid, CAST(sum(m) OVER (PARTITION BY g ORDER BY od "
        "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) "
        "AS DOUBLE) AS v "
        "FROM wx WHERE od <= ALL (SELECT od FROM wx w2 WHERE w2.g = 9) "
        "ORDER BY rid OFFSET 1 ROWS FETCH FIRST 5 ROWS ONLY"
    )
    got = [(r.rid, r.v) for r in eng.sql(sql).collect()]
    want = list(duck.execute(sql).fetchall())
    assert got == want and len(got) == 5
