"""Round-12 advisor closures (ADVICE.md round 11):

1. MATCH_RECOGNIZE runtime exclusivity guard — overlapping DEFINEs (the
   common BI spelling ``DOWN AS v <= PREV(v), UP AS v >= PREV(v)``) must
   RAISE instead of silently returning non-Trino results.
2. Lakekeeper warehouse ids are creation-stable: POST's returned id and
   GET's listed id always name the same warehouse.
3. Trino-DDL type substitutions fire only in TYPE position — a column
   literally named ``real`` / ``varchar`` / ``varbinary`` survives.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.operators.match_recognize import match_recognize


def _mk_df(spark, vals):
    data = [(1, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        data, "user_id long, event_id long, value double"
    )


def test_overlapping_defines_raise_not_silently_mislabel(spark):
    """ADVICE round 11 (medium), verbatim scenario: values [5,3,3] with
    DOWN AS value <= PREV(value), UP AS value >= PREV(value). The reference
    NFA finds 1 match; the label rewrite would find 0 — so the engine must
    refuse at execution time, not return the wrong answer."""
    df = _mk_df(spark, [5, 3, 3])
    out = match_recognize(
        df,
        partition_by=["user_id"],
        order_by="event_id",
        pattern="STRT DOWN+ UP+",
        defines={
            "DOWN": "value <= PREV(value)",
            "UP": "value >= PREV(value)",
        },
        measures={"mn": "MATCH_NUMBER()"},
    )
    with pytest.raises(Exception, match="mutually exclusive"):
        out.collect()


def test_exclusive_defines_pass_the_guard(spark):
    """The guard must not fire on contract-conforming (strict) defines —
    the shipped b53 spelling still evaluates."""
    df = _mk_df(spark, [5, 3, 1, 4, 6, 2])
    out = match_recognize(
        df,
        partition_by=["user_id"],
        order_by="event_id",
        pattern="STRT DOWN+ UP+",
        defines={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        measures={"mn": "MATCH_NUMBER()"},
    )
    assert out.count() == 1  # 5>3>1<4<6 matches; trailing 2 has no UP leg


def test_sql_route_overlapping_defines_raise(spark, tmp_path):
    """Engine.sql routes arbitrary Trino MATCH_RECOGNIZE text — the guard
    must protect that path too."""
    e = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    e.sql("CREATE TABLE ev (user_id BIGINT, event_id BIGINT, value DOUBLE) "
          "USING snapshot")
    e.sql("INSERT INTO ev VALUES (1, 0, 5.0), (1, 1, 3.0), (1, 2, 3.0)")
    out = e.sql(
        "SELECT * FROM ev MATCH_RECOGNIZE ("
        " PARTITION BY user_id ORDER BY event_id"
        " MEASURES MATCH_NUMBER() AS mn"
        " PATTERN (STRT DOWN+ UP+)"
        " DEFINE DOWN AS value <= PREV(value),"
        "        UP AS value >= PREV(value))"
    )
    with pytest.raises(Exception, match="mutually exclusive"):
        out.collect()


def test_warehouse_ids_consistent_across_post_and_get():
    """ADVICE round 11 (low): create 'b' then 'a' — POST returns wh-0 for
    b; the name-sorted GET listing must still say b=wh-0, a=wh-1."""
    from oss_data_lake_spark.sources.rest_catalog import RestCatalogServer

    srv = RestCatalogServer().start()
    try:
        created = {}
        for name in ("b", "a"):
            req = urllib.request.Request(
                f"{srv.url}/management/v1/warehouse",
                data=json.dumps({"warehouse-name": name}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                created[name] = json.loads(r.read().decode())["warehouse-id"]
        assert created == {"b": "wh-0", "a": "wh-1"}
        with urllib.request.urlopen(
            f"{srv.url}/management/v1/warehouse"
        ) as r:
            listed = {
                w["name"]: w["id"]
                for w in json.loads(r.read().decode())["warehouses"]
            }
        assert listed == created
    finally:
        srv.stop()


def test_trino_ddl_type_words_as_column_names_survive(spark, tmp_path):
    """ADVICE round 11 (low): 'real DOUBLE' in Trino-marked DDL (WITH
    partitioning tail) is a column NAMED real, not a type token — the
    translation must keep the name and the declared type."""
    e = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE twords ("
        " real DOUBLE, varbinary BIGINT, varchar VARCHAR,"
        " ts TIMESTAMP(3) WITH TIME ZONE)"
        " WITH (partitioning = ARRAY['day(ts)'])"
    )
    schema = {f.name: f.dataType.simpleString()
              for f in e.sql("SELECT * FROM twords").schema.fields}
    assert schema["real"] == "double"
    assert schema["varbinary"] == "bigint"
    assert schema["varchar"] == "string"   # VARCHAR in TYPE position maps
    assert schema["ts"] == "timestamp"
    e.sql("INSERT INTO twords VALUES "
          "(1.5, 2, 'x', TIMESTAMP '2024-01-02 03:04:05')")
    row = e.sql("SELECT real, varbinary, varchar FROM twords").collect()[0]
    assert (row["real"], row["varbinary"], row["varchar"]) == (1.5, 2, "x")
