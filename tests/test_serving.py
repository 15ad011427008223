"""BI serving surface: HiveServer2-protocol JDBC endpoint over the lake.

Mirrors the reference's Metabase/CloudBeaver-over-JDBC contract (reference
RUNBOOK.md:120-123): a BI tool holding only a JDBC URL must be able to list
and query warehouse tables with plain SQL. One HiveThriftServer2 per JVM —
all scenarios share a module-scoped handle.
"""

from __future__ import annotations

import pytest

from oss_data_lake_spark import serving


@pytest.fixture(scope="module")
def thrift(spark, sf_dir):
    if not serving.thrift_server_available(spark):
        pytest.skip("spark build lacks HiveThriftServer2")
    handle = serving.serve(spark, sf_dir)
    yield handle
    # leave the server running: HiveThriftServer2.stop() stops the shared
    # SparkContext in-process, which would kill every later test


def _rows(csv: str) -> list[list[str]]:
    lines = [ln for ln in csv.strip().splitlines() if ln]
    return [ln.split(",") for ln in lines]


def test_jdbc_count_matches_dataframe(thrift, spark, sf_dir):
    from oss_data_lake_spark.sources.loaders import load_table

    expected = load_table(spark, sf_dir, "lineitem").count()
    out = serving.jdbc_query(
        thrift, "SELECT count(*) AS n FROM global_temp.lineitem"
    )
    rows = _rows(out)
    assert rows[0] == ["n"]
    assert int(rows[1][0]) == expected


def test_jdbc_aggregation_query(thrift):
    out = serving.jdbc_query(
        thrift,
        "SELECT l_returnflag, count(*) AS n FROM global_temp.lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
    )
    rows = _rows(out)
    assert rows[0] == ["l_returnflag", "n"]
    flags = [r[0] for r in rows[1:]]
    assert flags == sorted(flags) and len(flags) >= 2


def test_jdbc_sees_all_published_tables(thrift):
    out = serving.jdbc_query(thrift, "SHOW TABLES IN global_temp")
    listed = {r[1] for r in _rows(out)[1:]}
    for name in ("lineitem", "orders", "documents", "embeddings"):
        assert name in listed, (name, listed)


def test_metastore_scratch_not_in_repo(thrift):
    import os

    assert not os.path.exists("/root/repo/metastore_db")
    assert not os.path.exists("/root/repo/derby.log")
