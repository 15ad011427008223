"""Table-layer checks: the reference's DDL/DML/introspection surface
(A19-A23) against the session catalog, including its doc SQL statements
run verbatim (modulo catalog prefix — SURVEY.md §3.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oss_data_lake_spark.sources.ingest import normalize_ohlcv
from oss_data_lake_spark.sources.ohlcv import generate_ohlcv
from oss_data_lake_spark.sources.tables import Warehouse


@pytest.fixture()
def warehouse(spark, tmp_path):
    wh = Warehouse(spark, "yfinance_test", location=str(tmp_path))
    yield wh
    wh.drop()


def test_schema_and_table_lifecycle(warehouse):
    warehouse.create_fact_price()
    assert "yfinance_test" in warehouse.show_schemas()  # A19/A23
    assert "fact_price" in warehouse.show_tables()  # A20/A23
    assert warehouse.count_star() == 0  # A14 smoke on empty table


def test_insert_and_query(spark, warehouse):
    warehouse.create_fact_price()
    tidy = normalize_ohlcv(generate_ohlcv(spark), ingest_date="2025-07-01")
    warehouse.insert_prices(tidy)  # A21
    assert warehouse.count_star() == 120

    # A12 — notebook SQL verbatim
    means = warehouse.avg_close_by_ticker().collect()
    assert [r.ticker for r in means] == ["AAPL", "AMZN", "GOOGL", "MSFT"]
    assert all(r.avg_close is not None for r in means)

    # A13 — RUNBOOK dashboard SQL verbatim
    daily = warehouse.daily_avg_limit(20).collect()
    assert len(daily) == 20
    assert daily[0].ticker == "AAPL"

    # partition pruning on the materialized day transform
    pruned = spark.sql(
        "SELECT COUNT(*) AS n FROM yfinance_test.fact_price WHERE date = '2025-06-03'"
    ).collect()[0].n
    assert pruned == 4


def test_sql_insert_iso_timestamp(spark, warehouse):
    """A21/A22: SQL INSERT with ISO-8601 literal (from_iso8601_timestamp →
    to_timestamp)."""
    warehouse.create_fact_price()
    warehouse.insert_row_sql("2025-01-02T00:00:00", "TEST", 123.45)
    row = spark.sql(
        "SELECT ticker, ts, close, date FROM yfinance_test.fact_price"
    ).collect()[0]
    assert row.ticker == "TEST" and row.close == 123.45
    assert str(row.ts) == "2025-01-02 00:00:00"
    assert row.date == "2025-01-02"


def test_ctas_and_partition_introspection(spark, warehouse):
    warehouse.create_fact_price()
    tidy = normalize_ohlcv(generate_ohlcv(spark, n_days=5), ingest_date="2025-07-01")
    warehouse.insert_prices(tidy)

    parts = warehouse.show_partitions()
    assert len(parts) == 5 and all(p.startswith("date=") for p in parts)

    warehouse.create_table_as(
        "ticker_means",
        "SELECT ticker, AVG(close) AS avg_close FROM "
        "yfinance_test.fact_price GROUP BY ticker",
    )
    assert "ticker_means" in warehouse.show_tables()
    assert spark.table("yfinance_test.ticker_means").count() == 4


def test_insert_overwrite_dynamic_partitions(spark, warehouse):
    """Re-ingesting a subset of days must replace only those partitions."""
    warehouse.create_fact_price()
    full = normalize_ohlcv(generate_ohlcv(spark, n_days=5), ingest_date="2025-07-01")
    warehouse.insert_prices(full)
    assert warehouse.count_star() == 20

    # overwrite just the first 2 days with doubled close values
    from pyspark.sql import functions as F

    first_days = full.filter(F.to_date("ts") <= "2025-06-03").withColumn(
        "close", F.col("close") * 2
    )
    warehouse.insert_overwrite_partitions(first_days)
    assert warehouse.count_star() == 20  # replaced, not appended
    doubled = spark.sql(
        "SELECT COUNT(*) AS n FROM yfinance_test.fact_price "
        "WHERE date <= '2025-06-03'"
    ).collect()[0].n
    assert doubled == 8


def test_bucketed_join_is_shuffle_free(spark, warehouse, sf_dir):
    """Tables bucketed on the join key with equal bucket counts must join
    with zero shuffle exchanges (the 100 TB co-location strategy)."""
    from oss_data_lake_spark.plans.audit import count_exchanges
    from oss_data_lake_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    warehouse.write_bucketed(orders, "orders_b", "o_custkey", 8)
    warehouse.write_bucketed(cust, "customer_b", "c_custkey", 8)

    ob = spark.table("yfinance_test.orders_b")
    cb = spark.table("yfinance_test.customer_b")
    joined = ob.hint("merge").join(cb, ob.o_custkey == cb.c_custkey)
    assert count_exchanges(joined) == 0, joined._jdf.queryExecution().toString()
    assert joined.count() == orders.count()  # every order has a customer


def test_analyze_statistics(spark, warehouse):
    """ANALYZE feeds the CBO; stats must show up in the catalog."""
    warehouse.create_fact_price()
    tidy = normalize_ohlcv(generate_ohlcv(spark, n_days=5), ingest_date="2025-07-01")
    warehouse.insert_prices(tidy)
    warehouse.analyze(columns=["ticker", "close"])
    stats = warehouse.table_stats()
    assert "Statistics" in stats and "rows" in stats["Statistics"]
    assert "20 rows" in stats["Statistics"]


def test_hidden_partition_view(spark, warehouse):
    """The fact_price_v view hides the materialized partition column —
    Iceberg hidden-partitioning parity (SURVEY.md §4)."""
    warehouse.create_fact_price()
    cols = spark.table("yfinance_test.fact_price_v").columns
    assert "date" not in cols
    assert cols == ["ticker", "ts", "open", "high", "low", "close", "volume", "ingest_date"]


def test_nested_namespace_warehouse(spark, tmp_path):
    """Lakekeeper-style nested namespaces (reference
    etc/catalog/iceberg.properties:18 nested-namespace-enabled): a dotted
    namespace round-trips through the flat session catalog — DDL, insert,
    query, and namespace listing all speak the dotted name."""
    from oss_data_lake_spark.sources.tables import (
        encode_namespace,
        list_namespaces,
    )

    assert encode_namespace("finance.yahoo.daily") == "finance__yahoo__daily"
    with pytest.raises(ValueError):
        encode_namespace("bad__part.x")
    # 'a_.b' and 'a._b' would both encode to 'a___b' — boundary-adjacent
    # underscores are rejected to keep the encoding collision-free
    with pytest.raises(ValueError):
        encode_namespace("a_.b")
    with pytest.raises(ValueError):
        encode_namespace("a._b")
    assert encode_namespace("a_b.c") == "a_b__c"  # interior '_' is fine

    wh = Warehouse(spark, "finance_t.yahoo", location=str(tmp_path))
    try:
        wh.create_fact_price()
        tidy = normalize_ohlcv(
            generate_ohlcv(spark, ("AAPL",), n_days=3),
            ingest_date="2025-06-13",
        )
        wh.insert_prices(tidy)
        assert wh.count_star() == 3
        # dotted name visible in schema listing and under its parent
        assert "finance_t.yahoo" in wh.show_schemas()
        assert list_namespaces(spark, "finance_t") == ["finance_t.yahoo"]
        assert "fact_price" in wh.show_tables()
    finally:
        wh.drop()


def test_decode_namespace_round_trip_guard(spark):
    """A database created OUTSIDE Warehouse whose flat name merely contains
    '__' must not be reported as a nested namespace: decode only when
    decode→re-encode round-trips; others come back verbatim."""
    from oss_data_lake_spark.sources.tables import (
        decode_namespace,
        list_namespaces,
    )

    # round-trippers decode
    assert decode_namespace("finance__yahoo") == "finance.yahoo"
    # non-round-trippers (boundary underscores, empty parts) stay verbatim
    assert decode_namespace("a___b") == "a___b"  # would decode to 'a._b'
    assert decode_namespace("foo__") == "foo__"
    assert decode_namespace("__bar") == "__bar"

    spark.sql("CREATE DATABASE IF NOT EXISTS weird___db")
    try:
        names = list_namespaces(spark)
        assert "weird___db" in names
        assert "weird._db" not in names and "weird.db" not in names
    finally:
        spark.sql("DROP DATABASE weird___db")


def test_warehouse_auto_format_falls_back_to_parquet_jarless(spark, tmp_path):
    """The connector upgrade hook, jarless leg: table_format='auto'
    resolves through preferred_table_format to 'parquet' in this
    environment and the native path works unchanged."""
    from oss_data_lake_spark.sources.connectors import preferred_table_format

    assert preferred_table_format(spark) == "parquet"
    wh = Warehouse(spark, "auto_fmt_t", location=str(tmp_path), table_format="auto")
    try:
        assert wh.table_format == "parquet"
        wh.create_fact_price()
        tidy = normalize_ohlcv(
            generate_ohlcv(spark, ("AAPL",), n_days=2), ingest_date="2025-06-13"
        )
        wh.insert_prices(tidy)
        assert wh.count_star() == 2
        with pytest.raises(ValueError, match="snapshots"):
            wh.read_table_at_version(version=0)
    finally:
        wh.drop()


def test_warehouse_connector_upgrade_when_jar_present(spark, tmp_path):
    """The connector upgrade hook, jarred leg (gated like the s3a smoke:
    runs only when a Delta/Iceberg runtime jar IS on the classpath):
    Warehouse(table_format='auto') routes DDL through the connector and
    the same create/insert/select assertions pass, plus connector-native
    SQL time travel (VERSION AS OF) across two inserts."""
    from oss_data_lake_spark.sources.connectors import preferred_table_format

    fmt = preferred_table_format(spark)
    if fmt == "parquet":
        pytest.skip("no Delta/Iceberg connector jar on classpath")
    wh = Warehouse(spark, "conn_fmt_t", location=str(tmp_path), table_format="auto")
    try:
        assert wh.table_format == fmt
        wh.create_fact_price()
        t1 = normalize_ohlcv(
            generate_ohlcv(spark, ("AAPL",), n_days=2), ingest_date="2025-06-13"
        )
        wh.insert_prices(t1)
        assert wh.count_star() == 2
        t2 = normalize_ohlcv(
            generate_ohlcv(spark, ("MSFT",), n_days=3), ingest_date="2025-06-14"
        )
        wh.insert_prices(t2)
        assert wh.count_star() == 5
        # connector-native time travel: the pre-append version still shows 2
        versions = sorted(
            r[0] for r in wh.spark.sql(
                f"DESCRIBE HISTORY {wh.db}.fact_price"
            ).select("version").collect()
        ) if fmt == "delta" else [0, 1]
        early = wh.read_table_at_version(version=versions[-2])
        assert early.count() == 2
    finally:
        wh.drop()
