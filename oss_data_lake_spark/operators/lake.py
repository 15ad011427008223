"""Partition-pruned lake queries (p0x) — reads that touch only the queried
partitions of the date-partitioned lake tables (``sources/lake.py``).

This is the read side of the reference's partitioned layout (reference
RUNBOOK.md:90 ``day(ts)`` DDL; dags/yfinance_to_minio.py:85-91 ``date=``
dirs): a predicate on the partition column prunes at the FILE INDEX level —
``PartitionFilters`` in the scan node, directories never opened — which at
100 TB is the difference between scanning ~7 days and scanning 3 000.
Column pruning and row-group pushdown still apply inside the touched
partitions.

Oracle strategy: the queries read the PARTITIONED copy the engine wrote;
the DuckDB oracles read the ORIGINAL fixture parquet and re-derive the
partition key from ``ts`` / ``l_shipdate``. Matching results therefore
verify the whole round-trip: partition derivation → partitioned write →
partition-discovering read → pruned scan.

At fixture scale the lake is materialized once per scale factor into a
cache dir outside the repo (build cost excluded from bench timing via the
warmup phase; build-once protocol in ``sources/lake.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import dsum, sql_dsum
from oss_data_lake_spark.sources.lake import (
    events_by_date,
    lineitem_by_month,
    read_lake,
)

# One calendar week of the 30-day events fixture (~23% of partitions) and a
# 4-month slice of lineitem's ~83 ship months (~5%): both prune hard while
# leaving enough rows to make the aggregate non-trivial.
EVENTS_DATE_LO, EVENTS_DATE_HI = "2024-01-08", "2024-01-14"
SHIP_MONTH_LO, SHIP_MONTH_HI = "1995-03", "1995-06"


def pruned_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p01: daily per-type counts/sums over ONE WEEK of the date-partitioned
    events lake. The ``date`` predicate is a partition filter: only 7 of the
    30 ``date=`` directories are listed/opened (plan pinned in
    tests/test_plans.py::test_partition_pruning_events)."""
    path = events_by_date(spark, sf_dir)
    ev = read_lake(spark, path)
    return (
        ev.filter(F.col("date").between(EVENTS_DATE_LO, EVENTS_DATE_HI))
        .groupBy("date", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .orderBy("date", "event_type")
    )


def pruned_month_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p02: pricing aggregate over a 4-month ship window of the
    month-partitioned lineitem lake — TPC-H Q1's shape, but scanning only
    the queried months instead of every row ever shipped."""
    path = lineitem_by_month(spark, sf_dir)
    li = read_lake(spark, path)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("ship_month").between(SHIP_MONTH_LO, SHIP_MONTH_HI))
        .groupBy("ship_month", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "sum_qty"),
            dsum(disc_price, "sum_disc_price"),
        )
        .orderBy("ship_month", "l_returnflag")
    )


QUERIES = {
    "p01_pruned_daily_events": pruned_daily_events,
    "p02_pruned_month_lineitem": pruned_month_lineitem,
}

ORACLES = {
    # re-derives the partition key from the raw fixture: value equality
    # proves the partitioned round-trip lost/duplicated nothing
    "p01_pruned_daily_events": f"""
        SELECT strftime(ts, '%Y-%m-%d') AS date,
               event_type,
               COUNT(*) AS n,
               {sql_dsum("value")} AS sum_value
        FROM events
        WHERE strftime(ts, '%Y-%m-%d') BETWEEN '{EVENTS_DATE_LO}' AND '{EVENTS_DATE_HI}'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "p02_pruned_month_lineitem": f"""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               l_returnflag,
               COUNT(*) AS n,
               {sql_dsum("l_quantity")} AS sum_qty,
               {sql_dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price
        FROM lineitem
        WHERE strftime(l_shipdate, '%Y-%m') BETWEEN '{SHIP_MONTH_LO}' AND '{SHIP_MONTH_HI}'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}
