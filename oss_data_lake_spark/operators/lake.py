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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import dsum, sql_dsum
from oss_data_lake_spark.sources.lake import (
    events_by_date,
    lake_root,
    lineitem_by_month,
    read_lake,
)
from oss_data_lake_spark.sources.loaders import load_table
from oss_data_lake_spark.sources.snapshots import SnapshotTable

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


# One calendar year of the orders fixture's ~6.5-year span (1995-01 ..
# 2001-08): with the table clustered into 24 date-ranged files, ~1/6 of
# files survive the manifest bounds check.
ORDERS_DATE_LO, ORDERS_DATE_HI = "1997-01-01", "1997-12-31"
ORDERS_N_FILES = 24


def orders_clustered(spark: SparkSession, sf_dir: str) -> SnapshotTable:
    """Build-once: ``orders`` as a snapshot table committed CLUSTERED by
    ``o_orderdate`` (range-partition + sort into ORDERS_N_FILES files)
    with per-file min/max manifest stats — the Iceberg sort-order +
    manifest-stats layout (``sources/skipping.py``). Cached per scale
    factor next to the p01/p02 lakes with THEIR staged-build protocol
    (``sources/lake.py``): staged into a UNIQUE temp dir and swapped into
    place under a flock (``_publish_local``), so concurrent cache users
    (bench warmup + a pytest run sharing lake_root) never observe a
    half-built table, corrupt each other's staging, or lose one
    mid-rebuild to the other's rmtree. Local cache dir only — the
    stamp/swap protocol is local-FS."""
    from oss_data_lake_spark.sources.lake import (
        _built,
        _publish_local,
        _source_stamp,
        _staging_dir,
    )
    from oss_data_lake_spark.sources.skipping import ENC_VERSION

    sf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(lake_root(), sf, "orders_clustered")
    # the stats-encoding version participates in the stamp: bumping it
    # rebuilds the cache once so its manifest stats carry the current canon
    stamp = (
        f"enc{ENC_VERSION}:"
        + _source_stamp(os.path.join(sf_dir, "orders.parquet"))
    )
    if _built(path, stamp):
        return SnapshotTable(spark, path)
    tmp = _staging_dir(path)
    staged = SnapshotTable(spark, tmp)
    staged.commit_clustered(
        load_table(spark, sf_dir, "orders"),
        cluster_by="o_orderdate",
        n_files=ORDERS_N_FILES,
        stats_for=["o_orderdate", "o_totalprice"],
    )
    with open(os.path.join(tmp, "_SOURCE_STAMP"), "w") as fh:
        fh.write(stamp)
    _publish_local(tmp, path, stamp)
    return SnapshotTable(spark, path)


def skipping_orders_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p03: monthly order counts/revenue for ONE YEAR, read through the
    file-skipping scan (``SnapshotTable.read_between``): the manifest's
    per-file ``o_orderdate`` bounds eliminate ~6/7 of the clustered files
    before any data byte is read — Iceberg's manifest-stats pruning, the
    lever that serves range queries on columns the partition layout does
    NOT cover. The exact predicate is still applied to surviving rows, so
    the oracle (raw fixture, same filter) verifies the whole
    cluster→commit→stats→prune→read round-trip; the file-count evidence
    is pinned by tests/test_skipping.py."""
    table = orders_clustered(spark, sf_dir)
    df = table.read_between("o_orderdate", ORDERS_DATE_LO, ORDERS_DATE_HI)
    return (
        df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "sum_price"),
        )
        .orderBy("order_month")
    )


def sql_fileskip_orders_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p04: the p03 predicate as PURE SQL TEXT through ``Engine.sql`` —
    the reference's BI persona (a JDBC client issuing plain SELECTs,
    reference RUNBOOK.md:120-132) gets manifest file skipping without
    calling any engine API: ``sql_with_time_travel`` extracts the WHERE's
    top-level range conjunct on the registered snapshot table's stats
    column and backs the head view with the pruned scan
    (``SnapshotTable.read_pruned``); the SQL's own WHERE still applies, so
    the same oracle as p03 verifies the whole text→extract→prune→read
    path. Plan evidence (files opened == plan_pruned count) is pinned by
    tests/test_plans.py::test_p04_sql_scan_lists_only_admitted_files."""
    from oss_data_lake_spark.engine import Engine

    table = orders_clustered(spark, sf_dir)
    eng = Engine(spark=spark)
    eng.register_snapshot_table("orders_snap", table.path)
    return eng.sql(f"""
        SELECT date_format(o_orderdate, 'yyyy-MM') AS order_month,
               COUNT(*) AS n,
               {sql_dsum("o_totalprice")} AS sum_price
        FROM orders_snap
        WHERE o_orderdate BETWEEN TIMESTAMP '{ORDERS_DATE_LO} 00:00:00'
                              AND TIMESTAMP '{ORDERS_DATE_HI} 00:00:00'
        GROUP BY date_format(o_orderdate, 'yyyy-MM')
        ORDER BY order_month
    """)


def hidden_partition_day_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p05 (round 7): TRUE hidden partitioning end to end — events
    committed ``days(ts)``-partitioned into a snapshot table (the
    partition value lives in a hidden ``_p_days_ts`` column no reader
    ever sees), then ONE WEEK queried through the SOURCE column's range
    (``read_between("ts", ...)``), which prunes by pushing the bounds
    through the transform onto the day path segments. The oracle is
    p01's shape over the raw fixture: matching values prove the whole
    derive→hidden-write→transform-prune→read round-trip, and the hidden
    column leaking into the result would break the schema check."""
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    )
    # the production write shape: co-locate each day before the
    # partitioned write so every day lands as ~1 file instead of
    # (tasks × days) small files — at 100 TB the small-file explosion,
    # not the shuffle, is what kills partitioned ingest
    ev = ev.repartition(32, F.date_format("ts", "yyyy-MM-dd"))
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="p05_") + "/events"
    )
    t.commit(ev, partition_by=["days(ts)"])
    return (
        # the range bound over-admits up to midnight of the next day
        # (read_between's residual is exact; sub-second rows inside the
        # last day must survive it) — the day-string filter below is the
        # effective predicate, mirrored verbatim in the oracle
        t.read_between(
            "ts", f"{EVENTS_DATE_LO} 00:00:00", "2024-01-15 00:00:00"
        )
        .filter(
            F.date_format("ts", "yyyy-MM-dd").between(
                EVENTS_DATE_LO, EVENTS_DATE_HI
            )
        )
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("date"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .orderBy("date", "event_type")
    )


QUERIES = {
    "p01_pruned_daily_events": pruned_daily_events,
    "p02_pruned_month_lineitem": pruned_month_lineitem,
    "p03_fileskip_orders_year": skipping_orders_year,
    "p04_sql_fileskip_orders_year": sql_fileskip_orders_year,
    "p05_hidden_partition_day_events": hidden_partition_day_events,
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
    # p05 answers p01's question through TRUE hidden partitioning
    # (days(ts) transform, source-predicate pruning), so p01's raw-
    # fixture re-derivation is its oracle verbatim: matching values
    # prove the hidden layout lost/duplicated/leaked nothing
    "p05_hidden_partition_day_events": f"""
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
    # raw fixture + identical filter: matching values prove the clustered
    # commit + manifest-stats prune + file-subset read lost/duplicated
    # nothing (the prune itself can only affect which files are OPENED)
    "p03_fileskip_orders_year": f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS n,
               {sql_dsum("o_totalprice")} AS sum_price
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '{ORDERS_DATE_LO} 00:00:00'
                              AND TIMESTAMP '{ORDERS_DATE_HI} 00:00:00'
        GROUP BY 1
        ORDER BY 1
    """,
    # p04 answers the SAME question as p03 through the SQL-text path, so
    # the identical membership re-derivation is its oracle: matching
    # values prove the predicate extraction pruned nothing it shouldn't
    "p04_sql_fileskip_orders_year": f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS n,
               {sql_dsum("o_totalprice")} AS sum_price
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '{ORDERS_DATE_LO} 00:00:00'
                              AND TIMESTAMP '{ORDERS_DATE_HI} 00:00:00'
        GROUP BY 1
        ORDER BY 1
    """,
}
