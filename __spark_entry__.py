"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``oss_data_lake_spark``; this module only wires
the contract to the operator registry (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oss_data_lake_spark.operators import driver_oracles, driver_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's BI dashboard query shape (reference RUNBOOK.md:128-132)
    recast onto the ``events`` fixture: daily average value per event type,
    ordered, limited.
    """
    from oss_data_lake_spark.operators.tier_a import flagship_daily_avg

    return flagship_daily_avg(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver registry (≤ 50 entries — the driver verifies only the
    first 50): every SURVEY.md §2 operator is covered either by its own
    entry or through a composite query whose long-format projection carries
    each member's values (operators/composite.py). The full fine-grained
    per-operator registry lives in ``all_queries()`` and stays verified by
    the pytest oracle-parity suite."""
    return driver_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omitted keys → rows-only check."""
    return driver_oracles()
