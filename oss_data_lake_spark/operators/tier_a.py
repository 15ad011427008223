"""Tier A — the operators the reference directly exercises (SURVEY.md §2.A).

Each query recasts a reference site onto the driver fixtures (the reference's
own ``fact_price`` data needs live yfinance; our ingest job covers that path
in ``sources/``). Reference citations per query below.

Scale notes: every query here is a single scan → partial/final hash aggregate
(one shuffle on the group keys) or a sort-limit (TakeOrdered, no full sort on
the cluster). Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import davg, sql_davg, sql_dsum
from oss_data_lake_spark.sources.loaders import load_table


def flagship_daily_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: two-key aggregate with scalar date fn, sort, limit — the
    reference's BI dashboard query (reference RUNBOOK.md:128-132:
    ``SELECT ticker, DATE(ts) AS d, AVG(close) … GROUP BY ticker, DATE(ts)
    ORDER BY ticker, d LIMIT 20``) recast onto ``events``."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(davg("value", "avg_value"))
        .orderBy("event_type", "d")
        .limit(20)
    )


def avg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/A12: hash aggregate mean-by-key + sort, the notebook's dual-engine
    query (reference notebooks/test_airflow_yfinance.ipynb:160-166 pandas path,
    :332-336 SQL path). Run via spark.sql to exercise the SQL entry point."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        f"""
        SELECT event_type, {sql_davg("value")} AS avg_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """
    )


def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: COUNT(*) smoke probe (reference RUNBOOK.md:105, README.md:42)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(F.count(F.lit(1)).alias("n_rows"))


def json_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: lenient null-on-error casts (reference
    notebooks/test_airflow_yfinance.ipynb:160 ``pd.to_numeric(errors="coerce")``)
    applied to the JSON ``props`` column: extract ``$.k``, cast to long
    (non-ANSI cast → null on malformed), aggregate."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


def null_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+A15: dropna before aggregating (reference
    notebooks/test_airflow_yfinance.ipynb:161 ``dropna(subset=["close"])``)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.na.drop(subset=["value"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), davg("value", "avg_value"))
        .orderBy("user_id")
    )


def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: vertical union of frames (reference dags/yfinance_to_minio.py:62
    ``pd.concat``) — split events into high/low-value slices, unionByName,
    re-aggregate."""
    events = load_table(spark, sf_dir, "events")
    high = events.filter(F.col("value") >= 100).select(
        F.lit("high").alias("bucket"), "event_type"
    )
    low = events.filter(F.col("value") < 100).select(
        F.lit("low").alias("bucket"), "event_type"
    )
    return (
        high.unionByName(low)
        .groupBy("bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket", "event_type")
    )


def full_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17/A18: the reference's differential-compare pattern (reference
    notebooks/test_airflow_yfinance.ipynb:339 — full-outer merge of two
    independently computed means, then abs diff): first half of January vs
    second half, per event type."""
    events = load_table(spark, sf_dir, "events")
    first = (
        events.filter(F.dayofmonth("ts") <= 15)
        .groupBy("event_type")
        .agg(davg("value", "avg_a"))
    )
    second = (
        events.filter(F.dayofmonth("ts") > 15)
        .groupBy("event_type")
        .agg(davg("value", "avg_b"))
    )
    return (
        first.join(second, "event_type", "full_outer")
        .withColumn("diff", F.abs(F.col("avg_a") - F.col("avg_b")))
        .orderBy("event_type")
    )


def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/A16: ORDER BY + LIMIT → Spark plans TakeOrderedAndProject (per-
    partition top-N + driver merge), not a cluster-wide sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def iso_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22: ISO-8601 timestamp parse (reference
    notebooks/test_airflow_yfinance.ipynb:235 ``from_iso8601_timestamp``):
    format ts to ISO text, re-parse, count exact second-grain roundtrips."""
    events = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    return (
        events.withColumn(
            "ok",
            (F.to_timestamp(iso) == F.date_trunc("second", F.col("ts"))).cast("int"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ok").alias("n_roundtrip"))
        .orderBy("event_type")
    )


QUERIES = {
    "a13_flagship_daily_avg": flagship_daily_avg,
    "a12_avg_by_type": avg_by_type,
    "a14_count_star": count_star,
    "a06_json_try_cast": json_try_cast,
    "a07_null_filter_agg": null_filter_agg,
    "a10_union_all_counts": union_all_counts,
    "a17_full_outer_diff": full_outer_diff,
    "a15_sort_limit_topn": sort_limit_topn,
    "a22_iso_roundtrip": iso_roundtrip,
}

ORACLES = {
    "a13_flagship_daily_avg": f"""
        SELECT event_type, CAST(ts AS DATE) AS d, {sql_davg("value")} AS avg_value
        FROM events GROUP BY event_type, CAST(ts AS DATE)
        ORDER BY event_type, d LIMIT 20
    """,
    "a12_avg_by_type": f"""
        SELECT event_type, {sql_davg("value")} AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "a14_count_star": "SELECT COUNT(*) AS n_rows FROM lineitem",
    "a06_json_try_cast": """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(k) AS n_k,
               CAST(SUM(k) AS BIGINT) AS sum_k
        FROM (SELECT event_type,
                     TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type ORDER BY event_type
    """,
    "a07_null_filter_agg": f"""
        SELECT user_id, COUNT(*) AS n, {sql_davg("value")} AS avg_value
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id ORDER BY user_id
    """,
    "a10_union_all_counts": """
        SELECT bucket, event_type, COUNT(*) AS n FROM (
            SELECT 'high' AS bucket, event_type FROM events WHERE value >= 100
            UNION ALL
            SELECT 'low' AS bucket, event_type FROM events WHERE value < 100
        ) GROUP BY bucket, event_type ORDER BY bucket, event_type
    """,
    "a17_full_outer_diff": f"""
        WITH a AS (
            SELECT event_type, {sql_davg("value")} AS avg_a FROM events
            WHERE EXTRACT(day FROM ts) <= 15 GROUP BY event_type
        ), b AS (
            SELECT event_type, {sql_davg("value")} AS avg_b FROM events
            WHERE EXTRACT(day FROM ts) > 15 GROUP BY event_type
        )
        SELECT COALESCE(a.event_type, b.event_type) AS event_type,
               avg_a, avg_b, ABS(avg_a - avg_b) AS diff
        FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
        ORDER BY event_type
    """,
    "a15_sort_limit_topn": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
    "a22_iso_roundtrip": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'),
                                      '%Y-%m-%dT%H:%M:%S')
                        = CAST(date_trunc('second', ts) AS TIMESTAMP)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}
