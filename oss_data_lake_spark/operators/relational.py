"""Tier B — the implied relational surface (SURVEY.md §2.B).

The reference's query layer is full ANSI SQL through Trino 467 over Iceberg
(reference docker-compose.yaml:153, etc/catalog/iceberg.properties:14-20);
its BI tools issue arbitrary SQL (reference RUNBOOK.md:120-123). This module
exposes that standard relational core through Catalyst: star joins,
semi/anti joins, window functions, rollup/cube/grouping sets, set ops,
scalar-function families, subqueries, pivot, having.

Scale notes (100 TB design):
- Star joins broadcast every dimension (region/nation/customer/supplier are
  orders-of-magnitude smaller than lineitem); only the fact table shuffles,
  and only when an aggregation key demands it.
- Top-K is TakeOrderedAndProject (per-partition heap + driver merge of K
  rows), never a global sort.
- Window functions shuffle once on the partition key; rollup/cube expand
  grouping sets map-side with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import (
    PRECISION,
    SCALE,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from oss_data_lake_spark.sources.loaders import load_table

_DEC = f"decimal({PRECISION},{SCALE})"


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate — the canonical test that
    partial+final hash aggregation and scan pushdown hold up."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def topk_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-K. customer is broadcast; the
    orders⋈lineitem join shuffles on orderkey (the natural co-location key
    for bucketed tables at scale)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > F.lit("1997-01-01"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1998-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: full star join with broadcast dimensions; customer and
    supplier must share a nation (the classic co-location predicate)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia = region.filter(F.col("r_name") == "ASIA")
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(asia), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers having at least one order > 300k,
    counted per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def anti_join_small_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no order > 300k."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def window_ma7_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average — the canonical finance-analytics query for the
    reference's OHLCV data model (SURVEY.md §2.B "Window functions"), on the
    events fixture: daily avg per type, then a 7-row trailing mean.

    The window sum runs over decimal so Spark's sliding-frame accumulation
    and DuckDB's segment-tree accumulation produce identical bits."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(davg("value", "daily_avg"))
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    ma = (
        F.sum(F.col("daily_avg").cast(_DEC)).over(w).cast("double")
        / F.count("daily_avg").over(w).cast("double")
    )
    return daily.withColumn("ma7", ma).orderBy("event_type", "d")


def lag_delta_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: per-user event-value deltas, aggregated to up/down counts."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    return (
        events.withColumn("delta", delta)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("delta") > 0).cast("int")).alias("n_up"),
            F.sum((F.col("delta") < 0).cast("int")).alias("n_down"),
        )
        .orderBy("user_id")
    )


def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number — the scalable alternative to a global
    sort (one shuffle on the partition key, heap within partitions)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice",
                F.col("rn").cast("long").alias("rn"))
        .orderBy("o_custkey", "rn")
    )


def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_GROUPING_SETS_SQL = f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {sql_dsum("o_totalprice")} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — same SQL text runs on Spark and DuckDB."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT: nations that have customers vs suppliers."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    cn = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    sn = supp.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cn.intersect(sn).withColumn("tag", F.lit("both"))
    cust_only = cn.exceptAll(sn).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(cust_only).orderBy("tag", "nationkey")


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family coverage (lower is directly exercised by the
    reference at dags/yfinance_to_minio.py:46)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.lower("p_name").alias("lname"),
            F.upper("p_brand").alias("ubrand"),
            F.substring("p_type", 1, 3).alias("type3"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
            F.trim(F.lit("  x  ")).alias("trimmed"),
        )
        .orderBy("p_partkey")
        .limit(50)
    )


def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time-function family: year/month/quarter/dow/date_trunc
    (DATE(ts) is exercised by the reference at RUNBOOK.md:128)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.quarter("o_orderdate").cast("long").alias("q"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "sum_price"),
            F.countDistinct(F.dayofweek("o_orderdate")).alias("n_dows"),
            F.min(F.to_date(F.date_trunc("month", "o_orderdate"))).alias(
                "month_start"
            ),
        )
        .orderBy("y", "q", "m")
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast join —
    PROMO revenue share per ship-year."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(dsum(promo, "promo_rev"), dsum(revenue, "total_rev"))
        .withColumn("promo_share", F.col("promo_rev") / F.col("total_rev"))
        .orderBy("ship_year")
    )


_SCALAR_SUBQUERY_SQL = f"""
    SELECT o_orderstatus, COUNT(*) AS n, {sql_davg("o_totalprice")} AS avg_price
    FROM orders
    WHERE o_totalprice > (SELECT {sql_davg("o_totalprice")} FROM orders)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate — same SQL text on both engines; the
    deterministic avg makes the threshold bit-identical so the selected row
    set matches exactly."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQUERY_SQL)


def theta_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join component: unordered nation pairs per region."""
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_regionkey").alias("regionkey"),
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
        )
        .orderBy("regionkey", "nation_a", "nation_b")
    )


def distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate under Catalyst."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type value sums as columns."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(F.col("value").cast(_DEC)).cast("double"))
        .orderBy("user_id")
    )


def filter_predicates_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / LIKE predicate coverage (all pushdown-eligible)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_size").between(10, 30)
            & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4")
            & F.col("p_name").like("%red%")
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), davg("p_retailprice", "avg_price"))
        .orderBy("p_brand")
    )


def having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: GROUP BY + HAVING on an aggregate, then top-K join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "sum_qty")
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


QUERIES = {
    "b01_tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "b02_topk_revenue_orders": topk_revenue_orders,
    "b03_star_join_revenue_by_nation": star_join_revenue_by_nation,
    "b04_semi_join_big_spenders": semi_join_big_spenders,
    "b05_anti_join_small_spenders": anti_join_small_spenders,
    "b06_window_ma7_daily_value": window_ma7_daily_value,
    "b07_lag_delta_per_user": lag_delta_per_user,
    "b08_topk_orders_per_customer": topk_orders_per_customer,
    "b09_rollup_lineitem_status": rollup_lineitem_status,
    "b10_cube_orders_status_priority": cube_orders_status_priority,
    "b11_grouping_sets_orders": grouping_sets_orders,
    "b12_setops_nations": setops_nations,
    "b13_scalar_string_funcs": scalar_string_funcs,
    "b14_date_funcs_orders": date_funcs_orders,
    "b15_promo_revenue_share": promo_revenue_share,
    "b16_above_avg_orders": above_avg_orders,
    "b17_theta_join_nation_pairs": theta_join_nation_pairs,
    "b18_distinct_customers_per_status": distinct_customers_per_status,
    "b19_pivot_event_values": pivot_event_values,
    "b20_filter_predicates_parts": filter_predicates_parts,
    "b21_having_big_orders": having_big_orders,
}

ORACLES = {
    "b01_tpch_q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum("l_quantity")} AS sum_qty,
               {sql_dsum("l_extendedprice")} AS sum_base_price,
               {sql_dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
               {sql_davg("l_quantity")} AS avg_qty,
               {sql_davg("l_extendedprice")} AS avg_price,
               {sql_davg("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "b02_topk_revenue_orders": f"""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
               {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "b03_star_join_revenue_by_nation": f"""
        SELECT n_name, {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "b04_semi_join_big_spenders": """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "b05_anti_join_small_spenders": """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey
    """,
    "b06_window_ma7_daily_value": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   {sql_davg("value")} AS daily_avg
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        )
        SELECT event_type, d, daily_avg,
               CAST(SUM(CAST(daily_avg AS DECIMAL({PRECISION},{SCALE})))
                    OVER w AS DOUBLE)
               / CAST(COUNT(daily_avg) OVER w AS DOUBLE) AS ma7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY event_type, d
    """,
    "b07_lag_delta_per_user": """
        WITH deltas AS (
            SELECT user_id,
                   value - LAG(value) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS delta
            FROM events
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
               CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
        FROM deltas GROUP BY user_id ORDER BY user_id
    """,
    "b08_topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    "b09_rollup_lineitem_status": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "b10_cube_orders_status_priority": f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n, {sql_dsum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "b11_grouping_sets_orders": _GROUPING_SETS_SQL,
    "b12_setops_nations": """
        SELECT nationkey, 'both' AS tag FROM (
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        )
        UNION ALL
        SELECT nationkey, 'cust_only' AS tag FROM (
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        )
        ORDER BY tag, nationkey
    """,
    "b13_scalar_string_funcs": """
        SELECT p_partkey,
               LOWER(p_name) AS lname,
               UPPER(p_brand) AS ubrand,
               SUBSTRING(p_type, 1, 3) AS type3,
               LENGTH(p_name) AS name_len,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
               TRIM('  x  ') AS trimmed
        FROM part ORDER BY p_partkey LIMIT 50
    """,
    "b14_date_funcs_orders": f"""
        SELECT EXTRACT(year FROM o_orderdate) AS y,
               EXTRACT(quarter FROM o_orderdate) AS q,
               EXTRACT(month FROM o_orderdate) AS m,
               COUNT(*) AS n,
               {sql_dsum("o_totalprice")} AS sum_price,
               COUNT(DISTINCT EXTRACT(dow FROM o_orderdate) + 1) AS n_dows,
               MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_start
        FROM orders GROUP BY 1, 2, 3 ORDER BY y, q, m
    """,
    "b15_promo_revenue_share": f"""
        SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
               {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_rev,
               {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_rev,
               {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
                 / {sql_dsum("l_extendedprice * (1 - l_discount)")} AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1 ORDER BY ship_year
    """,
    "b16_above_avg_orders": _SCALAR_SUBQUERY_SQL,
    "b17_theta_join_nation_pairs": """
        SELECT n1.n_regionkey AS regionkey, n1.n_name AS nation_a,
               n2.n_name AS nation_b
        FROM nation n1 JOIN nation n2
          ON n1.n_regionkey = n2.n_regionkey
         AND n1.n_nationkey < n2.n_nationkey
        ORDER BY regionkey, nation_a, nation_b
    """,
    "b18_distinct_customers_per_status": """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "b19_pivot_event_values": f"""
        SELECT user_id,
               {sql_dsum("CASE WHEN event_type = 'click' THEN value END")} AS click,
               {sql_dsum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
               {sql_dsum("CASE WHEN event_type = 'view' THEN value END")} AS view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "b20_filter_predicates_parts": f"""
        SELECT p_brand, COUNT(*) AS n, {sql_davg("p_retailprice")} AS avg_price
        FROM part
        WHERE p_size BETWEEN 10 AND 30
          AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4')
          AND p_name LIKE '%red%'
        GROUP BY p_brand ORDER BY p_brand
    """,
    "b21_having_big_orders": f"""
        WITH big AS (
            SELECT l_orderkey, {sql_dsum("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING {sql_dsum("l_quantity")} > 150
        )
        SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
        FROM big JOIN orders ON l_orderkey = o_orderkey
        ORDER BY sum_qty DESC, o_orderkey ASC LIMIT 20
    """,
}
