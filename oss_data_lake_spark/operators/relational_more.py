"""Tier B (continued) — deeper TPC-H query shapes and function families:
correlated-aggregate subqueries, outer-join distributions, exact
percentiles, ordered array aggregation, date-interval arithmetic
(SURVEY.md §2.B — all capability the reference exposes through Trino 467).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import davg, dsum, sql_davg, sql_dsum
from oss_data_lake_spark.sources.loaders import load_table


def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with date-interval arithmetic — orders having
    at least one lineitem shipped >60 days after the order date, counted
    per priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation — how many
    customers placed 0, 1, 2, ... non-urgent orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_count"))
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average — revenue from
    lineitems below half their part's average quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        li.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "total_price"),
        )
    )


def acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Trino offers approx+exact percentile; Spark's
    ``percentile`` is exact with linear interpolation, DuckDB's
    ``quantile_cont`` matches)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("median_bal"),
            F.round(F.expr("percentile(c_acctbal, 0.9)"), 6).alias("p90_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


def nations_per_region_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation (collect_list + sort_array → deterministic
    CSV string; DuckDB string_agg ORDER BY)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


def revenue_per_supplier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier revenue + rank/dense_rank over the whole
    frame (single-partition window — fine for a supplier-cardinality frame;
    at 100 TB this would be a two-phase top-k instead)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(dsum(revenue, "total_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("total_revenue"), F.asc("s_suppkey"))
    return (
        per_supp.withColumn("revenue_rank", F.rank().over(w).cast("long"))
        .withColumn("revenue_dense_rank", F.dense_rank().over(w).cast("long"))
        .select("s_suppkey", "s_name", "total_revenue", "revenue_rank",
                "revenue_dense_rank")
        .orderBy("revenue_rank", "s_suppkey")
    )


def top_suppliers_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB-safe global top-k: aggregate → orderBy+limit (planned as
    TakeOrderedAndProject: per-partition heaps + driver merge of k rows) →
    rank the k survivors. Contrast with ``b28``'s full-frame rank window,
    which funnels every group through one partition. Plan pinned in
    tests/test_plans.py."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    top = (
        li.groupBy("l_suppkey")
        .agg(dsum(revenue, "total_revenue"))
        .orderBy(F.desc("total_revenue"), F.asc("l_suppkey"))
        .limit(10)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("total_revenue"), F.asc("l_suppkey"))
    return top.withColumn("revenue_rank", F.row_number().over(w).cast("long")).select(
        "l_suppkey", "total_revenue", "revenue_rank"
    )


# Window frame EXCLUDE (SQL:2011 <window frame exclusion>; Trino 467
# supports EXCLUDE CURRENT ROW | GROUP | TIES | NO OTHERS). Spark has no
# EXCLUDE mode, but over a RANGE frame with non-negative bounds the
# excluded sets are always fully INSIDE the frame (the current row sits
# at distance 0; its peers at distance 0), so each mode is an exact
# subtraction of window aggregates:
#   EXCLUDE CURRENT ROW:  frame_agg - current_row_contribution
#   EXCLUDE GROUP:        frame_agg - peer_group_agg
#                         (peer group = RANGE CURRENT ROW..CURRENT ROW)
#   EXCLUDE TIES:         frame_agg - peer_group_agg + current_row
# with ANSI empty-set semantics restored by a count guard (sum over an
# emptied frame is NULL, not 0). All three stay single-pass Catalyst
# window functions over ONE partition exchange — no self-join. The
# DuckDB oracle evaluates the NATIVE EXCLUDE spellings, so the
# subtraction identities themselves are what cross-engine parity
# verifies. NULL measures are planted (m NULL on orderkey%5=0) so the
# count-vs-sum distinction and the empty-frame guard are value-checked.
_B57_BASE = """
  SELECT o_custkey, o_orderkey,
         CAST(o_orderkey % 11 AS BIGINT) AS od,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE CAST(o_orderkey % 97 AS BIGINT) END AS m
  FROM {orders} WHERE o_custkey % 31 = 0
"""

_B57_SPARK_SQL = """
WITH base AS ({base}),
w AS (
  SELECT o_custkey, o_orderkey, m,
    CAST(sum(m) OVER (PARTITION BY o_custkey ORDER BY od
         RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS fsum,
    CAST(count(m) OVER (PARTITION BY o_custkey ORDER BY od
         RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS fcnt,
    CAST(sum(m) OVER (PARTITION BY o_custkey ORDER BY od
         RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) AS psum,
    CAST(count(m) OVER (PARTITION BY o_custkey ORDER BY od
         RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) AS pcnt
  FROM base
)
SELECT o_custkey, o_orderkey,
  CAST(fcnt - CASE WHEN m IS NULL THEN 0 ELSE 1 END AS BIGINT)
    AS cnt_x_cur,
  CAST(CASE WHEN fcnt - CASE WHEN m IS NULL THEN 0 ELSE 1 END = 0
            THEN NULL
            ELSE COALESCE(fsum, 0) - COALESCE(m, 0) END AS BIGINT)
    AS sum_x_cur,
  CAST(fcnt - pcnt AS BIGINT) AS cnt_x_grp,
  CAST(CASE WHEN fcnt - pcnt = 0 THEN NULL
            ELSE COALESCE(fsum, 0) - COALESCE(psum, 0) END AS BIGINT)
    AS sum_x_grp,
  CAST(fcnt - pcnt + CASE WHEN m IS NULL THEN 0 ELSE 1 END AS BIGINT)
    AS cnt_x_ties,
  CAST(CASE WHEN fcnt - pcnt + CASE WHEN m IS NULL THEN 0 ELSE 1 END = 0
            THEN NULL
            ELSE COALESCE(fsum, 0) - COALESCE(psum, 0) + COALESCE(m, 0)
       END AS BIGINT) AS sum_x_ties
FROM w ORDER BY o_custkey, o_orderkey
"""

_B57_DUCK_SQL = """
WITH base AS ({base})
SELECT o_custkey, o_orderkey,
  CAST(count(m) OVER (PARTITION BY o_custkey ORDER BY od
       RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
       EXCLUDE CURRENT ROW) AS BIGINT) AS cnt_x_cur,
  CAST(sum(m) OVER (PARTITION BY o_custkey ORDER BY od
       RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
       EXCLUDE CURRENT ROW) AS BIGINT) AS sum_x_cur,
  CAST(count(m) OVER (PARTITION BY o_custkey ORDER BY od
       RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
       EXCLUDE GROUP) AS BIGINT) AS cnt_x_grp,
  CAST(sum(m) OVER (PARTITION BY o_custkey ORDER BY od
       RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
       EXCLUDE GROUP) AS BIGINT) AS sum_x_grp,
  CAST(count(m) OVER (PARTITION BY o_custkey ORDER BY od
       RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
       EXCLUDE TIES) AS BIGINT) AS cnt_x_ties,
  CAST(sum(m) OVER (PARTITION BY o_custkey ORDER BY od
       RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
       EXCLUDE TIES) AS BIGINT) AS sum_x_ties
FROM base ORDER BY o_custkey, o_orderkey
"""


def window_frame_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 window frame EXCLUDE modes as exact aggregate
    subtractions (derivation and scale notes in the block comment above
    ``_B57_BASE``); the DuckDB oracle runs the native EXCLUDE text."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        _B57_SPARK_SQL.format(base=_B57_BASE.format(orders="orders"))
    )


# SQL:2016 SQL/JSON functions (json_value / json_query / json_exists —
# Trino 467). The Spark side issues the TRINO SPELLINGS through
# Engine.sql (the statement layer maps them onto get_json_object,
# `engine.py:_translate_sql_json`, deviations documented there); the
# DuckDB oracle uses its native json_extract machinery. The document is
# BUILT from columns (nested object + array + the real events.props
# field), so path navigation, RETURNING casts, and exists/missing all
# carry engine-computed values. All outputs are integers/strings —
# bit-exact cross-engine.
_B58_TRINO_SQL = """
WITH j AS (
  SELECT event_id,
         concat('{{"u": ', CAST(user_id AS STRING),
                ', "obj": {{"t": "', event_type, '"}}',
                ', "arr": [', CAST(event_id % 5 AS STRING), ', ',
                CAST(user_id % 7 AS STRING), ']}}') AS doc,
         props
  FROM {events} WHERE event_id % 199 = 0
)
SELECT event_id,
  json_value(doc, 'lax $.u' RETURNING BIGINT) AS u,
  json_value(doc, '$.obj.t') AS tag,
  json_query(doc, '$.obj') AS obj_json,
  json_query(doc, 'lax $.arr') AS arr_json,
  CAST(CASE WHEN json_exists(doc, '$.obj.t') THEN 1 ELSE 0 END
       AS BIGINT) AS has_t,
  CAST(CASE WHEN json_exists(doc, '$.missing') THEN 1 ELSE 0 END
       AS BIGINT) AS has_missing,
  json_value(props, '$.k' RETURNING BIGINT) AS prop_k
FROM j ORDER BY event_id
"""

_B58_DUCK_SQL = """
WITH j AS (
  SELECT event_id,
         concat('{{"u": ', CAST(user_id AS VARCHAR),
                ', "obj": {{"t": "', event_type, '"}}',
                ', "arr": [', CAST(event_id % 5 AS VARCHAR), ', ',
                CAST(user_id % 7 AS VARCHAR), ']}}') AS doc,
         props
  FROM {events} WHERE event_id % 199 = 0
)
SELECT event_id,
  CAST(json_extract_string(doc, '$.u') AS BIGINT) AS u,
  json_extract_string(doc, '$.obj.t') AS tag,
  CAST(json_extract(doc, '$.obj') AS VARCHAR) AS obj_json,
  CAST(json_extract(doc, '$.arr') AS VARCHAR) AS arr_json,
  CAST(CASE WHEN json_extract(doc, '$.obj.t') IS NOT NULL
       THEN 1 ELSE 0 END AS BIGINT) AS has_t,
  CAST(CASE WHEN json_extract(doc, '$.missing') IS NOT NULL
       THEN 1 ELSE 0 END AS BIGINT) AS has_missing,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM j ORDER BY event_id
"""


# b59 (round 13): the Trino scalar-function DIALECT — the spellings
# BI-generated Trino SQL actually contains (reference RUNBOOK.md:120-123)
# — issued VERBATIM through Engine.sql and translated by
# `Engine._translate_trino_functions` / `_translate_at_time_zone`:
# date_diff/date_add unit forms → timestampdiff/timestampadd, strpos →
# locate (argument order swap), format_datetime → date_format (shared
# Joda/Spark pattern subset), regexp_like (native), AT TIME ZONE →
# convert_timezone (the non-UTC day-bucketing the reference dashboards
# group by). The nested `date_diff('minute', ts, date_add('hour', 2,
# ts))` term pins translator composability. Only exact-elapsed units
# (hour/day/minute) ride the oracle hash — DuckDB's `datesub` shares
# their complete-intervals semantics bit-exactly; the month-end
# unit semantics are pinned separately in tests/test_trino_dialect.py.
# approx_distinct stays OUT of the hash (sketches differ across
# engines); its accuracy bound is pinned in the same test file.
#
# min_fmt is spelled format_datetime(min(ts), ...) rather than
# min(format_datetime(ts, ...)) (r15, guide §1.2): the two are
# value-identical because 'yyyy-MM-dd HH' is zero-padded in every
# component, so its lexicographic order IS chronological order and the
# min commutes with the (monotone) formatting. The min(string) spelling
# forced the WHOLE aggregate into SortAggregate (a string-buffered
# declarative min has no mutable fixed-width buffer), paying three
# full-table sorts; with only long/date/timestamp buffers the plan is
# a HashAggregate end to end — ABBA 1.142 -> 0.570 s at sf0.1, rows
# identical, DuckDB oracle text untouched.
_B59_TRINO_SQL = """
SELECT event_type AS etype,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts))
       AS BIGINT) AS sum_hours,
  CAST(sum(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts))
       AS BIGINT) AS sum_days,
  CAST(sum(strpos(event_type, 'e')) AS BIGINT) AS sum_pos,
  CAST(sum(CASE WHEN regexp_like(event_type, '^[a-z_]+$')
           THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
  CAST(sum(date_diff('minute', ts, date_add('hour', 2, ts)))
       AS BIGINT) AS sum_min120,
  format_datetime(min(ts), 'yyyy-MM-dd HH') AS min_fmt,
  min(CAST(ts AT TIME ZONE 'America/New_York' AS DATE)) AS min_ny_date,
  CAST(count(DISTINCT CAST(ts AT TIME ZONE 'Asia/Kolkata' AS DATE))
       AS BIGINT) AS n_kolkata_days,
  CAST(min(unix_micros(date_add('minute', 90, ts))) AS BIGINT)
       AS min_shift_us
FROM {events}
GROUP BY event_type
"""

# DuckDB's exact twins: `datesub` = complete elapsed intervals (DuckDB's
# `datediff` counts BOUNDARY crossings — the argument-semantics trap the
# differential matrix in tests/test_trino_dialect.py pins); naive→zone
# wall-clock rebasing is the (ts AT TIME ZONE 'UTC') AT TIME ZONE z
# double application (Postgres/DuckDB direction rules).
_B59_DUCK_SQL = """
SELECT event_type AS etype,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(datesub('hour', TIMESTAMP '2024-01-01 00:00:00', ts))
       AS BIGINT) AS sum_hours,
  CAST(sum(datesub('day', TIMESTAMP '2024-01-01 00:00:00', ts))
       AS BIGINT) AS sum_days,
  CAST(sum(strpos(event_type, 'e')) AS BIGINT) AS sum_pos,
  CAST(sum(CASE WHEN regexp_matches(event_type, '^[a-z_]+$')
           THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
  CAST(sum(datesub('minute', ts, ts + INTERVAL 2 HOUR))
       AS BIGINT) AS sum_min120,
  min(strftime(ts, '%Y-%m-%d %H')) AS min_fmt,
  min(CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York'
       AS DATE)) AS min_ny_date,
  CAST(count(DISTINCT CAST((ts AT TIME ZONE 'UTC')
       AT TIME ZONE 'Asia/Kolkata' AS DATE)) AS BIGINT) AS n_kolkata_days,
  CAST(min(epoch_us(ts + INTERVAL 90 MINUTE)) AS BIGINT) AS min_shift_us
FROM {events}
GROUP BY event_type
"""


# b60 (round 13, phase 2): the Trino date-part/epoch/convenience family
# — day_of_week (ISO Mon=1, NOT Spark's Sun=1 dayofweek), day_of_year,
# week, year_of_week (ISO week-year rollover), day_of_month,
# to_unixtime (DOUBLE epoch seconds — both engines compute
# micros/1000000.0, bit-identical IEEE), date_parse (%-directives,
# DuckDB strptime shares them natively), format (printf; DuckDB twin is
# printf()). All issued in Trino spellings through Engine.sql.
_B60_TRINO_SQL = """
SELECT o_orderpriority AS pri,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(day_of_week(o_orderdate)) AS BIGINT) AS sum_dow,
  CAST(sum(day_of_year(o_orderdate)) AS BIGINT) AS sum_doy,
  CAST(sum(week(o_orderdate)) AS BIGINT) AS sum_week,
  CAST(sum(year_of_week(o_orderdate)) AS BIGINT) AS sum_yow,
  CAST(sum(day_of_month(o_orderdate)) AS BIGINT) AS sum_dom,
  min(to_unixtime(o_orderdate)) AS min_epoch,
  CAST(min(date_parse(format_datetime(o_orderdate, 'yyyy-MM-dd'),
                      '%Y-%m-%d')) AS DATE) AS min_day_ts,
  min(format('%s|%d', o_orderpriority, day_of_month(o_orderdate)))
      AS min_fmt
FROM {orders}
GROUP BY o_orderpriority
"""

_B60_DUCK_SQL = """
SELECT o_orderpriority AS pri,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(isodow(o_orderdate)) AS BIGINT) AS sum_dow,
  CAST(sum(dayofyear(o_orderdate)) AS BIGINT) AS sum_doy,
  CAST(sum(weekofyear(o_orderdate)) AS BIGINT) AS sum_week,
  CAST(sum(isoyear(o_orderdate)) AS BIGINT) AS sum_yow,
  CAST(sum(day(o_orderdate)) AS BIGINT) AS sum_dom,
  min(epoch_us(o_orderdate) / 1000000.0) AS min_epoch,
  CAST(min(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'))
       AS DATE) AS min_day_ts,
  min(printf('%s|%d', o_orderpriority, day(o_orderdate))) AS min_fmt
FROM {orders}
GROUP BY o_orderpriority
"""


def trino_datepart_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phase-2 Trino dialect family (date parts / epoch /
    date_parse / format) issued verbatim through Engine.sql. Same scale
    shape as b59: one pruned scan, one hash aggregate, all translated
    functions JVM-side."""
    from oss_data_lake_spark.engine import Engine

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "b60_orders"
    )
    return Engine(spark=spark).sql(
        _B60_TRINO_SQL.format(orders="b60_orders")
    )


def trino_dialect_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Trino scalar-function dialect surface, issued verbatim as a
    BI tool would (reference RUNBOOK.md:120-123) and translated by the
    statement layer. One scan, one hash aggregate over 5 groups — every
    translated function evaluates JVM-side inside the aggregate (no
    Python, no extra exchange): the plan is a single
    partial-agg/exchange/final-agg over the parquet scan."""
    from oss_data_lake_spark.engine import Engine

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return Engine(spark=spark).sql(_B59_TRINO_SQL.format(events="events"))


def sql_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 SQL/JSON functions issued in their TRINO spellings and
    routed through the statement layer's mapping onto Spark's JSON
    machinery (`Engine._translate_sql_json`)."""
    from oss_data_lake_spark.engine import Engine

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return Engine(spark=spark).sql(_B58_TRINO_SQL.format(events="events"))


def quantified_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified subquery comparisons (ANSI §8.9 — Trino 467 supports
    `op ANY/SOME/ALL (subquery)`, reference capability via arbitrary BI
    SQL, `README.md:97-98`), expressed Spark-first:

    - `s_acctbal > ALL (per-nation customer balances)` → the correlated
      ALL collapses to a 25-row (max, seen) aggregate of customer,
      BROADCAST left-joined to supplier (ALL over an empty set is TRUE →
      unmatched nations count);
    - `p_retailprice < SOME (Brand#13 prices)` → the uncorrelated SOME
      collapses to one scalar max, broadcast as a literal-like 1-row
      cross join;
    - `s_nationkey = ANY (region-3 nations)` → a LEFT SEMI join.

    Each family is the plan you'd want at 100 TB: the quantifier side is
    always reduced to an aggregate before it meets the big side — never a
    per-row subquery. All three measures are integer counts over
    comparisons of byte-identical parquet doubles (bit-exact
    cross-engine). The SQL-surface twin — the statement-layer
    `op ANY/ALL` rewrite in ``Engine._translate_quantified`` — is
    differentially checked against DuckDB's native ANSI evaluation
    (incl. NULL semantics) in ``tests/test_quantified.py``."""
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")

    nat_max = cust.groupBy("c_nationkey").agg(
        F.max("c_acctbal").alias("mx"), F.count(F.lit(1)).alias("ncust")
    )
    above_all = (
        sup.join(
            F.broadcast(nat_max),
            F.col("s_nationkey") == F.col("c_nationkey"),
            "left",
        )
        .filter(F.col("ncust").isNull() | (F.col("s_acctbal") > F.col("mx")))
        .agg(F.count(F.lit(1)).alias("n_above_all"))
    )
    brand_max = part.filter(F.col("p_brand") == "Brand#13").agg(
        F.max("p_retailprice").alias("bmx")
    )
    lt_some = (
        part.crossJoin(F.broadcast(brand_max))
        .filter(F.col("p_retailprice") < F.col("bmx"))
        .agg(F.count(F.lit(1)).alias("n_lt_some"))
    )
    eq_any = (
        sup.join(
            F.broadcast(
                nation.filter(F.col("n_regionkey") == 3)
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        ).agg(F.count(F.lit(1)).alias("n_eq_any"))
    )
    return above_all.crossJoin(lt_some).crossJoin(eq_any).select(
        F.col("n_above_all").cast("long").alias("n_above_all"),
        F.col("n_lt_some").cast("long").alias("n_lt_some"),
        F.col("n_eq_any").cast("long").alias("n_eq_any"),
    )


def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-window family: ntile / percent_rank / cume_dist
    / first_value / last_value, fully deterministic via custkey tiebreak.
    percent_rank and cume_dist are exact rank fractions (single double
    division) so they hash-match across engines."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first("c_custkey").over(wf).alias("richest_custkey"),
            F.last("c_custkey").over(wf).alias("poorest_custkey"),
        )
        .filter(F.col("c_custkey") < 200)
        .orderBy("c_mktsegment", "c_custkey")
    )


def math_funcs_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar-function family: sqrt/log/exp/pow/floor/ceil/sign/mod —
    rounded to 9 dp (libm implementations may differ in the last ulp)."""
    part = load_table(spark, sf_dir, "part")
    p = F.col("p_retailprice")
    return (
        part.select(
            "p_partkey",
            F.round(F.sqrt(p), 9).alias("sqrt_price"),
            F.round(F.log(p), 9).alias("ln_price"),
            F.round(F.log10(p), 9).alias("log10_price"),
            F.round(F.pow(p, F.lit(0.3)), 9).alias("pow_price"),
            F.floor(p).cast("long").alias("floor_price"),
            F.ceil(p).cast("long").alias("ceil_price"),
            (F.col("p_size") % 7).alias("size_mod7"),
            F.signum(p - 1000.0).alias("sign_vs_1000"),  # double; oracle casts to match
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram via integer bucketing (floor division — exact in both
    engines), the standard OLAP distribution probe."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50).cast("long")
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), davg("value", "avg_value"))
        .orderBy("bucket")
    )


_CORRELATED_SCALAR_SQL = """
    SELECT n_name,
           (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
               AS n_customers,
           (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)
               AS n_suppliers
    FROM nation
    ORDER BY n_name
"""


def correlated_scalar_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — Catalyst rewrites
    them to left outer aggregates; same SQL text runs on both engines."""
    for t in ("nation", "customer", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CORRELATED_SCALAR_SQL)


def multiset_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset semantics (duplicates counted),
    the variant plain INTERSECT/EXCEPT (b12) can't express."""
    li = load_table(spark, sf_dir, "lineitem")
    p_side = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    o_side = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    inter = p_side.intersectAll(o_side).withColumn("tag", F.lit("intersect_all"))
    exc = p_side.exceptAll(o_side).withColumn("tag", F.lit("except_all"))
    return (
        inter.unionByName(exc)
        .groupBy("tag", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("tag", "l_suppkey")
    )


def epoch_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/timestamp conversion family at microsecond grain (exact integer
    copies — no float time arithmetic)."""
    events = load_table(spark, sf_dir, "events")
    micros = F.unix_micros("ts")
    return (
        events.groupBy("event_type")
        .agg(
            F.min(micros).alias("min_us"),
            F.max(micros).alias("max_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("min_day", F.to_date(F.timestamp_micros("min_us")))
        .orderBy("event_type")
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics family: nullif/coalesce, COUNT(*) vs COUNT(col),
    null-safe grouping of derived nulls."""
    orders = load_table(spark, sf_dir, "orders")
    masked = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        orders.select(
            masked.alias("status_np"),
            F.coalesce(masked, F.lit("(pending)")).alias("status_filled"),
        )
        .groupBy("status_np", "status_filled")
        .agg(F.count(F.lit(1)).alias("n_star"), F.count("status_np").alias("n_col"))
        .orderBy(F.col("status_np").asc_nulls_first())
    )


def most_frequent_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino ``approx_most_frequent`` surface, exact formulation: top-10
    heavy-hitter part keys by lineitem count, partkey tiebreak. The plan is
    partial+final hash agg then TakeOrdered (k rows per partition — no
    global sort, no single-partition window), so it holds at any part-key
    cardinality; the approximate path (``DataFrame.stat.freqItems``,
    Karp-Papadimitriou-Shenker one-pass heavy hitters) is pytest-pinned to
    contain the exact set on skewed data."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("l_partkey"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("l_partkey"))
    return top.withColumn(
        "hh_rank", F.row_number().over(w).cast("long")
    ).orderBy("hh_rank")


def salted_hot_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b38: skew-safe per-user aggregate via explicit two-phase salting
    (``functions/skew.py``): partial agg on (user_id, salt) spreads any hot
    user over 16 reducers, final agg on user_id combines partials. The
    events fixture's user_id distribution is skewed, making this the
    registry query that exercises the salted path end-to-end; results are
    provably identical to the direct aggregation (the oracle IS the direct
    form), and the plan pin (tests/test_plans.py) asserts the salt stage
    is really there. At 100 TB this is the aggregation-skew answer for the
    cases AQE's skew handling doesn't cover (AQE splits skewed JOIN
    partitions, not skewed aggregation keys)."""
    from oss_data_lake_spark.functions.skew import salted_agg_count_sum

    events = load_table(spark, sf_dir, "events")
    return salted_agg_count_sum(
        events.select("user_id", "value"), "user_id", "value"
    ).orderBy("user_id")


_B50_SQL = """
WITH RECURSIVE tree(user_id, depth) AS (
    SELECT CAST(0 AS BIGINT) AS user_id, CAST(0 AS BIGINT) AS depth
    UNION ALL
    SELECT u.user_id, c.depth + CAST(1 AS BIGINT)
    FROM {users} u
    JOIN (SELECT {children} AS child, depth FROM tree) c
      ON u.user_id = c.child
)
SELECT t.depth,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sum_value} AS sum_value
FROM tree t JOIN {events} e ON e.user_id = t.user_id
GROUP BY t.depth ORDER BY t.depth
"""


def recursive_user_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b50 (round 10): ANSI ``WITH RECURSIVE`` — the last Tier-B SQL
    family the reference's declared query layer supports that the repo
    lacked (Trino 467 evaluates recursive CTEs for BI hierarchy
    queries; reference docker-compose.yaml:153, arbitrary BI SQL per
    RUNBOOK.md:120-123). Spark 4.x evaluates recursive CTEs natively
    (UnionLoop), so the query is pure declarative SQL — no driver-side
    iteration.

    Shape: an org-chart walk over the USER dimension (children of user
    u are 2u+1 and 2u+2, rooted at 0 — the classic hierarchy
    traversal), then ONE join of the resulting closure to the events
    fact, aggregating per depth. 100-TB design: the user DIMENSION is
    materialized (cached) ONCE before the loop — UnionLoop would
    otherwise rescan the fact table per iteration to recompute the
    DISTINCT — so each recursion step is a dimension-sized join and
    the 100-TB fact joins ONCE against the final closure
    (broadcastable — closure is dimension-sized), never inside the
    loop. Measured 2x at sf0.1 vs the DISTINCT-in-loop formulation.

    r15 (guide §3): the recursive step's join condition was
    ``u = 2t+1 OR u = 2t+2`` — no equi keys, so every iteration planned
    a nested-loop join (frontier × dimension comparisons). Exploding
    each frontier row into its two child ids makes the step a hash
    EQUI-join (per-step cost dimension + frontier): identical closure
    rows (a (u, t) pair can satisfy at most one disjunct), identical
    iteration count, oracle green; wall flat at sf0.1's 1,500-user
    dimension — the fix is the join's scale shape, not a local win."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("b50_events")
    # materialize the dimension before the loop as an eager
    # localCheckpoint, NOT cache(): a cache() entry lives in the
    # CacheManager until an explicit unpersist that a queries()-contract
    # callable has no hook to issue (round-10 ADVICE: bench loops
    # accumulated pinned storage); checkpoint blocks are released by the
    # ContextCleaner once the returned DataFrame is unreachable
    users = (
        events.select("user_id").distinct().localCheckpoint(eager=True)
    )
    users.createOrReplaceTempView("b50_users")
    return spark.sql(
        _B50_SQL.format(
            users="b50_users",
            events="b50_events",
            children="explode(array(2 * user_id + 1, 2 * user_id + 2))",
            sum_value=sql_dsum("value"),
        )
    )


_B51_SQL = """
SELECT o.o_orderkey, l.l_linenumber, l.price2
FROM (SELECT o_orderkey FROM {orders} WHERE o_orderkey % 97 = 0) o,
LATERAL (
  SELECT l_linenumber, CAST(l_extendedprice AS DECIMAL(18,2)) AS price2
  FROM {lineitem}
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber
  LIMIT 2
) l
ORDER BY o.o_orderkey, l.price2 DESC, l.l_linenumber
"""


def lateral_topn_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b51 (round 10): ANSI LATERAL join with a correlated ORDER BY ...
    LIMIT inner query — the per-row top-n idiom Trino BI users write
    instead of a window (`FROM orders o, LATERAL (SELECT ... WHERE
    l_orderkey = o.o_orderkey ORDER BY ... LIMIT 2)`). Spark 4.x plans
    the correlated LIMIT natively (de-correlated to a ranked join);
    DuckDB runs the identical text as the oracle. Decimal price keeps
    the cross-engine values exact."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("b51_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "b51_lineitem"
    )
    return spark.sql(
        _B51_SQL.format(orders="b51_orders", lineitem="b51_lineitem")
    )


# b52: SQL window completeness — IGNORE NULLS navigation + GROUPS frames.
# The SELECT body is shared between engines ({ign} abstracts the two
# IGNORE NULLS spellings: Spark takes the ANSI postfix `lag(px) IGNORE
# NULLS`, DuckDB 1.0 only parses the inner `lag(px IGNORE NULLS)`); the
# GROUPS-frame aggregate is pre-computed per engine ({groups_src}) since
# DuckDB 1.0 has no GROUPS mode at all — Spark rewrites it to the exact
# dense_rank + RANGE equivalent (a GROUPS frame of N peer groups IS a
# RANGE of N over the dense_rank of the order key), and the oracle
# re-derives it with an INDEPENDENT join-based formulation, so the
# rewrite's semantics (not just its arithmetic) are what's verified.
_B52_SQL = """
WITH base AS (
  SELECT o_custkey, o_orderkey,
         o_orderkey % 7 AS grp_key,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS px
  FROM {orders} WHERE o_custkey % 97 = 0
),
ranked AS (
  SELECT base.*, dense_rank()
    OVER (PARTITION BY o_custkey ORDER BY grp_key) AS dr
  FROM base
),
grp AS (
{groups_src}
)
SELECT r.o_custkey, r.o_orderkey,
  {lag_ign} OVER (PARTITION BY r.o_custkey ORDER BY r.o_orderkey)
      AS prev_px,
  {lead_ign} OVER (PARTITION BY r.o_custkey ORDER BY r.o_orderkey)
      AS next_px,
  {first_ign} OVER (PARTITION BY r.o_custkey ORDER BY r.o_orderkey)
      AS first_px,
  {last_ign} OVER (PARTITION BY r.o_custkey ORDER BY r.o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_last_px,
  {nth_ign} OVER (PARTITION BY r.o_custkey ORDER BY r.o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_px,
  g.grp_sum, g.grp_cnt
FROM ranked r JOIN grp g
  ON g.o_custkey = r.o_custkey AND g.o_orderkey = r.o_orderkey
ORDER BY r.o_custkey, r.o_orderkey
"""

# Spark: the GROUPS frame, rewritten to RANGE over dense_rank (dr is a
# dense integer, so RANGE 1 PRECEDING..1 FOLLOWING over dr covers
# exactly the previous/current/next PEER GROUPS of grp_key)
_B52_GROUPS_SPARK = """
  SELECT o_custkey, o_orderkey,
         CAST(sum(px) OVER (PARTITION BY o_custkey ORDER BY dr
              RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
              AS DECIMAL(18,2)) AS grp_sum,
         CAST(count(px) OVER (PARTITION BY o_custkey ORDER BY dr
              RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
              AS BIGINT) AS grp_cnt
  FROM ranked
"""

# DuckDB: GROUPS semantics from first principles — every cluster-mate
# row whose peer-group index is within 1, via a join (independent of
# both GROUPS mode and the RANGE rewrite)
_B52_GROUPS_DUCK = """
  SELECT a.o_custkey, a.o_orderkey,
         CAST(sum(b.px) AS DECIMAL(18,2)) AS grp_sum,
         CAST(count(b.px) AS BIGINT) AS grp_cnt
  FROM ranked a JOIN ranked b
    ON b.o_custkey = a.o_custkey AND abs(b.dr - a.dr) <= 1
  GROUP BY a.o_custkey, a.o_orderkey
"""


def window_nulls_groups_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b52 (round 11): the last SQL-window corners from the reference's
    arbitrary-BI-SQL surface (Trino 467 window spec,
    docker-compose.yaml:153, RUNBOOK.md:120-123): IGNORE NULLS on
    lag/lead/first_value/last_value/nth_value, and a GROUPS frame
    (peer-group framing). Spark evaluates IGNORE NULLS natively; GROUPS
    frames Spark lacks, so the query pins the exact rewrite every
    Trino-to-Spark migration uses: dense_rank() the order key, then
    RANGE over the rank. 100-TB shape: all windows are
    partitionBy(o_custkey) — uniform keys, one exchange reused across
    the window functions; no global sort until the final (bounded)
    ORDER BY."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("b52_orders")
    return spark.sql(
        _B52_SQL.format(
            orders="b52_orders",
            groups_src=_B52_GROUPS_SPARK,
            lag_ign="lag(r.px) IGNORE NULLS",
            lead_ign="lead(r.px) IGNORE NULLS",
            first_ign="first_value(r.px) IGNORE NULLS",
            last_ign="last_value(r.px) IGNORE NULLS",
            nth_ign="nth_value(r.px, 2) IGNORE NULLS",
        )
    )


def array_lambda_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b54 (round 11): the Trino lambda / array-function family
    (reference surface: arbitrary BI SQL, Trino 467 functions doc —
    `transform`, `filter`, `reduce`, `zip_with`, `UNNEST WITH
    ORDINALITY`, `TRY`/`try_*`; Spark spells them transform/filter/
    aggregate/zip_with/posexplode/try_element_at). Every measure is an
    INTEGER derivation (counts and 0/1 folds), so Spark and DuckDB agree
    bit-for-bit with no float-fold ordering concerns. 100-TB shape: one
    narrow codegen'd projection + one aggregate; the ordinality arm is
    an explode bounded to 8 positions per row, aggregated pre-join, and
    the label dimension is tiny (broadcast)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    per = emb.select(
        "label",
        # filter + cardinality (Trino filter(arr, x -> ...))
        F.size(F.filter("v", lambda x: x > 0)).alias("npos"),
        # reduce/fold (Trino reduce): 0/1 accumulator over the head slice
        F.aggregate(
            F.slice("v", 1, 16),
            F.lit(0),
            lambda acc, x: acc + F.when(x > 0, 1).otherwise(0),
        ).alias("fold16"),
        # zip_with over two disjoint slices (Trino zip_with)
        F.aggregate(
            F.zip_with(
                F.slice("v", 1, 4),
                F.slice("v", 33, 4),
                lambda a, b: F.when(a < b, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("ziplt"),
        # TRY family: out-of-bounds element access yields NULL, not error
        F.try_element_at("v", F.lit(999)).isNull().cast("int").alias("tnull"),
    )
    agg = per.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("npos").cast("long").alias("sum_pos_elems"),
        F.sum("fold16").cast("long").alias("sum_fold16"),
        F.sum("ziplt").cast("long").alias("sum_zip_lt"),
        F.sum("tnull").cast("long").alias("n_try_null"),
    )
    # UNNEST WITH ORDINALITY (posexplode): negatives in the first 8
    # positions, counted per label (0-based pos < 8 == ordinality 1..8)
    ords = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .filter((F.col("pos") < 8) & (F.col("x") < 0))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("ord_neg8"))
    )
    return (
        agg.join(F.broadcast(ords), "label", "left")
        .withColumn("ord_neg8", F.coalesce("ord_neg8", F.lit(0)).cast("long"))
        .orderBy("label")
    )


# b61 (round 14): the Trino FROM-clause UNNEST SQL TEXT — the last
# common hand-written Trino spelling with no Spark parse (reference
# surface: arbitrary BI SQL over array/JSON shapes, Trino docs "SELECT
# — UNNEST") — issued VERBATIM through Engine.sql and rewritten by
# `Engine._translate_unnest` onto LATERAL explode/posexplode
# subqueries. Three grammar forms ride the one query: CROSS JOIN
# UNNEST ... WITH ORDINALITY (posexplode, 1-based BIGINT ordinality
# LAST), plain-array LEFT JOIN UNNEST ... ON TRUE (preserve-empty:
# n_rows counts the NULL-src documents, n_tok does not), and a
# translated-function argument (slice — the same spelling in Trino and
# Spark). Every measure is an integer; the float arm is a sign test
# (bit-exact on parquet floats). 100-TB shape: the expansion is
# bounded (16 positions/row, 2 tokens/doc), each side aggregates
# BEFORE the tiny label-grain join — no row explosion crosses a join.
_B61_TRINO_SQL = """
WITH ord AS (
  SELECT e.label AS label,
         CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(t.i) AS BIGINT) AS sum_ord,
         CAST(sum(CASE WHEN t.x < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg,
         CAST(sum(CASE WHEN t.x < 0 AND t.i <= 8 THEN t.i ELSE 0 END)
             AS BIGINT) AS ord_neg8
  FROM {emb} e
  CROSS JOIN UNNEST(slice(e.v, 1, 16)) WITH ORDINALITY AS t(x, i)
  GROUP BY e.label
),
toks AS (
  SELECT d.label AS label,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(w.tok) AS BIGINT) AS n_tok,
         CAST(sum(length(w.tok)) AS BIGINT) AS sum_tok_len
  FROM {docsrc} d
  LEFT JOIN UNNEST(split(d.src, '_')) AS w(tok) ON TRUE
  GROUP BY d.label
)
SELECT ord.label AS label, n_pos, sum_ord, n_neg, ord_neg8,
       n_rows, n_tok, sum_tok_len
FROM ord JOIN toks ON ord.label = toks.label
"""

# DuckDB's native expansion idioms oracle the identical semantics:
# SELECT-clause unnest + generate_subscripts zip positionally (the
# WITH ORDINALITY twin), and LEFT JOIN LATERAL unnest preserves the
# NULL-src rows exactly like Trino's LEFT JOIN UNNEST ON TRUE
_B61_DUCK_SQL = """
WITH emb AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_slice(embedding, 1, 16) AS v
  FROM {embeddings}
),
ordx AS (
  SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM emb
),
ord AS (
  SELECT label,
         CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(i) AS BIGINT) AS sum_ord,
         CAST(sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg,
         CAST(sum(CASE WHEN x < 0 AND i <= 8 THEN i ELSE 0 END)
             AS BIGINT) AS ord_neg8
  FROM ordx GROUP BY label
),
docsrc AS (
  SELECT CAST(doc_id % 8 AS BIGINT) AS label,
         CASE WHEN doc_id % 11 = 0 THEN NULL
              ELSE lang || '_' || source END AS src
  FROM {documents}
),
toks AS (
  SELECT d.label AS label,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(w.tok) AS BIGINT) AS n_tok,
         CAST(sum(length(w.tok)) AS BIGINT) AS sum_tok_len
  FROM docsrc d
  LEFT JOIN LATERAL
    (SELECT unnest(string_split(d.src, '_')) AS tok) AS w ON TRUE
  GROUP BY d.label
)
SELECT ord.label AS label, n_pos, sum_ord, n_neg, ord_neg8,
       n_rows, n_tok, sum_tok_len
FROM ord JOIN toks ON ord.label = toks.label
"""


# b62 (round 14): Trino's TRY(expr) in the spellings BI SQL uses it —
# TRY(CAST(...)) over parseable and unparseable text, and the NULL-on-
# zero-divisor guard — issued VERBATIM through Engine.sql and mapped by
# `Engine._translate_try` onto Spark's try_cast / try_divide. Only
# engine-agreeing measures ride the hash: NULL-ness of guarded
# divisions (divisor-zero rows — identical in any engine) and try_cast
# results (both engines NULL unparseable text). Documented delta kept
# OUT of the query: Spark's try_divide returns NULL for a 0.0 DOUBLE
# divisor where Trino's IEEE division gives Infinity without erroring
# (TRY never fires there) — the integer-division NULL-on-zero case,
# the one BI SQL guards, agrees.
_B62_TRINO_SQL = """
SELECT o_orderstatus AS st,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(COALESCE(TRY(CAST(substring(o_orderpriority, 1, 1)
       AS INTEGER)), -1)) AS BIGINT) AS sum_pri,
  CAST(sum(CASE WHEN TRY(o_totalprice /
       CAST(o_orderkey % 3 AS DOUBLE)) IS NULL
       THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
  CAST(sum(CASE WHEN TRY(CAST(o_orderpriority AS INTEGER)) IS NULL
       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_cast
FROM {orders}
GROUP BY o_orderstatus
"""

_B62_DUCK_SQL = """
SELECT o_orderstatus AS st,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(COALESCE(try_cast(substring(o_orderpriority, 1, 1)
       AS INTEGER), -1)) AS BIGINT) AS sum_pri,
  CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_div_null,
  CAST(sum(CASE WHEN try_cast(o_orderpriority AS INTEGER) IS NULL
       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_cast
FROM {orders}
GROUP BY o_orderstatus
"""


def try_dialect_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b62: TRY(CAST(...)) / TRY(a / b) through Engine.sql — one pruned
    scan, one hash aggregate, the try_* builtins JVM-side (same plan
    family as b59/b60)."""
    from oss_data_lake_spark.engine import Engine

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "b62_orders"
    )
    return Engine(spark=spark).sql(
        _B62_TRINO_SQL.format(orders="b62_orders")
    )


def unnest_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b61: Trino CROSS JOIN / LEFT JOIN UNNEST SQL text through
    Engine.sql. Plan shape: two independent scan→explode→partial-agg
    legs meeting in one tiny (label-grain) join — the LATERAL
    generators run inside whole-stage codegen and each leg's exchange
    carries already-aggregated rows, never exploded ones."""
    from oss_data_lake_spark.engine import Engine

    load_table(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        F.col("embedding").alias("v"),
    ).createOrReplaceTempView("b61_emb")
    load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 8).cast("long").alias("label"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat_ws("_", "lang", "source"))
        .alias("src"),
    ).createOrReplaceTempView("b61_docsrc")
    return Engine(spark=spark).sql(
        _B61_TRINO_SQL.format(emb="b61_emb", docsrc="b61_docsrc")
    )


QUERIES = {
    "b56_quantified_comparisons": quantified_comparisons,
    "b61_unnest_lateral": unnest_lateral,
    "b62_try_dialect_funcs": try_dialect_funcs,
    "b57_window_frame_exclude": window_frame_exclude,
    "b58_sql_json_funcs": sql_json_funcs,
    "b59_trino_dialect_funcs": trino_dialect_funcs,
    "b60_trino_datepart_funcs": trino_datepart_funcs,
    "b50_recursive_user_tree": recursive_user_tree,
    "b54_array_lambda_funcs": array_lambda_funcs,
    "b51_lateral_topn_lineitems": lateral_topn_lineitems,
    "b52_window_nulls_groups_frames": window_nulls_groups_frames,
    "b33_multiset_setops": multiset_setops,
    "b38_salted_hot_user_agg": salted_hot_user_agg,
    "b34_epoch_conversions": epoch_conversions,
    "b35_null_semantics": null_semantics,
    "b37_most_frequent_parts": most_frequent_parts,
    "b31_value_histogram": value_histogram,
    "b32_correlated_scalar_subqueries": correlated_scalar_subqueries,
    "b22_late_shipment_orders": late_shipment_orders,
    "b23_returned_revenue_by_customer": returned_revenue_by_customer,
    "b24_customer_order_distribution": customer_order_distribution,
    "b25_small_quantity_revenue": small_quantity_revenue,
    "b26_acctbal_percentiles": acctbal_percentiles,
    "b27_nations_per_region_list": nations_per_region_list,
    "b28_revenue_per_supplier_rank": revenue_per_supplier_rank,
    "b29_math_funcs_coverage": math_funcs_coverage,
    "b30_top_suppliers_scalable": top_suppliers_scalable,
    "b36_window_rank_family": window_rank_family,
}

ORACLES = {
    # DuckDB evaluates the ANSI quantified text NATIVELY — the
    # cross-engine claim is that the Spark-side aggregate/semi-join
    # plans implement exactly `> ALL` / `< SOME` / `= ANY`
    "b56_quantified_comparisons": """
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM supplier s
            WHERE s.s_acctbal > ALL
              (SELECT c.c_acctbal FROM customer c
                WHERE c.c_nationkey = s.s_nationkey)) AS n_above_all,
          (SELECT CAST(count(*) AS BIGINT) FROM part
            WHERE p_retailprice < SOME
              (SELECT p_retailprice FROM part
                WHERE p_brand = 'Brand#13')) AS n_lt_some,
          (SELECT CAST(count(*) AS BIGINT) FROM supplier
            WHERE s_nationkey = ANY
              (SELECT n_nationkey FROM nation
                WHERE n_regionkey = 3)) AS n_eq_any
    """,
    # DuckDB's native JSON machinery oracles the Trino SQL/JSON spellings
    "b58_sql_json_funcs": _B58_DUCK_SQL.format(events="events"),
    # DuckDB twins of the Trino dialect spellings (datesub = elapsed
    # complete intervals; AT TIME ZONE double application)
    "b59_trino_dialect_funcs": _B59_DUCK_SQL.format(events="events"),
    "b60_trino_datepart_funcs": _B60_DUCK_SQL.format(orders="orders"),
    # DuckDB's native unnest/generate_subscripts/LATERAL idioms oracle
    # the UNNEST translator's LATERAL explode rewrites
    "b61_unnest_lateral": _B61_DUCK_SQL.format(
        embeddings="embeddings", documents="documents"
    ),
    # DuckDB try_cast + divisor-zero CASE twins oracle the TRY mapping
    "b62_try_dialect_funcs": _B62_DUCK_SQL.format(orders="orders"),
    # DuckDB evaluates the NATIVE SQL:2011 EXCLUDE spellings — parity
    # verifies the Spark-side subtraction identities
    "b57_window_frame_exclude": _B57_DUCK_SQL.format(
        base=_B57_BASE.format(orders="orders")
    ),
    # the lambda family re-expressed in DuckDB list functions
    # (list_filter/list_transform/list_sum, generate_subscripts for the
    # ordinality arm, index-OOB NULL for the TRY arm) — all-integer
    # measures, bit-exact cross-engine
    "b54_array_lambda_funcs": """
        WITH e AS (
          SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        per AS (
          SELECT label,
                 len(list_filter(v, x -> x > 0)) AS npos,
                 list_sum(list_transform(v[1:16],
                     x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)) AS fold16,
                 list_sum(list_transform(range(1, 5),
                     i -> CASE WHEN v[CAST(i AS INT)]
                                    < v[CAST(i AS INT) + 32]
                          THEN 1 ELSE 0 END)) AS ziplt,
                 CASE WHEN v[999] IS NULL THEN 1 ELSE 0 END AS tnull
          FROM e
        ),
        agg AS (
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(npos) AS BIGINT) AS sum_pos_elems,
                 CAST(SUM(fold16) AS BIGINT) AS sum_fold16,
                 CAST(SUM(ziplt) AS BIGINT) AS sum_zip_lt,
                 CAST(SUM(tnull) AS BIGINT) AS n_try_null
          FROM per GROUP BY label
        ),
        ords AS (
          SELECT label, CAST(COUNT(*) AS BIGINT) AS ord_neg8 FROM (
            SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos
            FROM e
          ) WHERE pos <= 8 AND x < 0 GROUP BY label
        )
        SELECT a.label, a.n, a.sum_pos_elems, a.sum_fold16, a.sum_zip_lt,
               a.n_try_null,
               CAST(COALESCE(o.ord_neg8, 0) AS BIGINT) AS ord_neg8
        FROM agg a LEFT JOIN ords o ON a.label = o.label
        ORDER BY a.label
    """,
    # DuckDB evaluates the SAME recursive algorithm natively — anchor,
    # child-id explosion + equi-join loop step, closure aggregation —
    # with only the explosion spelled in each dialect (explode(array())
    # vs unnest([]); r15, the equi-join step fix documented on the
    # query). The cross-engine recursion is the correctness claim.
    "b50_recursive_user_tree": _B50_SQL.format(
        users="(SELECT DISTINCT user_id FROM events)",
        events="events",
        children="unnest([2 * user_id + 1, 2 * user_id + 2])",
        sum_value=sql_dsum("value"),
    ),
    # DuckDB evaluates the IDENTICAL lateral text natively
    "b51_lateral_topn_lineitems": _B51_SQL.format(
        orders="orders", lineitem="lineitem"
    ),
    # same SELECT body; DuckDB's inner IGNORE NULLS spelling, and the
    # GROUPS frame re-derived by a peer-group join (DuckDB 1.0 has no
    # GROUPS mode) — an independent check of the Spark-side rewrite
    "b52_window_nulls_groups_frames": _B52_SQL.format(
        orders="orders",
        groups_src=_B52_GROUPS_DUCK,
        lag_ign="lag(r.px IGNORE NULLS)",
        lead_ign="lead(r.px IGNORE NULLS)",
        first_ign="first_value(r.px IGNORE NULLS)",
        last_ign="last_value(r.px IGNORE NULLS)",
        nth_ign="nth_value(r.px, 2 IGNORE NULLS)",
    ),
    # the direct (unsalted) aggregation — value-identity of the salted
    # two-phase plan vs the plain form IS the correctness claim
    "b38_salted_hot_user_agg": f"""
        SELECT user_id, COUNT(*) AS n,
               {sql_dsum("value")} AS sum_value
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "b37_most_frequent_parts": """
        WITH c AS (SELECT l_partkey, COUNT(*) AS cnt
                   FROM lineitem GROUP BY l_partkey),
        top AS (SELECT l_partkey, CAST(cnt AS BIGINT) AS cnt
                FROM c ORDER BY cnt DESC, l_partkey LIMIT 10)
        SELECT l_partkey, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, l_partkey) AS BIGINT)
                 AS hh_rank
        FROM top ORDER BY hh_rank
    """,
    "b33_multiset_setops": """
        SELECT tag, l_suppkey, COUNT(*) AS n FROM (
            SELECT 'intersect_all' AS tag, l_suppkey FROM (
                SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
                INTERSECT ALL
                SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')
            UNION ALL
            SELECT 'except_all' AS tag, l_suppkey FROM (
                SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
                EXCEPT ALL
                SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')
        ) GROUP BY tag, l_suppkey ORDER BY tag, l_suppkey
    """,
    "b34_epoch_conversions": """
        SELECT event_type,
               MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS min_us,
               MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us,
               COUNT(*) AS n,
               CAST(make_timestamp(MIN(epoch_us(CAST(ts AS TIMESTAMP)))) AS DATE)
                   AS min_day
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "b35_null_semantics": """
        SELECT NULLIF(o_orderstatus, 'P') AS status_np,
               COALESCE(NULLIF(o_orderstatus, 'P'), '(pending)') AS status_filled,
               COUNT(*) AS n_star,
               COUNT(NULLIF(o_orderstatus, 'P')) AS n_col
        FROM orders
        GROUP BY 1, 2 ORDER BY status_np ASC NULLS FIRST
    """,
    "b31_value_histogram": f"""
        SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
               COUNT(*) AS n, {sql_davg("value")} AS avg_value
        FROM events GROUP BY 1 ORDER BY bucket
    """,
    "b32_correlated_scalar_subqueries": _CORRELATED_SCALAR_SQL,
    "b22_late_shipment_orders": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "b23_returned_revenue_by_customer": f"""
        SELECT c_custkey, c_name, n_name,
               {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "b24_customer_order_distribution": """
        SELECT c_count, COUNT(*) AS n_customers FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) GROUP BY c_count ORDER BY n_customers DESC, c_count DESC
    """,
    "b25_small_quantity_revenue": f"""
        WITH pa AS (
            SELECT l_partkey AS pk, {sql_davg("l_quantity")} AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT COUNT(*) AS n_items, {sql_dsum("l_extendedprice")} AS total_price
        FROM lineitem JOIN pa ON l_partkey = pk
        WHERE l_quantity < 0.5 * avg_qty
    """,
    "b26_acctbal_percentiles": """
        SELECT c_mktsegment, COUNT(*) AS n,
               round(quantile_cont(c_acctbal, 0.5), 6) AS median_bal,
               round(quantile_cont(c_acctbal, 0.9), 6) AS p90_bal,
               MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "b27_nations_per_region_list": """
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "b28_revenue_per_supplier_rank": f"""
        WITH per_supp AS (
            SELECT l_suppkey,
                   {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue,
               RANK() OVER (ORDER BY total_revenue DESC, s_suppkey ASC)
                   AS revenue_rank,
               DENSE_RANK() OVER (ORDER BY total_revenue DESC, s_suppkey ASC)
                   AS revenue_dense_rank
        FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY revenue_rank, s_suppkey
    """,
    "b36_window_rank_family": """
        SELECT c_mktsegment, c_custkey, c_acctbal,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               FIRST_VALUE(c_custkey) OVER wf AS richest_custkey,
               LAST_VALUE(c_custkey) OVER wf AS poorest_custkey
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey ASC),
               wf AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        QUALIFY c_custkey < 200
        ORDER BY c_mktsegment, c_custkey
    """,
    "b30_top_suppliers_scalable": f"""
        WITH top AS (
            SELECT l_suppkey,
                   {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
            FROM lineitem GROUP BY l_suppkey
            ORDER BY total_revenue DESC, l_suppkey ASC LIMIT 10
        )
        SELECT l_suppkey, total_revenue,
               ROW_NUMBER() OVER (ORDER BY total_revenue DESC, l_suppkey ASC)
                   AS revenue_rank
        FROM top
    """,
    "b29_math_funcs_coverage": """
        SELECT p_partkey,
               round(sqrt(p_retailprice), 9) AS sqrt_price,
               round(ln(p_retailprice), 9) AS ln_price,
               round(log10(p_retailprice), 9) AS log10_price,
               round(pow(p_retailprice, 0.3), 9) AS pow_price,
               CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
               CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
               p_size % 7 AS size_mod7,
               CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sign_vs_1000
        FROM part ORDER BY p_partkey LIMIT 100
    """,
}
