"""Tier C EXT — as-of (point-in-time) join (SURVEY.md §2.C E5).

Spark has no native ASOF JOIN (DuckDB does; Trino doesn't either). The
scalable formulation: union probe and build rows, single shuffle on the join
key, one pass of ``last(value, ignorenulls=True)`` over an ordered window.
This is O(n log n) per key partition with exactly ONE shuffle — versus the
naive range-join + row_number which shuffles a quadratic candidate blowup.

Ordering contract (must match the oracle's deterministic subquery):
build rows sort before probe rows at equal timestamps (inclusive `<=`
semantics), ties within builds broken by the highest event_id winning.

The 100 TB note: partitionBy(user_id) distributes perfectly unless one key
is hot; a skewed hot user is handled by AQE skew-split because the window
only needs per-key ordering, not global.

Fixture mapping: "price at/before event time" recast as: for each
``purchase`` event, the value of that user's most recent ``error`` event at
or before it (the reference's OHLCV model has no event-time series in the
fixtures; semantics are identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oss_data_lake_spark.sources.loaders import load_table


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Generic as-of join: for each probe row, latest build ``value_col`` with
    build.time <= probe.time on the same ``key``. Probe columns preserved."""
    p = probe.withColumn("__is_probe", F.lit(1)).withColumn(
        "__bval", F.lit(None).cast(build.schema[value_col].dataType)
    )
    # keep the build side's own event_id (when both sides have one) so the
    # tie-break below orders equal-ts BUILD rows deterministically — selecting
    # only (key, ts, value) would null it out and break the contract
    b_cols = [key, time_col, F.col(value_col).alias("__bval"),
              F.lit(0).alias("__is_probe")]
    if "event_id" in build.columns and "event_id" in probe.columns:
        b_cols.append(F.col("event_id"))
    b = build.select(*b_cols)
    # align schemas: probe cols not in build become nulls on build rows
    for c in probe.columns:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    b = b.select(*p.columns)
    unioned = p.unionByName(b)
    # builds first at equal ts (inclusive <=); among equal-ts builds the last
    # (max event ordering) wins via last() over the running frame
    order = [F.col(time_col).asc(), F.col("__is_probe").asc()]
    if "event_id" in probe.columns:
        order.append(F.col("event_id").asc())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(out_col, F.last("__bval", ignorenulls=True).over(w))
        .filter(F.col("__is_probe") == 1)
        .drop("__is_probe", "__bval")
    )


def asof_join_pandas(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """The applyInPandas formulation of the as-of join: co-group probe and
    build per key, run ``pd.merge_asof`` inside each group (Arrow batches).

    Exists as the idiomatic escape hatch when the window formulation can't
    express the semantics (e.g. tolerance windows, nearest-instead-of-prior);
    for the plain backward as-of, :func:`asof_join` (pure JVM) is the fast
    path — pytest pins both to the same result. Same shuffle profile: one
    exchange on the key."""
    out_field = build.schema[value_col].dataType.simpleString()
    probe_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in probe.schema.fields
    )
    schema = f"{probe_schema}, {out_col} {out_field}"
    p_cols = list(probe.columns)

    def merge(left, right):  # nested: pickled by value for workers
        import pandas as pd
        left = left.sort_values([time_col, "event_id"] if "event_id" in left else time_col)
        right = right.sort_values([time_col, "event_id"] if "event_id" in right else time_col)
        if right.empty:
            out = left[p_cols].copy()
            out[out_col] = None
            return out
        merged = pd.merge_asof(
            left[p_cols],
            right[[time_col, value_col]].rename(columns={value_col: out_col}),
            on=time_col,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged

    return (
        probe.groupBy(key)
        .cogroup(build.groupBy(key))
        .applyInPandas(merge, schema=schema)
    )


def asof_error_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 query: each purchase event annotated with the same user's most
    recent prior-or-simultaneous error value."""
    events = load_table(spark, sf_dir, "events")
    probe = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    build = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        probe, build, key="user_id", time_col="ts", value_col="value",
        out_col="prior_error_value",
    )
    return joined.select(
        "event_id", "user_id", "value", "prior_error_value"
    ).orderBy("event_id")


def interval_open_count(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    out_col: str = "open_cnt",
) -> DataFrame:
    """Interval-containment count by SWEEP: for each point row, how many
    intervals ``[start_col, end_col]`` (day grain, inclusive) contain it —
    WITHOUT materializing point×interval pairs.

    The naive formulation is a range join (``p BETWEEN start AND end``),
    which Spark plans as BroadcastNestedLoopJoin and which materializes
    every containment pair — with dense intervals (every day here has
    thousands of open shipments) that's O(points × avg_open) rows of pure
    intermediate state, a scale-killer. The sweep rewrite is the classic
    event-time decomposition: +1 at each interval start, −1 the day after
    each end, daily net, one cumulative sum → a per-day "open intervals"
    table; each point then needs ONE broadcast-join lookup.

    Costs at 100 TB: two linear projections + one groupBy("day") shuffle
    (output ≤ #calendar-days rows); the cumulative window is ordered over
    the CALENDAR (bounded — ~3.6k rows per decade, single-partition by
    construction and by bound, not by data size); the final join
    broadcasts that tiny table to the points. Points outside the interval
    span get 0."""
    starts = intervals.select(
        F.to_date(start_col).alias("d"), F.lit(1).alias("delta")
    )
    ends = intervals.select(
        F.date_add(F.to_date(end_col), 1).alias("d"),
        F.lit(-1).alias("delta"),
    )
    daily = (
        starts.unionByName(ends).groupBy("d").agg(F.sum("delta").alias("net"))
    )
    spine = (
        daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    cum_w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        spine.join(daily, "d", "left")
        .na.fill(0, ["net"])
        .withColumn(out_col, F.sum("net").over(cum_w))
        .select("d", out_col)
    )
    pts = points.withColumn("__pd", F.to_date(point_col))
    return (
        pts.join(
            F.broadcast(cum.withColumnRenamed("d", "__pd")), "__pd", "left"
        )
        .na.fill(0, [out_col])
        .drop("__pd")
    )


def interval_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e32: monthly statistics of "shipments in transit on the order date"
    — each order counted against the lineitem transit intervals that
    contain its o_orderdate, via the sweep (no pair materialization: at
    sf0.1 the naive range join would build ~10⁹ containment pairs; the
    sweep's biggest intermediate is one row per calendar day).

    The fixture lineitem has no receipt date, so the transit window is
    derived deterministically: ``[l_shipdate, l_shipdate +
    (floor(l_quantity) % 30 + 1) days]`` — FLOOR before the int cast on
    both sides because Spark truncates double→int while DuckDB rounds."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    transit = lineitem.select(
        F.to_date("l_shipdate").alias("start_d"),
        F.expr(
            "date_add(to_date(l_shipdate), "
            "CAST(floor(l_quantity) AS INT) % 30 + 1)"
        ).alias("end_d"),
    )
    with_open = interval_open_count(
        orders.select("o_orderdate"),
        transit,
        point_col="o_orderdate",
        start_col="start_d",
        end_col="end_d",
        out_col="open_cnt",
    )
    return (
        with_open.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum("open_cnt").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_open_intervals"),
            F.max("open_cnt").cast("long").alias("max_open_intervals"),
        )
        .orderBy("order_month")
    )


QUERIES = {
    "e30_asof_error_before_purchase": asof_error_before_purchase,
    "e32_interval_open_orders": interval_open_orders,
}

# Oracle: deterministic correlated subquery (ORDER BY ts DESC, event_id DESC
# LIMIT 1) — avoids DuckDB ASOF JOIN's unspecified tie behavior and matches
# the window formulation's ordering contract exactly. Timestamps compared at
# microsecond grain on both sides (Spark truncates ns on read; the oracle
# casts TIMESTAMP_NS → TIMESTAMP).
ORACLES = {
    "e30_asof_error_before_purchase": """
        SELECT p.event_id, p.user_id, p.value,
               (SELECT e.value FROM events e
                WHERE e.user_id = p.user_id AND e.event_type = 'error'
                  AND CAST(e.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
                ORDER BY CAST(e.ts AS TIMESTAMP) DESC, e.event_id DESC
                LIMIT 1) AS prior_error_value
        FROM events p
        WHERE p.event_type = 'purchase'
        ORDER BY p.event_id
    """,
    # the oracle mirrors the SWEEP (deltas → calendar spine → cumulative →
    # point lookup) rather than the naive range join, so the two engines
    # compute identical integer open-counts by construction; avg is one
    # exact integer sum + one double division on each side
    "e32_interval_open_orders": """
        WITH deltas AS (
            SELECT CAST(l_shipdate AS DATE) AS d, 1 AS delta FROM lineitem
            UNION ALL
            SELECT CAST(l_shipdate AS DATE)
                     + (CAST(FLOOR(l_quantity) AS INT) % 30 + 1) + 1 AS d,
                   -1 AS delta
            FROM lineitem
        ),
        daily AS (SELECT d, SUM(delta) AS net FROM deltas GROUP BY d),
        spine AS (
            SELECT UNNEST(generate_series(
                (SELECT MIN(d) FROM daily),
                (SELECT MAX(d) FROM daily),
                INTERVAL 1 DAY))::DATE AS d
        ),
        cum AS (
            SELECT s.d,
                   CAST(SUM(COALESCE(dl.net, 0))
                        OVER (ORDER BY s.d) AS BIGINT) AS open_cnt
            FROM spine s LEFT JOIN daily dl ON s.d = dl.d
        ),
        pts AS (
            SELECT CAST(o_orderdate AS DATE) AS d FROM orders
        )
        SELECT strftime(p.d, '%Y-%m') AS order_month,
               COUNT(*) AS n_orders,
               CAST(SUM(COALESCE(c.open_cnt, 0)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_open_intervals,
               CAST(MAX(COALESCE(c.open_cnt, 0)) AS BIGINT)
                   AS max_open_intervals
        FROM pts p LEFT JOIN cum c ON p.d = c.d
        GROUP BY 1
        ORDER BY 1
    """,
}
