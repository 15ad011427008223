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


QUERIES = {"e30_asof_error_before_purchase": asof_error_before_purchase}

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
}
