"""Approximate aggregate coverage (Trino exposes approx_distinct /
approx_percentile; Spark's equivalents are approx_count_distinct /
percentile_approx). No DuckDB oracle — sketches differ by engine — so these
pin accuracy against the exact Spark aggregates instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from oss_data_lake_spark.sources.loaders import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_correct):
    orders = load_table(spark, sf_correct, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_percentile_approx_near_exact(spark, sf_correct):
    cust = load_table(spark, sf_correct, "customer")
    row = cust.agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("exact"),
        F.expr("percentile_approx(c_acctbal, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    spread = (
        cust.agg(F.max("c_acctbal") - F.min("c_acctbal")).collect()[0][0]
    )
    assert abs(row.approx - row.exact) / spread < 0.01
