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


def test_freq_items_covers_exact_heavy_hitters(spark):
    """Approximate heavy hitters (DataFrame.stat.freqItems — one-pass
    KPS/Misra-Gries style) must contain every value whose true frequency
    exceeds the support threshold; pinned on skewed data with known
    hitters. This is the approximate path of b37_most_frequent_parts."""
    rows = (
        [(1,)] * 500 + [(2,)] * 300 + [(3,)] * 120  # heavy: >10% each
        + [(i,) for i in range(100, 180)]            # 80 singleton tail
    )
    df = spark.createDataFrame(rows, "k long").repartition(8)
    approx = set(df.stat.freqItems(["k"], support=0.1).collect()[0][0])
    assert {1, 2, 3} <= approx  # no false negatives above support


def test_count_min_sketch_overestimates_within_bound(spark):
    """count_min_sketch point estimates: never under the true count, over
    by at most eps*N with the configured confidence (deterministic seed)."""
    rows = [(1,)] * 400 + [(2,)] * 100 + [(i,) for i in range(50, 550)]
    df = spark.createDataFrame(rows, "k long")
    sketch_bytes = df.agg(
        F.count_min_sketch("k", F.lit(0.01), F.lit(0.95), F.lit(42)).alias("s")
    ).collect()[0].s
    jvm = spark._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_bytes)
    )
    n = len(rows)
    for key, true_cnt in ((1, 400), (2, 100)):
        est = sketch.estimateCount(key)
        assert true_cnt <= est <= true_cnt + 0.01 * n + 1
