"""Skew-mitigation primitives for hot keys (north-star 100 TB design note).

AQE's skew-join handling (on in session.py) covers sort-merge joins; these
helpers cover the two cases AQE doesn't: aggregation skew (one key holding a
large share of rows) and broadcast-salted replication joins.

Both are pure DataFrame compositions — results are provably identical to the
unsalted equivalents (tests pin this), only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import PRECISION, SCALE

_DEC = f"decimal({PRECISION},{SCALE})"


def _salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic pseudo-uniform salt from the full row content (no
    F.rand: re-runs and retried tasks must agree)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg_count_sum(
    df: DataFrame, key: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial on (key, salt) spreads a hot
    key over ``n_salts`` reducers, final on key combines the partials.
    Returns (key, n, sum_value) — sum routed through decimal so the result
    is bit-identical to the direct aggregation."""
    partial = (
        df.withColumn("__salt", _salt(df, n_salts))
        .groupBy(key, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_col).cast(_DEC)).alias("__s"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__s").cast("double").alias("sum_value"),
        )
    )


def salted_broadcast_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Replicate the (small) dim ``n_salts``× and split the fact's hot key
    across salt buckets — an explicit alternative to relying on AQE when the
    dim fits in memory but the fact key is pathological. Row-identical to
    ``fact.join(dim, key)``."""
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    dim_rep = dim.crossJoin(F.broadcast(salts))
    fact_salted = fact.withColumn("__salt", _salt(fact, n_salts))
    return fact_salted.join(
        F.broadcast(dim_rep), [key, "__salt"], "inner"
    ).drop("__salt")
