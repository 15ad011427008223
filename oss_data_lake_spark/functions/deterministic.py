"""Deterministic floating-point aggregation helpers.

Problem: ``SUM(double)`` is summation-order-dependent; Spark's partial+final
hash aggregation and DuckDB's single-threaded oracle can legally disagree in
the low bits, breaking the driver's order-insensitive value-hash compare
(SURVEY.md §7 risk register, "Float aggregation determinism").

Solution: route double sums through an exact DECIMAL sum — both Spark and
DuckDB sum decimals exactly (integer arithmetic), so the result is independent
of partitioning and summation order — then cast the final scalar back to
double. The per-row double→decimal rounding is identical in both engines
(round-half-up at the given scale; generator doubles essentially never land on
a tie). Averages divide the exact decimal sum by the count *after* casting to
double, so both engines do exactly one IEEE-754 division.

The oracle-SQL mirror of these helpers lives in the query pack: e.g.
``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.

At 100 TB this costs nothing extra: decimal partial aggregation is still
map-side-combined, codegen'd, and shuffle-reduced exactly like a double sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25 integer+fraction digits, 6 fractional: exact for sums of ~1e12 rows of
# values < 1e13 — comfortable headroom at 100 TB scale factors.
PRECISION = 25
SCALE = 6


def _dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({PRECISION},{SCALE})")


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    return F.sum(_dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum → double, / count → double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_dec(c)).cast("double") / F.count(c).cast("double")).alias(alias)


def sql_dsum(expr: str) -> str:
    """The ANSI-SQL mirror of ``dsum`` for DuckDB oracles."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{SCALE}))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """The ANSI-SQL mirror of ``davg`` for DuckDB oracles."""
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{SCALE}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE))"
    )
