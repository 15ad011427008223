"""Engine scalar/aggregate function helpers (JVM-side expressions only)."""

from oss_data_lake_spark.functions.deterministic import davg, dsum

__all__ = ["davg", "dsum"]
