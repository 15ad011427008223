"""Physical-plan introspection — the engine's EXPLAIN transparency surface
(mirrors Trino's EXPLAIN role in the reference, SURVEY.md §3.2)."""

from oss_data_lake_spark.plans.audit import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    has_sort_merge_join,
    has_take_ordered,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filters",
    "has_sort_merge_join",
    "has_take_ordered",
    "scan_read_schema",
]
