"""Plan-audit helpers: programmatic checks that Catalyst produced the plan
we'd want at 100 TB — filters pushed to the parquet scan, columns pruned,
dimensions broadcast, top-k as TakeOrdered, no accidental cartesian/SMJ.

Used by tests/test_plans.py to pin the plan shape of headline queries, so a
regression that silently de-optimizes (e.g. a cast blocking pushdown, a
broadcast hint lost) fails CI instead of shipping a 10× slower plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The executedPlan/sparkPlan text (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if at least one parquet scan carries non-empty PushedFilters."""
    txt = explain_str(df)
    return bool(re.search(r"PushedFilters: \[(?!\])", txt))


def scan_read_schema(df: DataFrame) -> list[str]:
    """All ReadSchema structs in the plan (column-pruning evidence)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def partition_filters(df: DataFrame) -> list[str]:
    """Non-empty PartitionFilters entries from every scan in the plan —
    the file-index-level pruning evidence (directories never opened)."""
    return [
        m
        for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", explain_str(df))
        if m.strip()
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan: every Exchange that is not a broadcast —
    hash, range, SinglePartition (global windows/sorts!) and RoundRobin all
    count, so a refactor that funnels data through one partition can't slip
    past the plan pins. Uses 'simple' mode: formatted mode splits the node
    name and its partitioning arguments across sections."""
    txt = explain_str(df, "simple")
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition|roundrobin)",
            txt,
            flags=re.IGNORECASE,
        )
    )
