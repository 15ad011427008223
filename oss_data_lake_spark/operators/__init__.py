"""Operator/query registry.

Each operator module exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL; a query with no
oracle entry gets the driver's weaker rows-only check). ``all_queries()`` /
``all_oracles()`` merge every module for ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    return merged


def _modules():
    from oss_data_lake_spark.operators import (
        asof,
        dedup,
        multimodal,
        pipeline,
        relational,
        relational_more,
        similarity,
        text,
        tier_a,
        upsert,
        windows,
    )

    # Order matters: the driver's correctness pass walks the registry in
    # order under a time budget. Round 1 stopped after the 50th query, so
    # modules the driver has never verified (similarity, text, asof,
    # multimodal, pipeline — see VERDICT.md round 1) run FIRST; the
    # modules with round-1-green rows run last.
    return [
        similarity,
        text,
        asof,
        multimodal,
        pipeline,
        dedup,
        upsert,
        windows,
        tier_a,
        relational,
        relational_more,
    ]
