"""The core gate: every declared query must match its DuckDB oracle.

Covers the UNION of both registries: every fine-grained per-operator query
(``all_queries`` — including the members folded into driver composites) AND
the ≤50-entry driver registry (``__spark_entry__.queries()`` — composites
included), so consolidation never weakens per-operator verification.

Runs at sf0.001 for speed in the default suite; the driver runs sf0.01 —
``pytest -m sf001 tests/test_oracle_parity.py`` (slow marker) covers that too.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from oss_data_lake_spark.operators import all_oracles, all_queries
from tests.parity import compare, duckdb_con

QUERIES = {**all_queries(), **entrymod.queries()}
ORACLES = {**all_oracles(), **entrymod.oracle_sql()}


def test_no_raw_timestamp_outputs(spark, sf_dir):
    """Oracle-compat guard: queries must not return TimestampType columns —
    the fixtures' ns-grain timestamps hash differently across engines
    (Spark truncates to µs, DuckDB keeps TIMESTAMP_NS). Return dates,
    epoch integers, or formatted strings instead."""
    from pyspark.sql import types as T

    offenders = []
    for name, fn in QUERIES.items():
        for f in fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, T.TimestampType):
                offenders.append((name, f.name))
    assert not offenders, offenders


_ARROW_TO_SPARK = {
    "int64": "bigint",
    "int32": "int",
    "double": "double",
    "float64": "double",
    "string": "string",
    "large_string": "string",
    "date32[day]": "date",
    "bool": "boolean",
}


def test_cross_engine_column_types_match(spark, sf_dir):
    """Schema-type parity guard: every oracle query's Spark output types must
    equal the DuckDB Arrow types (the driver may compare types, not just
    values — rank/ntile/year return int32 in Spark vs int64 in DuckDB, and
    DuckDB SUM(BIGINT) returns int128, unless explicitly aligned)."""
    con = duckdb_con(sf_dir)
    mismatches = []
    for name in sorted(ORACLES):
        sdf = QUERIES[name](spark, sf_dir)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        tbl = con.execute(ORACLES[name]).arrow()
        for f in tbl.schema:
            duck = _ARROW_TO_SPARK.get(str(f.type), str(f.type))
            # arrow spells decimal(p, s) as decimal128(p, s)
            duck = re.sub(
                r"^decimal128\((\d+), (\d+)\)$", r"decimal(\1,\2)", duck
            )
            if f.name in stypes and stypes[f.name] != duck:
                mismatches.append((name, f.name, stypes[f.name], duck))
    assert not mismatches, mismatches


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity_sf0001(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    con = duckdb_con(sf_dir)
    res = compare(df, con, ORACLES[name])
    assert res["ok"], f"{name}: {res}"


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity_sf001(spark, sf_correct, name):
    df = QUERIES[name](spark, sf_correct)
    if name not in ORACLES:
        assert df.count() >= 0
        return
    con = duckdb_con(sf_correct)
    res = compare(df, con, ORACLES[name])
    assert res["ok"], f"{name}: {res}"
