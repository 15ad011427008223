"""Round-11 fuzz extension (VERDICT r10 next #10): the NEW grammar's
hostile-input seams — SET SESSION values carrying quotes/SQL-looking
text, and the TABLESAMPLE translator, which rewrites on the masked
text and must never touch sampling keywords inside string literals.
Same discipline as ``test_statement_fuzz.py``: hypothesis generates
literal-hostile payloads, Spark itself is the oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from oss_data_lake_spark.engine import Engine

TRICKY = [
    "TABLESAMPLE BERNOULLI (10)",
    "t TABLESAMPLE SYSTEM (50) REPEATABLE (1)",
    "TABLESAMPLE BERNOULLI (",          # unbalanced — must stay data
    ") TABLESAMPLE SYSTEM (100",
    "SET SESSION a = 'b'",
    "USE hive.analytics",
    "O''Brien",
    "'; DROP TABLE t; --",
    "",
]

_plain = st.text(
    alphabet="abcdefgXYZ0123456789 _.,$?=<>()-;'",
    min_size=0, max_size=24,
).map(lambda s: s.replace("'", ""))
_payload = st.one_of(st.sampled_from(TRICKY), _plain)


def _quote(p: str) -> str:
    return "'" + p.replace("'", "''") + "'"


@pytest.fixture(scope="module")
def fz_eng(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fz11")
    e = Engine(spark=spark, warehouse_dir=str(root / "wh"))
    e.sql("CREATE TABLE fz (k INT, v DOUBLE) USING snapshot")
    e.sql(
        "INSERT INTO fz VALUES "
        + ", ".join(f"({i}, {i}.5)" for i in range(20))
    )
    return e


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_set_session_value_round_trips(fz_eng, payload):
    """Any payload survives SET SESSION quoting verbatim: stored,
    listed, and reset — never parsed as statement structure."""
    r = fz_eng.sql(f"SET SESSION fuzz_key = {_quote(payload)}").collect()[0]
    assert r["name"] == "fuzz_key" and r["value"] == payload
    listed = {
        row["name"]: row["value"]
        for row in fz_eng.sql("SHOW SESSION").collect()
    }
    assert listed["fuzz_key"] == payload
    assert fz_eng.sql("RESET SESSION fuzz_key").collect()[0]["reset"] is True


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_tablesample_translator_never_rewrites_literals(fz_eng, payload):
    """A string literal carrying TABLESAMPLE keywords (balanced or not)
    comes back byte-identical — the translator matches on masked text,
    so quoted bytes are invisible to it — and the statement still
    samples correctly when a REAL clause follows the literal."""
    got = fz_eng.sql(
        f"SELECT {_quote(payload)} AS s FROM fz "
        f"TABLESAMPLE BERNOULLI (100) LIMIT 1"
    ).collect()[0]["s"]
    assert got == payload


def test_unbalanced_real_tablesample_still_errors(fz_eng):
    """An unbalanced UNQUOTED sampling clause is left for the SQL
    parser to refuse — the translator must not loop or 'repair' it."""
    with pytest.raises(Exception):
        fz_eng.sql("SELECT k FROM fz TABLESAMPLE BERNOULLI (100").collect()
