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


# ------------------- MATCH_RECOGNIZE grammar fuzz (round 11) -------------
MR_TMPL = """
SELECT * FROM mrz MATCH_RECOGNIZE (
  PARTITION BY u ORDER BY i
  MEASURES MATCH_NUMBER() AS n, LAST(A.s) AS last_s, COUNT(*) AS c
  PATTERN (A+ B+)
  DEFINE A AS s = {pa}, B AS s = {pb}
)
"""


@pytest.fixture(scope="module")
def mrz_eng(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fz11mr")
    e = Engine(spark=spark, warehouse_dir=str(root / "whmr"))
    e.sql("CREATE TABLE mrz (u INT, i INT, s STRING) USING snapshot")
    e.sql(
        "INSERT INTO mrz VALUES "
        + ", ".join(
            f"(1, {i}, '{'xy'[i % 2]}')" for i in range(16)
        )
    )
    return e


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_match_recognize_define_literals_stay_data(mrz_eng, payload):
    """Hostile payloads inside DEFINE string literals must parse as DATA:
    commas, parens, AS, PATTERN(, MATCH_RECOGNIZE( inside the literal may
    never split the clause or re-trigger the router. The statement either
    returns cleanly (payload matched / didn't match rows) or raises a
    clean analysis error — never a mangled rewrite."""
    q = MR_TMPL.format(pa=_quote(payload), pb=_quote(payload + "z"))
    rows = mrz_eng.sql(q).collect()
    # labels are exclusive ('s' can't equal both payloads), so matches
    # require both labels present — only the 'x'/'y' payloads can match
    for r in rows:
        assert r["last_s"] == payload
        assert r["c"] >= 2


def test_match_recognize_keyword_inside_literal_is_data(mrz_eng):
    df = mrz_eng.sql(
        "SELECT 'MATCH_RECOGNIZE ( PATTERN' AS s FROM mrz LIMIT 1"
    )
    assert df.collect()[0]["s"] == "MATCH_RECOGNIZE ( PATTERN"


def test_match_recognize_malformed_clauses_raise_cleanly(mrz_eng):
    cases = [
        # clause order violated
        ("SELECT * FROM mrz MATCH_RECOGNIZE (ORDER BY i PARTITION BY u "
         "MEASURES MATCH_NUMBER() AS n PATTERN (A+) DEFINE A AS s = 'x')",
         "out of order"),
        # missing DEFINE
        ("SELECT * FROM mrz MATCH_RECOGNIZE (PARTITION BY u ORDER BY i "
         "MEASURES MATCH_NUMBER() AS n PATTERN (A+))", "missing"),
        # SUBSET unsupported
        ("SELECT * FROM mrz MATCH_RECOGNIZE (PARTITION BY u ORDER BY i "
         "MEASURES MATCH_NUMBER() AS n PATTERN (A+) SUBSET S = (A) "
         "DEFINE A AS s = 'x')", "SUBSET"),
        # DESC order
        ("SELECT * FROM mrz MATCH_RECOGNIZE (PARTITION BY u ORDER BY i DESC "
         "MEASURES MATCH_NUMBER() AS n PATTERN (A+) DEFINE A AS s = 'x')",
         "ascending"),
        # measure without alias
        ("SELECT * FROM mrz MATCH_RECOGNIZE (PARTITION BY u ORDER BY i "
         "MEASURES MATCH_NUMBER() PATTERN (A+) DEFINE A AS s = 'x')",
         "AS alias"),
        # trailing junk after the clause
        ("SELECT * FROM mrz MATCH_RECOGNIZE (PARTITION BY u ORDER BY i "
         "MEASURES MATCH_NUMBER() AS n PATTERN (A+) DEFINE A AS s = 'x') "
         "WHERE n > 1", "trailing"),
    ]
    for q, msg in cases:
        with pytest.raises(ValueError, match=msg):
            mrz_eng.sql(q)
