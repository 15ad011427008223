"""Round-14 fuzz extension: the UNNEST rewrite and EXECUTE IMMEDIATE
unwrap are NEW hostile-text seams — `CROSS JOIN UNNEST(` / `WITH
ORDINALITY` / `EXECUTE IMMEDIATE` INSIDE a string literal are data and
must pass through Engine.sql byte-for-byte; and the EXECUTE IMMEDIATE
quote-undoubling must round-trip any payload losslessly. Same
discipline as ``test_statement_fuzz.py``: hypothesis generates
literal-hostile payloads, Spark itself is the oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oss_data_lake_spark.engine import Engine

TRICKY = [
    "CROSS JOIN UNNEST(arr) AS t(v)",
    "UNNEST(a, b) AS t(x, y)",
    "WITH ORDINALITY AS t(v, i)",
    "LEFT JOIN UNNEST(m) ON TRUE",
    "UNNEST(",                       # unbalanced — must stay data
    "EXECUTE IMMEDIATE 'SELECT 1'",
    "EXECUTE IMMEDIATE",
    "WITH FUNCTION f(x INT) RETURNS INT",
    "TRY(1 / 0)",
    "TRY(CAST(x AS INT)",           # unbalanced — must stay data
    "O''Brien UNNEST",
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
def fz_eng(spark):
    return Engine(spark=spark)


@settings(
    max_examples=60, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_unnest_spellings_inside_literals_are_data(fz_eng, payload):
    """SELECT '<payload>' round-trips byte-for-byte even when the
    payload spells an UNNEST clause, WITH ORDINALITY, or EXECUTE
    IMMEDIATE — the masked-text matchers must never fire inside the
    literal."""
    got = fz_eng.sql(
        f"SELECT {_quote(payload)} AS s, length({_quote(payload)}) AS n"
    ).collect()[0]
    assert got.s == payload
    assert got.n == len(payload)


@settings(
    max_examples=60, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_execute_immediate_roundtrips_hostile_payload(fz_eng, payload):
    """EXECUTE IMMEDIATE 'SELECT ''<payload-doubled>'' AS s' must
    yield the payload exactly: the unwrap undoubles ONCE, the inner
    statement's own literal grammar handles the rest."""
    inner = f"SELECT {_quote(payload)} AS s"
    stmt = "EXECUTE IMMEDIATE " + _quote(inner)
    got = fz_eng.sql(stmt).collect()[0]
    assert got.s == payload


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_real_unnest_next_to_hostile_literal(fz_eng, payload):
    """A REAL UNNEST clause with the hostile payload in a neighboring
    literal: the rewrite splices around the literal, never into it."""
    got = sorted(fz_eng.sql(
        f"SELECT u.v, {_quote(payload)} AS s FROM "
        f"(SELECT array(1, 2) AS a) "
        f"CROSS JOIN UNNEST(a) WITH ORDINALITY AS u(v, i)"
    ).collect())
    assert [r.v for r in got] == [1, 2]
    assert all(r.s == payload for r in got)


def test_composed_r14_statement_with_every_seam(fz_eng):
    """One statement exercising the UNNEST rewrite, a translated
    function in its argument, EXECUTE IMMEDIATE wrapping, and hostile
    literals simultaneously — the chain must compose."""
    row = fz_eng.sql(
        "EXECUTE IMMEDIATE 'SELECT u.v AS v, u.i AS i, "
        "strpos(''CROSS JOIN UNNEST('', ''UNNEST'') AS p "
        "FROM (SELECT array(10, 20) AS a) "
        "CROSS JOIN UNNEST(slice(a, 1, 1)) WITH ORDINALITY AS u(v, i)'"
    ).collect()
    assert len(row) == 1
    assert (row[0].v, row[0].i, row[0].p) == (10, 1, 12)
