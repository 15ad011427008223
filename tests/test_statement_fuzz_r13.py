"""Round-13 fuzz extension: the Trino function-dialect rewrites and
AT TIME ZONE are a NEW hostile-text seam — `strpos(` / `date_diff('day'`
/ `AT TIME ZONE 'UTC'` INSIDE a string literal are data and must pass
through Engine.sql byte-for-byte; outside literals the rewrites must
never corrupt surrounding expression text. Same discipline as
``test_statement_fuzz.py``: hypothesis generates literal-hostile
payloads, Spark itself is the oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oss_data_lake_spark.engine import Engine

TRICKY = [
    "strpos('a','b')",
    "date_diff('day', x, y)",
    "date_add('hour', 1",           # unbalanced — must stay data
    "format_datetime(ts, 'YYYY')",  # refused OUTSIDE a literal only
    "AT TIME ZONE 'UTC'",
    "ts AT TIME ZONE",
    "approx_distinct(",
    "x = ANY (SELECT",
    "O''Brien strpos",
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
def test_dialect_spellings_inside_literals_are_data(fz_eng, payload):
    """SELECT '<payload>' round-trips byte-for-byte even when the
    payload spells a dialect function, a unit form, or AT TIME ZONE —
    the masked-text matchers must never fire inside the literal."""
    got = fz_eng.sql(
        f"SELECT {_quote(payload)} AS s, strpos({_quote(payload)}, 'x') "
        f"AS p"
    ).collect()[0]
    assert got.s == payload
    assert got.p == (payload.find("x") + 1)


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_dialect_call_over_hostile_literal_argument(fz_eng, payload):
    """A REAL dialect call whose string argument is hostile: the
    translation rewrites the call but embeds the literal unchanged."""
    got = fz_eng.sql(
        f"SELECT format_datetime(TIMESTAMP '2020-03-04 05:06:07', "
        f"'yyyy-MM-dd') AS f, {_quote(payload)} AS s"
    ).collect()[0]
    assert got.f == "2020-03-04" and got.s == payload


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_at_time_zone_zone_literal_is_never_payload(fz_eng, payload):
    """AT TIME ZONE with the payload in a NEIGHBORING literal: the zone
    argument detection must bind the adjacent literal, not scan into
    (or past) other strings."""
    got = fz_eng.sql(
        f"SELECT CAST(TIMESTAMP '2020-01-01 01:30:00' "
        f"AT TIME ZONE 'America/New_York' AS DATE) AS d, "
        f"{_quote(payload)} AS s"
    ).collect()[0]
    assert str(got.d) == "2019-12-31" and got.s == payload


def test_composed_dialect_statement_with_every_seam(fz_eng):
    """One statement exercising every round-13 rewrite plus hostile
    literals simultaneously — the translator chain must compose."""
    row = fz_eng.sql(
        "SELECT strpos('date_diff(''day'' AT TIME ZONE', 'TIME') AS p, "
        "date_diff('hour', TIMESTAMP '2020-01-01 00:00:00', "
        "          date_add('minute', 90, "
        "                   TIMESTAMP '2020-01-01 00:00:00')) AS h, "
        "format_datetime(TIMESTAMP '2020-01-01 00:00:00' "
        "                AT TIME ZONE 'Asia/Kolkata', 'HH:mm') AS k, "
        "approx_distinct(1) AS a"
    ).collect()[0]
    assert row.p == 20  # 'TIME' in "date_diff('day' AT TIME ZONE"
    assert row.h == 1            # 90 min, elapsed whole hours
    assert row.k == "05:30"      # the half-hour zone through both layers
    assert row.a == 1


def test_braces_in_literal_arguments_survive(fz_eng):
    """str.format-style braces inside a literal argument of a translated
    call must pass through verbatim (the substitution templates use
    plain text replacement, never str.format over user SQL)."""
    row = fz_eng.sql(
        "SELECT format('%s={x}{unbalanced', 'v') AS f, "
        "strpos('{a}{b}', '{b}') AS p, "
        "day_of_week(TIMESTAMP '2020-01-01 00:00:00') AS d"
    ).collect()[0]
    assert row.f == "v={x}{unbalanced"
    assert row.p == 4
    assert row.d == 3
