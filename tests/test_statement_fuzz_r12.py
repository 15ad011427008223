"""Round-12 fuzz extension: the NEW grammar's hostile-input seams —
the quantified-comparison translator (op ANY/SOME/ALL), the SQL/JSON
function mapper, and the information_schema reference rewriter. All
three rewrite on the MASKED text, so their keywords inside string
literals must stay data; malformed spellings must either fall through
to Spark's own parser error or raise a precise engine error — never
silently produce a different query. Same discipline as
``test_statement_fuzz.py``: hypothesis generates literal-hostile
payloads, Spark itself is the oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oss_data_lake_spark.engine import Engine

TRICKY = [
    "x > ALL (SELECT 1)",
    "v = ANY (SELECT k FROM fz)",
    "<= SOME (",                       # unbalanced — must stay data
    ") <> ALL (SELECT",
    "json_value(doc, '$.a')",
    "json_exists(props, 'lax $.k')",
    "information_schema.tables",
    "iceberg.information_schema.columns",
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
    root = tmp_path_factory.mktemp("fz12")
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
def test_translator_keywords_inside_literals_stay_data(fz_eng, payload):
    """A literal carrying quantified / SQL-JSON / information_schema
    spellings round-trips byte-identically — no translator fires inside
    it, and the row count of the carrying query is unchanged."""
    lit = _quote(payload)
    rows = fz_eng.sql(
        f"SELECT k, {lit} AS s FROM fz WHERE k < 3 ORDER BY k"
    ).collect()
    assert [r.k for r in rows] == [0, 1, 2]
    assert all(r.s == payload for r in rows)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payload=_payload)
def test_quantified_in_where_with_hostile_literal_beside_it(fz_eng, payload):
    """A real quantified comparison translates while a hostile literal
    sits in the same statement — the masked-text scan must not let the
    literal shift the subquery span."""
    lit = _quote(payload)
    rows = fz_eng.sql(
        f"SELECT k, {lit} AS s FROM fz "
        f"WHERE k > ALL (SELECT k - 19 FROM fz) ORDER BY k"
    ).collect()
    assert [r.k for r in rows] == list(range(1, 20))
    assert all(r.s == payload for r in rows)


def test_malformed_quantified_raises_not_corrupts(fz_eng):
    # unbalanced subquery paren: translator declines; Spark's parser
    # reports the site
    with pytest.raises(Exception):
        fz_eng.sql("SELECT k FROM fz WHERE k > ALL (SELECT k FROM fz")
    # quantifier over a non-subquery stays Spark's own error (any() is
    # an aggregate, invalid in WHERE)
    with pytest.raises(Exception):
        fz_eng.sql("SELECT k FROM fz WHERE k = ANY (k)")


def test_sql_json_clause_refusals_are_precise(fz_eng):
    with pytest.raises(ValueError, match="ON EMPTY"):
        fz_eng.sql("SELECT json_value('{\"a\":1}', "
                   "'$.a' DEFAULT 0 ON EMPTY) AS v")
    with pytest.raises(ValueError, match="string literal"):
        fz_eng.sql("SELECT json_value('{\"a\":1}', k) AS v FROM fz")


def test_sql_json_nested_calls_translate(fz_eng):
    got = fz_eng.sql(
        "SELECT json_value(json_query('{\"a\": {\"b\": 7}}', '$.a'), "
        "'$.b' RETURNING BIGINT) AS v"
    ).collect()[0]["v"]
    assert got == 7


def test_information_schema_inside_ddl_name_is_refused_cleanly(fz_eng):
    """A table NAMED like the reserved schema cannot shadow it — the
    reference text rewrites to the metadata relation first, so the
    CREATE fails loudly rather than silently registering a shadow."""
    with pytest.raises(Exception):
        fz_eng.sql("CREATE TABLE information_schema.tables (k INT) "
                   "USING snapshot")


def test_fetch_first_offset_rows_translate(fz_eng):
    """ANSI paging (DBeaver-class BI emits it): OFFSET n ROWS /
    FETCH FIRST n ROWS ONLY / the combined ANSI ordering, vs the same
    paging in Spark's native LIMIT/OFFSET spellings."""
    base = "SELECT k FROM fz ORDER BY k "
    want = [r.k for r in fz_eng.sql(base + "LIMIT 3 OFFSET 2").collect()]
    assert want == [2, 3, 4]
    for ansi in [
        "OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY",
        "OFFSET 2 ROWS FETCH NEXT 3 ROWS ONLY",
    ]:
        got = [r.k for r in fz_eng.sql(base + ansi).collect()]
        assert got == want, ansi
    assert [r.k for r in fz_eng.sql(
        base + "FETCH FIRST ROW ONLY").collect()] == [0]  # default n=1
    assert [r.k for r in fz_eng.sql(
        base + "OFFSET 18 ROWS").collect()] == [18, 19]
    with pytest.raises(ValueError, match="WITH TIES"):
        fz_eng.sql(base + "FETCH FIRST 3 ROWS WITH TIES")
    # the spelling inside a literal stays data
    s = fz_eng.sql(
        "SELECT 'OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY' AS s"
    ).collect()[0]["s"]
    assert s == "OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY"
