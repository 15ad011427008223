"""The Trino scalar-function dialect layer (round 13) — the spellings
BI-generated Trino SQL actually contains (reference RUNBOOK.md:120-123),
translated by ``Engine._translate_trino_functions`` and
``Engine._translate_at_time_zone``.

Three claims, each pinned here:

1. EXACTNESS — every translated call returns what Trino documents,
   checked differentially against DuckDB wherever DuckDB shares the
   semantics (``datesub`` = complete elapsed intervals, ``strpos``,
   native ``AT TIME ZONE`` double application), and against documented
   values for the month-end edge where engines legitimately differ.
2. ARGUMENT-ORDER TRAPS — strpos/locate swap, date_add 2-arg vs 3-arg
   dispatch, DuckDB datediff-vs-datesub — the silent-wrongness seams.
3. LOUD REFUSAL — anything outside the exact subset (3-arg strpos,
   non-shared Joda pattern letters, non-literal units/zones, compound
   operand tails) raises, never approximates.
"""

from __future__ import annotations

import duckdb
import pytest

from oss_data_lake_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return Engine(spark=spark)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


# deterministic pseudo-random timestamp pairs (no RNG dependency):
# seconds-since-2020 offsets chosen by a small LCG, microsecond tails
# included so truncation (not rounding) is exercised
def _ts_pairs(n=60):
    pairs, state = [], 123457
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % (86400 * 900)
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % (86400 * 900)
        us_a, us_b = state % 1000000, (state * 7) % 1000000
        pairs.append((a, us_a, b, us_b))
    return pairs


def _iso(base_s, us):
    import datetime

    t = datetime.datetime(2020, 1, 1) + datetime.timedelta(
        seconds=base_s, microseconds=us
    )
    return t.strftime("%Y-%m-%d %H:%M:%S.%f")


class TestDateDiffDifferential:
    """date_diff('unit', a, b) → timestampdiff == DuckDB datesub for the
    exact-elapsed units; DuckDB's datediff (BOUNDARY crossings) is the
    trap the matrix proves we did NOT map onto."""

    @pytest.mark.parametrize(
        "unit", ["second", "minute", "hour", "day", "week"]
    )
    def test_elapsed_units_match_datesub(self, eng, duck, unit):
        for a_s, a_us, b_s, b_us in _ts_pairs(40):
            ta, tb = _iso(a_s, a_us), _iso(b_s, b_us)
            got = eng.sql(
                f"SELECT date_diff('{unit}', TIMESTAMP '{ta}', "
                f"TIMESTAMP '{tb}') AS d"
            ).collect()[0].d
            want = duck.sql(
                f"SELECT datesub('{unit}', TIMESTAMP '{ta}', "
                f"TIMESTAMP '{tb}')"
            ).fetchone()[0]
            assert got == want, (unit, ta, tb, got, want)

    def test_boundary_crossing_is_not_our_semantics(self, eng, duck):
        # 00:59 → 01:01 crosses one hour BOUNDARY but spans 2 minutes:
        # Trino/Spark elapsed-hours = 0; DuckDB datediff = 1
        q = ("'hour', TIMESTAMP '2020-01-01 00:59:00', "
             "TIMESTAMP '2020-01-01 01:01:00'")
        assert eng.sql(f"SELECT date_diff({q}) AS d").collect()[0].d == 0
        assert duck.sql(f"SELECT datediff({q})").fetchone()[0] == 1
        assert duck.sql(f"SELECT datesub({q})").fetchone()[0] == 0

    def test_month_end_pins(self, eng):
        # Spark's timestampdiff day-of-month comparison rule: Jan 31 →
        # Feb 29 is 0 whole months (29 < 31), Jan 31 → Mar 31 is exactly
        # 2, Jan 31 → Mar 30 is 1. Clamped month-ends are a DOCUMENTED
        # cross-engine disagreement point (DuckDB's datesub clamps and
        # says 1/2/1) — which is why month/quarter/year stay out of the
        # b59 differential arms and the dialect layer pins (and
        # documents) the Spark rule rather than claiming exact Trino
        # month-end parity.
        cases = [
            ("2020-01-31", "2020-02-29", 0),
            ("2020-01-31", "2020-03-31", 2),
            ("2020-01-31", "2020-03-30", 1),
            ("2020-01-15", "2020-02-15", 1),
            ("2020-02-29", "2021-02-28", 11),
        ]
        for a, b, want in cases:
            got = eng.sql(
                f"SELECT date_diff('month', TIMESTAMP '{a} 00:00:00', "
                f"TIMESTAMP '{b} 00:00:00') AS d"
            ).collect()[0].d
            assert got == want, (a, b, got, want)

    def test_negative_direction(self, eng, duck):
        # b before a → negative, truncated toward zero in both engines
        q = ("'day', TIMESTAMP '2020-01-10 12:00:00', "
             "TIMESTAMP '2020-01-08 18:00:00'")
        got = eng.sql(f"SELECT date_diff({q}) AS d").collect()[0].d
        want = duck.sql(f"SELECT datesub({q})").fetchone()[0]
        assert got == want == -1


class TestDateAdd:
    def test_unit_form_matches_duck_interval(self, eng, duck):
        for unit, n in [("hour", 37), ("minute", -90), ("day", 400),
                        ("second", 86401), ("week", 3)]:
            got = eng.sql(
                f"SELECT date_add('{unit}', {n}, "
                f"TIMESTAMP '2020-03-08 01:30:00.250000') AS t"
            ).collect()[0].t
            want = duck.sql(
                f"SELECT TIMESTAMP '2020-03-08 01:30:00.250000' "
                f"+ ({n}) * INTERVAL 1 {unit}"
            ).fetchone()[0]
            assert got == want, (unit, n, got, want)

    def test_spark_two_arg_form_untouched(self, eng):
        # Spark's own date_add(start_date, days) must pass through
        row = eng.sql(
            "SELECT date_add(DATE '2020-01-01', 31) AS d"
        ).collect()[0]
        assert str(row.d) == "2020-02-01"

    def test_nested_translation_composes(self, eng):
        # date_diff over date_add: inner splice still translates
        got = eng.sql(
            "SELECT date_diff('minute', ts, date_add('hour', 2, ts)) AS m "
            "FROM (SELECT TIMESTAMP '2020-01-01 05:06:07' AS ts)"
        ).collect()[0].m
        assert got == 120


class TestStrpos:
    """The ARGUMENT-ORDER trap: Trino strpos(string, substring) vs
    Spark locate(substring, string)."""

    CASES = [
        ("hello world", "o"), ("hello", "hello"), ("hello", "x"),
        ("aaa", "aa"), ("", "a"), ("abc", ""), ("ababab", "bab"),
        ("naïve café", "é"), ("x,y", ","),
    ]

    def test_matches_duckdb_strpos(self, eng, duck):
        for s, sub in self.CASES:
            got = eng.sql(
                f"SELECT strpos('{s}', '{sub}') AS p"
            ).collect()[0].p
            want = duck.sql(
                f"SELECT strpos('{s}', '{sub}')"
            ).fetchone()[0]
            assert got == want, (s, sub, got, want)

    def test_not_the_swapped_reading(self, eng):
        # strpos('needle in haystack', 'needle'): if the translator
        # forgot the swap, locate('needle in haystack', 'needle') = 0
        assert eng.sql(
            "SELECT strpos('needle in haystack', 'needle') AS p"
        ).collect()[0].p == 1

    def test_three_arg_refuses(self, eng):
        with pytest.raises(Exception, match="instance"):
            eng.sql("SELECT strpos('aaa', 'a', 2)")


class TestFormatDatetime:
    def test_shared_subset_matches_strftime(self, eng, duck):
        pairs = [  # (joda/spark shared pattern, strftime twin)
            ("yyyy-MM-dd", "%Y-%m-%d"),
            ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
            ("HH", "%H"), ("dd/MM/yyyy", "%d/%m/%Y"),
        ]
        ts = "2020-03-04 05:06:07.123456"
        for joda, strf in pairs:
            got = eng.sql(
                f"SELECT format_datetime(TIMESTAMP '{ts}', '{joda}') AS f"
            ).collect()[0].f
            want = duck.sql(
                f"SELECT strftime(TIMESTAMP '{ts}', '{strf}')"
            ).fetchone()[0]
            assert got == want, (joda, got, want)

    def test_quoted_literal_in_pattern(self, eng):
        got = eng.sql(
            "SELECT format_datetime(TIMESTAMP '2020-03-04 05:06:07', "
            "'yyyy-MM-dd''T''HH:mm') AS f"
        ).collect()[0].f
        assert got == "2020-03-04T05:06"

    @pytest.mark.parametrize("letter", ["Y", "w", "x", "e", "C", "Q"])
    def test_non_shared_letters_refuse(self, eng, letter):
        # Joda 'Y' (weekyear) / 'w' (week) / 'x' / 'e' / 'C' mean
        # DIFFERENT fields (or nothing) in Spark's grammar — silent
        # reformatting would corrupt dashboards; must refuse
        with pytest.raises(Exception, match="pattern letter"):
            eng.sql(
                f"SELECT format_datetime(TIMESTAMP '2020-03-04 05:06:07',"
                f" 'yyyy-{letter}')"
            )

    def test_non_literal_pattern_refuses(self, eng):
        with pytest.raises(Exception, match="string literal"):
            eng.sql(
                "SELECT format_datetime(ts, col) FROM "
                "(SELECT TIMESTAMP '2020-01-01 00:00:00' ts, 'yyyy' col)"
            )


class TestApproxDistinct:
    def test_hll_accuracy_bound(self, eng, spark, sf_correct):
        from oss_data_lake_spark.sources.loaders import load_table

        load_table(spark, sf_correct, "events")\
            .createOrReplaceTempView("ad_events")
        row = eng.sql(
            "SELECT approx_distinct(user_id) AS a, "
            "count(DISTINCT user_id) AS x FROM ad_events"
        ).collect()[0]
        spark.catalog.dropTempView("ad_events")
        # Trino documents 2.3% standard error by default; allow 3 sigma
        assert abs(row.a - row.x) <= max(3, 0.069 * row.x), row

    def test_error_parameter_accepted(self, eng):
        got = eng.sql(
            "SELECT approx_distinct(x, 0.01) AS a "
            "FROM (SELECT explode(sequence(1, 50)) AS x)"
        ).collect()[0].a
        assert got == 50  # small-n HLL is exact


class TestRegexpLike:
    def test_native_passthrough(self, eng, duck):
        for s, p in [("abc", "^a.c$"), ("abc", "z"), ("a1b2", "[0-9]b")]:
            got = eng.sql(
                f"SELECT regexp_like('{s}', '{p}') AS r"
            ).collect()[0].r
            want = duck.sql(
                f"SELECT regexp_matches('{s}', '{p}')"
            ).fetchone()[0]
            assert got == want, (s, p)


class TestAtTimeZone:
    def test_day_bucketing_matches_duckdb(self, eng, duck):
        # THE semantic that changes answers: group-by-local-day near
        # midnight UTC (reference dashboards group by DATE(ts))
        for ts, zone in [
            ("2020-01-01 01:30:00", "America/New_York"),
            ("2020-12-31 20:30:00", "Asia/Tokyo"),
            ("2020-06-15 18:40:00", "Asia/Kolkata"),  # half-hour offset
            ("2020-03-08 06:59:00", "America/New_York"),  # DST spring
            ("2020-11-01 05:30:00", "America/New_York"),  # DST fall
        ]:
            got = eng.sql(
                f"SELECT CAST(TIMESTAMP '{ts}' AT TIME ZONE '{zone}' "
                f"AS DATE) AS d"
            ).collect()[0].d
            want = duck.sql(
                f"SELECT CAST((TIMESTAMP '{ts}' AT TIME ZONE 'UTC') "
                f"AT TIME ZONE '{zone}' AS DATE)"
            ).fetchone()[0]
            assert got == want, (ts, zone, got, want)

    def test_operand_forms(self, eng):
        # identifier / parenthesized / typed literal / call operand
        rows = eng.sql(
            "SELECT ts AT TIME ZONE 'UTC' AS a, "
            "(ts) AT TIME ZONE 'UTC' AS b, "
            "date_trunc('hour', ts) AT TIME ZONE 'UTC' AS c "
            "FROM (SELECT TIMESTAMP '2020-01-01 05:06:07' AS ts)"
        ).collect()[0]
        assert str(rows.a) == "2020-01-01 05:06:07"
        assert rows.a == rows.b
        assert str(rows.c) == "2020-01-01 05:00:00"

    def test_chained_at_time_zone_refuses(self, eng):
        # the rewrite yields the target-zone WALL-CLOCK; a second
        # application would re-interpret it in the session zone and
        # silently land on the wrong instant — must refuse
        with pytest.raises(Exception, match="chained"):
            eng.sql(
                "SELECT TIMESTAMP '2020-01-01 00:00:00' "
                "AT TIME ZONE 'Asia/Tokyo' AT TIME ZONE 'UTC'"
            )

    def test_non_literal_zone_refuses(self, eng):
        with pytest.raises(Exception, match="string literal"):
            eng.sql(
                "SELECT ts AT TIME ZONE z FROM (SELECT "
                "TIMESTAMP '2020-01-01 00:00:00' ts, 'UTC' z)"
            )

    def test_keyword_inside_string_is_data(self, eng):
        row = eng.sql(
            "SELECT 'AT TIME ZONE ''UTC''' AS s, "
            "strpos('date_diff(''day'' x', 'x') AS p"
        ).collect()[0]
        assert row.s == "AT TIME ZONE 'UTC'"
        assert row.p == 17


class TestCompoundLhsRefusals:
    """The ADVICE medium item: a compound LHS/operand tail must refuse
    loudly, never splice inside the expression."""

    def test_concat_lhs_quantified_refuses(self, eng):
        with pytest.raises(Exception, match="compound"):
            eng.sql(
                "SELECT a || b = ANY (SELECT 'x') "
                "FROM (SELECT 'p' a, 'q' b)"
            )

    def test_arithmetic_lhs_quantified_refuses(self, eng):
        with pytest.raises(Exception, match="compound"):
            eng.sql(
                "SELECT price * qty > ALL (SELECT 5) "
                "FROM (SELECT 2 price, 3 qty)"
            )

    def test_parenthesized_compound_lhs_works(self, eng):
        # the documented fix: wrap the full LHS. (The subquery body is
        # a VALUES-backed select: Spark's lexer reads a bare
        # `(SELECT 'pq')` as the typed literal SELECT'pq' — a parser
        # quirk independent of the quantified rewrite.)
        row = eng.sql(
            "SELECT (a || b) = ANY (SELECT v FROM VALUES ('pq') t(v)) "
            "AS ok FROM (SELECT 'p' a, 'q' b)"
        ).collect()[0]
        assert row.ok is True

    def test_compound_at_time_zone_operand_refuses_or_errors(self, eng):
        # `x - interval` tail: either our loud refusal or Spark's parse
        # error — NEVER a silently rebased partial operand
        with pytest.raises(Exception):
            eng.sql(
                "SELECT ts + INTERVAL 1 HOUR AT TIME ZONE 'UTC' "
                "FROM (SELECT TIMESTAMP '2020-01-01 00:00:00' ts)"
            )


class TestUnitValidation:
    def test_bad_unit_refuses(self, eng):
        with pytest.raises(Exception, match="unsupported unit"):
            eng.sql(
                "SELECT date_diff('fortnight', TIMESTAMP "
                "'2020-01-01 00:00:00', TIMESTAMP '2020-01-02 00:00:00')"
            )

    def test_non_literal_unit_left_alone(self, eng):
        # not Trino's spelling → untranslated → Spark's own parse error
        with pytest.raises(Exception):
            eng.sql(
                "SELECT date_diff(u, TIMESTAMP '2020-01-01 00:00:00', "
                "TIMESTAMP '2020-01-02 00:00:00') FROM (SELECT 'day' u)"
            )


class TestShowFunctions:
    def test_shape_and_dialect_rows(self, eng):
        df = eng.sql("SHOW FUNCTIONS")
        assert [f.name for f in df.schema.fields] == [
            "function", "function_type", "description"
        ]
        rows = {(r.function, r.function_type) for r in df.collect()}
        for fn in ["approx_distinct", "date_diff", "date_add", "strpos",
                   "format_datetime", "regexp_like", "json_value",
                   "json_exists"]:
            assert (fn, "trino dialect") in rows, fn
        assert ("at time zone", "sql clause (translated)") in rows
        # Spark's own registry is unioned in (names work verbatim)
        assert ("concat_ws", "spark builtin") in rows

    def test_like_filter(self, eng):
        rows = eng.sql("SHOW FUNCTIONS LIKE 'date_diff'")
        got = {r.function for r in rows.collect()}
        assert got == {"date_diff"}
        rows = eng.sql("SHOW FUNCTIONS LIKE 'json%'").collect()
        assert {r.function for r in rows} >= {
            "json_value", "json_query", "json_exists"
        }

    def test_dialect_table_is_live_contract(self, eng):
        """Every FUNCTION row advertised as 'trino dialect' must actually
        translate (or natively run) through Engine.sql — the table can
        never drift ahead of the chain."""
        ts = "TIMESTAMP '2020-01-01 00:00:00'"
        samples = {
            "approx_distinct": "SELECT approx_distinct(1) AS v",
            "date_diff": f"SELECT date_diff('day', {ts}, TIMESTAMP "
                         "'2020-01-02 00:00:00') AS v",
            "date_add": f"SELECT date_add('day', 1, {ts}) AS v",
            "strpos": "SELECT strpos('ab', 'b') AS v",
            "format_datetime": f"SELECT format_datetime({ts}, 'yyyy') "
                               "AS v",
            "regexp_like": "SELECT regexp_like('a', 'a') AS v",
            "json_value": "SELECT json_value('{\"a\":1}', '$.a') AS v",
            "json_query": "SELECT json_query('{\"a\":[1]}', '$.a') AS v",
            "json_exists": "SELECT json_exists('{\"a\":1}', '$.a') AS v",
            "day_of_week": f"SELECT day_of_week({ts}) AS v",
            "dow": f"SELECT dow({ts}) AS v",
            "day_of_year": f"SELECT day_of_year({ts}) AS v",
            "doy": f"SELECT doy({ts}) AS v",
            "day_of_month": f"SELECT day_of_month({ts}) AS v",
            "week": f"SELECT week({ts}) AS v",
            "week_of_year": f"SELECT week_of_year({ts}) AS v",
            "year_of_week": f"SELECT year_of_week({ts}) AS v",
            "yow": f"SELECT yow({ts}) AS v",
            "to_unixtime": f"SELECT to_unixtime({ts}) AS v",
            "date_parse": "SELECT date_parse('2020-01-02 03:04:05', "
                          "'%Y-%m-%d %H:%i:%s') AS v",
            "arbitrary": "SELECT arbitrary(x) AS v FROM VALUES (1) t(x)",
            "format": "SELECT format('%d-%s', 7, 'x') AS v",
            "try": "SELECT try(4 / 2) AS v",
            "any_match": "SELECT any_match(array(1, 2), x -> x > 1) "
                         "AS v",
            "all_match": "SELECT all_match(array(1, 2), x -> x > 0) "
                         "AS v",
            "none_match": "SELECT none_match(array(1, 2), x -> x > 9) "
                          "AS v",
            "json_parse": "SELECT json_parse('{\"a\":1}') AS v",
            "json_format": "SELECT json_format('{\"a\":1}') AS v",
        }
        advertised = {
            f for f, t, _ in Engine._DIALECT_FUNCTIONS
            if t == "trino dialect"
        }
        assert advertised == set(samples), (
            "dialect table and live-contract samples diverged"
        )
        for name, q in samples.items():
            assert eng.sql(q).collect()[0].v is not None, name


class TestDatePartFamily:
    """Phase-2 dialect: Trino's date-part spellings vs DuckDB's native
    twins over a spread of dates (ISO-week boundaries included — the
    day_of_week Sun-vs-Mon trap and the year_of_week rollover)."""

    DATES = [
        "2019-12-29", "2019-12-30", "2020-01-01", "2020-02-29",
        "2020-12-31", "2021-01-03", "2021-01-04", "2024-06-15",
    ]

    def test_matches_duckdb_parts(self, eng, duck):
        pairs = [  # (trino spelling, duckdb twin)
            ("day_of_week", "isodow"), ("dow", "isodow"),
            ("day_of_year", "dayofyear"), ("doy", "dayofyear"),
            ("day_of_month", "day"),
            ("week", "weekofyear"), ("week_of_year", "weekofyear"),
            ("year_of_week", "isoyear"), ("yow", "isoyear"),
        ]
        for d in self.DATES:
            for trino, duckfn in pairs:
                got = eng.sql(
                    f"SELECT {trino}(TIMESTAMP '{d} 12:00:00') AS v"
                ).collect()[0].v
                want = duck.sql(
                    f"SELECT {duckfn}(TIMESTAMP '{d} 12:00:00')"
                ).fetchone()[0]
                assert got == want, (trino, d, got, want)

    def test_not_sparks_sunday_based_dayofweek(self, eng):
        # 2020-01-01 was a Wednesday: ISO day_of_week = 3; Spark's own
        # dayofweek says 4 (Sun=1) — the trap the translation avoids
        assert eng.sql(
            "SELECT day_of_week(TIMESTAMP '2020-01-01 00:00:00') AS v"
        ).collect()[0].v == 3

    def test_to_unixtime_fractional(self, eng, duck):
        ts = "2020-06-15 01:02:03.250000"
        got = eng.sql(
            f"SELECT to_unixtime(TIMESTAMP '{ts}') AS v"
        ).collect()[0].v
        want = duck.sql(
            f"SELECT epoch_us(TIMESTAMP '{ts}') / 1000000.0"
        ).fetchone()[0]
        assert abs(got - want) < 1e-9 and abs(got % 1 - 0.25) < 1e-9


class TestDateParse:
    def test_matches_duckdb_strptime(self, eng, duck):
        # the engine accepts Trino/MySQL directives (%i minute, %s
        # second); DuckDB's strptime is C-style (%M minute, %S second)
        # — each case carries both spellings, values must agree
        cases = [
            ("2020-01-02 03:04:05", "%Y-%m-%d %H:%i:%s",
             "%Y-%m-%d %H:%M:%S"),
            ("02/01/2020", "%d/%m/%Y", "%d/%m/%Y"),
            ("2020-01-02T03:04:05", "%Y-%m-%dT%H:%i:%s",
             "%Y-%m-%dT%H:%M:%S"),  # literal T quoted in the rewrite
            ("03:04:05 2020-01-02", "%T %Y-%m-%d", "%H:%M:%S %Y-%m-%d"),
        ]
        for s, trino_fmt, c_fmt in cases:
            got = eng.sql(
                f"SELECT date_parse('{s}', '{trino_fmt}') AS v"
            ).collect()[0].v
            want = duck.sql(
                f"SELECT strptime('{s}', '{c_fmt}')"
            ).fetchone()[0]
            assert got == want, (s, trino_fmt, got, want)

    def test_unsupported_directive_refuses(self, eng):
        with pytest.raises(Exception, match="directive"):
            eng.sql("SELECT date_parse('2020 Mon', '%Y %W')")

    def test_non_literal_format_refuses(self, eng):
        with pytest.raises(Exception, match="string literal"):
            eng.sql(
                "SELECT date_parse(s, f) FROM "
                "(SELECT '2020' s, '%Y' f)"
            )


class TestConvenienceFunctions:
    def test_format_is_format_string(self, eng):
        # documented delta: Spark parses 1.5 as a DECIMAL literal and
        # Java's %f conversion rejects Spark Decimal — cast to DOUBLE
        # (Trino parses 1.5 as DOUBLE natively, so real Trino text over
        # double COLUMNS works unchanged)
        got = eng.sql(
            "SELECT format('%02d/%s=%.2f', 7, 'x', "
            "CAST(1.5 AS DOUBLE)) AS v"
        ).collect()[0].v
        assert got == "07/x=1.50"

    def test_arbitrary_returns_a_member(self, eng):
        got = eng.sql(
            "SELECT arbitrary(x) AS v FROM VALUES (3), (3), (3) t(x)"
        ).collect()[0].v
        assert got == 3

    def test_from_unixtime_keeps_spark_semantics(self, eng):
        # the DOCUMENTED delta: the 1-arg spelling conflicts between
        # dialects (Trino: timestamp, Spark: string) — the engine keeps
        # Spark's, never silently re-types
        got = eng.sql("SELECT from_unixtime(0) AS v").collect()[0].v
        assert isinstance(got, str) and got.startswith("1970-01-01")


class TestViewBodyChainParity:
    """The ADVICE chain-divergence item: a body that plans at top level
    must plan as a persistent view — including the round-13 dialect."""

    def test_dialect_functions_in_view(self, eng):
        eng.sql(
            "CREATE VIEW v_r13_dialect AS SELECT "
            "strpos('abcb', 'b') AS p, "
            "date_diff('day', TIMESTAMP '2020-01-01 00:00:00', "
            "TIMESTAMP '2020-01-05 00:00:00') AS d, "
            "CAST(TIMESTAMP '2020-01-01 01:30:00' AT TIME ZONE "
            "'America/New_York' AS DATE) AS ny"
        )
        try:
            row = eng.sql("SELECT * FROM v_r13_dialect").collect()[0]
            assert (row.p, row.d, str(row.ny)) == (2, 4, "2019-12-31")
        finally:
            eng.sql("DROP VIEW v_r13_dialect")

    def test_tablesample_and_niladic_in_view(self, eng):
        # previously planned ONLY at the top level (missing from
        # _plan_view_body's chain) — the factored _translate_chain
        # closes the divergence
        eng.sql(
            "CREATE VIEW v_r13_ts AS SELECT count(*) AS n FROM "
            "(SELECT explode(sequence(1, 100)) AS x) "
            "TABLESAMPLE BERNOULLI (100) "
        )
        eng.sql(
            "CREATE VIEW v_r13_nil AS SELECT CURRENT_SCHEMA AS cs"
        )
        try:
            assert eng.sql(
                "SELECT * FROM v_r13_ts"
            ).collect()[0].n == 100
            assert isinstance(
                eng.sql("SELECT * FROM v_r13_nil").collect()[0].cs, str
            )
        finally:
            eng.sql("DROP VIEW v_r13_ts")
            eng.sql("DROP VIEW v_r13_nil")


class TestSharedSpellingsPassThrough:
    """Spellings the two dialects already share must keep working
    untranslated — the translator's no-false-positive surface."""

    def test_ansi_interval_literals(self, eng):
        row = eng.sql(
            "SELECT TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '3' DAY "
            "AS d, TIMESTAMP '2020-01-01 00:00:00' - INTERVAL '90' "
            "MINUTE AS m"
        ).collect()[0]
        assert str(row.d) == "2020-01-04 00:00:00"
        assert str(row.m) == "2019-12-31 22:30:00"

    def test_approx_percentile_shared(self, eng):
        got = eng.sql(
            "SELECT approx_percentile(x, 0.5) AS v "
            "FROM (SELECT explode(sequence(1, 101)) AS x)"
        ).collect()[0].v
        assert got == 51

    def test_element_at_cardinality_shared(self, eng):
        row = eng.sql(
            "SELECT element_at(array(10, 20), 2) AS e, "
            "cardinality(array(1, 2, 3)) AS c, "
            "array(1, 2) || array(3) AS cat"
        ).collect()[0]
        assert (row.e, row.c, list(row.cat)) == (20, 3, [1, 2, 3])

    def test_date_trunc_shared(self, eng, duck):
        # same instant both engines (Spark keeps TIMESTAMP, DuckDB
        # narrows to DATE — compare at day grain)
        got = eng.sql(
            "SELECT CAST(date_trunc('week', TIMESTAMP "
            "'2020-06-18 13:14:15') AS DATE) AS w"
        ).collect()[0].w
        want = duck.sql(
            "SELECT CAST(date_trunc('week', TIMESTAMP "
            "'2020-06-18 13:14:15') AS DATE)"
        ).fetchone()[0]
        assert got == want


class TestTryTranslation:
    """Round 14: Trino's TRY(expr) over the exact bodies Spark's try_*
    builtins cover — NULL instead of error, differentially against
    DuckDB's try_cast / CASE twins; everything else refuses with the
    supported-form list."""

    def test_try_divide_null_on_zero(self, eng, duck):
        got = eng.sql(
            "SELECT x, TRY(10 / x) AS q FROM VALUES (0), (2), (5) t(x)"
        ).collect()
        want = dict(duck.execute(
            "SELECT x, CASE WHEN x = 0 THEN NULL ELSE 10 / x END "
            "FROM (VALUES (0), (2), (5)) t(x)"
        ).fetchall())
        assert {r.x: r.q for r in got} == want

    def test_try_cast_forms(self, eng, duck):
        got = eng.sql(
            "SELECT TRY(CAST('12' AS INTEGER)) AS ok, "
            "TRY(CAST('nope' AS INTEGER)) AS bad"
        ).collect()[0]
        want = duck.execute(
            "SELECT try_cast('12' AS INTEGER), "
            "try_cast('nope' AS INTEGER)"
        ).fetchone()
        assert (got.ok, got.bad) == want == (12, None)

    def test_try_add_subtract_multiply(self, eng):
        row = eng.sql(
            "SELECT TRY(9223372036854775807 + 1) AS o, "
            "TRY(3 - 1) AS s, TRY(6 * 7) AS m"
        ).collect()[0]
        assert (row.o, row.s, row.m) == (None, 2, 42)

    def test_try_element_at(self, eng):
        row = eng.sql(
            "SELECT TRY(element_at(map('a', 1), 'b')) AS missing, "
            "TRY(element_at(map('a', 1), 'a')) AS hit"
        ).collect()[0]
        assert (row.missing, row.hit) == (None, 1)

    def test_try_unary_sign_is_not_an_operator(self, eng):
        row = eng.sql("SELECT TRY(-4 / 2) AS q").collect()[0]
        assert row.q == -2

    def test_try_composes_with_dialect_args(self, eng):
        # the guarded operands themselves go through the later passes
        row = eng.sql(
            "SELECT TRY(strpos('abc', 'c') / 3) AS q"
        ).collect()[0]
        assert row.q == 1

    def test_try_inside_literal_is_data(self, eng):
        row = eng.sql("SELECT 'TRY(1/0)' AS s").collect()[0]
        assert row.s == "TRY(1/0)"

    @pytest.mark.parametrize(
        "sql, needle",
        [
            ("SELECT TRY(1 + 2 * 3) AS v", "parenthesize"),
            ("SELECT TRY(lower('A')) AS v", "unsupported body"),
            ("SELECT TRY(x) AS v FROM VALUES (1) t(x)",
             "unsupported body"),
            ("SELECT TRY(1, 2) AS v", "exactly one"),
        ],
    )
    def test_try_refusals(self, eng, sql, needle):
        with pytest.raises(ValueError, match=needle):
            eng.sql(sql)

    def test_guarded_single_op_with_parenthesized_compound(self, eng):
        # the parenthesize fix from the refusal actually works
        row = eng.sql("SELECT TRY((1 + 2) * 3) AS v").collect()[0]
        assert row.v == 9


class TestTryCastIntGuardEquivalence:
    """Round 15: TRY(CAST(s AS <integral>)) is rewritten to a regex
    pre-reject (no per-row exception on unparseable rows) guarded by a
    foldable typeof() dispatch. These pins prove the rewrite is
    value-identical to plain try_cast — the SUPERSET property: whatever
    the regex rejects, try_cast maps to NULL — on a compact version of
    the discovery matrix (the full 3,712-string matrix + ~108k fuzz
    strings ran 0 mismatches for all four integral widths)."""

    # trimAll surface (\x00-\x20, \x7f both ends), signs, leading
    # zeros, overflow per width, decimals/exponents/unicode rejects
    MATRIX = [
        "5", "-5", "+5", "  5  ", "\t5\n", "\r\n5", "05", "0005",
        "\x005", "5\x00", "\x01 5", "\x1f5", "5\x1f", "\x7f5", "5\x7f",
        "\x085", "\x0b5\x0c", " +5 ", " -5 ", "", " ", "+", "-", "+-5",
        "--5", "5 5", "+ 5", "1.0", "1.5", ".5", "1.", "1e2", "0x1f",
        "1_000", "1,000", "٣", "５", "　5", "5　", " 5", "127",
        "128", "-128", "-129", "32767", "32768", "-32768", "-32769",
        "2147483647", "2147483648", "-2147483648", "-2147483649",
        "9223372036854775807", "9223372036854775808",
        "-9223372036854775808", "-9223372036854775809", "nope",
    ]

    def test_matrix_matches_plain_try_cast(self, eng, spark):
        vals = ", ".join(
            "('" + s.replace("\\", "\\\\").replace("'", "''") + "')"
            for s in self.MATRIX
        )
        for ty in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
            got = [
                r.v
                for r in eng.sql(
                    f"SELECT TRY(CAST(s AS {ty})) AS v "
                    f"FROM VALUES {vals} t(s)"
                ).collect()
            ]
            want = [
                r.v
                for r in spark.sql(
                    f"SELECT try_cast(s AS {ty}) AS v "
                    f"FROM VALUES {vals} t(s)"
                ).collect()
            ]
            assert got == want, ty

    def test_non_string_input_keeps_try_cast_semantics(self, eng):
        # typeof() dispatch: a DOUBLE input must NOT be routed through
        # the string regex (5.25 would regex-fail but casts to 5)
        row = eng.sql(
            "SELECT TRY(CAST(d AS INTEGER)) AS v "
            "FROM VALUES (5.25D), (CAST(NULL AS DOUBLE)) t(d)"
        ).collect()
        assert sorted((r.v for r in row), key=lambda x: (x is None, x)) \
            == [5, None]

    def test_non_integral_targets_stay_plain(self, eng):
        # DOUBLE/DECIMAL accept grammars the matrix does not cover —
        # they must keep the unguarded try_cast
        row = eng.sql(
            "SELECT TRY(CAST('1.5e2' AS DOUBLE)) AS d, "
            "TRY(CAST('12.34' AS DECIMAL(6,2))) AS de, "
            "TRY(CAST('2020-01-02' AS DATE)) AS dt"
        ).collect()[0]
        assert (row.d, float(row.de)) == (150.0, 12.34)
        assert str(row.dt) == "2020-01-02"


class TestLambdaMatchAndJsonPassthrough:
    """Round 14: the lambda-predicate trio (any_match/all_match/
    none_match → exists/forall) with the SHARED 3VL contract, and the
    json_parse/json_format passthroughs with their documented
    deviations."""

    def test_basic_truth_table(self, eng):
        row = eng.sql(
            "SELECT any_match(array(1, 5), x -> x > 4) AS a, "
            "any_match(array(1, 2), x -> x > 4) AS b, "
            "all_match(array(1, 5), x -> x > 0) AS c, "
            "all_match(array(1, 5), x -> x > 2) AS d, "
            "none_match(array(1, 2), x -> x > 4) AS e, "
            "none_match(array(1, 5), x -> x > 4) AS f"
        ).collect()[0]
        assert (row.a, row.b, row.c, row.d, row.e, row.f) == (
            True, False, True, False, True, False
        )

    def test_three_valued_logic(self, eng):
        # Trino: NULL when no definite answer and a lambda result is
        # NULL — exists/forall share the rule exactly
        row = eng.sql(
            "SELECT any_match(array(1, NULL), x -> x > 4) AS a, "
            "any_match(array(5, NULL), x -> x > 4) AS b, "
            "all_match(array(5, NULL), x -> x > 4) AS c, "
            "none_match(array(1, NULL), x -> x > 4) AS d"
        ).collect()[0]
        assert row.a is None         # false-or-unknown -> unknown
        assert row.b is True         # one definite true wins
        assert row.c is None         # true-or-unknown -> unknown
        assert row.d is None         # NOT(unknown) -> unknown

    def test_none_match_parenthesization(self, eng):
        # the (NOT ...) wrapper must not rebind in a comparison
        row = eng.sql(
            "SELECT (none_match(array(1), x -> x > 4) = true) AS v"
        ).collect()[0]
        assert row.v is True

    def test_empty_array(self, eng):
        row = eng.sql(
            "SELECT any_match(cast(array() as array<int>), x -> x > 0)"
            " AS a, "
            "all_match(cast(array() as array<int>), x -> x > 0) AS b"
        ).collect()[0]
        assert (row.a, row.b) == (False, True)  # vacuous truth (both)

    def test_json_parse_composes_with_sql_json(self, eng):
        row = eng.sql(
            "SELECT json_value(json_parse('{\"a\": 7}'), '$.a') AS v"
        ).collect()[0]
        assert row.v == "7"

    def test_json_format_passthrough_documented_delta(self, eng):
        # verbatim text, NOT canonical re-rendering (documented)
        row = eng.sql(
            "SELECT json_format(json_parse('{ \"a\" : 1 }')) AS v"
        ).collect()[0]
        assert row.v == '{ "a" : 1 }'

    def test_match_names_inside_literals_are_data(self, eng):
        row = eng.sql(
            "SELECT 'any_match(x, y)' AS s, "
            "'json_parse(z)' AS t"
        ).collect()[0]
        assert (row.s, row.t) == ("any_match(x, y)", "json_parse(z)")
