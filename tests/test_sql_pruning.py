"""SQL-text predicate extraction → file-pruned head views
(sources/snapshots.py::extract_prunable_predicates + read_pruned).

Soundness frame: extraction may only surface predicates that are GENUINE
top-level WHERE conjuncts of the query block that reads the table —
anything else must be ignored (under-pruning is free, wrong-pruning loses
rows). These tests pin every conservative gate, then prove end-to-end that
the pruned SQL path returns identical results to the unpruned one while
opening strictly fewer files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.sources.snapshots import (
    SnapshotTable,
    extract_prunable_predicates,
    sql_with_time_travel,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k=i, v=float(i), s=f"g{i % 4}") for i in range(100)]
    )
    t.commit_clustered(df, cluster_by="k", n_files=10, stats_for=["k", "v"])
    return t


def _preds(text, tbl, name="t"):
    return extract_prunable_predicates(text, {name: tbl}).get(name)


def test_between_and_comparisons_extract(tbl):
    got = _preds("SELECT * FROM t WHERE k BETWEEN 10 AND 19", tbl)
    assert got == [("k", 10, 19)]
    got = _preds("SELECT * FROM t WHERE k >= 10 AND k <= 19 AND v = 5", tbl)
    assert got == [("k", 10, None), ("k", None, 19), ("v", 5, 5)]
    # strict ops map to their inclusive superset
    got = _preds("SELECT * FROM t WHERE k > 10 AND k < 20", tbl)
    assert got == [("k", 10, None), ("k", None, 20)]


def test_qualified_names_must_match_table(tbl):
    assert _preds("SELECT * FROM t WHERE t.k >= 50", tbl) == [("k", 50, None)]
    # a foreign qualifier must NOT prune this table
    assert _preds(
        "SELECT * FROM t JOIN u ON t.k = u.k WHERE u.k >= 50", tbl
    ) is None


def test_or_not_case_disable_the_span(tbl):
    assert _preds("SELECT * FROM t WHERE k > 90 OR v < 1", tbl) is None
    assert _preds("SELECT * FROM t WHERE NOT (k > 90)", tbl) is None
    assert _preds(
        "SELECT * FROM t WHERE CASE WHEN k > 90 THEN 1 ELSE 0 END = 1", tbl
    ) is None


def test_non_stats_and_function_wrapped_columns_ignored(tbl):
    assert _preds("SELECT * FROM t WHERE s = 'g1'", tbl) is None  # no stats
    assert _preds("SELECT * FROM t WHERE abs(k) > 90", tbl) is None
    # parenthesized conjunct is depth>0 relative to the WHERE: skipped
    # (under-prune, never wrong-prune)
    assert _preds("SELECT * FROM t WHERE (k > 90)", tbl) is None


def test_subquery_and_union_wheres_never_prune_outer_table(tbl):
    # the inner WHERE's from-list names u, not t
    assert _preds(
        "SELECT * FROM t WHERE k IN (SELECT k FROM u WHERE k < 5)", tbl
    ) == []  or _preds(
        "SELECT * FROM t WHERE k IN (SELECT k FROM u WHERE k < 5)", tbl
    ) is None
    # a union branch over ANOTHER table must not poison t's view
    text = (
        "SELECT k FROM t UNION ALL SELECT k FROM u WHERE k < 5"
    )
    assert _preds(text, tbl) is None
    # the same table referenced twice shares one view: no extraction
    text2 = (
        "SELECT * FROM t WHERE k < 5 UNION ALL SELECT * FROM t WHERE k > 90"
    )
    assert _preds(text2, tbl) is None


def test_predicate_shaped_text_inside_literal_ignored(tbl):
    got = _preds("SELECT * FROM t WHERE s = 'k BETWEEN 1 AND 2'", tbl)
    assert got is None


def test_having_not_extracted(tbl):
    got = _preds(
        "SELECT s, count(*) c FROM t WHERE k BETWEEN 0 AND 9 "
        "GROUP BY s HAVING count(*) > 3",
        tbl,
    )
    assert got == [("k", 0, 9)]  # the HAVING comparison is not a pred


def test_sql_pruned_view_matches_unpruned_and_opens_fewer_files(spark, tbl):
    """End to end through sql_with_time_travel: identical results, fewer
    files opened (plan-pinned via InMemoryFileIndex path count)."""
    import re

    from oss_data_lake_spark.plans.audit import explain_str

    text = "SELECT k, v FROM t WHERE k BETWEEN 20 AND 39 ORDER BY k"
    df = sql_with_time_travel(spark, text, {"t": tbl})
    got = [tuple(r) for r in df.collect()]
    want = [(i, float(i)) for i in range(20, 40)]
    assert got == want

    _sel, n_sel, n_skip = tbl.plan_pruned([("k", 20, 39)])
    assert n_skip > 0 and n_sel < n_sel + n_skip
    plan = explain_str(
        sql_with_time_travel(spark, text, {"t": tbl}), "simple"
    )
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", plan)
    assert m and int(m.group(1)) == n_sel, plan


def test_multi_column_plan_intersects(tbl):
    """Two conjuncts on different stats columns intersect their plans:
    k and v are correlated in the fixture, so each predicate alone admits
    the same files, but a CONTRADICTORY conjunction admits none."""
    sel, n_sel, _ = tbl.plan_pruned([("k", 0, 9), ("v", 90.0, 99.0)])
    assert n_sel == 0
    assert tbl.read_pruned([("k", 0, 9), ("v", 90.0, 99.0)]).count() == 0


def test_compound_expressions_extract_nothing(tbl):
    """A conjunct must FULLMATCH its extraction pattern — a literal
    matched mid-expression would over-prune (ADVICE r6-high: `k = 5 + 50`
    used to extract (k, 5, 5) and wrongly prune the k=55 file)."""
    assert _preds("SELECT * FROM t WHERE k = 5 + 50", tbl) is None
    assert _preds("SELECT * FROM t WHERE k = 5e3", tbl) is None
    assert _preds("SELECT * FROM t WHERE -k < 5", tbl) is None
    assert _preds("SELECT * FROM t WHERE k BETWEEN 1 AND 5+1", tbl) is None
    assert _preds("SELECT * FROM t WHERE k = v + 1", tbl) is None
    assert _preds("SELECT * FROM t WHERE abs(k) = 5 + 50", tbl) is None
    # a clean conjunct NEXT TO a compound one still extracts (per-conjunct
    # fallback, not whole-span)
    got = _preds("SELECT * FROM t WHERE k = 5 + 50 AND v >= 2", tbl)
    assert got == [("v", 2, None)]
    # trailing semicolon must not block the fullmatch
    assert _preds("SELECT * FROM t WHERE k = 55;", tbl) == [("k", 55, 55)]


def test_compound_expression_sql_end_to_end(spark, tbl):
    """The ADVICE repro: `WHERE k = 5 + 50` must return the k=55 row."""
    df = sql_with_time_travel(
        spark, "SELECT count(*) AS n FROM t WHERE k = 5 + 50", {"t": tbl}
    )
    assert df.collect()[0]["n"] == 1


def test_compound_expression_dml_end_to_end(spark, tmp_path):
    """DELETE FROM t WHERE k = 5 + 50 must delete exactly the k=55 row
    (used to delete nothing: the wrong (k,5,5) range pruned every file
    containing k=55)."""
    from oss_data_lake_spark.sources.dml_sql import dispatch_statement

    t = SnapshotTable(spark, str(tmp_path / "d"))
    df = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(100)])
    t.commit_clustered(df, cluster_by="k", n_files=10, stats_for=["k"])
    dispatch_statement(spark, "DELETE FROM d WHERE k = 5 + 50", {"d": t})
    assert t.read().where("k = 55").count() == 0
    assert t.read().count() == 99


def test_unextractable_sql_still_correct(spark, tbl):
    """The fallback path: an OR query gets the UNPRUNED view and full
    results."""
    text = "SELECT count(*) AS n FROM t WHERE k < 5 OR k > 94"
    df = sql_with_time_travel(spark, text, {"t": tbl})
    assert df.collect()[0]["n"] == 10


def test_equality_predicate_uses_bloom_pruning(spark, tmp_path):
    """`WHERE col = x` through the SQL path must engage the per-file
    BLOOM on unclustered columns: min/max bounds alone cannot prune a
    column every file straddles, the bloom can."""
    import re

    from oss_data_lake_spark.plans.audit import explain_str

    t = SnapshotTable(spark, str(tmp_path / "b"))
    # ids shuffled across files: every file's [min, max] straddles any probe
    df = spark.createDataFrame(
        [Row(doc_id=(i * 37) % 1000, v=float(i)) for i in range(1000)]
    ).repartition(10)
    t.commit(df, stats_for=["doc_id"], bloom_for=["doc_id"])

    _sel, range_sel, range_skip = t.plan_range_scan("doc_id", 5, 5)
    sel, eq_sel, eq_skip = t.plan_pruned([("doc_id", 5, 5)])
    assert eq_skip > range_skip, (
        "plan_pruned must route point predicates via the bloom, which "
        "prunes beyond what min/max bounds can on this layout"
    )

    text = "SELECT v FROM b WHERE doc_id = 5"
    df_out = sql_with_time_travel(spark, text, {"b": t})
    assert df_out.count() == 1
    plan = explain_str(
        sql_with_time_travel(spark, text, {"b": t}), "simple"
    )
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", plan)
    assert m and int(m.group(1)) == eq_sel, plan


def test_in_list_predicate_unions_bloom_plans(spark, tmp_path):
    """`col IN (...)` prunes as the UNION of per-value bloom probes —
    still sound (a file outside every branch provably holds no listed
    value), and each branch gets bloom power beyond min/max."""
    t = SnapshotTable(spark, str(tmp_path / "in"))
    df = spark.createDataFrame(
        [Row(doc_id=(i * 37) % 1000, v=float(i)) for i in range(1000)]
    ).repartition(10)
    t.commit(df, stats_for=["doc_id"], bloom_for=["doc_id"])

    preds = extract_prunable_predicates(
        "SELECT * FROM x WHERE doc_id IN (5, 17, 400)", {"x": t}
    )["x"]
    assert preds == [{"col": "doc_id", "in": [5, 17, 400]}]
    sel, n_sel, n_skip = t.plan_pruned(preds)
    assert n_skip > 0
    got = sql_with_time_travel(
        spark, "SELECT v FROM x WHERE doc_id IN (5, 17, 400)", {"x": t}
    ).count()
    assert got == 3


def test_null_predicates_prune_from_null_counts(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "n"))
    with_nulls = spark.createDataFrame(
        [Row(k=i, v=(None if i % 2 == 0 else float(i))) for i in range(50)],
        "k long, v double",
    )
    no_nulls = spark.createDataFrame(
        [Row(k=100 + i, v=float(i)) for i in range(50)], "k long, v double"
    )
    all_nulls = spark.createDataFrame(
        [Row(k=200 + i, v=None) for i in range(50)], "k long, v double"
    )
    t.commit(with_nulls.coalesce(1), stats_for=["v"])
    t.commit(no_nulls.coalesce(1), mode="append", stats_for=["v"])
    t.commit(all_nulls.coalesce(1), mode="append", stats_for=["v"])

    sel, n_sel, n_skip = t.plan_pruned([{"col": "v", "null": True}])
    assert (n_sel, n_skip) == (2, 1), "zero-null file must skip IS NULL"
    sel, n_sel, n_skip = t.plan_pruned([{"col": "v", "null": False}])
    assert (n_sel, n_skip) == (2, 1), "all-null file must skip IS NOT NULL"

    # end-to-end through SQL text, both forms, exact results
    got = sql_with_time_travel(
        spark, "SELECT count(*) AS n FROM t WHERE v IS NULL", {"t": t}
    ).collect()[0]["n"]
    assert got == 25 + 50
    got = sql_with_time_travel(
        spark, "SELECT count(*) AS n FROM t WHERE v IS NOT NULL", {"t": t}
    ).collect()[0]["n"]
    assert got == 25 + 50
    # IS NOT NULL extraction survives the NOT blocker exception; real
    # negations still disable
    assert extract_prunable_predicates(
        "SELECT * FROM t WHERE v IS NOT NULL", {"t": t}
    )["t"] == [{"col": "v", "null": False}]
    assert extract_prunable_predicates(
        "SELECT * FROM t WHERE v NOT IN (1, 2)", {"t": t}
    ) == {}


def test_as_of_views_also_prune(spark, tmp_path):
    """FOR VERSION AS OF + a WHERE range: the versioned view must plan
    against THAT version's manifest stats and open only admitted files —
    time travel and file skipping compose."""
    import re

    from oss_data_lake_spark.plans.audit import explain_str

    t = SnapshotTable(spark, str(tmp_path / "ttp"))
    df = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(100)])
    t.commit_clustered(df, cluster_by="k", n_files=10, stats_for=["k"])
    # v2 deletes the probed range; the AS-OF read must still see it
    t.delete_where(
        "k BETWEEN 20 AND 39", prune_column="k", prune_lower=20,
        prune_upper=39, stats_for=["k"],
    )
    text = (
        "SELECT count(*) AS n FROM ttp FOR VERSION AS OF 1 "
        "WHERE k BETWEEN 20 AND 39"
    )
    out = sql_with_time_travel(spark, text, {"ttp": t})
    assert out.collect()[0]["n"] == 20
    _sel, n_sel, n_skip = t.plan_pruned([("k", 20, 39)], version=1)
    assert n_skip > 0
    plan = explain_str(sql_with_time_travel(spark, text, {"ttp": t}), "simple")
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", plan)
    assert m and int(m.group(1)) == n_sel, plan
