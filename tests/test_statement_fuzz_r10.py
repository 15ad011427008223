"""Round-10 fuzz extension — the round-9 grammar's untested seams
(VERDICT r9 §next #5): hostile literals inside persistent-VIEW bodies,
GENERATED ALWAYS AS expressions, transaction statements, prepared-
statement parameters, and the paced-stream drain options. Same
discipline as ``test_statement_fuzz.py``: hypothesis generates
literal-hostile text, Spark itself is the oracle wherever a value can
be re-derived."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from oss_data_lake_spark.engine import Engine
from oss_data_lake_spark.sources.snapshots import SnapshotTable

# payloads that LOOK like SQL structure — they must stay data when
# quoted (the shared TRICKY list plus view/generated/txn-specific traps)
TRICKY = [
    "DELETE FROM t WHERE 1=1",
    "a; DROP TABLE t; --",
    "t FOR VERSION AS OF 3",
    "orders$files",
    "CREATE VIEW v AS SELECT 1",
    "GENERATED ALWAYS AS (k)",
    "BEGIN TRANSACTION ON t",
    "COMMIT TRANSACTION ON t",
    "?",
    "? OR ? -- ?",
    "USING 1, 2",
    "O''Brien",
    ");( ))((",
    "",
]

_plain = st.text(
    alphabet="abcdefgXYZ0123456789 _.,$?=<>()-;'",
    min_size=0, max_size=16,
).map(lambda s: s.replace("'", ""))  # raw quotes handled by TRICKY forms
_payload = st.one_of(st.sampled_from(TRICKY), _plain)


def _quote(p: str) -> str:
    return "'" + p.replace("'", "''") + "'"


@pytest.fixture(scope="module")
def fuzz_eng(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fz10")
    e = Engine(spark=spark, warehouse_dir=str(root / "wh"))
    svals = TRICKY + ["plain"]
    rows = [
        Row(k=i, s=svals[i % len(svals)], d=float(i) / 2) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k long, s string, d double")
    t = SnapshotTable(spark, str(root / "t"))
    t.commit(df, stats_for=["k", "d"])
    e._snapshot_tables["t"] = t
    return e, t, df


# ------------------------------------------------------- VIEW body fuzz


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_payload)
def test_view_bodies_with_hostile_literals(fuzz_eng, p):
    """A persistent view whose body carries a literal full of SQL
    structure must store, SHOW, and re-plan it verbatim: reading the
    view equals Spark's own evaluation of the body's predicate."""
    e, _t, base = fuzz_eng
    lit = _quote(p)
    name = f"v_{uuid.uuid4().hex[:8]}"
    e.sql(f"CREATE VIEW {name} AS SELECT k, s FROM t WHERE s = {lit}")
    try:
        shown = e.sql(f"SHOW CREATE VIEW {name}").collect()[0]["stmt"]
        assert lit in shown  # round-trips verbatim
        got = sorted(r["k"] for r in e.sql(f"SELECT k FROM {name}").collect())
        want = sorted(
            r["k"] for r in base.filter(F.col("s") == F.lit(p)).collect()
        )
        assert got == want, (p, got, want)
    finally:
        e.sql(f"DROP VIEW {name}")


# -------------------------------------------- GENERATED expression fuzz


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_payload)
def test_generated_expressions_with_hostile_literals(
    spark, tmp_path_factory, p
):
    """A GENERATED ALWAYS AS expression whose literal carries SQL
    structure must parse at CREATE, compute at INSERT, and equal
    Spark's own evaluation of the expression."""
    root = tmp_path_factory.mktemp("fg")
    e = Engine(spark=spark, warehouse_dir=str(root / "wh"))
    lit = _quote(p)
    e.sql(
        f"CREATE TABLE gt (s STRING, "
        f"g STRING GENERATED ALWAYS AS (concat(s, {lit}))) USING snapshot"
    )
    e.sql(f"INSERT INTO gt (s) VALUES ('a'), ({lit})")
    got = {r["s"]: r["g"] for r in e.sql("SELECT s, g FROM gt").collect()}
    assert got == {"a": "a" + p, p: p + p}, (p, got)
    # a provided-but-wrong generated value still refuses
    with pytest.raises(Exception, match="generated"):
        e.sql(f"INSERT INTO gt (s, g) VALUES ('x', concat('WRONG', {lit}))")


# ------------------------------------------------ transaction-flow fuzz


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_payload, st.booleans())
def test_txn_staged_hostile_writes_are_atomic(
    spark, tmp_path_factory, p, commit
):
    """Hostile string literals staged INSIDE a transaction stay
    invisible to other readers until COMMIT; ROLLBACK leaves no trace.
    The payload exercises the statement grammar end-to-end (BEGIN
    routing, INSERT masking, branch read-your-writes, publish)."""
    root = tmp_path_factory.mktemp("ft")
    e = Engine(spark=spark, warehouse_dir=str(root / "wh"))
    for name in ("t1", "t2"):
        t = SnapshotTable(spark, str(root / name))
        t.commit(spark.createDataFrame([Row(k=0, s="seed")]))
        e._snapshot_tables[name] = t
    outside1 = SnapshotTable(spark, str(root / "t1"))
    lit = _quote(p)
    e.sql("BEGIN TRANSACTION ON t1, t2")
    e.sql(f"INSERT INTO t1 VALUES (1, {lit})")
    e.sql(f"INSERT INTO t2 VALUES (2, {lit})")
    # read-your-writes inside; invisible outside
    assert e.sql(f"SELECT k FROM t1 WHERE s = {lit} AND k = 1").count() == 1
    assert outside1.read().filter("k = 1").count() == 0
    if commit:
        e.sql("COMMIT TRANSACTION ON t1, t2")
        assert [
            r["s"] for r in outside1.read().filter("k = 1").collect()
        ] == [p]
    else:
        e.sql("ROLLBACK TRANSACTION ON t1, t2")
        assert outside1.read().filter("k = 1").count() == 0
        assert outside1.current_version() == 1


# -------------------------------------------- prepared-statement fuzz


@settings(
    max_examples=30, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_payload)
def test_execute_parameter_differential(fuzz_eng, p):
    """EXECUTE ... USING '<hostile>' must select exactly the rows Spark
    says match the equality — the parameter splice can neither leak
    structure nor corrupt neighbors."""
    e, _t, base = fuzz_eng
    e.sql("PREPARE fz FROM SELECT k FROM t WHERE s = ? OR k = ?")
    got = sorted(
        r["k"]
        for r in e.sql(f"EXECUTE fz USING {_quote(p)}, 3").collect()
    )
    want = sorted(
        r["k"]
        for r in base.filter(
            (F.col("s") == F.lit(p)) | (F.col("k") == 3)
        ).collect()
    )
    assert got == want, (p, got, want)


@settings(max_examples=50, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=4))
def test_using_arg_splitter_arity(args):
    """The depth-0 comma split over USING text must recover exactly the
    quoted arguments, whatever their content."""
    text = ", ".join(_quote(a) for a in args)
    got = Engine._split_using_args(text)
    assert got == [_quote(a) for a in args]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.booleans(), min_size=0, max_size=6), _payload)
def test_param_positions_skip_literal_question_marks(slots, p):
    """`?` markers interleaved with literals CONTAINING `?`: only the
    bare markers count, at exactly their offsets."""
    parts, expect = [], []
    pos = 0
    for bare in slots:
        if bare:
            parts.append("x = ")
            pos += 4
            expect.append(pos)
            parts.append("?")
            pos += 1
        else:
            q = _quote(p + "?")
            parts.append(q)
            pos += len(q)
        parts.append(" AND ")
        pos += 5
    text = "".join(parts)
    assert Engine._param_positions(text) == expect


# ----------------------------------------------- drain-options property


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.integers(min_value=1, max_value=7), st.integers(min_value=1, max_value=4))
def test_paced_offers_cover_every_version_exactly_once(
    spark, tmp_path_factory, n_commits, cap
):
    """Admission control (maxVersionsPerTrigger) as a walk: repeated
    latestOffset/commit must advance monotonically in steps <= cap and
    terminate exactly at the head — no version skipped, none repeated,
    no offer past the head."""
    from oss_data_lake_spark.streaming.snapshot_source import (
        SnapshotStreamSource,
    )

    root = tmp_path_factory.mktemp("fp")
    t = SnapshotTable(spark, str(root / "t"))
    for i in range(n_commits):
        t.commit(spark.createDataFrame([Row(k=i)]), mode="append")
    src = SnapshotStreamSource(
        options={"path": t.path, "maxVersionsPerTrigger": str(cap)}
    )
    r = src.streamReader(None)
    seen, prev, steps = [], 0, 0
    while True:
        off = r.latestOffset()["version"]
        assert off <= n_commits, "offer past the head"
        if off == prev:
            break
        assert 1 <= off - prev <= cap, (prev, off, cap)
        seen.extend(range(prev + 1, off + 1))
        r.commit({"version": off})
        prev = off
        steps += 1
        assert steps <= n_commits + 1, "walk failed to terminate"
    assert seen == list(range(1, n_commits + 1))
    assert steps == -(-n_commits // cap)  # ceil division


# ----------------------------------------- recursive-CTE differential


@st.composite
def edge_set(draw):
    """A random small DAG-ish edge list over nodes 0..9 (child > parent
    guarantees termination) plus a random depth-limit predicate."""
    n_edges = draw(st.integers(min_value=0, max_value=14))
    edges = sorted({
        (draw(st.integers(1, 9)), draw(st.integers(0, 8)))
        for _ in range(n_edges)
        if True
    })
    edges = [(c, p) for c, p in edges if c > p]
    return edges


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_set())
def test_recursive_cte_differential_duckdb(spark, edges):
    """Spark and DuckDB evaluate the IDENTICAL recursive text over the
    same edge relation: closure row sets must match exactly (child >
    parent bounds the recursion — no infinite loops by construction)."""
    import duckdb

    rows = edges or [(1, 0)]
    df = spark.createDataFrame(rows, "child int, parent int")
    df.createOrReplaceTempView("fz_edges")
    q = """
        WITH RECURSIVE walk(node, depth) AS (
          SELECT 0, 0
          UNION ALL
          SELECT e.child, w.depth + 1
          FROM {tbl} e JOIN walk w ON e.parent = w.node
        )
        SELECT node, depth, COUNT(*) AS n
        FROM walk GROUP BY node, depth ORDER BY node, depth
    """
    got = [tuple(r) for r in spark.sql(q.format(tbl="fz_edges")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (child INT, parent INT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", rows)
    want = [tuple(r) for r in con.execute(q.format(tbl="edges")).fetchall()]
    assert got == want, (rows, got, want)
