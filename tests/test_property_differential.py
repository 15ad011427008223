"""Property-based differential testing: random filter/aggregate queries must
agree between Spark and DuckDB — generalizing the fixed oracle pack to a
query space (the reference's dual-engine idea taken to its logical end).

Deliberately small example counts: each example runs two engines; the point
is breadth of predicate shapes, not volume.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oss_data_lake_spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"

COLS_NUM = ["o_totalprice", "o_custkey", "o_orderkey"]
COLS_STR = ["o_orderstatus", "o_orderpriority"]
STR_VALS = ["P", "O", "F", "1-URGENT", "5-LOW"]


@st.composite
def predicates(draw) -> str:
    """A random SQL predicate over orders, valid in both dialects."""

    def leaf() -> str:
        if draw(st.booleans()):
            col = draw(st.sampled_from(COLS_NUM))
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
            val = draw(st.integers(min_value=0, max_value=400000))
            return f"{col} {op} {val}"
        col = draw(st.sampled_from(COLS_STR))
        val = draw(st.sampled_from(STR_VALS))
        neg = "NOT " if draw(st.booleans()) else ""
        return f"{neg}{col} = '{val}'"

    n = draw(st.integers(min_value=1, max_value=3))
    parts = [leaf() for _ in range(n)]
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(parts)


@pytest.fixture(scope="module")
def engines(spark):
    for t in ("orders", "customer"):
        load_table(spark, SF, t).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return spark, con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_random_filter_counts_agree(engines, pred):
    spark, con = engines
    sql = f"SELECT COUNT(*) AS n FROM orders WHERE {pred}"
    assert spark.sql(sql).collect()[0].n == con.execute(sql).fetchone()[0], pred


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicates(),
    how=st.sampled_from(["JOIN", "LEFT JOIN"]),
    seg=st.sampled_from(["AUTOMOBILE", "BUILDING", "MACHINERY"]),
)
def test_random_join_counts_agree(engines, pred, how, seg):
    spark, con = engines
    sql = (
        f"SELECT COUNT(*) AS n FROM customer {how} orders "
        f"ON c_custkey = o_custkey AND ({pred}) "
        f"WHERE c_mktsegment = '{seg}'"
    )
    assert spark.sql(sql).collect()[0].n == con.execute(sql).fetchone()[0], sql


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates(), key=st.sampled_from(COLS_STR))
def test_random_grouped_decimal_sums_agree(engines, pred, key):
    spark, con = engines
    sql = (
        f"SELECT {key} AS k, COUNT(*) AS n, "
        f"CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS s "
        f"FROM orders WHERE {pred} GROUP BY {key}"
    )
    s_rows = {(r.k): (r.n, r.s) for r in spark.sql(sql).collect()}
    d_rows = {
        r[0]: (r[1], float(r[2]) if isinstance(r[2], Decimal) else r[2])
        for r in con.execute(sql).fetchall()
    }
    assert s_rows == d_rows, pred


# ---------------------------------------------------------------------------
# Snapshot layer state machine: random commit/append/rollback sequences must
# leave every historical version readable and equal to a pure-Python model.
# ---------------------------------------------------------------------------

_snapshot_ops = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), st.lists(st.integers(0, 99), min_size=1, max_size=4)),
        st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=4)),
        st.tuples(st.just("rollback"), st.integers(0, 5)),
        st.tuples(st.just("cherry_pick"), st.integers(0, 5)),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_snapshot_ops)
def test_snapshot_history_matches_model(spark, tmp_path_factory, ops):
    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    path = tmp_path_factory.mktemp("snap")
    t = SnapshotTable(spark, str(path))
    model: dict[int, list[int]] = {}  # version -> multiset of k values

    from collections import Counter

    def commit_delta(target: int) -> list[int]:
        # the rows a commit ADDED = its multiset minus its parent's;
        # valid for every pure-append manifest regardless of HOW it was
        # made (append, rollback re-exposing dirs, earlier cherry-pick)
        prev = Counter(model.get(target - 1, []))
        return list((Counter(model[target]) - prev).elements())

    for op, arg in ops:
        if op == "rollback":
            if not model:
                continue
            versions = sorted(model)
            target = versions[arg % len(versions)]
            v = t.rollback(target)
            model[v] = list(model[target])
        elif op == "cherry_pick":
            # round 8: re-applying a random historical commit either
            # REFUSES (non-append, visible dirs, live rewrite output —
            # state must be untouched) or lands exactly that commit's
            # added rows on the head multiset
            if not model:
                continue
            versions = sorted(model)
            target = versions[arg % len(versions)]
            head_before = t.current_version()
            try:
                v = t.cherry_pick(target)
            except ValueError:
                assert t.current_version() == head_before, (
                    "a refused cherry_pick must not commit"
                )
                continue
            model[v] = model[head_before] + commit_delta(target)
        else:
            rows = arg
            df = spark.createDataFrame([(k,) for k in rows], "k long")
            v = t.commit(df, mode=op)
            prev = model.get(v - 1, [])
            model[v] = (prev + rows) if (op == "append" and prev) else list(rows)

    if not model:  # sequence was all no-op rollbacks on an empty table
        assert t.current_version() is None
        return
    assert t.current_version() == max(model)
    for v, expected in model.items():
        got = sorted(r.k for r in t.read(v).collect())
        assert got == sorted(expected), (v, got, expected)


_dml_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 199), min_size=1, max_size=6)),
        st.tuples(st.just("delete"), st.tuples(st.integers(0, 199), st.integers(0, 60))),
        st.tuples(st.just("mor_delete"), st.tuples(st.integers(0, 199), st.integers(0, 60))),
        st.tuples(st.just("update"), st.tuples(st.integers(0, 199), st.integers(0, 60))),
        st.tuples(st.just("merge"), st.lists(st.integers(0, 220), min_size=1, max_size=5)),
        st.tuples(st.just("eq_delete"), st.lists(st.integers(0, 220), min_size=1, max_size=5)),
        st.tuples(st.just("mor_merge"), st.lists(st.integers(0, 220), min_size=1, max_size=5)),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("restore"), st.integers(0, 100)),
    ),
    min_size=2,
    max_size=7,
)


@pytest.mark.parametrize("layout", ["clustered", "hidden_bucket"])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_dml_ops)
def test_dml_sequences_match_model(spark, tmp_path_factory, layout, ops):
    """Differential model check for the DML surface: any interleaving of
    appends, pruned range DELETEs/UPDATEs (copy-on-write AND merge-on-
    read), EQUALITY deletes, keyed MERGEs (CoW and the scan-free MoR
    upsert), compactions, and RESTOREs to random earlier versions
    (round 7 — rollback must resurrect exactly that version's visible
    state, including its outstanding delete vectors) must leave the
    table equal to a python dict model —
    and the pre-DML snapshot must still time-travel to the model's prior
    state (no rewrite may corrupt history)."""
    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    path = tmp_path_factory.mktemp("dml")
    t = SnapshotTable(spark, str(path))
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(100)], "k long, v double"
    )
    if layout == "clustered":
        t.commit_clustered(base, cluster_by="k", n_files=5, stats_for=["k"])
    else:
        # round 7: the SAME randomized op mix over a hidden
        # bucket(4, k)-partitioned base — sticky CoW layout, MoR
        # coordinates through partition segments, transform-pruned
        # candidates all under differential fire
        t.commit(base, partition_by=["bucket(4, k)"], stats_for=["k"])
    model: dict[int, float] = {k: float(k) for k in range(100)}
    prev_model = dict(model)
    prev_version = t.current_version()
    # per-version model snapshots — what a RESTORE must resurrect
    history: dict[int, dict[int, float]] = {prev_version: dict(model)}

    def check():
        got = {r.k: r.v for r in t.read().collect()}
        assert got == model

    for op, arg in ops:
        prev_model, prev_version = dict(model), t.current_version()
        if op == "append":
            rows = [(200 + i * 7 + k, -1.0) for i, k in enumerate(arg)]
            # model is a dict (keyed): make appended keys unique vs
            # existing AND within the batch (i*7+k can collide)
            seen_k = set(model)
            uniq = []
            for k, v in rows:
                if k not in seen_k:
                    seen_k.add(k)
                    uniq.append((k, v))
            rows = uniq
            if not rows:
                continue
            t.commit(
                spark.createDataFrame(rows, "k long, v double"),
                mode="append", stats_for=["k"],
            )
            model.update(dict(rows))
        elif op in ("delete", "update", "mor_delete"):
            lo, width = arg
            hi = lo + width
            if op == "mor_delete":
                # merge-on-read: tombstones, no rewrite — same model
                t.delete_where_mor(
                    f"k BETWEEN {lo} AND {hi}",
                    prune_column="k", prune_lower=lo, prune_upper=hi,
                )
                model = {k: v for k, v in model.items() if not lo <= k <= hi}
            elif op == "delete":
                t.delete_where(
                    f"k BETWEEN {lo} AND {hi}",
                    prune_column="k", prune_lower=lo, prune_upper=hi,
                    stats_for=["k"],
                )
                model = {k: v for k, v in model.items() if not lo <= k <= hi}
            else:
                t.update_where(
                    f"k BETWEEN {lo} AND {hi}", {"v": "v + 1000.0"},
                    prune_column="k", prune_lower=lo, prune_upper=hi,
                    stats_for=["k"],
                )
                model = {
                    k: (v + 1000.0 if lo <= k <= hi else v)
                    for k, v in model.items()
                }
        elif op == "merge":
            src = [(k, 9999.0) for k in sorted(set(arg))]
            t.merge_rows(
                spark.createDataFrame(src, "k long, v double"), ["k"],
                stats_for=["k"],
            )
            model.update(dict(src))
        elif op == "eq_delete":
            keys = sorted(set(arg))
            t.delete_where_eq("k", keys)
            model = {k: v for k, v in model.items() if k not in set(keys)}
        elif op == "mor_merge":
            src = [(k, -7.5) for k in sorted(set(arg))]
            t.merge_rows_mor(
                spark.createDataFrame(src, "k long, v double"), ["k"],
                stats_for=["k"],
            )
            model.update(dict(src))
        elif op == "compact":
            t.compact(target_partitions=2, stats_for=["k"])
        elif op == "restore":
            versions = sorted(history)
            target = versions[arg % len(versions)]
            t.rollback(target)
            model = dict(history[target])
        history[t.current_version()] = dict(model)
        check()
        # history intact: the PRE-op snapshot still reads the old state
        if prev_version is not None and op != "compact":
            old = {r.k: r.v for r in t.read(version=prev_version).collect()}
            assert old == prev_model, f"history corrupted by {op}"

    # round 8: the CHANGE FEED over the WHOLE random history (append
    # steps folded into one multi-path scan, DML/rollback steps on
    # per-commit arms) must net-replay to exactly the final model —
    # the multiset equation under differential fire
    from collections import Counter

    net: Counter = Counter()
    for r in t.read_change_feed(0).collect():
        net[(r["k"], r["v"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    assert all(c in (0, 1) for c in net.values()), net
    assert {k: v for (k, v), c in net.items() if c == 1} == model


# ---------------------------------------------------------------------------
# WAP publish rebase: random DISJOINT concurrent changes on clone and source
# must merge to exactly (source ops ∘ clone ops)(base) — both lands land.
# ---------------------------------------------------------------------------

_rebase_ops = st.tuples(
    # clone ops touch keys 0..39 (file 1..2 of the 5-file clustering);
    # source ops touch keys 60..99 (file 4..5) — disjoint by construction
    st.lists(
        st.one_of(
            st.tuples(st.just("delete"), st.tuples(st.integers(0, 30), st.integers(0, 9))),
            st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        ),
        min_size=1, max_size=3,
    ),
    st.lists(
        st.one_of(
            st.tuples(st.just("delete"), st.tuples(st.integers(60, 90), st.integers(0, 9))),
            st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        ),
        min_size=1, max_size=3,
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_rebase_ops)
def test_publish_rebase_matches_model(spark, tmp_path_factory, ops):
    from oss_data_lake_spark.sources.snapshots import SnapshotTable

    clone_ops, source_ops = ops
    path = tmp_path_factory.mktemp("rebase")
    t = SnapshotTable(spark, str(path / "src"))
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(100)], "k long, v double"
    )
    t.commit_clustered(base, cluster_by="k", n_files=5, stats_for=["k"])
    clone = t.shallow_clone_to(str(path / "wap"))

    model: dict[int, float] = {k: float(k) for k in range(100)}

    def apply(tbl, side_ops, key_base):
        for i, (op, arg) in enumerate(side_ops):
            if op == "delete":
                lo, width = arg
                hi = lo + width
                tbl.delete_where(
                    f"k BETWEEN {lo} AND {hi}",
                    prune_column="k", prune_lower=lo, prune_upper=hi,
                    stats_for=["k"],
                )
                for k in list(model):
                    if lo <= k <= hi:
                        del model[k]
            else:
                rows = [
                    (key_base + i * 31 + j * 3 + k, -1.0)
                    for j, k in enumerate(arg)
                ]
                rows = [(k, x) for k, x in dict(rows).items() if k not in model]
                if not rows:
                    continue
                tbl.commit(
                    spark.createDataFrame(rows, "k long, v double"),
                    mode="append", stats_for=["k"],
                )
                model.update(dict(rows))

    apply(clone, clone_ops, 1000)   # the audited branch
    apply(t, source_ops, 2000)      # the source advances concurrently

    new_v = clone.publish(require_source_unchanged=False)
    assert t._manifest(new_v)["mode"] == "publish_rebase"
    got = {r.k: r.v for r in t.read().collect()}
    assert got == model
    # the feed across the publish still satisfies the multiset equation
    from collections import Counter

    net: Counter = Counter()
    for r in t.read_change_feed(0).collect():
        net[(r["k"], r["v"])] += 1 if r["_change_type"] == "insert" else -1
    assert {k for (k, _v), c in net.items() if c == 1} == set(model)
