"""Iceberg-REST catalog façade (sources/rest_catalog.py) — the
Lakekeeper wire role: two independent engine processes share one
snapshot table through HTTP *load table* + *commit with requirements*
(reference etc/catalog/iceberg.properties:16 points Trino at
http://lakekeeper:8181/catalog). The server's atomic requirement check
rejects lost updates; the client protocol rebuilds on 409."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest
from pyspark.sql import Row

from oss_data_lake_spark.sources.catalog import CommitConflict
from oss_data_lake_spark.sources.rest_catalog import (
    RestCatalogServer,
    RestCommitProtocol,
)
from oss_data_lake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def server():
    s = RestCatalogServer().start()
    yield s
    s.stop()


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_two_engines_share_a_table_over_http(spark, server, tmp_path):
    """Writer engine commits through HTTP; a SECOND engine with its own
    client (fresh process shape: nothing shared but the URL and the
    data root) reads the table, time travel included."""
    path = str(tmp_path / "t")
    writer = SnapshotTable(
        spark, path, protocol=RestCommitProtocol(server.url, "tbl")
    )
    writer.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(8)]),
        stats_for=["k"],
    )
    writer.commit(
        spark.createDataFrame([Row(k=100, v=1.0)]), mode="append"
    )
    reader = SnapshotTable(
        spark, path, protocol=RestCommitProtocol(server.url, "tbl")
    )
    assert reader.current_version() == 2
    assert reader.read().count() == 9
    assert reader.read(version=1).count() == 8  # time travel via REST
    # and the reader can write back — the catalog serializes them
    reader.commit(spark.createDataFrame([Row(k=200, v=2.0)]), mode="append")
    assert writer.read().count() == 10


def test_concurrent_commits_race_no_lost_update(server):
    """Two writers build against the SAME parent through HTTP: the
    requirement check lets exactly one commit land per version; the
    loser rebuilds against the winner's head — both land, nothing
    clobbered. Pure-protocol test (manifests are dicts)."""
    a = RestCommitProtocol(server.url, "race")
    b = RestCommitProtocol(server.url, "race")
    barrier = threading.Barrier(2)
    parents_seen: dict[str, list] = {"a": [], "b": []}

    def writer(tag: str, proto: RestCommitProtocol):
        def build(parent, _read):
            parents_seen[tag].append(parent)
            if not parents_seen[tag][1:]:
                barrier.wait()
            return {"version": (parent or 0) + 1, "who": tag}

        proto.commit(build)

    th = [
        threading.Thread(target=writer, args=("a", a)),
        threading.Thread(target=writer, args=("b", b)),
    ]
    for t in th:
        t.start()
    for t in th:
        t.join()
    assert a.read_current() == 2
    assert {a.read_manifest(v)["who"] for v in (1, 2)} == {"a", "b"}
    losers = [p for p in parents_seen["a"] + parents_seen["b"] if p == 1]
    assert losers, "one writer must have rebuilt against the new head"


def test_stale_requirement_rejected_on_the_wire(server):
    """The raw wire behavior Trino relies on: a commit whose
    assert-current-version requirement is stale gets 409
    CommitFailedException and the table does not change."""
    p = RestCommitProtocol(server.url, "wire")
    p.commit(lambda parent, _r: {"version": 1, "who": "base"})
    url = f"{server.url}/v1/tables/wire/commit"
    code, body = _post(url, {
        "requirements": [{"type": "assert-current-version", "version": None}],
        "manifest": {"version": 1, "who": "stale"},
    })
    assert code == 409
    assert body["error"] == "CommitFailedException"
    assert p.read_manifest(1)["who"] == "base"
    assert p.read_current() == 1
    # unknown requirement types refuse loudly (never silently ignored)
    code, body = _post(url, {
        "requirements": [{"type": "assert-ref-snapshot-id", "ref": "main"}],
        "manifest": {"version": 2},
    })
    assert code == 400


def test_retries_exhausted_raises_commit_conflict(server):
    proto = RestCommitProtocol(server.url, "exhaust", retries=3)
    rival = RestCommitProtocol(server.url, "exhaust")
    calls = {"n": 0}

    def build(parent, _read):
        calls["n"] += 1
        v = (parent or 0) + 1
        # a rival lands our version between build and commit, every time
        rival._request(
            "POST", "/v1/tables/exhaust/commit",
            {"requirements": [
                {"type": "assert-current-version", "version": parent}
            ], "manifest": {"version": v, "who": "rival"}},
        )
        return {"version": v, "who": "me"}

    with pytest.raises(CommitConflict):
        proto.commit(build)
    assert calls["n"] == 3


def test_full_dml_surface_over_rest(spark, server, tmp_path):
    """The whole statement surface runs its metadata tail through the
    catalog service: DML, OPTIMIZE, expire (delete_manifest over HTTP)."""
    from oss_data_lake_spark.engine import Engine

    t = SnapshotTable(
        spark,
        str(tmp_path / "t"),
        protocol=RestCommitProtocol(server.url, "dml"),
    )
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(20)]),
        stats_for=["k"],
    )
    e = Engine(spark=spark)
    e._snapshot_tables["t"] = t
    e.sql("DELETE FROM t WHERE k < 5")
    e.sql("UPDATE t SET v = v * 2 WHERE k >= 15")
    e.sql("INSERT INTO t VALUES (300, 3.0)")
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert set(got) == set(range(5, 20)) | {300}
    assert got[15] == 30.0 and got[5] == 5.0
    # history lives in the catalog; expire trims it there
    assert t.protocol.list_versions() == [1, 2, 3, 4]
    t.expire_snapshots(keep_last=2)
    assert t.protocol.list_versions() == [3, 4]
    assert t.read().count() == 16


def test_cross_process_commit_through_http(server):
    """A literally separate OS process (no shared state but the URL)
    commits through the catalog service and the parent observes it —
    the two-independent-engine-processes claim, process-for-real."""
    import subprocess
    import sys

    parent = RestCommitProtocol(server.url, "xproc")
    parent.commit(lambda p, _r: {"version": (p or 0) + 1, "who": "parent"})
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from oss_data_lake_spark.sources.rest_catalog import "
        "RestCommitProtocol\n"
        "p = RestCommitProtocol(sys.argv[1], 'xproc')\n"
        "v = p.commit(lambda parent, _r: "
        "{'version': (parent or 0) + 1, 'who': 'child'})\n"
        "print('LANDED', v)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, server.url],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "LANDED 2" in out.stdout
    assert parent.read_current() == 2
    assert parent.read_manifest(2)["who"] == "child"


def test_views_shared_through_the_catalog_service(spark, server, tmp_path):
    """Persistent VIEWs through the REST catalog (the Lakekeeper view
    role): two engines with independent warehouses share saved queries
    via Engine(view_catalog=RestViewCatalog(url)) — full DDL grammar,
    re-planned over each engine's registered base tables."""
    from oss_data_lake_spark.engine import Engine
    from oss_data_lake_spark.sources.rest_catalog import RestViewCatalog

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(6)]))
    e1 = Engine(
        spark=spark,
        warehouse_dir=str(tmp_path / "wh1"),
        view_catalog=RestViewCatalog(server.url),
    )
    e2 = Engine(
        spark=spark,
        warehouse_dir=str(tmp_path / "wh2"),
        view_catalog=RestViewCatalog(server.url),
    )
    e1._snapshot_tables["t"] = t
    e2._snapshot_tables["t"] = t
    e1.sql("CREATE VIEW v_shared AS SELECT count(*) AS n FROM t")
    # the OTHER engine sees and reads the view immediately
    assert [r["view"] for r in e2.sql("SHOW VIEWS").collect()] == [
        "v_shared"
    ]
    assert e2.sql("SELECT * FROM v_shared").collect()[0]["n"] == 6
    # DDL semantics hold over the wire
    with pytest.raises(ValueError, match="already exists"):
        e2.sql("CREATE VIEW v_shared AS SELECT 1")
    e2.sql("CREATE OR REPLACE VIEW v_shared AS SELECT count(*) + 100 AS n FROM t")
    assert e1.sql("SELECT * FROM v_shared").collect()[0]["n"] == 106
    stmt = e1.sql("SHOW CREATE VIEW v_shared").collect()[0]["stmt"]
    assert "count(*) + 100" in stmt
    e1.sql("DROP VIEW v_shared")
    assert e2.sql("SHOW VIEWS").collect() == []
    with pytest.raises(ValueError, match="does not exist"):
        e2.sql("DROP VIEW v_shared")
