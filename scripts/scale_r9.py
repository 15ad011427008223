"""Scaling measurement for the round-9 control-plane surfaces.

Three claims, each pinning that a new feature's cost tracks the RIGHT
variable (never base-table size or history length):

1. Persistent VIEW read-through is metadata-plus-plan-only: the
   overhead of querying THROUGH a view (catalog file read + body
   re-plan + temp-view bind) vs querying the table directly must stay
   ~flat as the base table grows 16x — the view layer touches no data.

2. Multi-table transaction COMMIT cost tracks the STAGED delta and the
   member count, not table size: committing the same 2-table
   transaction (one small INSERT per member) must stay ~flat as the
   base tables grow 16x, and grow ~linearly (per-member work: dry-run
   + fast_forward) from 2 -> 6 members.

3. The Iceberg-REST wire adds per-COMMIT milliseconds, not a scan:
   commit wall time through RestCommitProtocol vs LocalFsCommitProtocol
   on identical appends must differ by a ~constant HTTP overhead,
   flat as the table grows.

Prints one JSON line per claim; record in SCALE.md. Run:
    python scripts/scale_r9.py
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import Row  # noqa: E402

from oss_data_lake_spark.engine import Engine  # noqa: E402
from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.rest_catalog import (  # noqa: E402
    RestCatalogServer,
    RestCommitProtocol,
)
from oss_data_lake_spark.sources.snapshots import SnapshotTable  # noqa: E402

spark = get_spark(app_name="scale_r9", cpus="8")
base = pathlib.Path(tempfile.mkdtemp(prefix="scale_r9_"))


def _rows(n: int, off: int = 0):
    return spark.createDataFrame(
        [Row(k=off + i, v=float(i)) for i in range(n)]
    )


def _med(fn, n: int = 3) -> float:
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


# ---- claim 1: view read-through overhead flat across table growth ----
out = {"claim": "view_read_through_overhead", "points": []}
for scale, n in (("1x", 5_000), ("4x", 20_000), ("16x", 80_000)):
    root = base / f"v_{scale}"
    e = Engine(spark=spark, warehouse_dir=str(root / "wh"))
    t = SnapshotTable(spark, str(root / "t"))
    t.commit(_rows(n), stats_for=["k"])
    e._snapshot_tables["tv"] = t
    e.sql("CREATE VIEW vv AS SELECT count(*) AS n, sum(v) AS s FROM tv")
    direct = _med(lambda: e.sql(
        "SELECT count(*) AS n, sum(v) AS s FROM tv").collect())
    through = _med(lambda: e.sql("SELECT * FROM vv").collect())
    out["points"].append({
        "scale": scale, "rows": n,
        "direct_s": round(direct, 4),
        "through_view_s": round(through, 4),
        "overhead_s": round(through - direct, 4),
    })
print(json.dumps(out))

# ---- claim 2: multi-table COMMIT vs table size and member count -------
out = {"claim": "multi_txn_commit_cost", "points": []}
for scale, n in (("1x", 5_000), ("4x", 20_000), ("16x", 80_000)):
    root = base / f"m_{scale}"
    e = Engine(spark=spark, warehouse_dir=str(root / "wh"))
    for name in ("a", "b"):
        t = SnapshotTable(spark, str(root / name))
        t.commit(_rows(n), stats_for=["k"])
        e._snapshot_tables[name] = t
    e.sql("BEGIN TRANSACTION ON a, b")
    e.sql("INSERT INTO a VALUES (900001, 1.0)")
    e.sql("INSERT INTO b VALUES (900001, 1.0)")
    t0 = time.time()
    e.sql("COMMIT TRANSACTION ON a, b")
    out["points"].append({
        "scale": scale, "rows_per_table": n, "members": 2,
        "commit_s": round(time.time() - t0, 4),
    })
for members in (2, 4, 6):
    root = base / f"mm_{members}"
    e = Engine(spark=spark, warehouse_dir=str(root / "wh"))
    names = [f"t{i}" for i in range(members)]
    for name in names:
        t = SnapshotTable(spark, str(root / name))
        t.commit(_rows(2_000), stats_for=["k"])
        e._snapshot_tables[name] = t
    group = ", ".join(names)
    e.sql(f"BEGIN TRANSACTION ON {group}")
    for name in names:
        e.sql(f"INSERT INTO {name} VALUES (900001, 1.0)")
    t0 = time.time()
    e.sql(f"COMMIT TRANSACTION ON {group}")
    out["points"].append({
        "members": members, "rows_per_table": 2_000,
        "commit_s": round(time.time() - t0, 4),
    })
print(json.dumps(out))

# ---- claim 3: REST wire = per-commit ms, flat across table growth -----
out = {"claim": "rest_catalog_commit_overhead", "points": []}
server = RestCatalogServer().start()
try:
    for scale, n in (("1x", 5_000), ("4x", 20_000), ("16x", 80_000)):
        local = SnapshotTable(spark, str(base / f"rl_{scale}"))
        local.commit(_rows(n))
        rest = SnapshotTable(
            spark,
            str(base / f"rr_{scale}"),
            protocol=RestCommitProtocol(server.url, f"r_{scale}"),
        )
        rest.commit(_rows(n))
        i = [0]

        def app(t):
            def go():
                i[0] += 1
                t.commit(_rows(100, off=1_000_000 + 100 * i[0]),
                         mode="append")
            return go

        lt = _med(app(local))
        rt = _med(app(rest))
        out["points"].append({
            "scale": scale, "base_rows": n,
            "local_commit_s": round(lt, 4),
            "rest_commit_s": round(rt, 4),
            "wire_overhead_s": round(rt - lt, 4),
        })
finally:
    server.stop()
print(json.dumps(out))
shutil.rmtree(base, ignore_errors=True)
