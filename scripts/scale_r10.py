"""Scaling measurement for the round-10 surfaces.

Three claims, each pinning that cost tracks the RIGHT variable:

1. e78's restructured survivorship (two-level md5-prefix prefix sum):
   under SINGLE-DOMAIN growth (the DoReMi regime where domain count is
   fixed while the corpus grows), the largest window-partition's SHARE
   of the domain must stay ~1/4096 — flat absolute task input per
   bucket-count, vs the old per-domain window's share of 1.0 (the whole
   domain in one task). Measured on synthetic one-domain corpora grown
   16x, plus wall time (must grow ~linearly, never superlinearly).

2. The server-side REST multi-table commit
   (POST /v1/transactions/commit) tracks the STAGED delta and member
   count, never member size: the same 2-member commit stays ~flat as
   the members grow 16x, and grows ~linearly from 2 -> 6 members.

3. e80 SemDeDup's verify work is the sum of CLUSTER-pair blocks, not
   all-pairs: the computed-pair fraction (sum of c*(c-1)/2 over
   clusters / n*(n-1)/2) must FALL as the corpus grows (more clusters
   at fixed stride ratio), pinning the O(cluster-pairs) growth class.

Prints one JSON line per claim; record in SCALE.md. Run:
    python scripts/scale_r10.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import Row  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from oss_data_lake_spark.engine import Engine  # noqa: E402
from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.rest_catalog import (  # noqa: E402
    RestCatalogServer,
    RestCommitProtocol,
)
from oss_data_lake_spark.sources.snapshots import SnapshotTable  # noqa: E402

spark = get_spark(app_name="scale_r10", cpus="8")
base = pathlib.Path(tempfile.mkdtemp(prefix="scale_r10_"))


def _med(fn, n: int = 3) -> float:
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


# ---- claim 1: e78 two-level prefix sum under single-domain growth ----
from oss_data_lake_spark.operators.pipeline import (  # noqa: E402
    MIX_BUCKET_HEX,
    token_budget_mixing_report,
)

out = {"claim": "e78_single_domain_prefix_sum", "points": []}
for scale, n in (("1x", 20_000), ("4x", 80_000), ("16x", 320_000)):
    sf = base / f"mix_{scale}"
    sf.mkdir(parents=True, exist_ok=True)
    # ONE domain — the regime that put the whole corpus in one task
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), (F.col("id") % 97).cast("string"))
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("webcrawl").alias("source"),
        F.lit(10).alias("n_chars"),
    ).coalesce(4).write.mode("overwrite").parquet(
        str(sf / "documents.parquet")
    )
    docs = spark.read.parquet(str(sf / "documents.parquet"))
    bucketed = docs.select(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")),
            1, MIX_BUCKET_HEX,
        ).alias("bkt")
    ).groupBy("bkt").count()
    mx = bucketed.agg(F.max("count")).first()[0]
    wall = _med(
        lambda sf=sf: token_budget_mixing_report(
            spark, str(sf)
        ).write.mode("overwrite").format("noop").save()
    )
    out["points"].append({
        "scale": scale,
        "rows": n,
        "max_window_partition_rows": int(mx),
        "max_partition_share": round(mx / n, 6),
        "old_design_share": 1.0,
        "wall_s": round(wall, 3),
    })
print(json.dumps(out))

# ---- claim 2: server-side REST multi-table commit ---------------------
server = RestCatalogServer().start()
out = {"claim": "rest_txn_commit_tracks_delta_not_size", "points": []}


def _rest_engine(tag: str, names: list[str], n: int) -> Engine:
    e = Engine(spark=spark, warehouse_dir=str(base / f"wh_{tag}"))
    for name in names:
        t = SnapshotTable(
            spark,
            str(base / f"{tag}_{name}"),
            protocol=RestCommitProtocol(server.url, f"{tag}_{name}"),
        )
        t.commit(
            spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") * 0.5).alias("v")
            )
        )
        e._snapshot_tables[name] = t
    return e


for scale, n in (("1x", 5_000), ("16x", 80_000)):
    names = ["t1", "t2"]
    e = _rest_engine(f"s{scale}", names, n)

    def _txn(e=e):
        e.sql("BEGIN TRANSACTION ON t1, t2")
        e.sql("INSERT INTO t1 VALUES (999999, 1.0)")
        e.sql("INSERT INTO t2 VALUES (999999, 1.0)")
        e.sql("COMMIT TRANSACTION ON t1, t2")

    out["points"].append({
        "scale": scale, "rows_per_member": n, "members": 2,
        "commit_wall_s": round(_med(_txn), 3),
    })
for m in (2, 6):
    names = [f"t{i}" for i in range(1, m + 1)]
    e = _rest_engine(f"m{m}", names, 2_000)

    def _txn(e=e, names=names):
        e.sql(f"BEGIN TRANSACTION ON {', '.join(names)}")
        for name in names:
            e.sql(f"INSERT INTO {name} VALUES (999999, 1.0)")
        e.sql(f"COMMIT TRANSACTION ON {', '.join(names)}")

    out["points"].append({
        "scale": "member-sweep", "rows_per_member": 2_000, "members": m,
        "commit_wall_s": round(_med(_txn), 3),
    })
server.stop()
print(json.dumps(out))

# ---- claim 3: e80 verify work = cluster-pair sum, never all-pairs -----
from oss_data_lake_spark.operators.similarity import (  # noqa: E402
    _ivf_assign,
    _ivf_model,
)
from oss_data_lake_spark.sources.loaders import load_table  # noqa: E402

out = {"claim": "e80_cluster_pairs_not_all_pairs", "points": []}
for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    ids, mat = _ivf_model(emb)
    sizes = [
        r["count"]
        for r in _ivf_assign(emb, ids, mat, 1).groupBy("cluster").count()
        .collect()
    ]
    pairs = sum(c * (c - 1) // 2 for c in sizes)
    all_pairs = n * (n - 1) // 2
    out["points"].append({
        "sf": sf_dir.rsplit("sf", 1)[-1],
        "vectors": n,
        "clusters": len(sizes),
        "cluster_pairs": pairs,
        "all_pairs": all_pairs,
        "computed_fraction": round(pairs / all_pairs, 6),
    })
print(json.dumps(out))
