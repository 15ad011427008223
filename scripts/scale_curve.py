"""Scaling-curve experiment: measure how the headline pipeline operators
grow as the corpus is replicated 1x / 2x / 4x beyond sf0.1.

The point is the EXPONENT, not the absolute seconds: bucketed/blocked
designs (LSH dedup, IVF near-dup, keyed sessionization) must grow
~linearly in input size, while their all-pairs truth twins grow
quadratically — this script measures the production paths only.

Replicas are PERTURBED so the workload's structure stays constant:
- documents: every token gets a replica suffix (disjoint shingle spaces →
  no cross-replica near-dup pairs; pair count grows exactly linearly).
  Caveat on e11's df cap: the >1% threshold scales with corpus size while
  each shingle's df stays fixed under disjoint replication, so a shingle
  capped at k=1 would be uncapped at k>=2 — a semantics shift, not pure
  scaling. Immaterial HERE because the synthetic corpus's max shingle df
  is 0.5% of docs (the cap never fires at any k — see BASELINE.md), but a
  corpus with real boilerplate would need the cap frozen at the k=1
  threshold for a clean curve.
- embeddings: each replica rotates the vector by k positions (norms
  preserved, directions decorrelated → no cross-replica near-dups).
- events: user_id shifted per replica (session structure per user
  unchanged; user count grows linearly).

Writes scaled fixtures under /tmp/spark_graft_scale/kN/ and prints one
JSON line per scale factor. Record the curve in SCALE.md.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from oss_data_lake_spark.operators import all_queries  # noqa: E402
from oss_data_lake_spark.session import get_spark  # noqa: E402
from oss_data_lake_spark.sources.loaders import load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/spark_graft_scale"
KS = tuple(int(a) for a in sys.argv[1:]) or (1, 2, 4)
# Optionally restrict to a comma-separated subset (re-measuring only newly
# added operators without re-running the full historical curve).
ONLY = tuple(
    q for q in os.environ.get("SCALE_QUERIES", "").split(",") if q
)
MEASURED = (
    "e11_minhash_lsh_pairs",
    "e26_ivf_neardup_pairs",
    "e51_session_stats",
    "e40_text_stats",
    # round-5 additions (VERDICT r4 ask #4): the iterative clustering job —
    # whose per-round fixed overhead dominates at 1x, so the 16x point tells
    # us whether rounds or data dominate — and broadcast decontamination.
    "e14_neardup_clusters",
    "e75_decontamination",
)


def build_scaled(spark, k: int) -> str:
    out = os.path.join(OUT_ROOT, f"k{k}")
    if os.path.exists(os.path.join(out, "_BUILT")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = load_table(spark, BASE_SF, "documents")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    d_parts = []
    for r in range(k):
        part = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n_docs))
        if r > 0:
            # suffix every token: replica shingle spaces are disjoint
            part = part.withColumn(
                "text", F.regexp_replace("text", " ", f"_r{r} ")
            )
        d_parts.append(part)
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    d.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    emb = load_table(spark, BASE_SF, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    e_parts = []
    for r in range(k):
        part = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * n_vec))
        if r > 0:
            rot = r % 64 or 1
            part = part.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, 64 - rot),
                    F.slice("embedding", 1, rot),
                ),
            )
        e_parts.append(part)
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    e.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    ev = load_table(spark, BASE_SF, "events")
    n_user = ev.agg(F.max("user_id")).first()[0] + 1
    n_event = ev.agg(F.max("event_id")).first()[0] + 1
    v_parts = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(r * n_user))
        .withColumn("event_id", F.col("event_id") + F.lit(r * n_event))
        for r in range(k)
    ]
    v = v_parts[0]
    for p in v_parts[1:]:
        v = v.unionByName(p)
    v.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    pathlib.Path(out, "_BUILT").touch()
    return out


def main() -> None:
    spark = get_spark(app_name="scale_curve")
    qs = all_queries()
    qs["a14_count_star"](spark, BASE_SF).write.mode("overwrite").format(
        "noop"
    ).save()
    for k in KS:
        sf_dir = build_scaled(spark, k)
        spark.catalog.clearCache()
        timings = {}
        for name in ONLY or MEASURED:
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(sorted(samples)[1], 3)
        print(json.dumps({"k": k, "queries": timings}), flush=True)


if __name__ == "__main__":
    main()
