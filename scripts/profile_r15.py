"""Round-14 optimization profiler (guide §1: measure first).

For every bench.py HEADLINE query: run it once to warm (bench is
median-of-3 so steady-state is what matters), then run it once timed
against the noop sink inside a dedicated job group, and record

- wall seconds (construction + noop materialization — bench methodology)
- number of Spark jobs and total tasks the timed run launched
- ``explain('formatted')`` written to plans/r15/<query>_<tag>.txt

Usage:
    python scripts/profile_r15.py before            # all headline queries
    python scripts/profile_r15.py after e11_... e14_...

Output: one JSON line per query to stdout + a summary JSON file
plans/r15/profile_<tag>.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from oss_data_lake_spark.operators import all_queries  # noqa: E402
from oss_data_lake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    import bench

    spark = get_spark(app_name=f"profile_r15_{tag}")
    sc = spark.sparkContext
    jvm = sc._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.CacheManager",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    queries = all_queries()
    # identical warmups to bench.py
    queries["a14_count_star"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()

    def _noop(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(
        _noop, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    from oss_data_lake_spark.operators.lake import orders_clustered
    from oss_data_lake_spark.operators.similarity import _pq_codebook
    from oss_data_lake_spark.sources.lake import (
        events_by_date,
        lineitem_by_month,
    )
    from oss_data_lake_spark.sources.loaders import load_table

    events_by_date(spark, SF_DIR)
    lineitem_by_month(spark, SF_DIR)
    orders_clustered(spark, SF_DIR)
    _pq_codebook(load_table(spark, SF_DIR, "embeddings"), SF_DIR)

    out_dir = ROOT / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    tracker = sc.statusTracker()
    results: dict[str, dict] = {}
    names = [n for n in bench.HEADLINE if not only or n in only]
    for name in names:
        fn = queries[name]
        # warm run (uncounted): steady-state timing like bench's median-of-3
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        group = f"r15:{name}"
        sc.setJobGroup(group, name)
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        sc.setJobDescription(None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_tasks = 0
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None and sinfo.numTasks > 0:
                    n_stages += 1
                    n_tasks += sinfo.numTasks
        from oss_data_lake_spark.plans.audit import explain_str

        plan = explain_str(df, "formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        row = {
            "wall_s": round(wall, 3),
            "build_s": round(t_build, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        results[name] = row
        print(json.dumps({"query": name, **row}), flush=True)
    total = round(sum(r["wall_s"] for r in results.values()), 3)
    doc = {"tag": tag, "sf_dir": SF_DIR, "total_wall_s": total, "queries": results}
    (out_dir / f"profile_{tag}.json").write_text(json.dumps(doc, indent=1))
    print(json.dumps({"profile_total_wall_s": total, "n": len(results)}))


if __name__ == "__main__":
    main()
