"""Per-job forensics for targeted queries (r15, guide §1): run a query
once warm, once inside a job group, then print one line per Spark job
with its stages' callsite names and task counts — the ground truth for
"which operation launched this job" that wall-clock noise cannot fake.

Usage:
    python scripts/job_forensics.py e92_corpus_pipeline m07_change_feed_orders
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
    names = sys.argv[1:]
    spark = get_spark(app_name="job_forensics_r15")
    sc = spark.sparkContext
    jvm = sc._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.CacheManager",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    queries = all_queries()
    # same warmups as bench.py
    queries["a14_count_star"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
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

    tracker = sc.statusTracker()
    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()  # warm
        group = f"forensics:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = sorted(tracker.getJobIdsForGroup(group))
        print(f"\n=== {name}: {len(job_ids)} jobs, wall {wall:.2f}s ===")
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            parts = []
            for sid in sorted(info.stageIds):
                si = tracker.getStageInfo(sid)
                if si is None or si.numTasks == 0:
                    continue
                nm = si.name.split("\n")[0][:70]
                parts.append(f"{nm}({si.numTasks}t)")
            print(f"job {jid}: " + " | ".join(parts))
        print(json.dumps({"query": name, "jobs": len(job_ids),
                          "wall_s": round(wall, 2)}))


if __name__ == "__main__":
    main()
