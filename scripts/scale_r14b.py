"""Round-14 scale curves for the round's new queries (b61 UNNEST,
b62 TRY, e93 line dedup) — b59/b60-row style: fresh-process medians
of 3 per (query, sf), local[8], full collect() walls, executed-plan
exchange counts for shape constancy.

Usage: python scripts/scale_r14b.py     # prints SCALE.md rows
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]
QUERIES = ["b61_unnest_lateral", "b62_try_dialect_funcs",
           "e93_line_dedup_report"]
REPS = 3

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from oss_data_lake_spark.operators import all_queries

name, sf = sys.argv[1], sys.argv[2]
t0 = time.time()
df = all_queries()[name](spark, sf)
rows = df.collect()
wall = time.time() - t0
plan = df._jdf.queryExecution().executedPlan().toString()
print("RESULT " + json.dumps({
    "wall": round(wall, 2), "n_rows": len(rows),
    "exchanges": plan.count("Exchange"),
}))
"""


def run(name: str, sf: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, name, sf],
        capture_output=True, text=True, cwd="/tmp", timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{name}@{sf}: no RESULT\n{out.stderr[-1500:]}")


def main() -> None:
    print("| query | sf0.001 | sf0.01 | sf0.1 (100x) | exchanges |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        cells, exch = [], set()
        for sf in SFS:
            samples = [run(name, sf) for _ in range(REPS)]
            cells.append(statistics.median(s["wall"] for s in samples))
            exch |= {s["exchanges"] for s in samples}
        print(
            f"| {name} | {cells[0]:.2f} s | {cells[1]:.2f} s "
            f"| {cells[2]:.2f} s | {sorted(exch)} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
