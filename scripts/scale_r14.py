"""Round-14 scale measurement: the e92 end-to-end corpus pipeline
curve (sf0.001 / 0.01 / 0.1), b56/b57-row style.

e92 is the heaviest composite after e11 (round-13 verdict: plan pins
but no measured curve). One child process per (sf, rep) so every
sample is a cold fresh-process wall — the same protocol as the
round-13 b56/b57/b59/b60 rows: medians of 3, local[8], full collect()
walls. Alongside the wall, each run records the pipeline's own stage
LEDGER (docs per stage) — constant across reps by construction (the
pipeline is deterministic) and the cross-sf growth of the ledger is
the data-size evidence the wall is measured against — plus the FINAL
plan's exchange count (the ledger assembly; the heavy stages are
localCheckpoint-bounded by design, which is the scale contract pinned
in tests/test_plans.py).

Usage: python scripts/scale_r14.py            # prints SCALE.md rows
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]
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

sf = sys.argv[1]
t0 = time.time()
df = all_queries()["e92_corpus_pipeline"](spark, sf)
rows = df.collect()
wall = time.time() - t0
plan = df._jdf.queryExecution().executedPlan().toString()
print("RESULT " + json.dumps({
    "wall": round(wall, 2),
    "ledger": sorted((r[0], r[1]) for r in rows if r[1] is not None)[:8],
    "n_rows": len(rows),
    "final_exchanges": plan.count("Exchange"),
}))
"""


def run(sf: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, sf],
        capture_output=True, text=True, cwd="/tmp", timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{sf}: no RESULT line\n{out.stderr[-2000:]}")


def main() -> None:
    print("| sf | median wall | walls | final-plan exchanges |")
    print("|---|---|---|---|")
    for sf in SFS:
        samples = [run(sf) for _ in range(REPS)]
        walls = [s["wall"] for s in samples]
        ex = {s["final_exchanges"] for s in samples}
        ledgers = {json.dumps(s["ledger"]) for s in samples}
        assert len(ledgers) == 1, f"{sf}: non-deterministic ledger"
        print(
            f"| {sf.rsplit('/', 1)[-1]} "
            f"| {statistics.median(walls):.2f} s "
            f"| {', '.join(f'{w:.2f}' for w in sorted(walls))} "
            f"| {sorted(ex)} |",
            flush=True,
        )
        print(f"  ledger: {samples[0]['ledger']}", flush=True)


if __name__ == "__main__":
    main()
