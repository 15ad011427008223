"""Profile the driver's correctness pass locally: per-query wall time at sf0.01.

Runs each registered query (Spark collect) and its DuckDB oracle, in registry
order, printing per-query seconds — the ordering/speed feedback loop for
getting all queries inside the driver's budget.

Collects the Spark result ONCE and feeds the rows into the compare, so the
spark/cmp timing split attributes each engine's cost correctly (the earlier
version re-collected inside compare(), double-counting Spark).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from oss_data_lake_spark.session import get_spark  # noqa: E402
from tests.parity import compare_rows, duckdb_con  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REGISTRY = sys.argv[2] if len(sys.argv) > 2 else "driver"


def main() -> None:
    if REGISTRY == "driver":
        from oss_data_lake_spark.operators import driver_oracles, driver_queries

        queries, oracles = driver_queries(), driver_oracles()
    else:
        from oss_data_lake_spark.operators import all_oracles, all_queries

        queries, oracles = all_queries(), all_oracles()

    spark = get_spark()
    con = duckdb_con(SF_DIR)

    # warm the JVM so the first profiled query isn't charged for startup
    spark.range(1).count()

    t_total = time.perf_counter()
    timings: dict[str, float] = {}
    bad: list[str] = []
    for name, fn in queries.items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        cols = list(df.columns)
        rows = [tuple(r) for r in df.collect()]
        t_spark = time.perf_counter() - t0
        t1 = time.perf_counter()
        if name in oracles:
            res = compare_rows(cols, rows, con, oracles[name])
            ok = res["ok"]
            if not ok:
                bad.append(name)
                print(f"MISMATCH {name}: {res['detail']}", flush=True)
        else:
            ok = len(rows) >= 0
        t_cmp = time.perf_counter() - t1
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(
            f"{dt:7.2f}s (spark {t_spark:5.2f} + cmp {t_cmp:5.2f})  "
            f"{'ok ' if ok else 'BAD'}  {name}",
            flush=True,
        )

    total = time.perf_counter() - t_total
    print(json.dumps({"total_sec": round(total, 1), "n": len(queries), "bad": bad}))
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    print("slowest:", json.dumps(ranked[:12]))


if __name__ == "__main__":
    main()
