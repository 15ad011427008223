"""Driver simulation: plain SparkSession (NO engine configs, non-UTC
timezone probe, foreign cwd), compare every queries() entry against its
oracle_sql() on sf0.01 — exactly the external driver's contract.

Run from OUTSIDE the repo (pickling-by-value check for pandas workers):

    cd /tmp && python /root/repo/scripts/drive_contract.py            # all 50
    cd /tmp && python /root/repo/scripts/drive_contract.py e22_... p90_...

Override the fixture dir with SPARK_GRAFT_SIM_SF (e.g. /root/testdata/sf0.1
for the 10x scale spot-check recorded in BASELINE.md)."""
import os
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "America/New_York")
    .getOrCreate()
)
import __spark_entry__ as e

n = e.entry(spark).count()
print(f"entry() rows: {n}", flush=True)
assert n >= 0

sys.path.insert(0, "/root/repo/tests")
from parity import duckdb_con, compare

con = duckdb_con(SF)
qs, oracles = e.queries(), e.oracle_sql()
only = set(sys.argv[1:])
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        if name in oracles:
            res = compare(sdf, con, oracles[name])
            ok = res["ok"]
            tag = "OK " if ok else "FAIL"
            if not ok:
                fails.append((name, res))
        else:
            cnt = sdf.count()
            tag = "ROWS"
            ok = True
        print(f"{tag} {name} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as ex:
        fails.append((name, str(ex)[:300]))
        print(f"ERR  {name}: {str(ex)[:200]}", flush=True)

print(f"\n{len(fails)} failures")
for name, res in fails:
    print(name, res)
sys.exit(1 if fails else 0)
