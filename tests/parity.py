"""Local replica of the driver's Spark-vs-DuckDB oracle compare.

Mirrors the driver contract (SURVEY.md §5.3): for each declared query, run
the Spark DataFrame AND the DuckDB oracle SQL on the same parquet fixtures,
then compare row count, sorted column names, and cell values (order-
insensitive). Used by tests to predict CORRECTNESS_r{N}.json before the
driver runs it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from oss_data_lake_spark.schemas import FIXTURE_TABLES

ABS_TOL = 0.0  # driver hashes values; we demand exact match to be safe


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    """Normalize a cell for cross-engine compare (dates/timestamps → ISO str,
    floats kept as floats, Decimals → float)."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    projected = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(projected, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, Any]:
    """Returns {ok, row_count_ok, schema_ok, values_ok, detail}."""
    return compare_rows(
        list(spark_df.columns), [tuple(r) for r in spark_df.collect()], con, sql
    )


def compare_rows(
    s_cols: list[str],
    s_rows: list[tuple],
    con: duckdb.DuckDBPyConnection,
    sql: str,
) -> dict[str, Any]:
    """compare() for an already-collected Spark result (no re-execution)."""
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    out: dict[str, Any] = {"detail": ""}
    out["row_count_ok"] = len(s_rows) == len(d_rows)
    out["schema_ok"] = sorted(s_cols) == sorted(d_cols)
    if not out["row_count_ok"]:
        out["detail"] = f"rows spark={len(s_rows)} duckdb={len(d_rows)}"
    if not out["schema_ok"]:
        out["detail"] += f" cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    values_ok = out["row_count_ok"] and out["schema_ok"]
    if values_ok:
        a = _sorted_rows(s_cols, s_rows)
        b = _sorted_rows(d_cols, d_rows)
        for i, (ra, rb) in enumerate(zip(a, b)):
            if not _row_eq(ra, rb):
                values_ok = False
                out["detail"] = f"first value mismatch at sorted row {i}: spark={ra} duckdb={rb}"
                break
    out["values_ok"] = values_ok
    out["ok"] = out["row_count_ok"] and out["schema_ok"] and values_ok
    return out


def _row_eq(a: tuple, b: tuple) -> bool:
    for x, y in zip(a, b):
        if x is None and y is None:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if x != y and abs(x - y) > ABS_TOL:
                return False
        elif x != y:
            return False
    return True
