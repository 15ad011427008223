"""CLI entry point: ``python -m oss_data_lake_spark <command>``.

The operational surface a reference user gets from its runbook commands
(trigger the DAG, open a Trino CLI, list buckets — reference RUNBOOK.md),
collapsed into subcommands over one engine:

    sql "SELECT ..." --sf-dir DIR      # ad-hoc SQL over the fixture views
    ingest OUT_PATH [--days N]         # synthetic OHLCV → partitioned parquet
    compact PATH                       # merge small files per partition
    query NAME --sf-dir DIR            # run a named inventory query
    list                               # list the query inventory
    serve [--port P]                   # JDBC endpoint (Metabase/beeline)
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="oss_data_lake_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_sql = sub.add_parser("sql", help="run SQL over the fixture views")
    p_sql.add_argument("text")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_sql.add_argument("--explain", action="store_true")

    p_ing = sub.add_parser("ingest", help="synthetic OHLCV ingest")
    p_ing.add_argument("out_path")
    p_ing.add_argument("--days", type=int, default=30)
    p_ing.add_argument("--ingest-date", default=None)

    p_cmp = sub.add_parser("compact", help="compact small files per partition")
    p_cmp.add_argument("path")

    p_q = sub.add_parser("query", help="run a named inventory query")
    p_q.add_argument("name")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_q.add_argument("-n", type=int, default=20, help="rows to show")

    sub.add_parser("list", help="list the query inventory")

    p_srv = sub.add_parser(
        "serve", help="publish the lake over JDBC (HiveServer2 protocol)"
    )
    p_srv.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_srv.add_argument("--port", type=int, default=None)

    args = p.parse_args(argv)

    from oss_data_lake_spark.operators import all_oracles, all_queries

    if args.cmd == "list":
        oracles = all_oracles()
        for name in sorted(all_queries()):
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name}  [{kind}]")
        return 0

    from oss_data_lake_spark.engine import Engine

    eng = Engine()
    if args.cmd == "sql":
        eng.register_fixtures(args.sf_dir)
        df = eng.sql(args.text)
        if args.explain:
            print(eng.explain(df))
        df.show(50, truncate=False)
    elif args.cmd == "ingest":
        from oss_data_lake_spark.sources.ohlcv import generate_ohlcv

        src = generate_ohlcv(eng.spark, n_days=args.days)
        print(eng.ingest_ohlcv(src, args.out_path, ingest_date=args.ingest_date))
    elif args.cmd == "compact":
        from oss_data_lake_spark.sources.files import compact_partitions

        print(compact_partitions(eng.spark, args.path))
    elif args.cmd == "query":
        queries = all_queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        queries[args.name](eng.spark, args.sf_dir).show(args.n, truncate=False)
    elif args.cmd == "serve":
        from oss_data_lake_spark import serving

        handle = serving.serve(eng.spark, args.sf_dir, port=args.port)
        print(f"JDBC endpoint ready: {handle.jdbc_url}")
        print("tables published under global_temp.*  (Ctrl-C to stop)")
        try:
            import time as _time

            while True:
                _time.sleep(60)
        except KeyboardInterrupt:
            handle.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
