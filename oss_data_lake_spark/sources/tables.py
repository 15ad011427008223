"""Managed-table layer — the session-catalog re-expression of the
reference's Iceberg/Lakekeeper warehouse (SURVEY.md §2.A A19-A23).

Reference surface → ours:

- Lakekeeper warehouse = bucket + key prefix (reference
  create-yfinance-warehouse.json:2-8) → a warehouse directory + database
  (``CREATE DATABASE ... LOCATION``).
- ``CREATE SCHEMA IF NOT EXISTS iceberg.yfinance`` (reference RUNBOOK.md:87)
  → ``CREATE DATABASE IF NOT EXISTS yfinance`` (catalog prefix modulo —
  SURVEY.md §3.3 requires doc SQL to run with only that rewrite).
- Iceberg hidden ``day(ts)`` partitioning (reference RUNBOOK.md:90) →
  materialized ``date`` partition column, exactly how the reference DAG
  itself materializes it for the curated zone (reference
  dags/yfinance_to_minio.py:74). Deviation documented: the partition column
  is visible; ``fact_price_v`` view exposes the logical schema without it.
- notebook's chunked INSERT VALUES with manual escaping (reference
  notebooks/test_airflow_yfinance.ipynb:216-247) → a single
  ``INSERT INTO ... SELECT`` / ``DataFrameWriterV2.append`` — no chunking,
  no literal building (SURVEY.md §2.A A21).
- ``SHOW SCHEMAS`` / ``SHOW TABLES`` (reference RUNBOOK.md:156-157) →
  identical statements on the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FACT_PRICE_DDL = """
    CREATE TABLE IF NOT EXISTS {db}.fact_price (
        ticker STRING,
        ts TIMESTAMP,
        open DOUBLE,
        high DOUBLE,
        low DOUBLE,
        close DOUBLE,
        volume BIGINT,
        ingest_date DATE,
        date STRING
    ) USING {fmt}
    PARTITIONED BY (date)
"""


# Nested-namespace encoding: the reference's Lakekeeper catalog allows
# multipart namespaces (reference etc/catalog/iceberg.properties:18,
# ``iceberg.rest-catalog.nested-namespace-enabled=true`` — e.g.
# ``finance.yahoo``). Spark's session catalog is single-level, so dotted
# namespaces are encoded into one database name with a reserved separator;
# every Warehouse method speaks the DOTTED name, the catalog sees the
# encoded one. (The Iceberg REST spec does the same flattening over the
# wire with a unit-separator byte.)
NS_SEP = "__"


def encode_namespace(name: str) -> str:
    parts = name.split(".")
    for p in parts:
        # leading/trailing underscores are rejected along with embedded
        # separators: otherwise 'a_.b' and 'a._b' would both encode to
        # 'a___b' (silent cross-namespace collision) and decode could not
        # round-trip
        if not p or NS_SEP in p or p.startswith("_") or p.endswith("_"):
            raise ValueError(f"invalid namespace part {p!r} in {name!r}")
    return NS_SEP.join(parts)


def decode_namespace(db: str) -> str:
    """Inverse of :func:`encode_namespace`, ROUND-TRIP GUARDED: a flat
    name is reported as a dotted nested namespace only when decoding then
    re-encoding reproduces it exactly. A database created outside
    Warehouse whose name merely contains ``__`` (e.g. ``a___b`` or
    ``foo__``) fails the round-trip and is returned verbatim instead of
    being conflated with a distinct nested identifier."""
    dotted = db.replace(NS_SEP, ".")
    try:
        if encode_namespace(dotted) == db:
            return dotted
    except ValueError:
        pass
    return db


def list_namespaces(spark: SparkSession, parent: str | None = None) -> list[str]:
    """All catalog namespaces in dotted form; with ``parent``, only the
    namespaces nested (directly or transitively) under it — the
    ``SHOW SCHEMAS IN parent`` surface of a nested catalog."""
    names = [
        decode_namespace(r[0])
        for r in spark.sql("SHOW DATABASES").collect()
    ]
    if parent is None:
        return sorted(names)
    prefix = parent + "."
    return sorted(n for n in names if n.startswith(prefix))


class Warehouse:
    """A named schema (database) of managed partitioned-Parquet tables.

    ``db`` may be a nested dotted namespace (``finance.yahoo``) — encoded
    into the flat session catalog via :func:`encode_namespace`."""

    def __init__(
        self,
        spark: SparkSession,
        db: str,
        location: str | None = None,
        table_format: str = "parquet",
    ):
        """``table_format``: ``'parquet'`` (the always-available native
        path every suite runs against), an explicit connector name
        (``'delta'`` / ``'iceberg'``), or ``'auto'`` — the upgrade hook:
        resolve via :func:`connectors.preferred_table_format` to the best
        format whose jar is on the classpath (falls back to parquet, so
        'auto' is safe jarless — pytest-pinned)."""
        self.spark = spark
        self.namespace = db
        self.db = encode_namespace(db)
        if table_format == "auto":
            from oss_data_lake_spark.sources.connectors import (
                preferred_table_format,
            )

            table_format = preferred_table_format(spark)
        self.table_format = table_format
        loc = f" LOCATION '{location}/{self.db}.db'" if location else ""
        # A19 — reference RUNBOOK.md:87 (catalog prefix modulo)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.db}{loc}")

    def create_fact_price(self) -> None:
        """A20 — reference RUNBOOK.md:90 DDL, day-transform partitioning
        materialized as the ``date`` column."""
        self.spark.sql(
            FACT_PRICE_DDL.format(db=self.db, fmt=self.table_format)
        )
        # logical view without the physical partition column (hidden-
        # partitioning parity, SURVEY.md §7 risk register)
        self.spark.sql(
            f"CREATE OR REPLACE VIEW {self.db}.fact_price_v AS "
            f"SELECT ticker, ts, open, high, low, close, volume, ingest_date "
            f"FROM {self.db}.fact_price"
        )

    def insert_prices(self, tidy: DataFrame) -> None:
        """A21: set-based insert (replaces the notebook's 400-row chunked
        INSERT VALUES string building)."""
        (
            tidy.withColumn("date", F.date_format("ts", "yyyy-MM-dd"))
            .select(
                "ticker", "ts", "open", "high", "low", "close", "volume",
                "ingest_date", "date",
            )
            .repartition("date")
            .write.insertInto(f"{self.db}.fact_price", overwrite=False)
        )

    def insert_row_sql(self, iso_ts: str, ticker: str, close: float) -> None:
        """A21+A22: single-row SQL insert with an ISO-8601 timestamp literal
        (reference notebooks/test_airflow_yfinance.ipynb:235
        ``from_iso8601_timestamp`` → ``to_timestamp``)."""
        self.spark.sql(
            f"INSERT INTO {self.db}.fact_price "
            f"SELECT '{ticker}', to_timestamp('{iso_ts}'), NULL, NULL, NULL, "
            f"{close}, NULL, current_date(), "
            f"date_format(to_timestamp('{iso_ts}'), 'yyyy-MM-dd')"
        )

    def show_schemas(self) -> list[str]:
        """A23 — reference RUNBOOK.md:156. Dotted (decoded) names."""
        return [
            decode_namespace(r[0])
            for r in self.spark.sql("SHOW DATABASES").collect()
        ]

    def show_tables(self) -> list[str]:
        """A23 — reference RUNBOOK.md:93,157."""
        return [
            r["tableName"]
            for r in self.spark.sql(f"SHOW TABLES IN {self.db}").collect()
        ]

    def count_star(self) -> int:
        """A14 — reference RUNBOOK.md:105 smoke probe."""
        return self.spark.sql(
            f"SELECT COUNT(*) FROM {self.db}.fact_price"
        ).collect()[0][0]

    def avg_close_by_ticker(self) -> DataFrame:
        """A12 — the notebook's SQL side of the dual-engine compare
        (reference notebooks/test_airflow_yfinance.ipynb:332-336),
        verbatim modulo catalog prefix."""
        return self.spark.sql(
            f"SELECT ticker, AVG(close) AS avg_close "
            f"FROM {self.db}.fact_price GROUP BY ticker ORDER BY ticker"
        )

    def daily_avg_limit(self, limit: int = 20) -> DataFrame:
        """A13 — the BI dashboard query (reference RUNBOOK.md:128-132),
        verbatim modulo catalog prefix."""
        return self.spark.sql(
            f"SELECT ticker, DATE(ts) AS d, AVG(close) AS avg_close "
            f"FROM {self.db}.fact_price GROUP BY ticker, DATE(ts) "
            f"ORDER BY ticker, d LIMIT {limit}"
        )

    def create_table_as(self, table: str, select_sql: str) -> None:
        """CTAS (Tier-B DDL: Trino supports CREATE TABLE AS — the standard
        derived-table workflow for BI users, reference RUNBOOK.md:120-123)."""
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.db}.{table} USING parquet AS {select_sql}"
        )

    def insert_overwrite_partitions(self, tidy: DataFrame) -> None:
        """INSERT OVERWRITE with dynamic partition resolution: replaces ONLY
        the date partitions present in the input (re-ingest semantics —
        Iceberg's dynamic overwrite, the reference's re-run-the-DAG story
        without its duplicate files)."""
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            tidy.withColumn("date", F.date_format("ts", "yyyy-MM-dd"))
            .select(
                "ticker", "ts", "open", "high", "low", "close", "volume",
                "ingest_date", "date",
            )
            .repartition("date")
            .write.insertInto(f"{self.db}.fact_price", overwrite=True)
        )

    def merge_into(self, tidy: DataFrame, keys: list[str] = ("ticker", "ts")) -> None:
        """MERGE INTO fact_price: source rows update matches / insert new,
        rewriting ONLY the date partitions the source touches (Iceberg's
        MERGE + dynamic overwrite story — reference Trino supports MERGE
        over Iceberg; our parquet catalog reproduces it set-based).

        Scale shape: one shuffle to anti-join the touched slice on the merge
        keys, one dynamic-partition overwrite of the touched dates. Cost
        scales with the updated slice, never the full table. Idempotent:
        re-merging the same source is a no-op (pytest-pinned)."""
        from oss_data_lake_spark.operators.upsert import merge_upsert

        cols = [
            "ticker", "ts", "open", "high", "low", "close", "volume",
            "ingest_date", "date",
        ]
        src = tidy.withColumn("date", F.date_format("ts", "yyyy-MM-dd")).select(*cols)
        touched = [r[0] for r in src.select("date").distinct().collect()]
        if not touched:
            return
        target_slice = (
            self.spark.table(f"{self.db}.fact_price")
            .filter(F.col("date").isin(touched))
            .select(*cols)
        )
        merged = merge_upsert(target_slice, src, list(keys))
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.repartition("date").write.insertInto(
            f"{self.db}.fact_price", overwrite=True
        )

    def show_partitions(self, table: str = "fact_price") -> list[str]:
        """A23+: partition introspection (SHOW PARTITIONS — the session-
        catalog analogue of Iceberg's partitions metadata table)."""
        return [
            r[0] for r in self.spark.sql(
                f"SHOW PARTITIONS {self.db}.{table}"
            ).collect()
        ]

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str,
        n_buckets: int = 8,
        sort_col: str | None = None,
    ) -> None:
        """Bucketed managed table: joins/aggregations on ``bucket_col``
        between tables with matching bucket counts need NO shuffle — the
        co-location strategy for repeated fact-fact joins at 100 TB
        (SURVEY.md §2.B; the Iceberg analogue is a bucket partition
        transform). Verified shuffle-free in tests/test_tables.py."""
        writer = df.write.bucketBy(n_buckets, bucket_col)
        writer = writer.sortBy(sort_col if sort_col else bucket_col)
        writer.mode("overwrite").format("parquet").saveAsTable(
            f"{self.db}.{table}"
        )

    def analyze(self, table: str = "fact_price", columns: list[str] | None = None) -> None:
        """ANALYZE TABLE — feeds row-count/size (and per-column NDV/min/max)
        statistics to Catalyst's CBO, the role Trino's connector stats play
        in the reference stack."""
        self.spark.sql(
            f"ANALYZE TABLE {self.db}.{table} COMPUTE STATISTICS"
        )
        if columns:
            self.spark.sql(
                f"ANALYZE TABLE {self.db}.{table} COMPUTE STATISTICS "
                f"FOR COLUMNS {', '.join(columns)}"
            )

    def table_stats(self, table: str = "fact_price") -> dict[str, str]:
        """Catalog statistics as a dict (DESCRIBE EXTENDED 'Statistics' row)."""
        rows = self.spark.sql(
            f"DESCRIBE TABLE EXTENDED {self.db}.{table}"
        ).collect()
        return {
            r.col_name: r.data_type
            for r in rows
            if r.col_name in ("Statistics", "Location", "Provider")
        }

    def read_table_at_version(
        self, table: str = "fact_price", version: int = 0
    ) -> DataFrame:
        """Connector-native SQL time travel (``VERSION AS OF`` over a
        Delta/Iceberg managed table — Spark parses the clause natively for
        v2 connector tables). On the parquet native path, time travel is
        served by ``sources/snapshots.py`` (manifest log + the m03 SQL
        rewriter) instead — this method raises to route callers there."""
        if self.table_format == "parquet":
            raise ValueError(
                "the parquet catalog has no table versions; use "
                "sources.snapshots.SnapshotTable / sql_with_time_travel"
            )
        return self.spark.sql(
            f"SELECT * FROM {self.db}.{table} VERSION AS OF {version}"
        )

    def drop(self) -> None:
        self.spark.sql(f"DROP DATABASE IF EXISTS {self.db} CASCADE")
