"""Legacy v1 lake layout: reader + migrator.

The reference's first-generation DAG (reference dags/yfinance_to_minio_v1.py)
wrote ``finance/yahoo/daily/ingest_date=YYYY-MM-DD/<TICKER>.parquet`` — raw
yfinance columns (capitalized ``Date/Open/High/Low/Close/Volume`` plus a
lowercase ``ticker``), one file per ticker per DAG run, a full 30-day
lookback window re-fetched on EVERY run (reference :18-20, :30-36). The v2
DAG replaced it with the normalized ``date=``-partitioned curated layout
(reference dags/yfinance_to_minio.py) that ``sources/ingest.py`` mirrors;
v1 survives only as data-at-rest that a migration has to drain.

Spark-first mapping:

- **Reader**: one ``spark.read.parquet`` over the layout root — Hive-style
  partition discovery recovers ``ingest_date`` from the directory names
  (per-ticker file NAMES are irrelevant to the scan; they were only ever a
  pandas-side writing convention). Column normalization reuses the v2
  ingest normalizer, so both generations converge on one schema.
- **Overlap resolution**: because every run rewrote the full lookback
  window, the same (ticker, ts) exists under many ``ingest_date=`` dirs.
  ``latest_per_key`` keeps the newest ingest per key — ``max_by`` over a
  single hash aggregate (one shuffle), not a row_number window.
- **Migrator**: resolved v1 rows flow into :func:`ingest.ingest`'s guarded
  partitioned write, landing in the v2 curated layout. At 100 TB the
  migration is a single scan → agg → partitioned write; restrict it to an
  ``ingest_date`` range (partition-pruned — directories outside the range
  are never opened) to migrate incrementally.

``write_v1_fixture`` exists to produce the layout for tests: the
driver-side per-ticker loop mirrors how the reference actually wrote
(separate ``df.to_parquet`` per ticker, reference :30-36) and is bounded
by the ticker count — it is a fixture generator, not an engine path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.sources.ingest import ingest, normalize_ohlcv

V1_PREFIX = "finance/yahoo/daily"  # reference dags/yfinance_to_minio_v1.py:21


def write_v1_fixture(
    df: DataFrame, root: str, ingest_date: str
) -> int:
    """TEST FIXTURE generator: lay ``df`` (tidy ticker/ts/ohlcv rows) down
    in the v1 layout — ``<root>/finance/yahoo/daily/ingest_date=<d>/
    <TICKER>.parquet``, one file per ticker with the reference's raw
    capitalized columns. Driver-side loop over tickers by design (that IS
    the v1 writer's shape); returns the number of files written."""
    raw = df.select(
        F.col("ts").alias("Date"),
        F.col("open").alias("Open"),
        F.col("high").alias("High"),
        F.col("low").alias("Low"),
        F.col("close").alias("Close"),
        F.col("volume").alias("Volume"),
        "ticker",
    )
    tickers = [r[0] for r in raw.select("ticker").distinct().collect()]
    base = os.path.join(root, V1_PREFIX, f"ingest_date={ingest_date}")
    os.makedirs(base, exist_ok=True)
    for t in sorted(tickers):
        pdf = raw.filter(F.col("ticker") == t).toPandas()
        # microsecond timestamps: pandas defaults to TIMESTAMP(NANOS),
        # which parquet readers disagree on (long vs NTZ vs illegal);
        # µs is the one grain every generation reads identically
        pdf["Date"] = pdf["Date"].astype("datetime64[us]")
        # nullable Int64: a ticker whose frame happens to contain a null
        # volume would otherwise become float64 → parquet DOUBLE, and the
        # layout's per-file schemas would disagree (bigint vs double)
        pdf["Volume"] = pdf["Volume"].astype("Int64")
        pdf.to_parquet(os.path.join(base, f"{t}.parquet"), index=False)
    return len(tickers)


def read_v1(spark: SparkSession, root: str) -> DataFrame:
    """Read the whole v1 layout back as the NORMALIZED v2 schema.

    Partition discovery turns ``ingest_date=`` dirs into a column; the
    reference's capitalized raw columns go through the same normalizer as
    live v2 ingest (lowercase, Date→ts, strict casts, ms truncation), with
    the DISCOVERED ingest_date (the truth of when each row landed) passed
    through as the ingest column. Downstream operators cannot tell which
    generation a row came from. A predicate on ``ingest_date`` prunes at
    the file index — the incremental-migration path."""
    # same reader posture as sources/loaders.py (runtime-settable for
    # foreign driver sessions): timestamps land as LTZ micros under UTC
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # partition inference off ONLY for this read (restored after — the
    # partition schema is fixed at DataFrame creation; leaving it off
    # would change later partition-discovering reads in the session)
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        raw = spark.read.parquet(os.path.join(root, V1_PREFIX))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return normalize_ohlcv(raw, ingest_date=F.col("ingest_date"))


def latest_per_key(v1: DataFrame) -> DataFrame:
    """Collapse the v1 layout's re-ingested overlaps: for each (ticker, ts)
    keep the row from the NEWEST ingest_date. ``max_by`` over one hash
    aggregate — a single shuffle on the key, partial-aggregated map-side;
    no window, no row_number, no second pass."""
    payload = [c for c in v1.columns if c not in ("ticker", "ts")]
    return v1.groupBy("ticker", "ts").agg(
        *[
            F.max_by(F.col(c), F.col("ingest_date")).alias(c)
            for c in payload
        ]
    )


def migrate_v1_to_curated(
    spark: SparkSession,
    v1_root: str,
    out_path: str,
    ingest_dates: tuple[str, str] | None = None,
) -> dict[str, int]:
    """Drain v1 into the v2 curated layout: read → (optional incremental
    ``ingest_date`` range, partition-pruned) → latest-per-key overlap
    resolution → partition-scoped merge into the curated zone. Returns the
    write metrics dict ({rows_written, partitions}).

    Three provenance/safety rules:
    - The DISCOVERED v1 ingest_date travels through the migration (the
      newest generation's per key) — re-running the migration on another
      day produces byte-identical output, and audits see when rows really
      landed, not when they were migrated.
    - Incremental waves MERGE: because v1 generations overlap in
      (ticker, ts), a later wave must not drop wave-1-only rows — rows
      already in the curated zone are unioned in and the latest ingest
      per (ticker, ts) wins across BOTH waves.
    - The merged result is STAGED into a sibling ``.migrating`` dir and
      swapped in with one ``os.rename`` (the ``sources/lake.py``
      ``_build_once`` protocol). The write job therefore never deletes
      the files it is reading (no read-overwrite-same-path window: a
      crash or task retry mid-write leaves the live curated zone
      untouched, and a crash between the rmtree and the rename leaves
      the complete staged copy on disk — and the v1 source, which the
      migration never deletes, regenerates everything on re-run).
      LOCAL-FILESYSTEM atomicity only: on an object store, publish via a
      manifest pointer (``sources/snapshots.py``) instead of dir renames."""
    import shutil

    v1 = read_v1(spark, v1_root)
    if ingest_dates is not None:
        lo, hi = ingest_dates
        v1 = v1.filter(F.col("ingest_date").between(lo, hi))
    resolved = latest_per_key(v1)
    if os.path.exists(out_path):
        existing = spark.read.parquet(out_path).drop("date")
        resolved = latest_per_key(resolved.unionByName(existing))
    staging = out_path.rstrip("/") + ".migrating"
    shutil.rmtree(staging, ignore_errors=True)
    metrics = ingest(
        spark,
        resolved,
        staging,
        ingest_date=F.col("ingest_date"),
        mode="overwrite",
    )
    shutil.rmtree(out_path, ignore_errors=True)
    os.rename(staging, out_path)
    return metrics
