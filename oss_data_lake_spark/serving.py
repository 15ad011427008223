"""BI serving surface: an in-process Thrift JDBC endpoint over the lake.

The reference serves its warehouse to BI tools over JDBC — Metabase and
CloudBeaver connect to Trino's HiveServer2-compatible endpoint (reference
RUNBOOK.md:120-123; scripts/fetch-metabase-trino-driver.sh:4-10 pulls the
Trino JDBC driver for Metabase). Spark ships the same protocol natively:
``HiveThriftServer2`` (bundled in ``spark-hive-thriftserver`` with pip
PySpark) speaks HiveServer2 Thrift, so any tool with a Hive JDBC driver —
Metabase, DBeaver/CloudBeaver, beeline — can run SQL against the running
SparkSession.

Design notes for a 1000-executor deployment:

- The Thrift server is a *driver-side* listener; queries it receives execute
  on the cluster like any other Spark SQL, so serving scales with the
  cluster, not with this process.
- Tables are published as **global temp views** (``global_temp.<name>``):
  visible to every JDBC connection without requiring
  ``spark.sql.hive.thriftServer.singleSession`` (a static conf that cannot
  be enabled after session start). Catalog (managed) tables registered via
  :mod:`oss_data_lake_spark.sources.tables` are visible as-is.
- Views are plain Parquet scans — predicate pushdown and column pruning
  apply to BI-tool queries exactly as to programmatic ones.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from oss_data_lake_spark.sources.loaders import load_tables

GLOBAL_TEMP_DB = "global_temp"


def thrift_server_available(spark: SparkSession) -> bool:
    """True when the bundled Spark build carries the HiveThriftServer2 class
    (pip PySpark does; a hive-free custom build may not)."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — py4j gateway
            "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2"
        )
        return True
    except Exception:  # pragma: no cover - absent only on hive-free builds
        return False


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@dataclass
class ThriftHandle:
    """A started HiveThriftServer2 and how to reach it."""

    port: int
    jdbc_url: str
    _jserver: object

    def stop(self) -> None:
        self._jserver.stop()


def publish_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Publish every lake table as a global temp view so JDBC sessions
    (which get their own session state) can query ``global_temp.<name>``."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceGlobalTempView(name)
    return sorted(dfs)


def start_thrift_server(spark: SparkSession, port: int | None = None) -> ThriftHandle:
    """Start the in-process HiveServer2-protocol endpoint.

    ``hive.server2.thrift.port`` is read from the session conf at server
    start, so it must be set *before* ``startWithContext``. One server per
    JVM: a second call raises from the JVM side — callers should treat the
    handle as process-wide.
    """
    if port is None:
        port = free_port()
    # Keep the embedded Derby metastore out of the caller's cwd (it is
    # serving-session scratch state, not lake data).
    scratch = tempfile.mkdtemp(prefix="odls-thrift-")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    hconf.set(
        "javax.jdo.option.ConnectionURL",
        f"jdbc:derby:;databaseName={scratch}/metastore_db;create=true",
    )
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.stream.error.file", f"{scratch}/derby.log"
    )
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", "127.0.0.1")
    jserver = (
        spark._jvm.org.apache.spark.sql.hive.thriftserver  # noqa: SLF001
        .HiveThriftServer2.startWithContext(spark._jsparkSession.sqlContext())
    )
    return ThriftHandle(
        port=port, jdbc_url=f"jdbc:hive2://127.0.0.1:{port}", _jserver=jserver
    )


def wait_until_listening(handle: ThriftHandle, timeout_s: float = 60.0) -> None:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", handle.port), timeout=2):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"thrift server not listening on :{handle.port}")


def beeline_path() -> str:
    """The Hive JDBC CLI bundled with PySpark — the same client a BI tool
    embeds (reference RUNBOOK.md:120-123 uses the Trino JDBC equivalent)."""
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")


def jdbc_query(handle: ThriftHandle, sql: str, timeout_s: float = 120.0) -> str:
    """Run one SQL statement over JDBC via beeline; returns csv2 stdout.

    This is the serving-surface smoke path — real BI tools hold a pooled
    connection instead, but the wire protocol and SQL dialect are identical.
    """
    result = subprocess.run(
        [
            beeline_path(),
            "-u",
            handle.jdbc_url,
            "--outputformat=csv2",
            "--silent=true",
            "-e",
            sql,
        ],
        capture_output=True,
        text=True,
        timeout=timeout_s,
        check=False,
    )
    if result.returncode != 0:  # pragma: no cover - surfaced in test output
        raise RuntimeError(f"beeline rc={result.returncode}: {result.stderr[-2000:]}")
    # beeline echoes the connection prompt ("0: jdbc:hive2://...> ") in front
    # of the first output line — strip it so callers see pure csv2
    return re.sub(r"^\d+: jdbc:hive2://\S*>\s*", "", result.stdout, flags=re.M)


def serve(spark: SparkSession, sf_dir: str, port: int | None = None) -> ThriftHandle:
    """One-call BI endpoint: publish the lake tables, start the listener,
    block until it accepts connections. Mirrors the reference's 'warehouse
    is queryable from Metabase once the stack is up' contract
    (reference RUNBOOK.md:120-123)."""
    publish_tables(spark, sf_dir)
    handle = start_thrift_server(spark, port)
    wait_until_listening(handle)
    return handle
