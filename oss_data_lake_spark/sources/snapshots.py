"""Snapshot layer over the parquet warehouse — the minimal re-expression of
the reference's Iceberg table-format semantics (reference
etc/catalog/iceberg.properties:14-20, RUNBOOK.md:90): atomic commits,
time-travel reads, and rollback, without requiring the Iceberg runtime jar
(``connectors.preferred_table_format`` upgrades to the real thing when one
is on the classpath).

Design (scaled-down Iceberg):

- Every commit writes its data files into a FRESH immutable directory
  ``data/c{N}-{suffix}/`` — existing files are never mutated or deleted, so
  concurrent readers of any older snapshot are undisturbed (snapshot
  isolation for readers).
- A manifest ``_snapshots/v{N}.json`` lists the data directories visible in
  that snapshot (append = parent dirs + new dir; overwrite = new dir only).
- ``_snapshots/CURRENT`` names the live version; both manifest and pointer
  are published via write-temp + ``os.replace`` (atomic on POSIX), so a
  crash mid-commit leaves the previous snapshot intact (the orphaned data
  dir is unreferenced garbage, reclaimed by ``vacuum``).
- ``rollback(v)`` never deletes: it creates a NEW snapshot whose file list
  equals the old one — exactly Iceberg's ``rollback_to_snapshot``.

At 100 TB: manifests store directory-level (not file-level) entries and the
data volume per commit is written partition-parallel by Spark; the manifest
write itself is O(#commits) driver-side metadata, the same order as
Iceberg's metadata JSON. Listing-based scan planning stays on Spark's
parquet reader over the manifest's directories.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """A parquet table with Iceberg-style snapshots, time travel, rollback."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._meta = os.path.join(self.path, "_snapshots")
        os.makedirs(self._meta, exist_ok=True)

    # ------------------------------------------------------------ commits

    def commit(self, df: DataFrame, mode: str = "overwrite") -> int:
        """Write ``df`` as a new snapshot; returns the new version number.

        mode='overwrite' → snapshot sees only this commit's files;
        mode='append'    → snapshot sees parent's files + this commit's.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported commit mode: {mode}")
        parent = self.current_version()
        version = (parent or 0) + 1
        data_dir = f"data/c{version}-{uuid.uuid4().hex[:8]}"
        df.write.mode("errorifexists").parquet(os.path.join(self.path, data_dir))

        dirs = [data_dir]
        if mode == "append" and parent:
            dirs = self._manifest(parent)["data_dirs"] + dirs
        manifest = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "data_dirs": dirs,
            "committed_at_ms": int(time.time() * 1000),
        }
        self._publish(version, manifest)
        return version

    def rollback(self, version: int) -> int:
        """New snapshot exposing exactly the file set of ``version``."""
        old = self._manifest(version)
        cur = self.current_version() or 0
        new_version = cur + 1
        manifest = {
            "version": new_version,
            "parent": cur,
            "mode": f"rollback_to_{version}",
            "data_dirs": old["data_dirs"],
            "committed_at_ms": int(time.time() * 1000),
        }
        self._publish(new_version, manifest)
        return new_version

    # ------------------------------------------------------------- reads

    def read(self, version: int | None = None) -> DataFrame:
        """Read the table at ``version`` (default: current snapshot)."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise ValueError(f"no snapshots at {self.path}")
        dirs = [
            os.path.join(self.path, d) for d in self._manifest(v)["data_dirs"]
        ]
        return self.spark.read.parquet(*dirs)

    def current_version(self) -> int | None:
        try:
            with open(os.path.join(self._meta, "CURRENT")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def versions(self) -> list[dict]:
        """All snapshot manifests, oldest first (the snapshot log)."""
        out = []
        for name in sorted(os.listdir(self._meta)):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(self._meta, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["version"])

    # ----------------------------------------------------------- cleanup

    def vacuum(self) -> list[str]:
        """Delete data directories unreachable from ANY snapshot (crash
        leftovers). Never touches referenced files."""
        import shutil

        referenced = {d for m in self.versions() for d in m["data_dirs"]}
        data_root = os.path.join(self.path, "data")
        removed = []
        if os.path.isdir(data_root):
            for name in os.listdir(data_root):
                rel = f"data/{name}"
                if rel not in referenced:
                    shutil.rmtree(os.path.join(data_root, name))
                    removed.append(rel)
        return removed

    # ----------------------------------------------------------- internal

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._meta, f"v{version}.json")) as f:
            return json.load(f)

    def _publish(self, version: int, manifest: dict) -> None:
        """Atomic two-step publish: manifest file, then CURRENT pointer —
        both via temp + os.replace. A reader never observes a half-written
        manifest or a pointer to a missing manifest."""
        mpath = os.path.join(self._meta, f"v{version}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        cpath = os.path.join(self._meta, "CURRENT")
        tmp = cpath + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, cpath)
