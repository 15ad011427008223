"""SnapshotTable as a STREAMING SOURCE — Delta's ``readStream`` parity.

The reference stack's consumers poll tables for new data (its DAG is
batch-triggered; a streaming consumer over Iceberg needs the incremental
append scan). Delta Lake's flagship equivalent is reading a versioned
table AS a stream: every committed append becomes a micro-batch, offsets
are table versions, and checkpoint recovery replays exactly the
uncommitted-to-sink versions. This module implements that on Spark 4's
Python DataSource API:

- **Offsets are snapshot versions** (``{"version": N}``): monotone by the
  commit protocol, durable in the stream checkpoint.
- **A micro-batch is the manifest DIFF between two versions**: exactly
  the data directories (restricted to their visible-file subsets) that
  versions ``start+1..end`` added — the same append-only delta contract
  as ``SnapshotTable.read_changes``, planned driver-side from manifests
  (metadata only).
- **One input partition per data file**: executors read their file with
  pyarrow and project onto the END version's schema (missing columns →
  NULL — schema evolution mid-stream yields the evolved view, like
  Delta with schema tracking).
- **Non-append history REFUSES loudly**: an overwrite / rollback /
  row-level rewrite between polled versions has no well-defined delta —
  the stream errors rather than silently replaying or dropping rows
  (Delta requires ``skipChangeCommits`` for the same reason; we have no
  silent mode).

Usage::

    spark.dataSource.register(SnapshotStreamSource)
    (spark.readStream.format("snapshot_stream")
          .option("path", table_path)
          .load()
          .writeStream...)

At 100 TB: offset planning is O(#versions-polled) manifest reads on the
driver; file reads are executor-parallel; a micro-batch's size is bounded
by what was committed, not by table size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "snapshot_stream"


def _build_source_class():
    """The DataSource / reader / partition classes are defined INSIDE
    this factory so cloudpickle ships them to Python workers BY VALUE
    (nested classes fail the module-lookup test that triggers
    by-reference pickling): the engine package is importable only on the
    driver in an external-driver session (see ``skipping._make_enc`` for
    the same constraint on functions). Everything the executor-side
    ``read`` touches is stdlib/pyarrow or pickled partition data."""

    class _FilePartition(InputPartition):
        def __init__(
            self, abs_path: str, columns: list[str],
            src_names: list[str] | None = None,
        ):
            self.abs_path = abs_path
            self.columns = columns
            # per-column WRITE-TIME name inside this file (field-id
            # resolution for renamed columns); None = same as columns
            self.src_names = src_names or columns

    class _SnapshotStreamReader(DataSourceStreamReader):
        """Driver-side planner: versions → file partitions. Reads
        manifests directly from the local metadata layout."""

        def __init__(
            self,
            path: str,
            start_version: int,
            skip_change_commits: bool = False,
        ):
            self.path = path.rstrip("/")
            self.meta = os.path.join(self.path, "_snapshots")
            self.start_version = start_version
            self.skip_change_commits = skip_change_commits

        # -------------------------------------------------------- meta
        def _current(self) -> int:
            try:
                with open(os.path.join(self.meta, "CURRENT")) as fh:
                    return int(fh.read().strip())
            except FileNotFoundError:
                return 0

        def _manifest(self, v: int) -> dict:
            with open(os.path.join(self.meta, f"v{v}.json")) as fh:
                return json.load(fh)

        @staticmethod
        def _visible(manifest: dict, d: str):
            return manifest.get("dir_files", {}).get(d)

        # ----------------------------------------------------- offsets
        def initialOffset(self) -> dict:
            return {"version": self.start_version}

        def latestOffset(self) -> dict:
            return {"version": max(self._current(), self.start_version)}

        def commit(self, end: dict) -> None:
            pass  # sink checkpoint owns progress; manifests are immutable

        # -------------------------------------------------- partitions
        def _classify(self, prev: dict, cur: dict) -> str:
            """One commit step: 'noop' (metadata-only / compaction),
            'append' (only new files arrived), or 'change' (files left
            visibility or delete vectors moved)."""
            if str(cur.get("mode", "")).startswith("compact"):
                return "noop"  # dataChange=false: same rows, new files
            if set(cur.get("delete_dirs", [])) != set(
                prev.get("delete_dirs", [])
            ):
                return "change"
            if [e["dir"] for e in cur.get("eq_deletes", [])] != [
                e["dir"] for e in prev.get("eq_deletes", [])
            ]:
                return "change"
            prev_dirs = set(prev["data_dirs"])
            if not prev_dirs <= set(cur["data_dirs"]):
                return "change"
            for d in prev_dirs:
                pvis = self._visible(prev, d)
                cvis = self._visible(cur, d)
                if (cvis is not None) and (
                    pvis is None or not set(pvis) <= set(cvis)
                ):
                    return "change"
            new_dirs = [d for d in cur["data_dirs"] if d not in prev_dirs]
            return "append" if new_dirs else "noop"

        def partitions(self, start: dict, end: dict):
            sv, ev = start["version"], end["version"]
            if ev <= sv:
                return []
            head = self._manifest(ev)
            target = head.get("schema")
            if target is None:
                raise ValueError(
                    "snapshot_stream: head manifest has no schema"
                )
            columns = [f["name"] for f in target["fields"]]
            # walk the range COMMIT BY COMMIT (not one base-vs-head
            # diff): each append step emits exactly the files it added,
            # so a change commit elsewhere in the range doesn't poison
            # the appends around it
            parts: list[_FilePartition] = []
            prev: dict = (
                self._manifest(sv) if sv > 0 else {"data_dirs": []}
            )
            for v in range(sv + 1, ev + 1):
                cur = self._manifest(v)
                kind = self._classify(prev, cur)
                if kind == "change":
                    if not self.skip_change_commits:
                        raise ValueError(
                            f"snapshot_stream: version {v} is not an "
                            f"append (an overwrite / rollback / row-level "
                            f"DML / merge-on-read delete intervened) — "
                            f"no well-defined append delta. Set "
                            f"skipChangeCommits=true to pass over change "
                            f"commits (their rows, including any files "
                            f"they add, are SKIPPED — Delta semantics), "
                            f"or consume SnapshotTable.read_change_feed "
                            f"for typed insert/delete rows"
                        )
                    prev = cur
                    continue  # skip the WHOLE commit, added files incl.
                if kind == "noop":
                    prev = cur
                    continue
                prev_dirs = set(prev["data_dirs"])
                head_fids = head.get("field_ids") or {}
                for d in cur["data_dirs"]:
                    if d in prev_dirs:
                        continue
                    if cur.get("partition_specs", {}).get(d):
                        raise ValueError(
                            "snapshot_stream does not support "
                            "Hive-partitioned commit layouts yet "
                            "(partition values live in dir names, not "
                            "files); commit unpartitioned for streaming"
                        )
                    # field-id projection: a column renamed between this
                    # commit and the head is read under its WRITE name
                    dmap = cur.get("dir_field_ids", {}).get(d) or {}
                    id2w = {i: w for w, i in dmap.items()}
                    src_names = [
                        id2w.get(head_fids.get(c), c)
                        if head_fids.get(c) in id2w
                        else c
                        for c in columns
                    ]
                    vis = self._visible(cur, d)
                    root = os.path.join(self.path, d)
                    files = (
                        [os.path.join(root, f) for f in vis]
                        if vis is not None
                        else [
                            os.path.join(dp, f)
                            for dp, _dn, fs in os.walk(root)
                            for f in sorted(fs)
                            if f.endswith(".parquet")
                            and not f.startswith("_")
                        ]
                    )
                    for p in files:
                        parts.append(
                            _FilePartition(p, columns, src_names)
                        )
                prev = cur
            return parts

        # -------------------------------------------------------- read
        def read(self, partition):
            # executor-side: pyarrow read + projection onto the head
            # columns (absent column → None)
            import pyarrow.parquet as pq

            tbl = pq.read_table(partition.abs_path)
            present = set(tbl.column_names)
            for row in tbl.to_pylist():
                yield tuple(
                    row.get(s) if s in present else None
                    for s in partition.src_names
                )

    class SnapshotStreamSource(DataSource):
        """``spark.readStream.format("snapshot_stream").option("path", p)``.

        Options: ``path`` (table root, required); ``startVersion``
        (first micro-batch starts AFTER this version; default 0 =
        stream the table from its first commit);
        ``skipChangeCommits`` ('true'/'false', default false) — pass
        over non-append commits (overwrite / rollback / row-level DML /
        merge-on-read deletes) instead of erroring, Delta's
        ``skipChangeCommits`` semantics: the change commit contributes
        NOTHING to the stream, including any files it added. Retraction
        consumers should read ``SnapshotTable.read_change_feed``
        batch-side instead."""

        @classmethod
        def name(cls) -> str:
            return FORMAT_NAME

        def schema(self):
            meta = os.path.join(self.options["path"], "_snapshots")
            with open(os.path.join(meta, "CURRENT")) as fh:
                cur = int(fh.read().strip())
            with open(os.path.join(meta, f"v{cur}.json")) as fh:
                manifest = json.load(fh)
            s = manifest.get("schema")
            if s is None:
                raise ValueError(
                    "snapshot_stream needs a schema-carrying snapshot table"
                )
            return T.StructType.fromJson(s)

        def streamReader(self, schema):
            return _SnapshotStreamReader(
                self.options["path"],
                int(self.options.get("startVersion", 0) or 0),
                str(
                    self.options.get("skipChangeCommits", "false")
                ).lower()
                == "true",
            )

    return SnapshotStreamSource


SnapshotStreamSource = _build_source_class()
