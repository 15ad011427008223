"""SQL-text DML and maintenance statements over registered snapshot tables.

The reference's engine accepts ``DELETE FROM`` / ``UPDATE`` as plain SQL
(Trino 467 over Iceberg v2, reference docker-compose.yaml:153), plus
maintenance procedures (Iceberg's ``rewrite_data_files`` /
``expire_snapshots``; Delta spells them ``OPTIMIZE`` / ``VACUUM``). Spark's
session parquet catalog parses none of these, so ``Engine.sql`` dispatches
statement-shaped text here BEFORE the query path:

- ``DELETE FROM t WHERE cond``            → ``SnapshotTable.delete_where``
- ``UPDATE t SET c = e, ... [WHERE cond]`` → ``SnapshotTable.update_where``
- ``OPTIMIZE t [ZORDER BY (a, b) | CLUSTER BY a] [INTO n FILES]``
                                           → ``SnapshotTable.compact``
- ``VACUUM t``                             → ``SnapshotTable.vacuum``
- ``DESCRIBE HISTORY t``                   → the snapshot log as rows

DML statements prune through the same conservative conjunct extraction as
SELECTs (``snapshots.extract_prunable_predicates``'s machinery over the
statement's WHERE text): extracted ranges intersect via ``plan_pruned`` so
only files whose manifest bounds admit the predicate are rewritten; an
inextractable WHERE (OR / NOT / CASE / function-wrapped columns) simply
rewrites everything the condition touches — under-pruning is a cost, never
a correctness, decision. Each statement returns a small result DataFrame
(the DML ones: one row of version / files_rewritten / files_skipped —
Delta's ``operationMetrics`` shape).

A DML-shaped statement naming an UNREGISTERED table raises immediately —
falling through to Spark's parser would produce a far-from-cause error
("DELETE is only supported with v2 tables").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from oss_data_lake_spark.sources.snapshots import (
    SnapshotTable,
    _BETWEEN_RE,
    _BLOCKER_RE,
    _CMP_RE,
    _depths,
    _literal_spans,
    _masked,
    _parse_sql_literal,
    _starts_in_literal,
)

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([A-Za-z_][\w.]*)\s*(?:WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([A-Za-z_][\w.]*)\s+SET\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+([A-Za-z_][\w.]*)"
    r"(?:\s+ZORDER\s+BY\s*\(([^)]*)\)|\s+CLUSTER\s+BY\s+([A-Za-z_]\w*))?"
    r"(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
# statement-shape detector for the unregistered-table error path
_DML_SHAPE_RE = re.compile(
    r"^\s*(DELETE\s+FROM|UPDATE\s|OPTIMIZE\s|VACUUM\s|DESCRIBE\s+HISTORY)",
    re.IGNORECASE,
)


def conjunct_ranges(
    cond: str, stats_cols: set[str]
) -> list[tuple[str, object, object]]:
    """Prunable ``(col, lo, hi)`` ranges from a bare WHERE condition (the
    single-table DML context — no FROM-scope resolution needed). Same
    conservative gates as the SELECT extractor: OR/NOT/CASE anywhere →
    nothing; only depth-0 conjuncts on stats columns; predicate-shaped
    text inside literals ignored. Under-extraction only costs pruning."""
    masked = _masked(cond)
    if _BLOCKER_RE.search(masked):
        return []
    depths = _depths(masked)
    spans = _literal_spans(cond)
    out: list[tuple[str, object, object]] = []
    for rex, is_between in ((_BETWEEN_RE, True), (_CMP_RE, False)):
        for m in rex.finditer(cond):
            if depths[m.start()] != 0:
                continue
            if _starts_in_literal(m.start(), spans):
                continue
            col = m.group(1)
            if "." in col or col not in stats_cols:
                continue
            if is_between:
                out.append(
                    (col, _parse_sql_literal(m.group(2)),
                     _parse_sql_literal(m.group(3)))
                )
            else:
                op, v = m.group(2), _parse_sql_literal(m.group(3))
                if op in (">=", ">"):
                    out.append((col, v, None))
                elif op in ("<=", "<"):
                    out.append((col, None, v))
                else:
                    out.append((col, v, v))
    return out


def _split_assignments(set_text: str) -> dict[str, str]:
    """``a = expr, b = expr`` split at paren-depth-0 commas (function
    arguments keep their commas)."""
    masked = _masked(set_text)
    depths = _depths(masked)
    parts, start = [], 0
    for i, ch in enumerate(masked):
        if ch == "," and depths[i] == 0:
            parts.append(set_text[start:i])
            start = i + 1
    parts.append(set_text[start:])
    out: dict[str, str] = {}
    for p in parts:
        m = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+?)\s*$", p, re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse UPDATE assignment: {p.strip()!r}")
        out[m.group(1)] = m.group(2)
    return out


def _metrics_df(spark: SparkSession, info: dict) -> DataFrame:
    return spark.createDataFrame(
        [(info["version"], info["files_rewritten"], info["files_skipped"])],
        "version long, files_rewritten long, files_skipped long",
    )


def _require(tables: dict[str, SnapshotTable], name: str, stmt: str):
    t = tables.get(name)
    if t is None:
        raise ValueError(
            f"{stmt} targets '{name}', which is not a registered snapshot "
            f"table (registered: {sorted(tables)}); register it via "
            f"Engine.register_snapshot_table first"
        )
    return t


def dispatch_statement(
    spark: SparkSession, text: str, tables: dict[str, SnapshotTable]
) -> DataFrame | None:
    """Execute ``text`` if it is a recognized DML/maintenance statement
    against a registered snapshot table; return None for everything else
    (the caller's query path takes over)."""
    m = _DELETE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "DELETE FROM")
        cond = m.group(2) or "true"
        preds = conjunct_ranges(cond, t.stats_columns())
        info = t.delete_where(
            cond, prune_preds=preds, stats_for=sorted(t.stats_columns())
        )
        return _metrics_df(spark, info)

    m = _UPDATE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "UPDATE")
        body = m.group(2)
        # split SET-list from WHERE on the MASKED text: a 'WHERE' inside
        # a string literal or parens is data, not the clause boundary
        masked_body = _masked(body)
        body_depths = _depths(masked_body)
        wheres = [
            w
            for w in re.finditer(r"\bWHERE\b", masked_body, re.IGNORECASE)
            if body_depths[w.start()] == 0
        ]
        if wheres:
            set_text = body[: wheres[0].start()]
            cond = body[wheres[0].end():].strip()
        else:
            set_text, cond = body, "true"
        assigns = _split_assignments(set_text)
        preds = conjunct_ranges(cond, t.stats_columns())
        info = t.update_where(
            cond, assigns, prune_preds=preds,
            stats_for=sorted(t.stats_columns()),
        )
        return _metrics_df(spark, info)

    m = _OPTIMIZE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "OPTIMIZE")
        zorder = (
            [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
        )
        cluster = m.group(3)
        n_files = int(m.group(4)) if m.group(4) else (16 if (zorder or cluster) else 1)
        version = t.compact(
            target_partitions=n_files,
            cluster_by=cluster,
            zorder_by=zorder,
            stats_for=sorted(t.stats_columns()) or None,
        )
        return spark.createDataFrame([(version,)], "version long")

    m = _VACUUM_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "VACUUM")
        removed = t.vacuum()
        return spark.createDataFrame(
            [(d,) for d in removed] or [], "removed_dir string"
        )

    m = _HISTORY_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "DESCRIBE HISTORY")
        rows = [
            (
                mfest["version"],
                mfest.get("parent"),
                mfest.get("mode"),
                len(mfest["data_dirs"]),
                mfest.get("committed_at_ms"),
            )
            for mfest in t.versions()
        ]
        return spark.createDataFrame(
            rows,
            "version long, parent long, operation string, "
            "n_data_dirs long, committed_at_ms long",
        )

    if _DML_SHAPE_RE.match(text):
        # DML-shaped but didn't parse: refuse with the real cause instead
        # of handing Spark's parser a statement it will misdiagnose
        raise ValueError(
            f"unrecognized DML/maintenance statement shape: {text.strip()[:80]!r}"
        )
    return None
