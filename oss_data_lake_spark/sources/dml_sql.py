"""SQL-text DML and maintenance statements over registered snapshot tables.

The reference's engine accepts ``DELETE FROM`` / ``UPDATE`` as plain SQL
(Trino 467 over Iceberg v2, reference docker-compose.yaml:153), plus
maintenance procedures (Iceberg's ``rewrite_data_files`` /
``expire_snapshots``; Delta spells them ``OPTIMIZE`` / ``VACUUM``). Spark's
session parquet catalog parses none of these, so ``Engine.sql`` dispatches
statement-shaped text here BEFORE the query path:

- ``DELETE FROM t WHERE cond``            → ``SnapshotTable.delete_where``
- ``UPDATE t SET c = e, ... [WHERE cond]`` → ``SnapshotTable.update_where``
  (both accept SUBQUERIES in the condition — ``IN (SELECT ...)``,
  ``EXISTS (...)``, scalar comparisons, correlated on the target's
  name, time-traveling inner SELECTs — routed through a temp-view SQL
  pass so Catalyst plans a real semi/anti join; always copy-on-write)
- ``INSERT INTO t [(cols)] SELECT ...|VALUES ...``
                                           → ``SnapshotTable.commit(append)``
  (the source query runs through the full SELECT surface, so it may read
  other registered snapshot tables, including ``FOR VERSION AS OF``;
  positional column mapping, absent columns filled with NULL)
- ``MERGE [WITH SCHEMA EVOLUTION] INTO t [AS a] USING (<query>)|<name>
     [AS] b ON a.k = b.k2 [AND ..]
     [WHEN MATCHED [AND cond] THEN UPDATE SET * | SET c = expr, ... | DELETE]
     [WHEN NOT MATCHED [BY TARGET] THEN INSERT * | INSERT (cols) VALUES (exprs)]
     [WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE | UPDATE SET c = expr, ...]``
                                           → ``SnapshotTable.merge_rows``
  (the full Trino clause grammar as of round 7: arbitrary ``SET``
  assignments see both rows — bare names resolve by scope, ambiguity
  raises; ``INSERT VALUES`` expressions see the source row; ON conjuncts
  are alias-qualified equalities whose column names may differ; the
  plain-upsert star form routes scan-free via ``merge_rows_mor`` under
  ``delete.mode = merge-on-read``)
- ``OPTIMIZE t [ZORDER BY (a, b) | CLUSTER BY a] [INTO n FILES]``
                                           → ``SnapshotTable.compact``
- ``VACUUM t [RETAIN n HOURS] [DRY RUN]``  → ``SnapshotTable.vacuum``
- ``DESCRIBE HISTORY | DETAIL | FILES t``  → snapshot log / table summary
                                             / per-file manifest view
- ``CREATE TABLE t USING snapshot AS <query>`` / ``DROP TABLE t``
- ``CREATE TABLE t (c T [DEFAULT e], ...) USING snapshot
  [PARTITIONED BY (c | days(ts) | bucket(n, c) | ...)]``
                                           → EMPTY table with declared
                                             schema/layout/defaults
                                           → managed CTAS + lifecycle
- ``ALTER TABLE t ADD CONSTRAINT n CHECK (e) | DROP CONSTRAINT n``
                                           → commit-time quality gates
- ``ALTER TABLE t ADD COLUMNS (c T [DEFAULT e], ...) | DROP COLUMN c
               | RENAME COLUMN a TO b``    → metadata-only schema DDL
- ``ALTER TABLE t ALTER COLUMN c SET DEFAULT e | DROP DEFAULT``
                                           → column DEFAULTs (Iceberg
                                             v3: add-time DEFAULT is
                                             the INITIAL default old
                                             files read; SET DEFAULT
                                             changes what INSERTs
                                             omitting the column fill)
                                             (rename resolves by field
                                             id — old files keep their
                                             written names)
- ``ALTER TABLE t SET | UNSET TBLPROPERTIES (...)``
                                           → table properties
                                             (``delete.mode =
                                             merge-on-read`` routes
                                             DELETEs through position
                                             tombstones)
- ``RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'``
                                           → ``SnapshotTable.rollback``
                                             (a NEW snapshot exposing
                                             the old file set — Delta
                                             RESTORE)
- ``CREATE TABLE c SHALLOW CLONE t [VERSION AS OF n]``
                                           → zero-copy clone referencing
                                             the source's files
                                             (``shallow_clone_to``)
- ``COPY INTO t FROM '<path>' [FILEFORMAT = PARQUET|CSV|JSON]
  [PATTERN = '<glob>']``
                                           → idempotent file-level bulk
                                             ingest (``copy_into``) —
                                             re-runs load only files not
                                             yet in the ingest ledger
- ``SHOW CREATE TABLE t``                  → reconstructed DDL (schema,
                                             layout, location,
                                             properties, constraints)
- ``INSERT INTO t REPLACE WHERE cond SELECT ...|VALUES ...``
                                           → Delta replaceWhere: ONE
                                             atomic commit swaps exactly
                                             the predicate's slice for
                                             the query's rows (pruned to
                                             admitting files; incoming
                                             rows outside the predicate
                                             refuse)
- ``INSERT OVERWRITE [TABLE] t [(cols)] SELECT ...|VALUES ...``
                                           → overwrite commit under the
                                             existing table schema
- ``TRUNCATE TABLE t``                     → empty overwrite commit
                                             (schema survives, history
                                             stays time-travelable)
- ``CREATE OR REPLACE TABLE t USING snapshot AS <query>``
                                           → overwrite commit on an
                                             existing table (history
                                             preserved), plain CTAS
                                             otherwise
- ``SHOW TBLPROPERTIES t [('key')]``       → property listing
- ``ALTER TABLE t EXPIRE SNAPSHOTS [KEEP LAST n] [OLDER THAN 'ts']
  [RETAIN n HOURS]``
                                           → manifest retention
                                             (``expire_snapshots``;
                                             tagged and younger-than-
                                             cutoff versions survive)
- ``DESC[RIBE] [TABLE] t``                 → column listing
- ``OPTIMIZE t [INTO n FILES] WHERE cond`` → SCOPED compaction
                                             (``compact_where`` — only
                                             bound-admitted files
                                             rewrite, dataChange=false)
- ``ALTER TABLE t ALTER COLUMN c TYPE <t>``
                                           → metadata-only type
                                             widening (safe promotions
                                             only)
- ``ALTER TABLE t CREATE TAG n [AS OF VERSION v] | DROP TAG n``
- ``ALTER TABLE t CREATE BRANCH b [AS OF VERSION v] | DROP BRANCH b``
- ``ALTER TABLE t FAST FORWARD BRANCH b [KEEP]``; ``SHOW BRANCHES t``
  (a created branch answers SQL as ``t_branch_<b>``)
- ``ALTER TABLE t CHERRY PICK VERSION n`` (re-apply a pure-append commit)
- ``SHOW TAGS t``
- ``CONVERT TO SNAPSHOT PARQUET '<path>' AS t [PARTITIONED BY (c1, c2)]
  [STATS FOR (c1, ...)]`` (adopt a foreign parquet dir zero-copy —
  Delta's CONVERT TO DELTA; STATS FOR harvests footer bounds)
                                           → named snapshot refs;
                                             ``FOR VERSION AS OF '<n>'``
                                             time-travels by tag
- ``ALTER TABLE t ADD | DROP PARTITION FIELD days(ts)|bucket(n, c)|c``
- ``ALTER TABLE t WRITE ORDERED BY (c1, c2) | WRITE UNORDERED``
                                           → metadata-only partition-
                                             spec evolution (future
                                             writes adopt the declared
                                             spec; old dirs keep theirs,
                                             pruning spans both)
- ``SHOW PARTITIONS t``                    → distinct partition tuples
                                             from file-path segments
                                             (no data scan)
- ``SELECT ... FROM t$files|$history|$snapshots|$partitions``
                                           → Trino-Iceberg metadata
                                             tables as plain relations
                                             (filter/join/aggregate
                                             table metadata; answered
                                             from manifests only)
- ``ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b]``
                                           → footer/manifest-harvested
                                             live row count + size (and
                                             approx NDV per column);
                                             engine views broadcast
                                             small-by-stats dimensions
- ``CREATE | REFRESH | DROP MATERIALIZED VIEW mv [AS SELECT ...]``
                                           → incrementally-maintained
                                             aggregate over a snapshot
                                             table (matview.py): refresh
                                             consumes only the source
                                             delta (change feed
                                             retractions for DML),
                                             bit-identical to the full
                                             recompute

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

import json
import re

from pyspark.sql import DataFrame, SparkSession

from oss_data_lake_spark.sources.snapshots import (
    SnapshotTable,
    _BLOCKER_RE,
    _CMP_RE,
    _IN_RE,
    _ANY_LIT_RE,
    _conjunct_spans,
    _depths,
    _masked,
    _coerce_key_value,
    _parse_sql_literal,
    _preds_from_conjuncts,
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
    r"(?:\s+INTO\s+(\d+)\s+FILES)?"
    r"(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+([A-Za-z_][\w.]*)"
    r"(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(\s+DRY\s+RUN)?\s*;?\s*$",
    re.IGNORECASE,
)
_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
_DETAIL_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
_FILES_RE = re.compile(
    r"^\s*DESCRIBE\s+FILES\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([A-Za-z_][\w.]*)"
    r"(?:\s*\(([^)]*)\))?\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Delta's replaceWhere: INSERT INTO t REPLACE WHERE cond SELECT ... —
# atomically swap exactly the predicate's slice for the query's rows
_INSERT_REPLACE_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?:TABLE\s+)?([A-Za-z_][\w.]*)\s+"
    r"REPLACE\s+WHERE\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+TABLE\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
_SHOW_PROPS_RE = re.compile(
    r"^\s*SHOW\s+TBLPROPERTIES\s+([A-Za-z_][\w.]*)"
    r"(?:\s*\(\s*'([^']+)'\s*\))?\s*;?\s*$",
    re.IGNORECASE,
)
_EXPIRE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+EXPIRE\s+SNAPSHOTS\s+"
    r"(?:KEEP\s+LAST\s+(\d+))?"
    r"(?:\s*(?:OLDER\s+THAN\s+(?:TIMESTAMP\s+)?'([^']+)'))?"
    r"(?:\s*RETAIN\s+(\d+)\s+HOURS?)?\s*;?\s*$",
    re.IGNORECASE,
)
# Trino-Iceberg's maintenance spelling (Trino 467 `ALTER TABLE ...
# EXECUTE <procedure>(name => 'value', ...)` — the way the reference
# stack's users actually run compaction/expiry from Trino):
#   optimize [(file_size_threshold => '128MB')] → full-table compaction
#       (the threshold is a LAYOUT hint — which files are merge
#       candidates — never a result-semantics knob: the table content
#       is identical either way, so it is accepted and the compaction
#       runs whole-table, same as `OPTIMIZE t`)
#   expire_snapshots(retention_threshold => '7d') → expire versions
#       older than the threshold (keep_last=1 floor, Trino's contract)
#   remove_orphan_files(retention_threshold => '7d') → vacuum
#       unreferenced files older than the threshold
# Any other procedure or argument refuses loudly.
_ALTER_EXECUTE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+EXECUTE\s+"
    r"([A-Za-z_]\w*)\s*(?:\((.*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EXEC_ARG_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\s*=>\s*'((?:[^']|'')*)'\s*$"
)
_DURATION_RE = re.compile(r"^\s*(\d+)\s*(s|m|h|d)\s*$", re.IGNORECASE)


def _parse_duration_ms(v: str, where: str) -> int:
    dm = _DURATION_RE.match(v)
    if dm is None:
        raise ValueError(
            f"{where}: retention_threshold must be <n><unit> with unit "
            f"in s/m/h/d (Trino duration form), got {v!r}"
        )
    mult = {"s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}
    return int(dm.group(1)) * mult[dm.group(2).lower()]


def _parse_exec_args(argtext: str | None, where: str) -> dict[str, str]:
    if not argtext or not argtext.strip():
        return {}
    from oss_data_lake_spark.sources.snapshots import _masked

    # split at UNMASKED depth-0 commas only: a quoted value containing
    # a comma is one argument, not a mis-split pair (round-13 ADVICE)
    masked = _masked(argtext)
    parts, start, depth = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(argtext[start:i])
            start = i + 1
    parts.append(argtext[start:])
    out: dict[str, str] = {}
    for part in parts:
        am = _EXEC_ARG_RE.match(part)
        if am is None:
            raise ValueError(
                f"{where}: arguments must be name => 'value' pairs, "
                f"got {part.strip()!r}"
            )
        out[am.group(1).lower()] = am.group(2).replace("''", "'")
    return out


# Trino-Iceberg's accidental-history-destruction guard: EXECUTE
# expire_snapshots / remove_orphan_files refuse retention thresholds
# below a configured minimum (iceberg.expire-snapshots.min-retention /
# iceberg.remove-orphan-files.min-retention, both 7d by default). The
# session-property override mirrors Trino's
# `SET SESSION <catalog>.expire_snapshots_min_retention = '0s'`.
_MIN_RETENTION_DEFAULT = "7d"


def _min_retention(engine, prop_tail: str) -> tuple[int, str]:
    props = getattr(engine, "_session_props", None) or {}
    for k, v in props.items():
        if k.rsplit(".", 1)[-1].lower() == prop_tail:
            return _parse_duration_ms(v, f"SET SESSION {k}"), v
    return (
        _parse_duration_ms(_MIN_RETENTION_DEFAULT, "min-retention"),
        _MIN_RETENTION_DEFAULT,
    )


def _check_min_retention(engine, proc: str, prop_tail: str,
                         ms: int, threshold_text: str) -> None:
    floor_ms, floor_text = _min_retention(engine, prop_tail)
    if ms < floor_ms:
        raise ValueError(
            f"EXECUTE {proc}: retention_threshold "
            f"{threshold_text!r} is below the minimum retention "
            f"{floor_text!r} (Trino's iceberg {proc} min-retention "
            f"guard against accidental history destruction) — raise "
            f"the threshold or SET SESSION {prop_tail} = '<n><unit>'"
        )
_DESCRIBE_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_MERGE_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+([A-Za-z_]\w*))?\s+USING\s+",
    re.IGNORECASE,
)
# Delta's MERGE WITH SCHEMA EVOLUTION: the prefix strips to a plain
# MERGE INTO after the source-only columns evolve into the target
_MERGE_EVOLVE_RE = re.compile(
    r"^\s*MERGE\s+WITH\s+SCHEMA\s+EVOLUTION\s+INTO\s+",
    re.IGNORECASE,
)
_ON_KEY_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\.(\w+)\s*=\s*([A-Za-z_]\w*)\.(\w+)\s*$"
)
_WHEN_RE = re.compile(
    r"\bWHEN\s+(NOT\s+)?MATCHED\b(?:\s+AND\s+(.*?))?\s*\bTHEN\s+"
    r"(UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*)",
    re.IGNORECASE | re.DOTALL,
)
# statement-shape detector for the unregistered-table error path
_DML_SHAPE_RE = re.compile(
    r"^\s*(DELETE\s+FROM|UPDATE\s|INSERT\s+INTO|MERGE\s+INTO"
    r"|OPTIMIZE\s|VACUUM\s|DESCRIBE\s+HISTORY"
    r"|RESTORE\s+TABLE|COPY\s+INTO|TRUNCATE\s+TABLE)",
    re.IGNORECASE,
)


def conjunct_ranges(cond: str, stats_cols: set[str]) -> list:
    """Prunable predicates from a bare WHERE condition (the single-table
    DML context — no FROM-scope resolution needed): ranges, point/IN
    probes (bloom-powered), IS [NOT] NULL. Same conservative gates as the
    SELECT extractor: OR/CASE/negations anywhere → nothing; only depth-0
    conjuncts on stats columns; predicate-shaped text inside literals
    ignored. Under-extraction only costs pruning."""
    masked = _masked(cond)
    if _BLOCKER_RE.search(masked):
        return []
    depths = _depths(masked)
    return _preds_from_conjuncts(
        cond, masked, depths, 0, len(cond), 0, stats_cols, None
    )


def subquery_free_conjunct_ranges(cond: str, stats_cols: set[str]) -> list:
    """Prunable predicates from the NON-subquery depth-0 conjuncts of a
    condition that contains subqueries elsewhere. Each conjunct gates
    the AND independently, so extraction is per-conjunct: a conjunct
    containing a subquery (or a blocker like OR/NOT) contributes
    nothing, the rest prune as usual — a file where any extracted
    conjunct cannot hold has no row satisfying the whole conjunction.
    Under-extraction only costs pruning, never soundness."""
    masked = _masked(cond)
    depths = _depths(masked)
    spans = _conjunct_spans(masked, depths, 0, len(cond), 0)
    preds: list = []
    for lo, hi in spans:
        if _SUBQUERY_RE.search(masked[lo:hi]):
            continue
        preds.extend(conjunct_ranges(cond[lo:hi], stats_cols))
    return preds


# multi-conjunct probes expand IN lists as a cross product; past this
# many key tuples the position-delete scan is the better plan anyway
_EQ_PROBE_MAX_ROWS = 1000


def eq_delete_probe(cond: str, table_cols: set[str]):
    """If the DELETE condition is a conjunction of ``col = lit`` /
    ``col IN (lits)`` terms on DISTINCT table columns, return
    ``(cols, [key_tuples])`` — the shape an EQUALITY delete can take
    without any scan (multi-conjunct forms become one composite-key
    delete; IN lists cross-product, bounded). Anything else returns
    None (the position-delete path)."""
    import itertools

    masked = _masked(cond)
    if _BLOCKER_RE.search(masked):
        return None
    depths = _depths(masked)
    spans = _conjunct_spans(masked, depths, 0, len(cond), 0)
    if not spans:
        return None
    cols: list[str] = []
    per_col_vals: list[list] = []
    for lo, hi in spans:
        conj = cond[lo:hi].strip().rstrip(";").strip()
        m = _CMP_RE.fullmatch(conj)
        if m and m.group(2) == "=" and m.group(1) in table_cols:
            col, vals = m.group(1), [_parse_sql_literal(m.group(3))]
        else:
            m = _IN_RE.fullmatch(conj)
            if not (m and m.group(1) in table_cols):
                return None
            col = m.group(1)
            vals = [
                _parse_sql_literal(t)
                for t in _ANY_LIT_RE.findall(m.group(2))
            ]
            if not vals:
                return None
        if col in cols:
            return None  # a = 1 AND a = 2 — let the scan decide
        cols.append(col)
        per_col_vals.append(vals)
    n_rows = 1
    for vs in per_col_vals:
        n_rows *= len(vs)
    if n_rows > _EQ_PROBE_MAX_ROWS:
        return None
    return cols, [tuple(t) for t in itertools.product(*per_col_vals)]


def split_statements(script: str) -> list[str]:
    """Split a SQL script on semicolons — only at paren depth 0 and
    outside string literals/comments (the masked-text discipline every
    structural split here uses). Empty statements vanish."""
    masked = _masked(script)
    depths = _depths(masked)
    out, start = [], 0
    for i, ch in enumerate(masked):
        if ch == ";" and depths[i] == 0:
            out.append(script[start:i])
            start = i + 1
    out.append(script[start:])
    return [s for s in (p.strip() for p in out) if s]


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


def _split_exprs(text: str) -> list[str]:
    """Comma-split at paren depth 0 outside literals (VALUES lists —
    function arguments and quoted commas stay intact)."""
    masked = _masked(text)
    depths = _depths(masked)
    parts, start = [], 0
    for i, ch in enumerate(masked):
        if ch == "," and depths[i] == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


_IDENT_RE = re.compile(r"(?<![\w.'\"])([A-Za-z_]\w*)(?![\w(])")


def _rewrite_scoped(
    expr: str,
    tgt_alias: str,
    src_alias: str,
    tgt_cols: set[str],
    src_cols: set[str],
    allow_target: bool,
) -> str:
    """Resolve a MERGE expression's column references against the two
    row scopes (Trino's rule): ``<tgt_alias>.c`` → the target row
    (``t.c``), ``<src_alias>.c`` → the source row (``s.c``), bare names
    that match exactly one scope qualify to it, names matching BOTH
    raise (ambiguous), everything else (functions, keywords, literals —
    detected on the literal-masked copy) passes through. INSERT VALUES
    expressions (``allow_target=False``) may reference only the source
    row."""
    masked = _masked(expr)
    repl: list[tuple[int, int, str]] = []
    for m in _IDENT_RE.finditer(masked):
        name = m.group(1)
        followed_by_dot = m.end() < len(masked) and masked[m.end()] == "."
        if followed_by_dot:
            if name == tgt_alias:
                if not allow_target:
                    raise ValueError(
                        f"INSERT VALUES may reference only the source row; "
                        f"found {name!r}"
                    )
                repl.append((m.start(1), m.end(1), "t"))
            elif name == src_alias:
                repl.append((m.start(1), m.end(1), "s"))
            # other qualifiers: struct-field access on a bare column —
            # resolve the column part below on a later pass? keep as-is:
            # bare column with field access resolves through scope rules
            elif name in src_cols and (
                not allow_target or name not in tgt_cols
            ):
                repl.append((m.start(1), m.start(1), "s."))
            elif allow_target and name in tgt_cols and name not in src_cols:
                repl.append((m.start(1), m.start(1), "t."))
            elif allow_target and name in tgt_cols and name in src_cols:
                raise ValueError(
                    f"ambiguous column {name!r} in MERGE expression "
                    f"{expr.strip()!r}: qualify with {tgt_alias!r} or "
                    f"{src_alias!r}"
                )
            continue
        if name in tgt_cols and name in src_cols and allow_target:
            raise ValueError(
                f"ambiguous column {name!r} in MERGE expression "
                f"{expr.strip()!r}: qualify with {tgt_alias!r} or "
                f"{src_alias!r}"
            )
        if name in src_cols:
            repl.append((m.start(1), m.start(1), "s."))
        elif name in tgt_cols:
            if not allow_target:
                raise ValueError(
                    f"INSERT VALUES may reference only the source row; "
                    f"found target column {name!r}"
                )
            repl.append((m.start(1), m.start(1), "t."))
    out = expr
    for a, b, new in sorted(repl, reverse=True):
        out = out[:a] + new + out[b:]
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


def _depth0_matches(pattern: str, text: str) -> list["re.Match[str]"]:
    masked = _masked(text)
    depths = _depths(masked)
    return [
        w
        for w in re.finditer(pattern, masked, re.IGNORECASE)
        if depths[w.start()] == 0
    ]


def _run_merge(
    spark: SparkSession,
    text: str,
    head: "re.Match[str]",
    tables: dict[str, SnapshotTable],
    evolve: bool = False,
) -> DataFrame:
    """The restricted star-form MERGE grammar (module docstring). All
    structural splits (USING→ON→WHEN, AND conjuncts) happen on
    literal-masked depth-0 text."""
    from oss_data_lake_spark.sources.snapshots import sql_with_time_travel

    t = _require(tables, head.group(1), "MERGE INTO")
    tgt_alias = head.group(2) or head.group(1)
    rest = text[head.end():]
    ons = _depth0_matches(r"\bON\b", rest)
    if not ons:
        raise ValueError("MERGE INTO requires an ON clause")
    src_spec = rest[: ons[0].start()].strip()
    after_on = rest[ons[0].end():]
    whens = _depth0_matches(r"\bWHEN\b", after_on)
    if not whens:
        raise ValueError("MERGE INTO requires at least one WHEN clause")
    on_text = after_on[: whens[0].start()].strip()
    clause_text = after_on[whens[0].start():].strip().rstrip(";").strip()

    # ---- source: (subquery) [AS] alias | name [[AS] alias]
    if src_spec.startswith("("):
        ms, dd = _masked(src_spec), _depths(_masked(src_spec))
        close = next(
            (i for i, ch in enumerate(ms) if ch == ")" and dd[i] == 1), None
        )
        if close is None:
            raise ValueError("unbalanced parens in MERGE source")
        src_df = sql_with_time_travel(spark, src_spec[1:close], tables)
        alias_part = src_spec[close + 1:].strip()
        am = re.match(r"^(?:AS\s+)?([A-Za-z_]\w*)$", alias_part, re.IGNORECASE)
        src_alias = am.group(1) if am else None
    else:
        nm = re.match(
            r"^([A-Za-z_][\w.]*)(?:\s+AS)?(?:\s+([A-Za-z_]\w*))?$",
            src_spec,
            re.IGNORECASE,
        )
        if not nm:
            raise ValueError(f"cannot parse MERGE source: {src_spec!r}")
        src_name = nm.group(1)
        src_alias = nm.group(2) or src_name
        src_df = (
            tables[src_name].read()
            if src_name in tables
            else spark.table(src_name)
        )
    if src_alias is None:
        raise ValueError("MERGE source subquery needs an alias")

    def _apply_schema_evolution() -> None:
        # WITH SCHEMA EVOLUTION (Delta): source-only columns join the
        # target schema (metadata-only add — existing rows read NULL),
        # and a source column wider than its target counterpart widens
        # it (safe promotions only; a NARROWER source is the normal
        # case and just upcasts at align time, so refusals pass).
        # Deferred until the WHOLE statement parses: a MERGE that fails
        # validation must not leave committed schema changes behind.
        tschema = t.schema()
        if tschema is None:
            raise ValueError(
                "MERGE WITH SCHEMA EVOLUTION needs a schema-carrying "
                "snapshot"
            )
        ttypes = {f.name: f.dataType for f in tschema.fields}
        new_cols = {
            f.name: f.dataType.simpleString()
            for f in src_df.schema.fields
            if f.name not in ttypes
        }
        if new_cols:
            t.add_columns(new_cols)
        for f in src_df.schema.fields:
            cur = ttypes.get(f.name)
            if cur is not None and cur != f.dataType:
                try:
                    t.widen_column(f.name, f.dataType.simpleString())
                except ValueError:
                    pass  # narrower/cross-family source: align casts it

    # ---- ON: depth-0 AND conjuncts equating alias-qualified columns
    # (names may differ between the sides — `t.k = s.nk`)
    keys: list[str] = []
    src_keys: list[str] = []
    conjuncts, start = [], 0
    ands = _depth0_matches(r"\bAND\b", on_text)
    for a in ands:
        conjuncts.append(on_text[start: a.start()])
        start = a.end()
    conjuncts.append(on_text[start:])
    for c in conjuncts:
        km = _ON_KEY_RE.match(c)
        sides = (
            {km.group(1): km.group(2), km.group(3): km.group(4)} if km else {}
        )
        if not km or set(sides) != {tgt_alias, src_alias}:
            raise ValueError(
                f"MERGE ON conjunct {c.strip()!r} is outside the restricted "
                f"grammar: expected {tgt_alias}.<col> = {src_alias}.<col>"
            )
        keys.append(sides[tgt_alias])
        src_keys.append(sides[src_alias])

    # ---- WHEN clauses: star forms, arbitrary `SET c = expr`
    # assignments, and `INSERT (cols) VALUES (exprs)`
    tgt_schema = t.schema()
    tgt_cols = (
        set(f.name for f in tgt_schema.fields) if tgt_schema else set()
    )
    src_cols = set(src_df.columns)
    when_matched: str | None = None
    when_not_matched: str | None = None
    matched_condition: str | None = None
    matched_assignments: dict[str, str] | None = None
    insert_values: dict[str, str] | None = None
    when_nmbs: str | None = None
    nmbs_condition: str | None = None
    nmbs_assignments: dict[str, str] | None = None
    whens2 = _depth0_matches(r"\bWHEN\b", clause_text)
    ends = [w.start() for w in whens2[1:]] + [len(clause_text)]
    for w, end in zip(whens2, ends):
        clause = clause_text[w.end(): end].strip().rstrip(";").strip()
        cm = re.fullmatch(
            r"(NOT\s+)?MATCHED(\s+BY\s+(?:SOURCE|TARGET))?"
            r"(?:\s+AND\s+(.*?))?\s*\bTHEN\b\s+(.*)",
            clause,
            re.IGNORECASE | re.DOTALL,
        )
        if not cm:
            raise ValueError(f"unrecognized MERGE clause: WHEN {clause[:60]!r}")
        is_not, by = cm.group(1), cm.group(2)
        cond, action = cm.group(3), cm.group(4).strip()
        if by and not is_not:
            raise ValueError("BY SOURCE/TARGET qualifies NOT MATCHED only")
        if is_not and by and "SOURCE" in by.upper():
            # Delta's third clause family: TARGET rows with no source
            # match. Expressions/conditions see the TARGET row only.
            if when_nmbs is not None:
                raise ValueError(
                    "multiple WHEN NOT MATCHED BY SOURCE clauses are "
                    "not supported (clause-ordering semantics): fold "
                    "the conditions into one clause"
                )
            def _tgt_scope(expr: str) -> str:
                # literal-masked scan/sub: alias-shaped text INSIDE
                # string literals is data, not a reference
                masked = _masked(expr)
                if re.search(rf"\b{re.escape(src_alias)}\.", masked):
                    raise ValueError(
                        "NOT MATCHED BY SOURCE expressions cannot "
                        "reference the source (no source row exists)"
                    )
                out, pat = [], re.compile(
                    rf"\b{re.escape(tgt_alias)}\."
                )
                last = 0
                for mm in pat.finditer(masked):
                    out.append(expr[last: mm.start()])
                    last = mm.end()
                out.append(expr[last:])
                return "".join(out).strip()

            if re.fullmatch(r"DELETE", action, re.IGNORECASE):
                when_nmbs = "delete"
            else:
                mu = re.fullmatch(
                    r"UPDATE\s+SET\s+(.*)", action,
                    re.IGNORECASE | re.DOTALL,
                )
                if not mu:
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE supports THEN DELETE "
                        "or UPDATE SET c = expr, ..."
                    )
                raw = _split_assignments(mu.group(1))
                bad = set(raw) - tgt_cols
                if bad:
                    raise ValueError(
                        f"SET assigns unknown columns: {sorted(bad)}"
                    )
                when_nmbs = "update"
                nmbs_assignments = {
                    c: _tgt_scope(e) for c, e in raw.items()
                }
            if cond:
                nmbs_condition = _tgt_scope(cond)
            continue
        if is_not:
            if cond:
                raise ValueError("WHEN NOT MATCHED AND <cond> not supported")
            when_not_matched = "insert"
            if not re.fullmatch(r"INSERT\s+\*", action, re.IGNORECASE):
                mi = re.fullmatch(
                    r"INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)",
                    action,
                    re.IGNORECASE | re.DOTALL,
                )
                if not mi:
                    raise ValueError(
                        "WHEN NOT MATCHED supports THEN INSERT * or "
                        "INSERT (cols) VALUES (exprs)"
                    )
                cols = [c.strip() for c in mi.group(1).split(",") if c.strip()]
                exprs = _split_exprs(mi.group(2))
                if len(cols) != len(exprs):
                    raise ValueError(
                        f"INSERT names {len(cols)} columns but VALUES has "
                        f"{len(exprs)} expressions"
                    )
                insert_values = {
                    c: _rewrite_scoped(
                        e, tgt_alias, src_alias, tgt_cols, src_cols,
                        allow_target=False,
                    )
                    for c, e in zip(cols, exprs)
                }
        else:
            if re.fullmatch(r"UPDATE\s+SET\s+\*", action, re.IGNORECASE):
                when_matched = "update"
            elif re.fullmatch(r"DELETE", action, re.IGNORECASE):
                when_matched = "delete"
            else:
                mu = re.fullmatch(
                    r"UPDATE\s+SET\s+(.*)", action, re.IGNORECASE | re.DOTALL
                )
                if not mu:
                    raise ValueError(
                        f"unrecognized WHEN MATCHED action: {action[:60]!r}"
                    )
                raw = _split_assignments(mu.group(1))
                bad = set(raw) - tgt_cols
                if bad:
                    raise ValueError(f"SET assigns unknown columns: {sorted(bad)}")
                matched_assignments = {
                    c: _rewrite_scoped(
                        e, tgt_alias, src_alias, tgt_cols, src_cols,
                        allow_target=True,
                    )
                    for c, e in raw.items()
                }
                when_matched = "update"
            if cond:
                if re.search(rf"\b{re.escape(tgt_alias)}\.", cond):
                    raise ValueError(
                        "matched conditions may reference only the SOURCE "
                        "row in the restricted grammar"
                    )
                matched_condition = re.sub(
                    rf"\b{re.escape(src_alias)}\.", "", cond
                ).strip()
    if evolve:
        # Delta lands schema evolution in the SAME commit as the merge;
        # here evolution is metadata commits that precede the merge
        # body, so a runtime failure in the body (constraint violation,
        # commit conflict) must roll the evolution back — the statement
        # is atomic at the head either way.
        pre_evolve_version = t.current_version()
        _apply_schema_evolution()
        evolved = t.current_version() != pre_evolve_version
    else:
        pre_evolve_version, evolved = None, False

    def _rollback_evolution() -> None:
        if evolved and pre_evolve_version:
            try:
                t.rollback(pre_evolve_version)
            except Exception:
                pass  # best effort: the original error still raises

    if (
        t.properties().get("delete.mode") == "merge-on-read"
        and when_matched == "update"
        and when_not_matched == "insert"
        and matched_condition is None
        and matched_assignments is None
        and insert_values is None
        and when_nmbs is None
        and src_keys == keys
    ):
        # the plain upsert form routes scan-free: equality-delete the
        # source keys + append the source rows, one atomic commit
        # (src_keys == keys gate: merge_rows_mor eq-deletes/appends on
        # the TARGET key names, so ON t.k = s.nk must fall through to
        # merge_rows and its source_keys-aware validation)
        try:
            info = t.merge_rows_mor(
                src_df, keys, stats_for=sorted(t.stats_columns()) or None
            )
        except Exception:
            _rollback_evolution()
            raise
        return spark.createDataFrame(
            [(info["version"], info["mode"])], "version long, mode string"
        )
    try:
        info = t.merge_rows(
            src_df,
            keys,
            when_matched=when_matched,
            matched_condition=matched_condition,
            when_not_matched=when_not_matched,
            stats_for=sorted(t.stats_columns()) or None,
            matched_assignments=matched_assignments,
            insert_values=insert_values,
            source_keys=src_keys,
            when_not_matched_by_source=when_nmbs,
            not_matched_by_source_assignments=nmbs_assignments,
            not_matched_by_source_condition=nmbs_condition,
        )
    except Exception:
        _rollback_evolution()
        raise
    return _metrics_df(spark, info)


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?TABLE\s+"
    r"(?:(IF\s+NOT\s+EXISTS)\s+)?([A-Za-z_][\w.]*)\s+"
    r"USING\s+SNAPSHOT"
    # optional layout for CTAS (round 13 — the Trino `WITH
    # (partitioning = ARRAY[...])` CTAS translates here): transforms
    # carry one paren level (days(ts), bucket(4, k))
    r"(?:\s+PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))*)\))?"
    r"\s+AS\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_part_entries(part: str | None) -> list[str]:
    """Depth-0 comma split of a PARTITIONED BY spec (bucket(4, k)
    keeps its own comma); shared by the column-list and CTAS paths."""
    if not part:
        return []
    pmasked = _masked(part)
    pdepths = _depths(pmasked)
    entries, start = [], 0
    for i, ch in enumerate(pmasked):
        if ch == "," and pdepths[i] == 0:
            entries.append(part[start:i].strip())
            start = i + 1
    entries.append(part[start:].strip())
    return [x for x in entries if x]
# column-list CREATE TABLE (no AS): an EMPTY snapshot table with a
# declared schema, optional partition layout, and column DEFAULTs
_CREATE_COLS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?"
    r"([A-Za-z_][\w.]*)\s*\((.*)\)\s*USING\s+SNAPSHOT"
    r"(?:\s+PARTITIONED\s+BY\s*\((.*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_ADD_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+ADD\s+CONSTRAINT\s+"
    r"([A-Za-z_]\w*)\s+CHECK\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+DROP\s+CONSTRAINT\s+"
    r"([A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_SET_PROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+SET\s+TBLPROPERTIES\s*"
    r"\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UNSET_PROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+UNSET\s+TBLPROPERTIES\s*"
    r"\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Trino's COMMENT statement (catalog curation; Trino docs "COMMENT"):
# COMMENT ON TABLE t IS 'text' / COMMENT ON COLUMN t.c IS 'text';
# IS NULL clears. Stored as metadata-only property commits ('comment' /
# 'comment.column.<c>'), surfaced by SHOW COLUMNS' Comment field and
# SHOW TBLPROPERTIES. Names outside the snapshot registry fall through
# to Spark's own COMMENT ON support.
_COMMENT_ON_RE = re.compile(
    r"^\s*COMMENT\s+ON\s+(TABLE|COLUMN|VIEW)\s+([A-Za-z_][\w.]*)\s+IS\s+"
    r"('(?:[^']|'')*'|NULL)\s*;?\s*$",
    re.IGNORECASE,
)
# a subquery inside a DML condition (IN (SELECT ...), EXISTS (...),
# scalar comparison) — routes through the temp-view SQL path, since a
# Spark Column expression cannot hold a subquery
_SUBQUERY_RE = re.compile(r"\(\s*SELECT\b", re.IGNORECASE)

_PROP_PAIR_RE = re.compile(r"'([^']*)'\s*=\s*'([^']*)'")
_PROP_KEY_RE = re.compile(r"'([^']*)'")
_ADD_COLUMNS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+ADD\s+COLUMNS?\s*"
    r"\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_COLUMN_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+DROP\s+COLUMNS?\s+"
    r"\(?\s*([A-Za-z_][\w\s,]*?)\s*\)?\s*;?\s*$",
    re.IGNORECASE,
)
_RENAME_COLUMN_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+RENAME\s+COLUMN\s+"
    r"([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_SET_DEFAULT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+ALTER\s+COLUMN\s+"
    r"([A-Za-z_]\w*)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_DEFAULT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+ALTER\s+COLUMN\s+"
    r"([A-Za-z_]\w*)\s+DROP\s+DEFAULT\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_TYPE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+ALTER\s+COLUMN\s+"
    r"([A-Za-z_]\w*)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_TAG_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+CREATE\s+TAG\s+"
    r"([A-Za-z_][\w.-]*)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_TAG_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+DROP\s+TAG\s+"
    r"([A-Za-z_][\w.-]*)\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_BRANCH_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+CREATE\s+BRANCH\s+"
    r"([A-Za-z_][\w.-]*)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_BRANCH_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+DROP\s+BRANCH\s+"
    r"([A-Za-z_][\w.-]*)\s*;?\s*$",
    re.IGNORECASE,
)
_FAST_FORWARD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+FAST\s+FORWARD\s+BRANCH\s+"
    r"([A-Za-z_][\w.-]*)(\s+KEEP)?\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_BRANCHES_RE = re.compile(
    r"^\s*SHOW\s+BRANCHES\s+(?:IN\s+|FROM\s+)?([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_CONVERT_RE = re.compile(
    r"^\s*CONVERT\s+TO\s+SNAPSHOT\s+PARQUET\s+'([^']+)'\s+AS\s+"
    r"([A-Za-z_]\w*)(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?"
    r"(?:\s+STATS\s+FOR\s*\(([^)]*)\))?\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_TAGS_RE = re.compile(
    r"^\s*SHOW\s+TAGS\s+(?:IN\s+|FROM\s+)?([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_CHERRY_PICK_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+CHERRY[\s-]?PICK\s+"
    r"VERSION\s+(\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+([A-Za-z_][\w.]*)\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')"
    r"\s*;?\s*$",
    re.IGNORECASE,
)


def branch_sql_name(table_name: str, branch: str) -> str:
    """The registry name a branch answers SQL under: plain DML/SELECT
    against ``<table>_branch_<name>`` runs on the branch exactly like
    any registered snapshot table (Iceberg Spark's ``t.branch_<name>``
    identifier, flattened to one token for the session namespace)."""
    return f"{table_name}_branch_{re.sub(r'[^A-Za-z0-9_]', '_', branch)}"
_SHOW_CREATE_RE = re.compile(
    r"^\s*SHOW\s+CREATE\s+TABLE\s+([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_ADD_PART_FIELD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+ADD\s+PARTITION\s+FIELD\s+"
    r"([A-Za-z_]\w*\s*\([^)]*\)|[A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_PART_FIELD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+DROP\s+PARTITION\s+FIELD\s+"
    r"([A-Za-z_]\w*\s*\([^)]*\)|[A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_STATS_RE = re.compile(
    r"^\s*SHOW\s+STATS\s+FOR\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
_SHOW_COLUMNS_RE = re.compile(
    r"^\s*SHOW\s+COLUMNS\s+(?:FROM|IN)\s+([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_PARTITIONS_RE = re.compile(
    r"^\s*SHOW\s+PARTITIONS\s+([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_WRITE_ORDERED_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+WRITE\s+ORDERED\s+BY\s*"
    r"\(([^)]*)\)\s*;?\s*$",
    re.IGNORECASE,
)
_WRITE_UNORDERED_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+WRITE\s+UNORDERED\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_MV_RE = re.compile(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][\w.]*)\s+AS\s+"
    r"(SELECT\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_REFRESH_MV_RE = re.compile(
    r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_MV_RE = re.compile(
    r"^\s*DROP\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_MV_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(.*?)\s+FROM\s+([A-Za-z_][\w.]*)\s+"
    r"GROUP\s+BY\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MV_COUNT_RE = re.compile(
    r"^COUNT\s*\(\s*\*\s*\)\s+AS\s+([A-Za-z_]\w*)$", re.IGNORECASE
)
_MV_SUM_RE = re.compile(
    r"^SUM\s*\(\s*([A-Za-z_]\w*)\s*\)\s+AS\s+([A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_MV_AVG_RE = re.compile(
    r"^AVG\s*\(\s*([A-Za-z_]\w*)\s*\)\s+AS\s+([A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_MV_ACD_RE = re.compile(
    r"^APPROX_COUNT_DISTINCT\s*\(\s*([A-Za-z_]\w*)\s*\)\s+AS\s+"
    r"([A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_MV_DEF_PROP = "mv.definition"
_MV_PRES_PROP = "mv.presentation"


def _split_select_items(text: str) -> list[str]:
    """Top-level comma split of a SELECT list (commas inside call
    parentheses stay put)."""
    items, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(text[start:i].strip())
            start = i + 1
    items.append(text[start:].strip())
    return [x for x in items if x]


def _parse_mv_select(select_text: str) -> dict:
    """The restricted MV grammar → an IncrementalAggregate definition +
    a presentation projection (state columns → the SELECT's shape)."""
    sm = _MV_SELECT_RE.match(select_text)
    if not sm:
        raise ValueError(
            "CREATE MATERIALIZED VIEW supports: SELECT <group columns, "
            "COUNT(*)/SUM(c)/AVG(c)/APPROX_COUNT_DISTINCT(c) AS alias> "
            "FROM <registered snapshot table> GROUP BY <columns>"
        )
    items_txt, src_name, gb_txt = sm.groups()
    group_by = [c.strip() for c in gb_txt.split(",")]
    measures: dict[str, str] = {}
    nonnulls: dict[str, str] = {}
    distincts: dict[str, str] = {}
    pres: list[str] = []
    seen_aliases: set[str] = set()

    def check_alias(alias: str) -> str:
        # aliases must not shadow the stored state's own columns
        # (n_rows, __s_*/__c_* folds, __sk_* sketches) or repeat — a
        # collision would only surface as an ambiguous-reference error
        # at the first REFRESH, far from the CREATE that caused it
        if alias == "n_rows" or alias.startswith("__"):
            raise ValueError(
                f"materialized-view alias {alias!r} collides with "
                f"internal state columns (n_rows / __*)"
            )
        if alias in seen_aliases or alias in group_by:
            raise ValueError(f"duplicate output column: {alias!r}")
        seen_aliases.add(alias)
        return alias

    for item in _split_select_items(items_txt):
        if re.fullmatch(r"[A-Za-z_]\w*", item):
            if item not in group_by:
                raise ValueError(
                    f"non-aggregate SELECT column '{item}' must appear "
                    f"in GROUP BY"
                )
            pres.append(item)
            continue
        m = _MV_COUNT_RE.match(item)
        if m:
            pres.append(f"n_rows AS {check_alias(m.group(1))}")
            continue
        m = _MV_SUM_RE.match(item)
        if m:
            alias = check_alias(m.group(2))
            measures[alias] = m.group(1)
            pres.append(alias)
            continue
        m = _MV_AVG_RE.match(item)
        if m:
            alias = check_alias(m.group(2))
            # SQL AVG = sum / count of NON-NULL values (never row
            # count); nullif keeps the all-NULL group NULL, not NaN
            measures[f"__s_{alias}"] = m.group(1)
            nonnulls[f"__c_{alias}"] = m.group(1)
            pres.append(
                f"__s_{alias} / nullif(CAST(__c_{alias} AS DOUBLE), "
                f"0.0) AS {alias}"
            )
            continue
        m = _MV_ACD_RE.match(item)
        if m:
            alias = check_alias(m.group(2))
            distincts[alias] = m.group(1)
            pres.append(f"hll_sketch_estimate(__sk_{alias}) AS {alias}")
            continue
        raise ValueError(
            f"unsupported materialized-view SELECT item: {item!r} "
            f"(decomposable aggregates only — COUNT(*) / SUM / AVG / "
            f"APPROX_COUNT_DISTINCT, each AS <alias>)"
        )
    return {
        "source": src_name,
        "group_by": group_by,
        "measures": measures,
        "nonnull_measures": nonnulls,
        "distinct_measures": distincts,
        "presentation": pres,
    }


_ANALYZE_RE = re.compile(
    r"^\s*ANALYZE\s+TABLE\s+([A-Za-z_][\w.]*)\s+COMPUTE\s+STATISTICS"
    r"(?:\s+FOR\s+COLUMNS\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_CLONE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([A-Za-z_][\w.]*)\s+"
    r"SHALLOW\s+CLONE\s+([A-Za-z_][\w.]*)"
    r"(?:\s+(?:FOR\s+)?VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_COPY_INTO_RE = re.compile(
    r"^\s*COPY\s+INTO\s+([A-Za-z_][\w.]*)\s+FROM\s+'([^']+)'"
    r"(?:\s+FILEFORMAT\s*=\s*([A-Za-z]+))?"
    r"(?:\s+PATTERN\s*=\s*'([^']+)')?(\s+FORCE)?\s*;?\s*$",
    re.IGNORECASE,
)


def _parse_column_defs(
    defs: str,
) -> tuple[dict[str, str], dict[str, str], dict[str, str]]:
    """``a INT, b DECIMAL(10,2) DEFAULT 0.0, c DATE GENERATED ALWAYS AS
    (to_date(ts))`` → ({name: type_ddl}, {name: default_sql},
    {name: generated_sql}); commas inside type/expression parens are not
    separators, and keywords inside string literals stay data."""
    masked = _masked(defs)
    depths = _depths(masked)
    parts, start = [], 0
    for i, ch in enumerate(masked):
        if ch == "," and depths[i] == 0:
            parts.append((defs[start:i], masked[start:i]))
            start = i + 1
    parts.append((defs[start:], masked[start:]))
    out: dict[str, str] = {}
    dflt: dict[str, str] = {}
    gens: dict[str, str] = {}
    for p, pm in parts:
        m = re.match(r"^\s*([A-Za-z_]\w*)\s+(.+?)\s*$", p, re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse column definition: {p.strip()!r}")
        name, rest = m.group(1), m.group(2)
        gm = re.search(
            r"\bGENERATED\s+ALWAYS\s+AS\s*\(", pm[m.start(2):], re.IGNORECASE
        )
        if gm:
            # the expression is the balanced paren group after AS
            tail = rest[gm.end() - 1:]
            tmask = pm[m.start(2):][gm.end() - 1:]
            td = _depths(tmask)
            close = next(
                (i for i, ch in enumerate(tmask) if ch == ")" and td[i] == 1),
                None,
            )
            if close is None:
                raise ValueError(
                    f"unbalanced GENERATED ALWAYS AS parens for '{name}'"
                )
            expr = tail[1:close].strip()
            if not expr:
                raise ValueError(
                    f"empty GENERATED expression for column '{name}'"
                )
            if tail[close + 1:].strip():
                raise ValueError(
                    f"unexpected text after GENERATED ALWAYS AS (...) "
                    f"for '{name}': {tail[close + 1:].strip()!r}"
                )
            gens[name] = expr
            rest = rest[: gm.start()].strip()
        dm = re.search(r"\bDEFAULT\b", _masked(rest), re.IGNORECASE)
        if dm:
            expr = rest[dm.end():].strip()
            if not expr:
                raise ValueError(
                    f"empty DEFAULT expression for column '{name}'"
                )
            if name in gens:
                raise ValueError(
                    f"column '{name}' cannot be both GENERATED and "
                    f"DEFAULTed"
                )
            dflt[name] = expr
            rest = rest[: dm.start()].strip()
        out[name] = rest
    return out, dflt, gens


def _prunable_columns(df: DataFrame) -> list[str]:
    """Columns worth harvesting file stats for at CTAS time: the
    primitive comparable types the skipping encoder understands."""
    ok = {
        "byte", "short", "int", "bigint", "float", "double",
        "string", "date", "timestamp", "timestamp_ntz",
    }
    return [c for c, t in df.dtypes if t in ok or t.startswith("decimal")]


_TRINO_SCALARS = {
    "string": "varchar",
    "bigint": "bigint",
    "int": "integer",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "double": "double",
    "float": "real",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp(6)",
    "timestamp_ntz": "timestamp(6)",
    "binary": "varbinary",
}


def _trino_type_name(spark_type: str) -> str:
    """Spark dtype string → Trino spelling (SHOW COLUMNS parity): the
    scalar map above, decimals verbatim, one-level arrays/maps
    recursively; deeper nesting keeps the Spark spelling (documented
    delta — no BI handshake in the reference stack reads nested rows)."""
    st = spark_type.strip()
    if st in _TRINO_SCALARS:
        return _TRINO_SCALARS[st]
    if st.startswith("decimal"):
        return st
    if st.startswith("array<") and st.endswith(">"):
        return f"array({_trino_type_name(st[6:-1])})"
    if st.startswith("map<") and st.endswith(">"):
        k, _, v = st[4:-1].partition(",")
        return f"map({_trino_type_name(k)}, {_trino_type_name(v)})"
    return st


def _adopt_on_disk(engine, tables: dict, name: str) -> None:
    """A fresh process may face a table already ON DISK at the managed
    path that it never registered. Adopt it into the registry so the
    CREATE family's exists / IF NOT EXISTS / OR REPLACE semantics apply
    to it exactly as to a registered table — and, critically, so a
    FAILED create can never delete pre-existing data: the fresh-path
    rollback (``drop_snapshot_table(delete_data=True)``) only ever runs
    on a path that held ZERO snapshots before this statement."""
    if name in tables or engine is None:
        return
    t = engine.register_snapshot_table(name, engine.snapshot_table_path(name))
    if t.current_version() is None:
        # nothing readable locally: undo the probe registration (pure
        # in-memory) — but a NON-EMPTY directory without a local
        # snapshot tail is somebody's data we cannot adopt (round-10
        # ADVICE low: a REST-attached table keeps its metadata tail in
        # the catalog service, so the local probe reads None). Refuse
        # here rather than fall through to the fresh-CREATE path, whose
        # failure rollback rmtrees the directory.
        engine.drop_snapshot_table(name, delete_data=False)
        import os

        p = t.path
        # ignore the probe's own `_snapshots` scaffolding (the protocol
        # mkdirs it eagerly); any OTHER entry is data files
        if (
            "://" not in p
            and os.path.isdir(p)
            and any(ent != "_snapshots" for ent in os.listdir(p))
        ):
            raise ValueError(
                f"managed path '{p}' holds data but no readable local "
                f"snapshot tail (REST/foreign-attached table?) — "
                f"refusing CREATE over it; register/ATTACH the table "
                f"with its own protocol instead"
            )
    else:
        # ``tables`` may be the caller's throwaway dict (an engine with
        # an EMPTY registry passes {}), so the exists-check below needs
        # its own entry
        tables[name] = t


def dispatch_statement(
    spark: SparkSession,
    text: str,
    tables: dict[str, SnapshotTable],
    engine=None,
) -> DataFrame | None:
    """Execute ``text`` if it is a recognized DML/maintenance statement
    against a registered snapshot table; return None for everything else
    (the caller's query path takes over). ``engine`` (an ``Engine``)
    enables the lifecycle statements — ``CREATE TABLE ... USING snapshot
    AS <query>`` (managed location under the engine's warehouse,
    auto-registered, stats harvested for every prunable column) and
    ``DROP TABLE`` of a REGISTERED snapshot table (unregister + delete;
    unregistered names fall through to the session catalog's DROP)."""
    from oss_data_lake_spark.sources.snapshots import sql_with_time_travel

    m = _CREATE_COLS_RE.match(text)
    if m and engine is not None:
        if_not_exists, name, defs, part = m.groups()
        if getattr(engine, "view_exists", lambda _n: False)(name):
            raise ValueError(
                f"a view named '{name}' exists; a table cannot shadow it"
            )
        _adopt_on_disk(engine, tables, name)
        if name in tables:
            if if_not_exists:
                return spark.createDataFrame([(0,)], "version long").limit(0)
            raise ValueError(
                f"snapshot table '{name}' already exists; use CREATE "
                f"TABLE IF NOT EXISTS or DROP TABLE first"
            )
        cols, defaults, gens = _parse_column_defs(defs)
        unknown = (set(defaults) | set(gens)) - set(cols)
        if unknown:
            raise ValueError(
                f"DEFAULT/GENERATED for columns not declared: "
                f"{sorted(unknown)}"
            )
        ddl = ", ".join(f"{n} {ty}" for n, ty in cols.items())
        empty = spark.createDataFrame([], ddl)
        # validate DEFAULTs BEFORE the table exists: a failed CREATE
        # must not leave a registered, committed table behind
        from oss_data_lake_spark.sources.snapshots import validate_default

        etypes = {f.name: f.dataType for f in empty.schema.fields}
        for cname, lit in defaults.items():
            validate_default(spark, lit, etypes[cname])
        entries = _split_part_entries(part)
        t = engine.register_snapshot_table(
            name, engine.snapshot_table_path(name)
        )
        # v1 carries the schema AND the layout (commit validates the
        # transform typing rules eagerly, even on zero rows); DEFAULTs
        # follow as metadata commits — with no pre-existing files only
        # the WRITE side is meaningful. A failed v1 (e.g. days() on a
        # non-timestamp column) must not leave the name registered with
        # zero snapshots — that would make the corrected retry raise
        # 'already exists' and IF NOT EXISTS silently no-op.
        try:
            version = t.commit(empty, partition_by=entries or None)
            for cname, expr in gens.items():
                # validates planability/determinism over the v1 schema;
                # a bad expression unwinds the CREATE entirely
                version = t.set_generated_column(cname, expr)
        except Exception:
            # safe to delete: _adopt_on_disk proved the path held zero
            # snapshots before this statement, so every byte under it
            # is this failed CREATE's own
            engine.drop_snapshot_table(name, delete_data=True)
            raise
        for cname, lit in defaults.items():
            version = t.set_column_default(cname, lit)
        return spark.createDataFrame([(version,)], "version long")

    m = _CREATE_RE.match(text)
    if m and engine is not None:
        or_replace, if_not_exists, name, part_spec, query = m.groups()
        ctas_entries = _split_part_entries(part_spec)
        if getattr(engine, "view_exists", lambda _n: False)(name):
            raise ValueError(
                f"a view named '{name}' exists; a table cannot shadow it"
            )
        _adopt_on_disk(engine, tables, name)
        if or_replace and if_not_exists:
            raise ValueError(
                "CREATE OR REPLACE and IF NOT EXISTS are exclusive"
            )
        if name in tables:
            if if_not_exists:
                return spark.createDataFrame([(0,)], "version long").limit(0)
            if not or_replace:
                raise ValueError(
                    f"snapshot table '{name}' already exists; use "
                    f"CREATE OR REPLACE TABLE, CREATE TABLE IF NOT "
                    f"EXISTS, or DROP TABLE first"
                )
            # OR REPLACE on an existing snapshot table = an overwrite
            # COMMIT, not a drop-and-recreate: the version history stays
            # time-travelable across the replacement, and the partition
            # layout carries over when the replacement still has the
            # spec's source columns
            from oss_data_lake_spark.sources.snapshots import (
                parse_partition_entry,
            )

            df = sql_with_time_travel(spark, query, tables)
            # an explicit PARTITIONED BY on the replacement wins over
            # the carried-over layout (Trino CTAS semantics)
            pb = ctas_entries or tables[name].current_partition_by()
            entries = [parse_partition_entry(c) for c in pb]
            if not ctas_entries and not all(
                (tr["source"] if tr else p) in df.columns
                for p, tr in entries
            ):
                # CARRIED-OVER layout whose source column is gone:
                # plain replace. An EXPLICIT spec never degrades
                # silently — commit's eager validation raises instead.
                pb = []
            identity = {p for p, tr in entries if tr is None} if pb else set()
            version = tables[name].commit(
                df, mode="overwrite", tag="replace_table",
                partition_by=pb or None,
                stats_for=sorted(
                    set(_prunable_columns(df)) - identity
                ) or None,
            )
            return spark.createDataFrame([(version,)], "version long")
        df = sql_with_time_travel(spark, query, tables)
        t = engine.register_snapshot_table(name, engine.snapshot_table_path(name))
        try:
            if ctas_entries:
                from oss_data_lake_spark.sources.snapshots import (
                    parse_partition_entry,
                )

                identity = {
                    p
                    for p, tr in (
                        parse_partition_entry(c) for c in ctas_entries
                    )
                    if tr is None
                }
                version = t.commit(
                    df,
                    partition_by=ctas_entries,
                    stats_for=sorted(
                        set(_prunable_columns(df)) - identity
                    ) or None,
                )
            else:
                version = t.commit(
                    df, stats_for=_prunable_columns(df) or None
                )
        except Exception:
            # same guard as column-list CREATE: a failed v1 must not
            # leave a registered zero-snapshot name behind — and
            # _adopt_on_disk proved the path was empty of snapshots, so
            # deleting it cannot destroy pre-existing data
            engine.drop_snapshot_table(name, delete_data=True)
            raise
        return spark.createDataFrame([(version,)], "version long")

    m = _CLONE_RE.match(text)
    if m and engine is not None:
        if_not_exists, name, src_name, as_of = m.groups()
        _adopt_on_disk(engine, tables, name)
        if name in tables:
            if if_not_exists:
                return spark.createDataFrame([(0,)], "version long").limit(0)
            raise ValueError(
                f"snapshot table '{name}' already exists; use "
                f"CREATE TABLE IF NOT EXISTS or DROP TABLE first"
            )
        src = _require(tables, src_name, "SHALLOW CLONE")
        clone = src.shallow_clone_to(
            engine.snapshot_table_path(name),
            int(as_of) if as_of else None,
        )
        tables[name] = clone
        return spark.createDataFrame(
            [
                (
                    name,
                    src.path,
                    clone._manifest(1)["clone_source"]["version"],
                )
            ],
            "table string, source_path string, source_version long",
        )

    m = _RESTORE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "RESTORE TABLE")
        if m.group(2) is not None:
            to_v = int(m.group(2))
        else:
            from oss_data_lake_spark.sources.snapshots import _parse_ts_ms

            to_v = t.version_as_of(_parse_ts_ms(m.group(3)))
        version = t.rollback(to_v)
        return spark.createDataFrame(
            [(version, to_v)], "version long, restored_to long"
        )

    m = _COPY_INTO_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "COPY INTO")
        res = t.copy_into(
            m.group(2),
            m.group(4),  # None -> the format's own default pattern
            # harvest the same footer stats an INSERT would (copy_into
            # itself drops identity partition columns from the list)
            stats_for=sorted(t.stats_columns()) or None,
            force=bool(m.group(5)),
            fileformat=(m.group(3) or "parquet"),
        )
        return spark.createDataFrame(
            [(res["version"], res["files_loaded"], res["rows_loaded"])],
            "version long, files_loaded long, rows_loaded long",
        )

    m = _SHOW_CREATE_RE.match(text)
    if m and m.group(1) in tables:
        t = tables[m.group(1)]
        v = t.current_version()
        if v is None:
            raise ValueError(
                f"SHOW CREATE TABLE: no snapshots at {t.path} "
                "(table registered but never committed)"
            )
        manifest = t._manifest(v)
        schema = t.schema(v)
        wdef = t.write_defaults(v)
        gens = t.generated_columns(v)
        cols = ",\n".join(
            f"  {f.name} {f.dataType.simpleString().upper()}"
            + (f" DEFAULT {wdef[f.name]}" if f.name in wdef else "")
            + (
                f" GENERATED ALWAYS AS ({gens[f.name]})"
                if f.name in gens
                else ""
            )
            for f in schema.fields
        )
        lines = [f"CREATE TABLE {m.group(1)} (\n{cols}\n)", "USING snapshot"]
        dirs = manifest["data_dirs"]
        spec = (
            manifest.get("partition_specs", {}).get(dirs[-1], [])
            if dirs
            else []
        )
        if spec:
            trs = (
                manifest.get("partition_transforms", {}).get(dirs[-1]) or {}
            )

            def _disp(c: str) -> str:
                tr = trs.get(c)
                if tr is None:
                    return c
                if tr["param"] is None:
                    return f"{tr['kind']}({tr['source']})"
                return f"{tr['kind']}({tr['param']}, {tr['source']})"

            lines.append(
                f"PARTITIONED BY ({', '.join(_disp(c) for c in spec)})"
            )
        so = manifest.get("declared_sort_order")
        if so:
            lines.append(f"WRITE ORDERED BY ({', '.join(so)})")
        lines.append(f"LOCATION '{t.path}'")
        props = t.properties(v)
        if props:
            body = ",\n".join(
                f"  '{k}' = '{x}'" for k, x in sorted(props.items())
            )
            lines.append(f"TBLPROPERTIES (\n{body}\n)")
        stmt = "\n".join(lines)
        for cname, expr in sorted(t.constraints(v).items()):
            stmt += (
                f";\nALTER TABLE {m.group(1)} ADD CONSTRAINT {cname} "
                f"CHECK ({expr})"
            )
        return spark.createDataFrame([(stmt,)], "createtab_stmt string")

    m = _DROP_RE.match(text)
    if m:
        if_exists, name = m.group(1), m.group(2)
        # a fresh process can DROP a managed on-disk table it never
        # registered — same adoption rule as the CREATE family
        _adopt_on_disk(engine, tables, name)
        if name in tables and engine is not None:
            engine.drop_snapshot_table(name)
            return spark.createDataFrame([(name,)], "dropped string")
        if name not in tables:
            return None  # session-catalog table: Spark's own DROP handles it

    m = _ADD_CONSTRAINT_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ALTER falls through
        version = tables[name].add_constraint(m.group(2), m.group(3))
        return spark.createDataFrame([(version,)], "version long")

    m = _DROP_CONSTRAINT_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].drop_constraint(m.group(2))
        return spark.createDataFrame([(version,)], "version long")

    m = _SET_PROPS_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ALTER falls through
        props = dict(_PROP_PAIR_RE.findall(m.group(2)))
        if not props:
            raise ValueError(
                "SET TBLPROPERTIES expects 'key' = 'value' pairs"
            )
        version = tables[name].set_properties(props)
        return spark.createDataFrame([(version,)], "version long")

    m = _UNSET_PROPS_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].unset_properties(
            _PROP_KEY_RE.findall(m.group(2))
        )
        return spark.createDataFrame([(version,)], "version long")

    m = _COMMENT_ON_RE.match(text)
    if m:
        kind, name, raw = m.group(1).upper(), m.group(2), m.group(3)
        if kind == "VIEW":
            raise ValueError(
                "COMMENT ON VIEW is not supported — the view catalog "
                "stores only the definition; comment the base table or "
                "re-create the view with a documenting name"
            )
        value = (
            None if raw.upper() == "NULL"
            else raw[1:-1].replace("''", "'")
        )
        if kind == "COLUMN":
            if "." not in name:
                raise ValueError(
                    "COMMENT ON COLUMN takes table.column"
                )
            tname, col = name.rsplit(".", 1)
            _adopt_on_disk(engine, tables, tname)
            if tname not in tables:
                return None  # Spark's own COMMENT ON handles its tables
            t = tables[tname]
            schema = t.schema() or t.read().schema
            if col not in {f.name for f in schema.fields}:
                raise ValueError(
                    f"COMMENT ON COLUMN: no column {col!r} in {tname!r}"
                )
            key = f"comment.column.{col}"
        else:
            _adopt_on_disk(engine, tables, name)
            if name not in tables:
                return None
            t = tables[name]
            key = "comment"
        if value is None:
            version = t.unset_properties([key])
        else:
            version = t.set_properties({key: value})
        return spark.createDataFrame([(version,)], "version long")

    m = _ADD_COLUMNS_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ALTER falls through
        cols, defaults, gens = _parse_column_defs(m.group(2))
        if gens:
            raise ValueError(
                "GENERATED columns are declared at CREATE TABLE "
                "(Delta's rule: existing rows have no value to derive "
                "retroactively)"
            )
        version = tables[name].add_columns(cols, defaults or None)
        return spark.createDataFrame([(version,)], "version long")

    m = _DROP_COLUMN_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        names = [c.strip() for c in m.group(2).split(",") if c.strip()]
        version = tables[name].drop_columns(names)
        return spark.createDataFrame([(version,)], "version long")

    m = _RENAME_COLUMN_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ALTER falls through
        version = tables[name].rename_column(m.group(2), m.group(3))
        return spark.createDataFrame([(version,)], "version long")

    m = _SET_DEFAULT_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ALTER falls through
        version = tables[name].set_column_default(m.group(2), m.group(3))
        return spark.createDataFrame([(version,)], "version long")

    m = _DROP_DEFAULT_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].drop_column_default(m.group(2))
        return spark.createDataFrame([(version,)], "version long")

    m = _ALTER_TYPE_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ALTER falls through
        version = tables[name].widen_column(m.group(2), m.group(3))
        return spark.createDataFrame([(version,)], "version long")

    m = _ADD_PART_FIELD_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ALTER falls through
        version = tables[name].add_partition_field(m.group(2))
        return spark.createDataFrame([(version,)], "version long")

    m = _DROP_PART_FIELD_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].drop_partition_field(m.group(2))
        return spark.createDataFrame([(version,)], "version long")

    m = _SHOW_PARTITIONS_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog SHOW PARTITIONS falls through
        parts = tables[name].show_partitions()
        return spark.createDataFrame(
            [(p,) for p in parts], "partition string"
        )

    m = _SHOW_COLUMNS_RE.match(text)
    if m and m.group(1) in tables:
        # Trino's SHOW COLUMNS handshake (Metabase/CloudBeaver issue it
        # per table on connect; reference RUNBOOK.md:120-123): Trino's
        # exact 4-column shape with Trino type spellings. Names NOT in
        # the snapshot registry fall through (return None) to the Spark
        # session catalog's own SHOW COLUMNS.
        t = tables[m.group(1)]
        props = t.properties()
        rows = [
            (c, _trino_type_name(dt), "",
             props.get(f"comment.column.{c}", ""))
            for c, dt in t.read().dtypes
        ]
        return spark.createDataFrame(
            rows, "Column string, Type string, Extra string, Comment string"
        )

    m = _SHOW_STATS_RE.match(text)
    if m:
        # Trino's SHOW STATS FOR <table>: per-column summary from the
        # MANIFEST's per-file footer stats (metadata only — no data
        # scan, same source file skipping prunes with). One row per
        # stats column + the NULL-column table row-count summary;
        # values a file never harvested stay NULL (unknown), exactly
        # Trino's unknown-stat convention.
        t = _require(tables, m.group(1), "SHOW STATS FOR")
        v = t.current_version()
        if v is None:
            raise ValueError(f"SHOW STATS: no snapshots at {t.path}")
        man = t._manifest(v)
        vis_map = man.get("dir_files") or {}
        per_col: dict[str, dict] = {}
        total_rows, rows_known = 0, True
        for d in man.get("data_dirs", []):
            st = t.dir_stats(man, d) or {}
            vis = vis_map.get(d)
            files = vis if vis is not None else sorted(st)
            if not st:
                rows_known = False  # a dir with no stats: unknown rows
                continue
            for f in files:
                cols = st.get(f)
                if not cols:
                    rows_known = False
                    continue
                file_rows = None
                for cname, payload in cols.items():
                    if cname.startswith("bloom:"):
                        continue
                    a = per_col.setdefault(
                        cname,
                        {"files": 0, "rows": 0, "nulls": 0,
                         "lo": None, "hi": None},
                    )
                    a["files"] += 1
                    a["rows"] += payload.get("rows") or 0
                    a["nulls"] += payload.get("nulls") or 0
                    if file_rows is None:
                        file_rows = payload.get("rows") or 0
                    for key, side in (("min", "lo"), ("max", "hi")):
                        e = payload.get(key)
                        if e is None:
                            continue
                        kind, val = e
                        cur = a[side]
                        if cur is None:
                            a[side] = (kind, val)
                        elif key == "min":
                            a[side] = min(cur, (kind, val), key=lambda x: x[1])
                        else:
                            a[side] = max(cur, (kind, val), key=lambda x: x[1])
                if file_rows is None:
                    rows_known = False
                else:
                    total_rows += file_rows
        def _fmt(e):
            return None if e is None else str(e[1])
        # Trino's exact SHOW STATS shape (round-10 ADVICE low: BI
        # clients are written against it): data_size and
        # distinct_values_count stay NULL (the footer stats don't
        # harvest them — Trino's unknown-stat convention), row_count is
        # NULL on per-column rows and set ONLY on the all-NULL summary
        # row; every numeric stat is a double, as Trino emits.
        rows = [
            (
                c,
                None,
                None,
                (float(a["nulls"]) / a["rows"]) if a["rows"] else None,
                None,
                _fmt(a["lo"]),
                _fmt(a["hi"]),
            )
            for c, a in sorted(per_col.items())
        ]
        rows.append(
            (None, None, None, None,
             float(total_rows) if rows_known else None, None, None)
        )
        return spark.createDataFrame(
            rows,
            "column_name string, data_size double, "
            "distinct_values_count double, nulls_fraction double, "
            "row_count double, low_value string, high_value string",
        )

    m = _WRITE_ORDERED_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        cols = [c.strip() for c in m.group(2).split(",") if c.strip()]
        if not cols:
            raise ValueError(
                "WRITE ORDERED BY needs at least one column "
                "(use WRITE UNORDERED to clear the order)"
            )
        version = tables[name].set_sort_order(cols)
        return spark.createDataFrame([(version,)], "version long")

    m = _WRITE_UNORDERED_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].set_sort_order([])
        return spark.createDataFrame([(version,)], "version long")

    m = _CREATE_MV_RE.match(text)
    if m:
        if engine is None:
            raise ValueError(
                "CREATE MATERIALIZED VIEW needs an Engine (managed "
                "location + registration); use Engine.sql"
            )
        from oss_data_lake_spark.operators.matview import (
            IncrementalAggregate,
        )

        name, select_text = m.groups()
        if name in tables:
            raise ValueError(
                f"snapshot table '{name}' already exists; DROP it first"
            )
        d = _parse_mv_select(select_text)
        src = _require(tables, d["source"], "CREATE MATERIALIZED VIEW")
        ia = IncrementalAggregate(
            src,
            engine.snapshot_table_path(name),
            d["group_by"],
            d["measures"],
            d["distinct_measures"] or None,
            nonnull_measures=d["nonnull_measures"] or None,
        )
        info = ia.refresh()  # initial full materialization
        mvt = engine.register_snapshot_table(name, ia.mv.path)
        mvt.set_properties({
            _MV_DEF_PROP: json.dumps({
                "source_path": src.path,
                "group_by": d["group_by"],
                "measures": d["measures"],
                "nonnull_measures": d["nonnull_measures"],
                "distinct_measures": d["distinct_measures"],
            }),
            _MV_PRES_PROP: json.dumps(d["presentation"]),
        })
        return spark.createDataFrame(
            [(info["mode"], info["source_version"])],
            "mode string, source_version long",
        )

    m = _REFRESH_MV_RE.match(text)
    if m:
        from oss_data_lake_spark.operators.matview import (
            IncrementalAggregate,
        )

        name = m.group(1)
        mvt = _require(tables, name, "REFRESH MATERIALIZED VIEW")
        raw = mvt.properties().get(_MV_DEF_PROP)
        if raw is None:
            raise ValueError(
                f"'{name}' is not a materialized view (no "
                f"{_MV_DEF_PROP} definition)"
            )
        d = json.loads(raw)
        ia = IncrementalAggregate(
            SnapshotTable(spark, d["source_path"]),
            mvt.path,
            d["group_by"],
            d["measures"],
            d["distinct_measures"] or None,
            nonnull_measures=d.get("nonnull_measures") or None,
        )
        info = ia.refresh()
        return spark.createDataFrame(
            [(info["mode"], info["source_version"], mvt.current_version())],
            "mode string, source_version long, version long",
        )

    m = _DROP_MV_RE.match(text)
    if m:
        if engine is None:
            raise ValueError(
                "DROP MATERIALIZED VIEW needs an Engine; use Engine.sql"
            )
        name = m.group(1)
        mvt = _require(tables, name, "DROP MATERIALIZED VIEW")
        if mvt.properties().get(_MV_DEF_PROP) is None:
            raise ValueError(
                f"'{name}' is a plain snapshot table, not a "
                f"materialized view — use DROP TABLE"
            )
        engine.drop_snapshot_table(name)
        return spark.createDataFrame([(name,)], "dropped string")

    m = _ANALYZE_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None  # session-catalog ANALYZE falls through
        cols = (
            [c.strip() for c in m.group(2).split(",")]
            if m.group(2)
            else None
        )
        st = tables[name].analyze(columns=cols)
        return spark.createDataFrame(
            [(st["version"], st["row_count"], st["size_bytes"])],
            "version long, row_count long, size_bytes long",
        )

    m = _CREATE_TAG_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].create_tag(
            m.group(2), int(m.group(3)) if m.group(3) else None
        )
        return spark.createDataFrame(
            [(version, m.group(2))], "version long, tag string"
        )

    m = _DROP_TAG_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].drop_tag(m.group(2))
        return spark.createDataFrame([(version,)], "version long")

    m = _CREATE_BRANCH_RE.match(text)
    if m:
        name, bname = m.group(1), m.group(2)
        if name not in tables:
            return None
        reg = branch_sql_name(name, bname)
        if reg in tables:
            raise ValueError(
                f"CREATE BRANCH: registry name {reg!r} already taken"
            )
        bt = tables[name].create_branch(
            bname, int(m.group(3)) if m.group(3) else None
        )
        # the branch answers SQL immediately: SELECT/DML/MERGE against
        # <table>_branch_<name> run on the branch line
        tables[reg] = bt
        src = bt._manifest(1)["clone_source"]
        return spark.createDataFrame(
            [(bname, reg, src["version"])],
            "branch string, sql_name string, from_version long",
        )

    m = _DROP_BRANCH_RE.match(text)
    if m:
        name, bname = m.group(1), m.group(2)
        if name not in tables:
            return None
        bpath = tables[name].branch(bname).path
        tables[name].drop_branch(bname)
        # distinct branch names can sanitize to one registry name
        # ('a.b' and 'a_b'): pop only the entry that actually points at
        # the dropped branch's root
        reg = branch_sql_name(name, bname)
        if reg in tables and tables[reg].path == bpath:
            tables.pop(reg)
        return spark.createDataFrame([(bname,)], "dropped string")

    m = _FAST_FORWARD_RE.match(text)
    if m:
        name, bname = m.group(1), m.group(2)
        if name not in tables:
            return None
        keep = bool(m.group(3))
        bpath = tables[name].branch(bname).path
        version = tables[name].fast_forward(bname, drop=not keep)
        if not keep:
            reg = branch_sql_name(name, bname)
            if reg in tables and tables[reg].path == bpath:
                tables.pop(reg)
        return spark.createDataFrame([(version,)], "version long")

    m = _SHOW_BRANCHES_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        rows = [
            (b, info["head"], info["from_version"])
            for b, info in sorted(tables[name].branches().items())
        ]
        return spark.createDataFrame(
            rows, "branch string, head long, from_version long"
        )

    m = _CHERRY_PICK_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        version = tables[name].cherry_pick(int(m.group(2)))
        return spark.createDataFrame([(version,)], "version long")

    m = _SHOW_TAGS_RE.match(text)
    if m:
        name = m.group(1)
        if name not in tables:
            return None
        rows = sorted(tables[name].tags().items())
        return spark.createDataFrame(rows, "tag string, version long")

    m = _CONVERT_RE.match(text)
    if m:
        # NOTE: SnapshotTable is the MODULE-level import — a function-
        # local re-import here would shadow it for the whole dispatch
        # function and break the earlier REFRESH MATERIALIZED VIEW arm
        # with UnboundLocalError (regression pinned by test_matview_sql)
        src, name = m.group(1), m.group(2)
        if name in tables:
            raise ValueError(f"CONVERT: table {name!r} already registered")
        if engine is None:
            raise ValueError(
                "CONVERT TO SNAPSHOT needs an engine (managed location)"
            )
        pb = (
            [c.strip() for c in m.group(3).split(",") if c.strip()]
            if m.group(3)
            else None
        )
        sf = (
            [c.strip() for c in m.group(4).split(",") if c.strip()]
            if m.group(4)
            else None
        )
        t = SnapshotTable.convert_parquet(
            spark,
            src,
            engine.snapshot_table_path(name),
            partition_by=pb,
            stats_for=sf,
        )
        # register on the ENGINE (an engine with no snapshot tables yet
        # dispatches with a throwaway empty dict, not its registry)
        engine._snapshot_tables[name] = t
        tables[name] = t
        # metadata-only report (a row count would scan the adopted
        # data — the one thing a zero-copy CONVERT must not do)
        from oss_data_lake_spark.sources.skipping import (
            _iter_parquet_files,
        )

        n_files = sum(1 for _ in _iter_parquet_files(src))
        return spark.createDataFrame(
            [(name, src, n_files)],
            "table string, source string, n_files long",
        )

    m = _DELETE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "DELETE FROM")
        cond = m.group(2) or "true"
        if _SUBQUERY_RE.search(_masked(cond)):
            # Trino accepts subqueries in DML conditions; always a
            # copy-on-write rewrite (a tombstone write would still have
            # to evaluate the subquery against a full scan)
            from oss_data_lake_spark.sources.snapshots import (
                sql_with_time_travel,
            )

            info = t.delete_where_subquery(
                cond,
                lambda q: sql_with_time_travel(spark, q, tables),
                stats_for=sorted(t.stats_columns()),
                alias=m.group(1),
                prune_preds=subquery_free_conjunct_ranges(
                    cond, t.stats_columns()
                ) or None,
            )
            return _metrics_df(spark, info)
        preds = conjunct_ranges(cond, t.stats_columns())
        if t.properties().get("delete.mode") == "merge-on-read":
            schema = t.schema()
            probe = eq_delete_probe(
                cond, {f.name for f in schema.fields} if schema else set()
            )
            if probe is not None:
                # parsed literals are raw Python str/int/float; coerce
                # to each column's declared type (TIMESTAMP '...' /
                # DATE '...' / numeric-vs-double). A literal that
                # cannot be coerced takes the position-delete path
                # instead of tripping Spark's type verifier.
                cols, rows = probe
                ftypes = {f.name: f.dataType for f in schema.fields}
                try:
                    rows = [
                        tuple(
                            _coerce_key_value(v, ftypes[c])
                            for v, c in zip(r, cols)
                        )
                        for r in rows
                    ]
                except (TypeError, ValueError):
                    probe = None
            if probe is not None:
                # scan-free keyed delete: just the key tuples land
                info = t.delete_where_eq(cols, rows)
                return spark.createDataFrame(
                    [(info["version"], info["n_keys"], info["mode"])],
                    "version long, n_keys long, mode string",
                )
            info = t.delete_where_mor(cond, prune_preds=preds)
            return spark.createDataFrame(
                [(info["version"], info["files_scanned"],
                  info["files_skipped"], info["mode"])],
                "version long, files_scanned long, files_skipped long, "
                "mode string",
            )
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
        if _SUBQUERY_RE.search(_masked(cond)):
            from oss_data_lake_spark.sources.snapshots import (
                sql_with_time_travel,
            )

            info = t.update_where_subquery(
                cond,
                assigns,
                lambda q: sql_with_time_travel(spark, q, tables),
                stats_for=sorted(t.stats_columns()),
                alias=m.group(1),
                prune_preds=subquery_free_conjunct_ranges(
                    cond, t.stats_columns()
                ) or None,
            )
            return _metrics_df(spark, info)
        preds = conjunct_ranges(cond, t.stats_columns())
        if t.properties().get("delete.mode") == "merge-on-read":
            info = t.update_where_mor(
                cond, assigns, prune_preds=preds,
                stats_for=sorted(t.stats_columns()),
            )
            return spark.createDataFrame(
                [(info["version"], info["files_scanned"],
                  info["files_skipped"], info["mode"])],
                "version long, files_scanned long, files_skipped long, "
                "mode string",
            )
        info = t.update_where(
            cond, assigns, prune_preds=preds,
            stats_for=sorted(t.stats_columns()),
        )
        return _metrics_df(spark, info)

    m = _INSERT_REPLACE_RE.match(text)
    if m:
        from oss_data_lake_spark.sources.snapshots import sql_with_time_travel

        t = _require(tables, m.group(1), "INSERT INTO ... REPLACE WHERE")
        # split condition from source query on the FIRST depth-0
        # SELECT/VALUES of the masked text — a subquery or string
        # literal inside the condition is not the boundary (the
        # module's masked-scan contract)
        body = m.group(2)
        bmask = _masked(body)
        bdepths = _depths(bmask)
        split = next(
            (
                w.start()
                for w in re.finditer(
                    r"\b(?:SELECT|VALUES)\b", bmask, re.IGNORECASE
                )
                if bdepths[w.start()] == 0
            ),
            None,
        )
        if split is None:
            raise ValueError(
                "INSERT INTO ... REPLACE WHERE needs a SELECT or VALUES "
                "source after the condition"
            )
        cond, query = body[:split].strip(), body[split:].strip()
        if not cond:
            raise ValueError("REPLACE WHERE needs a condition")
        target_schema = t.schema()
        if target_schema is None:
            raise ValueError("REPLACE WHERE needs a schema-carrying snapshot")
        src = sql_with_time_travel(spark, query, tables)
        if len(src.columns) != len(target_schema.fields):
            raise ValueError(
                f"REPLACE WHERE arity mismatch: query produces "
                f"{len(src.columns)} columns, table has "
                f"{len(target_schema.fields)}"
            )
        aligned = t._align(
            src.toDF(*[f.name for f in target_schema.fields]), target_schema
        )
        info = t.replace_where(
            aligned, cond,
            prune_preds=conjunct_ranges(cond, t.stats_columns()) or None,
            stats_for=sorted(t.stats_columns()) or None,
        )
        return _metrics_df(spark, info)

    m = _INSERT_RE.match(text)
    if m:
        from oss_data_lake_spark.sources.snapshots import sql_with_time_travel

        mode = "append" if m.group(1).upper() == "INTO" else "overwrite"
        t = _require(tables, m.group(2), f"INSERT {m.group(1).upper()}")
        target_schema = t.schema()
        if target_schema is None:
            raise ValueError("INSERT needs a schema-carrying snapshot")
        names = [f.name for f in target_schema.fields]
        if m.group(3):
            cols = [c.strip() for c in m.group(3).split(",")]
            unknown = set(cols) - set(names)
            if unknown:
                raise ValueError(
                    f"INSERT column list names unknown columns: {sorted(unknown)}"
                )
        else:
            cols = names
        # the source may be VALUES ... or any SELECT over the session —
        # including other registered snapshot tables and AS-OF clauses
        src = sql_with_time_travel(spark, m.group(4), tables)
        if len(src.columns) != len(cols):
            raise ValueError(
                f"INSERT arity mismatch: query produces {len(src.columns)} "
                f"columns, target list has {len(cols)}"
            )
        # omitted columns fill their WRITE DEFAULT (NULL when none) —
        # standard SQL DEFAULT semantics — in a FIRST projection, so
        # that a GENERATED expression referencing a DEFAULT-filled
        # column sees the default VALUE, not an unresolvable name.
        # Omitted GENERATED columns stay absent here; commit-side
        # _apply_generated computes them over the default-filled row
        # (and validates explicitly-provided ones)
        from pyspark.sql import types as T

        gens = t.generated_columns()
        absent_gens = {g: e for g, e in gens.items() if g not in cols}
        pre_schema = T.StructType(
            [f for f in target_schema.fields if f.name not in absent_gens]
        )
        base = t._align(src.toDF(*cols), pre_schema, fill=t.write_defaults())
        # SECOND projection: the generated expressions, in target
        # column order (commit re-validates them as present columns)
        aligned = t._align(base, target_schema, fill=absent_gens)
        # the insert adopts the table's current partition layout
        # (identity or hidden transform) instead of accreting
        # unpartitioned dirs — Iceberg write-under-current-spec.
        # Identity partition columns leave the file bytes (path
        # segments carry them), so footer stats skip them.
        pb = t.current_partition_by()
        identity = {c for c in pb if "(" not in c}
        version = t.commit(
            aligned, mode=mode,
            partition_by=pb or None,
            stats_for=sorted(t.stats_columns() - identity) or None,
        )
        return spark.createDataFrame([(version,)], "version long")

    m = _MERGE_EVOLVE_RE.match(text)
    if m:
        stripped = _MERGE_EVOLVE_RE.sub("MERGE INTO ", text, count=1)
        hm = _MERGE_HEAD_RE.match(stripped)
        if hm:
            return _run_merge(spark, stripped, hm, tables, evolve=True)

    m = _MERGE_HEAD_RE.match(text)
    if m:
        return _run_merge(spark, text, m, tables)

    m = _OPTIMIZE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "OPTIMIZE")
        zorder = (
            [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
        )
        cluster = m.group(3)
        n_files = int(m.group(4)) if m.group(4) else (16 if (zorder or cluster) else 1)
        where = m.group(5)
        if where:
            # SCOPED compaction: rewrite only the files the WHERE's
            # manifest bounds admit (Delta's OPTIMIZE ... WHERE)
            if zorder or cluster:
                raise ValueError(
                    "OPTIMIZE ... WHERE is exclusive with "
                    "ZORDER BY / CLUSTER BY (re-clustering is whole-table)"
                )
            preds = conjunct_ranges(where, t.stats_columns())
            if not preds:
                raise ValueError(
                    "OPTIMIZE ... WHERE needs prunable conjuncts on "
                    "stats/partition columns (ranges, =, IN, IS NULL) — "
                    f"cannot scope by {where!r}; drop the WHERE to "
                    "compact the whole table"
                )
            res = t.compact_where(
                prune_preds=preds,
                target_partitions=n_files,
                stats_for=sorted(t.stats_columns()) or None,
            )
            return spark.createDataFrame(
                [(res["version"], res["files_rewritten"],
                  res["files_skipped"])],
                "version long, files_rewritten long, files_skipped long",
            )
        version = t.compact(
            target_partitions=n_files,
            cluster_by=cluster,
            zorder_by=zorder,
            stats_for=sorted(t.stats_columns()) or None,
        )
        return spark.createDataFrame([(version,)], "version long")

    m = _TRUNCATE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "TRUNCATE TABLE")
        schema = t.schema()
        if schema is None:
            raise ValueError("TRUNCATE TABLE needs a schema-carrying snapshot")
        # an empty OVERWRITE commit: schema survives, history intact
        # (time travel still reads the pre-truncate versions), O(1)
        # write — and the partition LAYOUT survives too, or the classic
        # truncate-and-reload workflow would silently reload
        # unpartitioned
        version = t.commit(
            spark.createDataFrame([], schema), mode="overwrite",
            partition_by=t.current_partition_by() or None,
            tag="truncate",
        )
        return spark.createDataFrame([(version,)], "version long")

    m = _SHOW_PROPS_RE.match(text)
    if m and m.group(1) in tables:
        t = tables[m.group(1)]
        props = t.properties()
        if m.group(2) is not None:
            props = {
                k: v for k, v in props.items() if k == m.group(2)
            }
        return spark.createDataFrame(
            sorted(props.items()) or [], "key string, value string"
        )

    m = _ALTER_EXECUTE_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "ALTER TABLE ... EXECUTE")
        proc = m.group(2).lower()
        args = _parse_exec_args(m.group(3), f"EXECUTE {proc}")
        if proc == "optimize":
            extra = set(args) - {"file_size_threshold"}
            if extra:
                raise ValueError(
                    f"EXECUTE optimize: unsupported arguments {sorted(extra)}"
                    " (supported: file_size_threshold)"
                )
            version = t.compact(
                target_partitions=1,
                stats_for=sorted(t.stats_columns()) or None,
            )
            return spark.createDataFrame([(version,)], "version long")
        if proc == "expire_snapshots":
            extra = set(args) - {"retention_threshold"}
            if extra or "retention_threshold" not in args:
                raise ValueError(
                    "EXECUTE expire_snapshots takes exactly "
                    "retention_threshold => '<n><s|m|h|d>' "
                    f"(got {sorted(args) or 'no arguments'})"
                )
            ms = _parse_duration_ms(
                args["retention_threshold"], "EXECUTE expire_snapshots"
            )
            _check_min_retention(
                engine, "expire_snapshots",
                "expire_snapshots_min_retention", ms,
                args["retention_threshold"],
            )
            expired = t.expire_snapshots(keep_last=1, retain_ms=ms)
            return spark.createDataFrame(
                [(v,) for v in expired] or [], "expired_version long"
            )
        if proc == "remove_orphan_files":
            extra = set(args) - {"retention_threshold"}
            if extra:
                raise ValueError(
                    "EXECUTE remove_orphan_files takes only "
                    f"retention_threshold (got {sorted(extra)})"
                )
            ms = (
                _parse_duration_ms(
                    args["retention_threshold"],
                    "EXECUTE remove_orphan_files",
                )
                if "retention_threshold" in args
                else None
            )
            if ms is not None:
                _check_min_retention(
                    engine, "remove_orphan_files",
                    "remove_orphan_files_min_retention", ms,
                    args["retention_threshold"],
                )
            removed = t.vacuum(dry_run=False, retain_ms=ms)
            return spark.createDataFrame(
                [(d,) for d in removed] or [], "removed_dir string"
            )
        raise ValueError(
            f"ALTER TABLE ... EXECUTE {proc!r} is not supported "
            "(supported procedures: optimize, expire_snapshots, "
            "remove_orphan_files)"
        )

    m = _EXPIRE_RE.match(text)
    if m and (m.group(2) or m.group(3)):
        t = _require(tables, m.group(1), "EXPIRE SNAPSHOTS")
        older = None
        if m.group(3):
            from oss_data_lake_spark.sources.snapshots import _parse_ts_ms

            older = _parse_ts_ms(m.group(3))
        expired = t.expire_snapshots(
            keep_last=int(m.group(2)) if m.group(2) else 1,
            older_than_ms=older,
            retain_ms=(
                int(m.group(4)) * 3_600_000 if m.group(4) else None
            ),
        )
        return spark.createDataFrame(
            [(v,) for v in expired] or [], "expired_version long"
        )

    m = _DESCRIBE_RE.match(text)
    if m and m.group(1) in tables:
        t = tables[m.group(1)]
        schema = t.schema()
        if schema is None:
            raise ValueError(
                f"DESCRIBE: no snapshots at {t.path} "
                "(table registered but never committed)"
            )
        wdef = t.write_defaults()
        gens = t.generated_columns()
        return spark.createDataFrame(
            [
                (
                    f.name,
                    f.dataType.simpleString(),
                    (
                        f"GENERATED ALWAYS AS ({gens[f.name]})"
                        if f.name in gens
                        else f"DEFAULT {wdef[f.name]}"
                        if f.name in wdef
                        else None
                    ),
                )
                for f in schema.fields
            ],
            "col_name string, data_type string, comment string",
        )

    m = _VACUUM_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "VACUUM")
        removed = t.vacuum(
            dry_run=bool(m.group(3)),
            retain_ms=(
                int(m.group(2)) * 3_600_000 if m.group(2) else None
            ),
        )
        return spark.createDataFrame(
            [(d,) for d in removed] or [], "removed_dir string"
        )

    m = _HISTORY_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "DESCRIBE HISTORY")
        return t.metadata_df("history")

    m = _DETAIL_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "DESCRIBE DETAIL")
        v = t.current_version()
        if v is None:
            raise ValueError(
                f"DESCRIBE DETAIL: no snapshots at {t.path} "
                "(table registered but never committed)"
            )
        manifest = t._manifest(v)
        n_files = n_visible = 0
        for d in manifest["data_dirs"]:
            universe = t._stats_universe(
                d, t.dir_stats(manifest, d) or {}
            )
            vis = manifest.get("dir_files", {}).get(d)
            n_files += len(universe)
            n_visible += len(universe) if vis is None else len(vis)
        schema = t.schema(v)
        return spark.createDataFrame(
            [
                (
                    v,
                    len(manifest["data_dirs"]),
                    n_files,
                    n_visible,
                    ", ".join(f.name for f in schema.fields) if schema else None,
                    ", ".join(
                        f"{k}: {x}"
                        for k, x in sorted(
                            manifest.get("constraints", {}).items()
                        )
                    ),
                    sorted(t.stats_columns(v)),
                    # merge-on-read DEBT (what auto-compaction repays):
                    # outstanding tombstone dirs + equality deletes
                    len(manifest.get("delete_dirs", [])),
                    len(manifest.get("eq_deletes", [])),
                    # the spec future writes adopt (declared via
                    # partition-spec evolution, else latest-dir sticky)
                    ", ".join(t.current_partition_by(v)) or None,
                    # the declared write sort order (WRITE ORDERED BY)
                    ", ".join(t.current_sort_order(v)) or None,
                    # ANALYZE stats (None until ANALYZE TABLE runs)
                    (manifest.get("table_stats") or {}).get("row_count"),
                    (manifest.get("table_stats") or {}).get("size_bytes"),
                )
            ],
            "version long, n_data_dirs long, n_files long, "
            "n_visible_files long, columns string, constraints string, "
            "stats_columns array<string>, n_delete_vector_dirs long, "
            "n_eq_deletes long, partition_by string, sort_order string, "
            "stats_row_count long, stats_size_bytes long",
        )

    m = _FILES_RE.match(text)
    if m:
        t = _require(tables, m.group(1), "DESCRIBE FILES")
        if t.current_version() is None:
            raise ValueError(
                f"DESCRIBE FILES: no snapshots at {t.path} "
                "(table registered but never committed)"
            )
        return t.metadata_df("files")

    if _DML_SHAPE_RE.match(text):
        # DML-shaped but didn't parse: refuse with the real cause instead
        # of handing Spark's parser a statement it will misdiagnose
        raise ValueError(
            f"unrecognized DML/maintenance statement shape: {text.strip()[:80]!r}"
        )
    return None
