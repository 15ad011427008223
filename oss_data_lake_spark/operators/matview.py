"""Incrementally-maintained aggregate tables (materialized views).

The lakehouse pattern the reference stack implies but never wires up: its
BI layer (Metabase dashboards re-issuing the daily-average SQL,
reference RUNBOOK.md:128-132) recomputes aggregates from the fact table on
every view. At 100 TB that's a full scan per dashboard refresh; the
standard fix is a materialized aggregate maintained INCREMENTALLY — each
refresh consumes only the rows appended since the last one (Iceberg's
incremental append scan, here ``SnapshotTable.read_changes``) and folds
them into the stored per-group state.

Design:

- **Decomposable measures only** (count / sum — the algebraic aggregates
  whose partials merge associatively). ``avg`` is derived at read time as
  exact-sum / count, never stored — storing it would make merges lossy.
  Doubles fold through the engine-wide DECIMAL path
  (``functions/deterministic``) so a value reached by N incremental
  refreshes is BIT-IDENTICAL to the full recompute, regardless of how the
  appends were batched (pinned by tests/test_matview.py).
- **The MV is itself a SnapshotTable**: every refresh is an atomic
  versioned commit, so dashboards never see a half-refreshed aggregate,
  and the MV's own history is time-travelable. The refresh watermark
  (which source version the state covers) is stored IN the MV manifest's
  own metadata file, published with the same write-temp + atomic-replace
  protocol.
- **Refresh cost**: one partial aggregate over the DELTA (map-side
  combined, shuffled on the group keys) + one full-outer merge against
  the current state. State size = #groups — for day×key rollups that is
  thousands of rows regardless of fact size, so the merge-and-rewrite is
  O(groups), not O(fact).
- **DML / rewritten history between refreshes**: ``read_changes``
  refuses to produce an append-only delta, but the CHANGE FEED
  (``SnapshotTable.read_change_feed``) still defines one — deletes
  RETRACT from the decomposable state (decimal subtraction is exact, so
  the MV stays bit-identical to the full recompute), fully-retracted
  groups drop. Only HLL distinct measures cannot retract (a sketch
  cannot forget an element) — those fall back to a FULL recompute, loud
  in the returned refresh info, silent in semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import PRECISION, SCALE, dsum
from oss_data_lake_spark.sources.snapshots import SnapshotTable


class IncrementalAggregate:
    """A count/sum aggregate over a ``SnapshotTable``, refreshed
    incrementally.

    ``measures`` maps output-column name → source column to SUM (doubles
    routed through the exact decimal fold). A ``<name>_avg`` for any
    measure is available from :meth:`read` via ``with_avg``.
    """

    # the MV's transactional writer identity: each refresh commits with
    # txn_version = the SOURCE version it folded through, so data and
    # watermark publish in ONE atomic manifest write
    _TXN_APP = "mv_refresh"

    def __init__(
        self,
        source: SnapshotTable,
        mv_path: str,
        group_by: list[str],
        measures: dict[str, str],
        distinct_measures: dict[str, str] | None = None,
        nonnull_measures: dict[str, str] | None = None,
    ):
        """``distinct_measures`` maps output name → column for APPROXIMATE
        per-group distinct counts. Exact COUNT DISTINCT is famously not
        incrementally maintainable (merging requires the full value sets);
        the MV instead stores a mergeable HLL SKETCH per group (Flajolet
        et al., "HyperLogLog: the analysis of a near-optimal cardinality
        estimation algorithm", AofA 2007; Apache DataSketches via Spark's
        ``hll_sketch_agg``) — the sketch of a union of row sets equals the
        union of the partial sketches, so N incremental refreshes estimate
        IDENTICALLY to the full recompute (pytest-pinned), at a few KB of
        state per group."""
        if not group_by:
            raise ValueError("group_by must name at least one column")
        self.source = source
        self.mv = SnapshotTable(source.spark, mv_path)
        self.group_by = list(group_by)
        self.measures = dict(measures)
        self.distinct_measures = dict(distinct_measures or {})
        # per-group NON-NULL counts (output name → column): the AVG
        # denominator — SQL AVG divides by count of non-NULL values,
        # not by row count. Decomposable (counts add; retractions
        # subtract only when the retracted row's value was non-null).
        self.nonnull_measures = dict(nonnull_measures or {})
        groups = [
            set(self.measures),
            set(self.distinct_measures),
            set(self.nonnull_measures),
        ]
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                overlap = groups[i] & groups[j]
                if overlap:
                    raise ValueError(
                        f"measure names collide: {sorted(overlap)}"
                    )

    @staticmethod
    def _sk(out: str) -> str:
        return f"__sk_{out}"

    # ------------------------------------------------------------ state

    def last_source_version(self) -> int | None:
        """The source version the MV state covers — read from the MV's own
        txn ledger, NOT a side file: the refresh commit carries it, so the
        watermark can never be newer or older than the data it describes
        (a side file updated after the commit could desynchronize on a
        crash between the two writes and silently double-apply the next
        delta)."""
        return self.mv.txn_watermark(self._TXN_APP)

    # ---------------------------------------------------------- refresh

    def _partial(self, rows: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for out, col in self.measures.items():
            aggs.append(dsum(col, out))
        for out, col in self.nonnull_measures.items():
            aggs.append(F.count(col).cast("long").alias(out))
        for out, col in self.distinct_measures.items():
            aggs.append(F.hll_sketch_agg(col).alias(self._sk(out)))
        return rows.groupBy(*self.group_by).agg(*aggs)

    def _partial_signed(self, feed: DataFrame) -> DataFrame:
        """Signed partial over CHANGE-FEED rows: inserts add, deletes
        retract. Decomposable sums subtract EXACTLY in the decimal fold
        (negation is exact integer arithmetic), so a state reached
        through retractions is still bit-identical to the full recompute.
        Only callable without distinct measures — an HLL sketch cannot
        forget an element."""
        w = F.when(
            F.col(SnapshotTable.CHANGE_TYPE_COL) == "delete", F.lit(-1)
        ).otherwise(F.lit(1))
        dec = f"decimal({PRECISION},{SCALE})"
        aggs = [F.sum(w).cast("long").alias("n_rows")]
        for out, col in self.measures.items():
            d = F.col(col).cast(dec)
            aggs.append(
                F.sum(F.when(w < 0, -d).otherwise(d))
                .cast("double")
                .alias(out)
            )
        for out, col in self.nonnull_measures.items():
            aggs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), w).otherwise(F.lit(0))
                )
                .cast("long")
                .alias(out)
            )
        return feed.groupBy(*self.group_by).agg(*aggs)

    def refresh(self) -> dict:
        """Fold source changes since the last refresh into the MV; returns
        ``{"mode": "noop"|"incremental"|"full", "source_version": v}``.

        Crash/race safety rides the snapshot txn protocol: the commit's
        transaction version IS the watermark, so a crash before the commit
        changes nothing, a crash after it loses nothing, and a racing
        refresh that folded an OLDER source head no-ops against the newer
        refresh's already-applied transaction instead of overwriting it."""
        head = self.source.current_version()
        if head is None:
            raise ValueError(f"source has no snapshots: {self.source.path}")
        last = self.last_source_version()
        if last is not None and last > head:
            # the ledger is AHEAD of the source: the source table was
            # recreated (version numbering restarted) or this mv_path was
            # repointed at a different source. Guessing would leave the MV
            # silently stale (the commit would no-op against the higher
            # ledger version) — refuse loudly instead.
            raise ValueError(
                f"MV watermark {last} is ahead of source head {head} "
                f"({self.source.path}): the source was recreated or the "
                f"MV was repointed — use a fresh mv_path"
            )
        # rollback desync: if the MV table was rolled back, its CURRENT
        # DATA was committed at an older source version than the ledger
        # high-water. The data's own provenance is the truth; rebuild
        # fully and FORCE the ledger back in line.
        desynced = self._data_version() != last
        if not desynced and last == head:
            return {"mode": "noop", "source_version": head}

        mode = "full"
        if not desynced and last is not None:
            try:
                delta = self.source.read_changes(last, head)
                mode = "incremental"
            except (ValueError, OSError):
                # DML / overwrite / rollback intervened: no append-only
                # delta. The CHANGE FEED still has a well-defined one —
                # consume it as retractions, unless a distinct measure's
                # HLL state makes retraction impossible (a sketch cannot
                # forget an element) or the needed manifests expired, in
                # which case rebuild from scratch.
                if not self.distinct_measures:
                    try:
                        feed = self.source.read_change_feed(last, head)
                        mode = "retract"
                    except (ValueError, OSError):
                        pass
        if mode == "incremental":
            merged = self._merge(self.mv.read(), self._partial(delta))
        elif mode == "retract":
            merged = self._merge(
                self.mv.read(), self._partial_signed(feed)
            ).filter(F.col("n_rows") != 0)  # fully-retracted groups drop
        else:
            merged = self._partial(self.source.read(version=head))
        self.mv.commit(
            merged,
            mode="overwrite",
            txn_app=self._TXN_APP,
            txn_version=head,
            txn_force=desynced,
        )
        return {"mode": mode, "source_version": head}

    def _data_version(self) -> int | None:
        """The source version the MV's CURRENT DATA was committed for —
        differs from the ledger high-water exactly when the MV table was
        rolled back. Metadata-only commits on the MV (set_properties,
        constraints, tags — the SQL surface adds these around refreshes)
        don't move data, so the walk steps past any commit whose file
        state equals its parent's until it reaches the refresh txn; a
        DATA-changing non-refresh commit (rollback/restore) stops it —
        that is the desync the caller rebuilds from."""
        cur = self.mv.current_version()
        while cur is not None:
            m = self.mv._manifest(cur)
            txn = m.get("txn")
            if txn and txn.get("app") == self._TXN_APP:
                return txn["version"]
            parent = m.get("parent")
            if parent is None:
                return None
            try:
                pm = self.mv._manifest(parent)
            except (OSError, ValueError):
                return None  # expired history: rebuild conservatively
            same_data = (
                m.get("data_dirs") == pm.get("data_dirs")
                and m.get("dir_files", {}) == pm.get("dir_files", {})
                and m.get("delete_dirs", []) == pm.get("delete_dirs", [])
                and m.get("eq_deletes", []) == pm.get("eq_deletes", [])
            )
            if not same_data:
                return None
            cur = parent
        return None

    def _merge(self, cur: DataFrame, fresh: DataFrame) -> DataFrame:
        """Associative partial-state merge: counts add; decimal-exact sums
        add in DOUBLE only after both sides were exact-decimal folds of
        disjoint row sets — one addition per refresh, identical to the
        order the full recompute's decimal fold would produce... except it
        is not: repeated double additions could drift across MANY
        refreshes, so sums re-fold through decimal here too."""
        sk_cols = [self._sk(out) for out in self.distinct_measures]
        val_cols = [
            "n_rows",
            *self.measures.keys(),
            *self.nonnull_measures.keys(),
            *sk_cols,
        ]
        # group keys are renamed per side and joined NULL-SAFELY (<=>):
        # Spark's equality join never matches NULL keys, so a plain
        # full_outer on the key names would leave a NULL-keyed group's
        # state row AND delta row both unmatched — the group would
        # duplicate on every refresh and diverge from the full recompute.
        # eqNullSafe treats NULL as a join value; the output key is the
        # coalesce of the two sides (equal whenever both present).
        a = cur.select(
            *[F.col(k).alias(f"__ka_{k}") for k in self.group_by],
            *[F.col(c).alias(f"__a_{c}") for c in val_cols],
        )
        b = fresh.select(
            *[F.col(k).alias(f"__kb_{k}") for k in self.group_by],
            *[F.col(c).alias(f"__b_{c}") for c in val_cols],
        )
        # the engine-wide exact-fold type (functions/deterministic): the
        # bit-identical-to-full-recompute guarantee requires the merge to
        # fold at the SAME precision as dsum
        dec = f"decimal({PRECISION},{SCALE})"
        out_cols = [
            (
                F.coalesce("__a_n_rows", F.lit(0))
                + F.coalesce("__b_n_rows", F.lit(0))
            ).alias("n_rows")
        ]
        for m in self.measures:
            out_cols.append(
                (
                    F.coalesce(F.col(f"__a_{m}").cast(dec), F.lit(0).cast(dec))
                    + F.coalesce(F.col(f"__b_{m}").cast(dec), F.lit(0).cast(dec))
                )
                .cast("double")
                .alias(m)
            )
        for m in self.nonnull_measures:
            out_cols.append(
                (
                    F.coalesce(F.col(f"__a_{m}"), F.lit(0))
                    + F.coalesce(F.col(f"__b_{m}"), F.lit(0))
                )
                .cast("long")
                .alias(m)
            )
        for sk in sk_cols:
            av, bv = F.col(f"__a_{sk}"), F.col(f"__b_{sk}")
            out_cols.append(
                F.when(av.isNull(), bv)
                .when(bv.isNull(), av)
                .otherwise(F.hll_union(av, bv))
                .alias(sk)
            )
        cond = None
        for k in self.group_by:
            eq = F.col(f"__ka_{k}").eqNullSafe(F.col(f"__kb_{k}"))
            cond = eq if cond is None else (cond & eq)
        key_cols = [
            F.coalesce(F.col(f"__ka_{k}"), F.col(f"__kb_{k}")).alias(k)
            for k in self.group_by
        ]
        return a.join(b, cond, "full_outer").select(*key_cols, *out_cols)

    # ------------------------------------------------------------- read

    def read(self, with_avg: bool = False, version: int | None = None) -> DataFrame:
        df = self.mv.read(version=version)
        for out in self.distinct_measures:
            # sketches are internal state; readers get the estimate
            df = df.withColumn(
                out, F.hll_sketch_estimate(self._sk(out))
            ).drop(self._sk(out))
        if with_avg:
            for m in self.measures:
                df = df.withColumn(
                    f"{m}_avg",
                    F.col(m) / F.col("n_rows").cast("double"),
                )
        return df
