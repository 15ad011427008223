"""Restricted MATCH_RECOGNIZE (SQL:2016 §7.10 row-pattern recognition) as an
exact rewrite to runs-and-windows — zero Python on the row path.

The reference exposes Trino 467, whose MATCH_RECOGNIZE evaluates an NFA per
partition (reference capability: `docker-compose.yaml:153`, arbitrary BI SQL
per `README.md:97-98`). Spark has no row-pattern operator, and a general
regex NFA over 100 TB of rows would be a row-at-a-time UDF — the one plan
shape this repo bans. But the patterns BI queries actually issue (Trino's
own docs lead with the stock V-shape `PATTERN (STRT DOWN+ UP+)`) fall in a
restricted class that rewrites EXACTLY to label runs + window arithmetic:

    PATTERN  ::=  [START] VAR^q VAR^q ... VAR^q      q in {1, +}
    - all VARs distinct, each DEFINEd by a row-LOCAL predicate (current-row
      columns and PREV(col [, n]) physical navigation — no aggregates, no
      references to other pattern variables), predicates pairwise mutually
      EXCLUSIVE (documented contract — under SQL:2016 preferment a row that
      satisfies two defines is classified by pattern position; with
      exclusive defines the classification is position-free and the rewrite
      below is exact; the NFA differential test enforces this for the
      shipped queries);
    - START is one optional LEADING undefined (always-true) single variable
      (Trino's STRT idiom);
    - ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW (the defaults);
    - MEASURES: MATCH_NUMBER(), COUNT(*), COUNT(V.*), FIRST(V.col),
      LAST(V.col), V.col (= FINAL LAST, the one-row-per-match semantics).

Why the rewrite is exact (derivation, abridged — the NFA test in
`tests/test_match_recognize.py` re-verifies it empirically):

- Row-local defines give every row a FIXED label (or none). Greedy `V+`
  therefore always consumes a maximal run of V-labeled rows: stopping early
  leaves the next row V-labeled, where the (distinct, exclusive) next
  variable cannot match, and backtracking restores the full run.
- A match is then a sequence of CONSECUTIVE maximal runs labeled exactly
  V1..Vk, where a middle `q=1` variable demands run length 1, a leading
  `q=1` core variable takes its run's LAST row, and a trailing `q=1`
  variable takes its run's FIRST row. Matches anchored at distinct runs
  never share rows (labels within a pattern are distinct), so AFTER MATCH
  SKIP PAST LAST ROW is automatically honored — EXCEPT for the one row an
  always-true START variable consumes, which can contend with the previous
  match's last row.
- START contention resolves with a parity sweep: a candidate whose anchor
  run has length 1 and whose preferred start (the row just before the
  anchor run) coincides with the previous candidate's consumed end is
  matched iff the previous candidate is NOT — chains of such candidates
  alternate off their chain head, whose status is position-free. Candidates
  with anchor length >= 2 match unconditionally (the START row shifts into
  the run); candidates at a partition head with anchor length 1 are dead.

Everything is expressed as window functions over (partition, order) — one
shuffle to co-locate partitions, then runs/candidates/parity as narrow
window passes over progressively tinier relations (runs <= rows,
candidates <= runs). The same rewrite is emitted as DuckDB SQL for the b53
oracle, and `Engine.sql` routes the Trino textual form over snapshot tables
(`sources/dml_sql.py`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_PREV_RE = re.compile(r"PREV\s*\(\s*(\w+)\s*(?:,\s*(\d+)\s*)?\)", re.IGNORECASE)


@dataclass(frozen=True)
class PatternVar:
    name: str
    quant: str  # "1" or "+"


def _parse_pattern(pattern: str) -> list[PatternVar]:
    """``"STRT DOWN+ UP+"`` → [PatternVar * 3]. Quantifiers beyond 1/+
    (?, *, {n}, alternation, grouping) are outside the supported class."""
    out: list[PatternVar] = []
    for tok in pattern.replace("(", " ").replace(")", " ").split():
        if re.fullmatch(r"\w+\+", tok):
            out.append(PatternVar(tok[:-1].upper(), "+"))
        elif re.fullmatch(r"\w+", tok):
            out.append(PatternVar(tok.upper(), "1"))
        else:
            raise ValueError(
                f"unsupported pattern token {tok!r}: the supported class is "
                "a sequence of distinct variables with quantifier 1 or +"
            )
    names = [v.name for v in out]
    if len(set(names)) != len(names):
        raise ValueError(f"pattern variables must be distinct: {names}")
    return out


def _rewrite_prev(expr: str) -> tuple[str, set[tuple[str, int]]]:
    """Rewrite PREV(col[, n]) to the internal lag-column spelling; return
    the rewritten text plus the (col, n) lags it needs."""
    needs: set[tuple[str, int]] = set()

    def sub(m: re.Match) -> str:
        col, n = m.group(1), int(m.group(2) or 1)
        needs.add((col, n))
        return f"__mr_prev_{col}_{n}"

    return _PREV_RE.sub(sub, expr), needs


_PREV_TOKEN_RE = re.compile(r"__mr_prev_(\w+)_(\d+)\b")
_SQUOTE_RE = re.compile(r"'(?:[^']|'')*'")


def _shift_one_row(txt: str, columns: list[str]) -> str:
    """The define text evaluated AS OF THE PREVIOUS ROW: every lag token
    ``__mr_prev_c_n`` becomes ``__mr_prev_c_{n+1}`` and every bare
    current-row column reference becomes ``__mr_prev_c_1`` (single-quoted
    SQL string literals are left untouched). Because ``lag(c, n)`` at row
    i equals ``lag(c, n-1)`` at row i-1 within a partition — and every
    shifted lag is NULL at a partition's first row, exactly where
    ``lag(label)`` is NULL — the shifted text computes the previous row's
    label without a second full-table window pass (r15, guide §2.4)."""
    cols = sorted(set(columns), key=len, reverse=True)

    def shift_segment(seg: str) -> str:
        seg = _PREV_TOKEN_RE.sub(
            lambda m: f"__mr_prev_{m.group(1)}_{int(m.group(2)) + 1}", seg
        )
        for c in cols:
            # \b can't fire inside __mr_prev_* tokens (underscores are
            # word characters), so only bare references rewrite
            seg = re.sub(rf"\b{re.escape(c)}\b", f"__mr_prev_{c}_1", seg)
        return seg

    out: list[str] = []
    last = 0
    for m in _SQUOTE_RE.finditer(txt):
        out.append(shift_segment(txt[last:m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(shift_segment(txt[last:]))
    return "".join(out)


_MEASURE_RES = [
    ("match_number", re.compile(r"^MATCH_NUMBER\s*\(\s*\)$", re.I)),
    ("classifier", re.compile(r"^CLASSIFIER\s*\(\s*\)$", re.I)),
    ("count_star", re.compile(r"^COUNT\s*\(\s*\*\s*\)$", re.I)),
    ("count_var", re.compile(r"^COUNT\s*\(\s*(\w+)\s*\.\s*\*\s*\)$", re.I)),
    ("first", re.compile(r"^FIRST\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)$", re.I)),
    ("last", re.compile(r"^LAST\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)$", re.I)),
    ("var_col", re.compile(r"^(\w+)\s*\.\s*(\w+)$", re.I)),
]


def _parse_measure(expr: str) -> tuple[str, str | None, str | None]:
    # FINAL is the one-row-per-match default and the only supported
    # semantics in ALL ROWS mode; RUNNING is refused below
    txt = re.sub(r"^\s*FINAL\s+", "", expr.strip(), flags=re.IGNORECASE)
    if re.match(r"^\s*RUNNING\b", txt, re.IGNORECASE):
        raise ValueError(
            f"unsupported measure {expr!r}: only FINAL semantics are "
            "supported (RUNNING measures are out of the restricted class)"
        )
    for kind, rx in _MEASURE_RES:
        m = rx.match(txt)
        if m:
            g = m.groups()
            var = g[0].upper() if g and g[0] else None
            col = g[1] if len(g) > 1 else None
            return kind, var, col
    raise ValueError(
        f"unsupported measure {expr!r}: MATCH_NUMBER(), CLASSIFIER(), "
        "COUNT(*), COUNT(V.*), [FINAL] FIRST(V.col), [FINAL] LAST(V.col), "
        "V.col"
    )


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    defines: dict[str, str],
    measures: dict[str, str],
    rows_per_match: str = "one",
) -> DataFrame:
    """Evaluate the restricted MATCH_RECOGNIZE described in the module
    docstring. ``defines`` maps variable → Spark-SQL boolean text over
    current-row columns and PREV(col[, n]); ``measures`` maps output alias →
    measure text. ``order_by`` must be a total order within partitions
    (ties would make SQL:2016 itself nondeterministic). Returns one row per
    match: partition columns + measures.

    ``rows_per_match``: "one" (the default, ONE ROW PER MATCH) or "all"
    (ALL ROWS PER MATCH with FINAL measure semantics): every matched input
    row is emitted with its original columns plus the measures, a
    ``classifier`` column naming the pattern variable the row mapped to,
    and unmatched rows omitted (the SQL:2016 default). The expansion is an
    EQUI-join: each match explodes into (k+1) per-variable row spans keyed
    by run id (run ids are consecutive within a partition), so no range
    join ever appears in the plan."""
    if rows_per_match not in ("one", "all"):
        raise ValueError(f"rows_per_match must be one|all: {rows_per_match}")
    pvars = _parse_pattern(pattern)
    known = {v.name for v in pvars}
    for alias, mtxt in measures.items():
        _kind, mvar, _col = _parse_measure(mtxt)
        if mvar is not None and mvar not in known:
            raise ValueError(
                f"measure {mtxt!r} references {mvar}, which is not a "
                f"pattern variable ({sorted(known)})"
            )
    defmap = {k.upper(): v for k, v in defines.items()}
    undefined = [v.name for v in pvars if v.name not in defmap]
    if undefined and (
        len(undefined) > 1
        or undefined[0] != pvars[0].name
        or pvars[0].quant != "1"
    ):
        raise ValueError(
            f"undefined variables {undefined}: only ONE leading always-true "
            "single variable is supported (the Trino STRT idiom)"
        )
    has_start = bool(undefined)
    core = pvars[1:] if has_start else pvars
    if not core:
        raise ValueError("pattern needs at least one defined variable")
    if has_start and len(core) == 1 and core[0].quant == "1":
        raise ValueError(
            "START followed by a single one-row variable tiles matches "
            "inside label runs — outside the supported class"
        )
    extra = set(defmap) - {v.name for v in pvars}
    if extra:
        raise ValueError(f"DEFINE for variables not in pattern: {extra}")

    ord_c, parts = order_by, list(partition_by)
    w = Window.partitionBy(*parts).orderBy(ord_c)

    if not has_start and len(core) == 1 and core[0].quant == "1":
        # trivial class: PATTERN (A) — every A-labeled row is its own match
        txt, needs = _rewrite_prev(defmap[core[0].name])
        rows = df
        for col, n in sorted(needs):
            rows = rows.withColumn(
                f"__mr_prev_{col}_{n}", F.lag(col, n).over(w)
            )
        rows = rows.filter(F.expr(txt)).withColumn(
            "__mn", F.row_number().over(w)
        )
        lead_cols = (
            list(df.columns) if rows_per_match == "all" else list(parts)
        )
        out: list[Column] = [F.col(c) for c in lead_cols]
        for alias, mtxt in measures.items():
            kind, _var, col = _parse_measure(mtxt)
            if kind == "match_number":
                out.append(F.col("__mn").cast("long").alias(alias))
            elif kind == "classifier":
                if rows_per_match != "all":
                    raise ValueError(
                        "CLASSIFIER() requires ALL ROWS PER MATCH"
                    )
                out.append(F.lit(core[0].name).alias(alias))
            elif kind in ("count_star", "count_var"):
                out.append(F.lit(1).cast("long").alias(alias))
            else:
                out.append(F.col(col).alias(alias))
        return rows.select(*out)

    # --- 1. row layer: PREV lags, label, global position -----------------
    lag_needs: set[tuple[str, int]] = set()
    label_cases: list[tuple[str, str]] = []
    shifted_cases: list[tuple[str, str]] = []
    for v in core:
        txt, needs = _rewrite_prev(defmap[v.name])
        lag_needs |= needs
        label_cases.append((v.name, txt))
        # the previous row's label re-derives from one-row-shifted lags
        # (r15): its lag columns ride the SAME window node as the define
        # lags, killing the separate full-table lag(__lbl) window pass
        # the run derivation used to pay (see _shift_one_row)
        stxt = _shift_one_row(txt, list(df.columns))
        shifted_cases.append((v.name, stxt))
        lag_needs |= {
            (m.group(1), int(m.group(2)))
            for m in _PREV_TOKEN_RE.finditer(stxt)
        }
    rows = df
    for col, n in sorted(lag_needs):
        rows = rows.withColumn(f"__mr_prev_{col}_{n}", F.lag(col, n).over(w))
    lbl: Column = F.lit(None).cast("string")
    for name, txt in reversed(label_cases):  # pattern order = preferment
        lbl = F.when(F.expr(txt), F.lit(name)).otherwise(lbl)
    if len(label_cases) > 1:
        # Runtime enforcement of the exclusivity contract (round-11
        # ADVICE): the rewrite is exact ONLY when DEFINE predicates are
        # pairwise mutually exclusive. A row satisfying >= 2 defines would
        # be silently classified by pattern order here but by NFA position
        # under true SQL:2016 preferment — so raise instead of returning
        # non-Trino results. The guard is a branch INSIDE the label
        # expression (never prunable, no extra pass): each define is
        # re-evaluated once per row in the same codegen stage.
        nlbl: Column = F.lit(0)
        for _name, txt in label_cases:
            nlbl = nlbl + F.coalesce(F.expr(txt).cast("int"), F.lit(0))
        lbl = F.when(
            nlbl >= 2,
            F.raise_error(F.concat(
                F.lit(
                    "MATCH_RECOGNIZE: DEFINE predicates are not mutually "
                    "exclusive — a row satisfies "
                ),
                nlbl.cast("string"),
                F.lit(
                    " pattern variables; the restricted rewrite requires "
                    "pairwise exclusive DEFINEs (see "
                    "operators/match_recognize.py), otherwise results "
                    "would diverge from SQL:2016/Trino NFA preferment"
                ),
            )),
        ).otherwise(lbl)
    # the previous row's label, from the shifted lags — NO guard branch:
    # a row that would trip the exclusivity guard trips it in its OWN
    # unshifted __lbl, so the shifted copy cannot add or mask a failure
    plbl: Column = F.lit(None).cast("string")
    for name, stxt in reversed(shifted_cases):
        plbl = F.when(F.expr(stxt), F.lit(name)).otherwise(plbl)
    rows = rows.withColumn("__lbl", lbl).withColumn(
        "__plbl", plbl
    ).withColumn("__pos", F.row_number().over(w))

    # --- 2. runs: maximal same-label stretches ---------------------------
    # run-boundary indicator from (__lbl, __plbl) — both plain
    # projections over the single lag window node, so the whole run
    # derivation costs TWO full-table window passes (lags+row_number,
    # running sum) instead of the former three (r15)
    chg = (~F.col("__lbl").eqNullSafe(F.col("__plbl"))).cast("long")
    rows = rows.withColumn("__run", F.sum(chg).over(w))
    rw = Window.partitionBy(*parts, "__run").orderBy(ord_c)
    rows = rows.withColumn("__rir", F.row_number().over(rw)).withColumn(
        "__rird", F.row_number().over(rw.orderBy(F.col(ord_c).desc()))
    )

    # measure columns that need per-run first/last/second/second-last values
    mspecs = {alias: _parse_measure(txt) for alias, txt in measures.items()}
    need_cols: set[str] = set()
    for kind, var, col in mspecs.values():
        if col is not None:
            need_cols.add(col)

    aggs = [
        F.first("__lbl").alias("lbl"),
        F.count(F.lit(1)).alias("rlen"),
        F.min("__pos").alias("pos_first"),
        F.max("__pos").alias("pos_last"),
    ]
    for c in sorted(need_cols):
        aggs += [
            F.min_by(c, "__pos").alias(f"f_{c}"),
            F.max_by(c, "__pos").alias(f"l_{c}"),
            F.max(F.when(F.col("__rir") == 2, F.col(c))).alias(f"s2_{c}"),
            F.max(F.when(F.col("__rird") == 2, F.col(c))).alias(f"sl_{c}"),
        ]
    runs = rows.groupBy(*parts, "__run").agg(*aggs)

    # --- 3. candidates: consecutive runs labeled core[0..k-1] ------------
    sw = Window.partitionBy(*parts).orderBy("__run")
    k = len(core)
    cand = runs
    if has_start:  # START's s_pref row = previous run's last
        for c in sorted(need_cols):
            cand = cand.withColumn(f"prev_l_{c}", F.lag(f"l_{c}").over(sw))
    for j in range(1, k):
        for fld in ["lbl", "rlen", "pos_first", "pos_last"] + [
            x for c in sorted(need_cols) for x in (f"f_{c}", f"l_{c}")
        ]:
            cand = cand.withColumn(f"{fld}_{j}", F.lead(fld, j).over(sw))
    structural = F.col("lbl") == core[0].name
    for j in range(1, k):
        structural &= F.col(f"lbl_{j}") == core[j].name
        if core[j].quant == "1" and j < k - 1:
            structural &= F.col(f"rlen_{j}") == 1  # middle singles: len 1
    cand = cand.filter(structural)

    tail = k - 1
    end_pos = (
        F.col(f"pos_last_{tail}" if tail else "pos_last")
        if core[tail].quant == "+"
        else F.col(f"pos_first_{tail}" if tail else "pos_first")
    )
    cand = cand.withColumn("cand_end", end_pos)

    cw = Window.partitionBy(*parts).orderBy("pos_first")
    if has_start:
        # contention parity (derivation in the module docstring)
        q0_plus = core[0].quant == "+"
        s_pref_exists = F.col("pos_first") > 1
        raw_zero_gap = (
            F.col("pos_first") - 1
        ) == F.lag("cand_end").over(cw)
        dep = (
            (F.col("rlen") == 1)
            & s_pref_exists
            & F.coalesce(raw_zero_gap, F.lit(False))
        )
        cand = cand.withColumn("dep", dep).withColumn(
            "zg", F.coalesce(raw_zero_gap, F.lit(False))
        )
        cand = cand.withColumn(
            "chain", F.sum((~F.col("dep")).cast("long")).over(cw)
        )
        chw = Window.partitionBy(*parts, "chain").orderBy("pos_first")
        # chain head (p=0, non-dep): len>=2 always matches; len 1 with a
        # free preferred start matches; len 1 at a partition head is dead
        head_matched = (F.col("rlen") >= 2) | (
            (F.col("rlen") == 1) & s_pref_exists
        )
        # p and head_m in ONE select (r15): both window functions share
        # chw and neither depends on the other's output, so Spark plans
        # a single Window node instead of the two stacked passes the
        # withColumn chain produced
        cand = cand.select(
            "*",
            (F.row_number().over(chw) - 1).alias("p"),
            F.first(head_matched).over(chw).alias("head_m"),
        ).withColumn(
            "matched",
            F.when(F.col("p") == 0, head_matched).otherwise(
                F.col("head_m") != (F.col("p") % 2 == 1)
            ),
        )
        contended = F.col("zg") & F.coalesce(
            F.lag("matched").over(cw), F.lit(False)
        )
        if q0_plus:
            start_spref = s_pref_exists & ~contended
            cand = cand.withColumn(
                "start_case",
                F.when(start_spref, F.lit("SPREF")).otherwise(
                    F.lit("INRUN_PLUS")
                ),
            ).withColumn(
                "start_pos",
                F.when(start_spref, F.col("pos_first") - 1).otherwise(
                    F.col("pos_first")
                ),
            )
        else:
            cand = cand.withColumn(
                "start_case",
                F.when(F.col("rlen") >= 2, F.lit("INRUN_ONE")).otherwise(
                    F.lit("SPREF")
                ),
            ).withColumn(
                "start_pos",
                F.when(
                    F.col("rlen") >= 2, F.col("pos_last") - 1
                ).otherwise(F.col("pos_first") - 1),
            )
        cand = cand.filter("matched")
    else:
        # no START: cores are disjoint, no contention; a leading q=1 core
        # var takes its run's LAST row
        cand = cand.withColumn("start_case", F.lit("NOSTART")).withColumn(
            "start_pos",
            F.col("pos_first")
            if core[0].quant == "+"
            else F.col("pos_last"),
        )

    cand = cand.withColumn(
        "match_no", F.row_number().over(cw)
    )

    # --- 4. measures ------------------------------------------------------
    def _var_field(var: str, col: str, want: str) -> Column:
        """Value of FIRST/LAST(var.col) given the var's run offset and the
        start-case adjustments for START and the anchor variable."""
        if has_start and var == pvars[0].name:
            # START maps one row; FIRST == LAST == that row
            spref_val = F.col(f"prev_l_{col}")
            if core[0].quant == "+":
                return F.when(
                    F.col("start_case") == "SPREF", spref_val
                ).otherwise(F.col(f"f_{col}"))  # in-run: anchor first row
            return F.when(
                F.col("start_case") == "SPREF", spref_val
            ).otherwise(F.col(f"sl_{col}"))  # INRUN_ONE: second-to-last
        j = next(i for i, v in enumerate(core) if v.name == var)
        sfx = f"_{j}" if j else ""
        if core[j].quant == "1":
            # one matched row: leading core var → run LAST row; middle →
            # the single row; trailing → run FIRST row
            if j == 0:
                return F.col(f"l_{col}")
            # trailing var takes its run's FIRST row; a middle var's
            # run has rlen == 1, so first == last — one expression
            return F.col(f"f_{col}{sfx}")
        if j == 0 and has_start and want == "first":
            # anchor run's first row went to START when the start shifted
            # in-run (q+): FIRST(V2.col) is then the run's SECOND row
            return F.when(
                F.col("start_case") == "SPREF", F.col(f"f_{col}")
            ).otherwise(F.col(f"s2_{col}"))
        return F.col(f"{'f' if want == 'first' else 'l'}_{col}{sfx}")

    def _measure_col(kind: str, var: str | None, col: str | None) -> Column:
        if kind == "match_number":
            return F.col("match_no").cast("long")
        if kind == "classifier":
            if rows_per_match != "all":
                raise ValueError("CLASSIFIER() requires ALL ROWS PER MATCH")
            return F.col("__cls")
        if kind == "count_star":
            return (F.col("cand_end") - F.col("start_pos") + 1).cast("long")
        if kind == "count_var":
            if has_start and var == pvars[0].name:
                return F.lit(1).cast("long")
            j = next(i for i, v in enumerate(core) if v.name == var)
            sfx = f"_{j}" if j else ""
            if core[j].quant == "1":
                return F.lit(1).cast("long")
            if j == 0 and has_start:
                return F.when(
                    F.col("start_case") == "SPREF", F.col("rlen")
                ).otherwise(F.col("rlen") - 1).cast("long")
            return F.col(f"rlen{sfx}").cast("long")
        if kind == "first":
            return _var_field(var, col, "first")
        if kind in ("last", "var_col"):
            return _var_field(var, col, "last")
        raise AssertionError(kind)  # pragma: no cover

    if rows_per_match == "one":
        out_cols: list[Column] = [F.col(c) for c in parts]
        for alias, (kind, var, col) in mspecs.items():
            out_cols.append(_measure_col(kind, var, col).alias(alias))
        return cand.select(*out_cols)

    # --- 5. ALL ROWS PER MATCH: explode matches into per-variable row
    # spans keyed by (consecutive) run id, then ONE equi-join back to the
    # input rows — no range join, no re-scan of the corpus beyond the
    # already-computed row layer.
    spans: list[Column] = []
    if has_start:
        start_rid = F.when(
            F.col("start_case") == "SPREF", F.col("__run") - 1
        ).otherwise(F.col("__run"))
        spans.append(
            F.struct(
                start_rid.alias("rid"),
                F.col("start_pos").alias("lo"),
                F.col("start_pos").alias("hi"),
                F.lit(pvars[0].name).alias("cls"),
            )
        )
    for j, v in enumerate(core):
        sfx = f"_{j}" if j else ""
        if v.quant == "+":
            if j == 0 and has_start:
                lo = F.when(
                    F.col("start_case") == "SPREF", F.col("pos_first")
                ).otherwise(F.col("pos_first") + 1)
            else:
                lo = F.col(f"pos_first{sfx}")
            hi = F.col(f"pos_last{sfx}")
        elif j == 0:
            lo = hi = F.col("pos_last")  # leading single: run LAST row
        else:
            lo = hi = F.col(f"pos_first{sfx}")  # middle len-1 / trailing
        spans.append(
            F.struct(
                (F.col("__run") + j).alias("rid"),
                lo.alias("lo"),
                hi.alias("hi"),
                F.lit(v.name).alias("cls"),
            )
        )
    mcols = []
    for alias, (kind, var, col) in mspecs.items():
        if kind in ("classifier", "match_number"):
            continue  # resolved per-row below / carried as __mno
        mcols.append(_measure_col(kind, var, col).alias(f"__m_{alias}"))
    exploded = cand.select(
        *[F.col(c).alias(f"__p_{c}") for c in parts],
        F.col("match_no").alias("__mno"),
        *mcols,
        F.explode(F.array(*spans)).alias("sp"),
    ).select(
        "*",
        F.col("sp.rid").alias("__rid"),
        F.col("sp.lo").alias("__lo"),
        F.col("sp.hi").alias("__hi"),
        F.col("sp.cls").alias("__cls"),
    ).drop("sp")
    base = rows.select(*df.columns, "__run", "__pos")
    cond = (F.col("__run") == F.col("__rid")) & (
        F.col("__pos") >= F.col("__lo")
    ) & (F.col("__pos") <= F.col("__hi"))
    for p in parts:
        cond &= F.col(p) == F.col(f"__p_{p}")
    joined = base.join(exploded, on=cond, how="inner")
    out_cols = [F.col(c) for c in df.columns]
    for alias, (kind, var, col) in mspecs.items():
        if kind == "match_number":
            out_cols.append(F.col("__mno").cast("long").alias(alias))
        elif kind == "classifier":
            out_cols.append(F.col("__cls").alias(alias))
        else:
            out_cols.append(F.col(f"__m_{alias}").alias(alias))
    return joined.select(*out_cols)


def vshape_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b53: Trino's canonical MATCH_RECOGNIZE query shape — the stock-ticker
    V (PATTERN (STRT DOWN+ UP+)) — over per-user event value series.
    One row per V: where it started (the row before the decline), the
    bottom, where the recovery ended, and the step accounting."""
    from oss_data_lake_spark.sources.loaders import load_table

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by="event_id",
        pattern="(STRT DOWN+ UP+)",
        defines={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        measures={
            "match_no": "MATCH_NUMBER()",
            "start_event": "FIRST(STRT.event_id)",
            "start_value": "STRT.value",
            "bottom_value": "LAST(DOWN.value)",
            "end_value": "LAST(UP.value)",
            "end_event": "LAST(UP.event_id)",
            "down_steps": "COUNT(DOWN.*)",
            "match_len": "COUNT(*)",
        },
    ).orderBy("user_id", "match_no")


def vshape_events_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b55: the same V-shape pattern in ALL ROWS PER MATCH form — every
    matched row with its original columns, MATCH_NUMBER, CLASSIFIER, and
    the FINAL measures (the per-row drill-down a BI user toggles to after
    the one-row summary)."""
    from oss_data_lake_spark.sources.loaders import load_table

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by="event_id",
        pattern="(STRT DOWN+ UP+)",
        defines={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        measures={
            "match_no": "MATCH_NUMBER()",
            "classifier": "CLASSIFIER()",
            "bottom_value": "FINAL LAST(DOWN.value)",
            "end_value": "FINAL LAST(UP.value)",
            "match_len": "COUNT(*)",
        },
        rows_per_match="all",
    ).orderBy("user_id", "match_no", "event_id")


QUERIES = {
    "b53_match_recognize_vshape": vshape_events,
    "b55_match_recognize_all_rows": vshape_events_all_rows,
}

# The identical restricted rewrite, expressed directly in DuckDB SQL (DuckDB
# has no MATCH_RECOGNIZE either): labels -> maximal runs -> DOWN/UP run-pair
# candidates -> START contention parity -> measures. The SEMANTIC anchor
# (that the rewrite equals true SQL:2016 scan semantics) is the NFA
# differential in tests/test_match_recognize.py; this oracle anchors
# cross-engine value parity of the shipped rewrite.
# shared oracle prefix: labels -> runs -> candidates -> contention parity
# -> matched candidates (m)
_VSHAPE_CTE = """
        WITH base AS (
          SELECT user_id, event_id, value,
                 lag(value) OVER w AS pv,
                 row_number() OVER w AS pos
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        lab AS (
          SELECT *, CASE WHEN value < pv THEN 'DOWN'
                         WHEN value > pv THEN 'UP' END AS lbl
          FROM base),
        lab2 AS (
          SELECT *, lag(lbl) OVER (PARTITION BY user_id ORDER BY event_id)
                     AS plbl
          FROM lab),
        rr AS (
          SELECT *, SUM(CASE WHEN lbl IS DISTINCT FROM plbl
                             THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY event_id) AS run_id
          FROM lab2),
        runs AS (
          SELECT user_id, run_id, any_value(lbl) AS lbl,
                 COUNT(*) AS rlen,
                 MIN(pos) AS pos_first, MAX(pos) AS pos_last,
                 arg_min(value, pos) AS f_value, arg_max(value, pos) AS l_value,
                 arg_min(event_id, pos) AS f_event_id,
                 arg_max(event_id, pos) AS l_event_id
          FROM rr GROUP BY user_id, run_id),
        seq AS (
          SELECT *, lag(l_value) OVER rw AS prev_l_value,
                 lag(l_event_id) OVER rw AS prev_l_event_id,
                 lead(lbl) OVER rw AS lbl_1, lead(rlen) OVER rw AS rlen_1,
                 lead(pos_last) OVER rw AS pos_last_1,
                 lead(l_value) OVER rw AS l_value_1,
                 lead(l_event_id) OVER rw AS l_event_id_1
          FROM runs
          WINDOW rw AS (PARTITION BY user_id ORDER BY run_id)),
        cand1 AS (
          SELECT *, pos_last_1 AS cand_end,
                 (pos_first > 1) AS spref_exists,
                 COALESCE((pos_first - 1) = lag(pos_last_1) OVER cw, FALSE)
                     AS zg
          FROM seq WHERE lbl = 'DOWN' AND lbl_1 = 'UP'
          WINDOW cw AS (PARTITION BY user_id ORDER BY pos_first)),
        cand3 AS (
          SELECT *, SUM(CASE WHEN rlen = 1 AND spref_exists AND zg
                             THEN 0 ELSE 1 END) OVER cw AS chain
          FROM cand1
          WINDOW cw AS (PARTITION BY user_id ORDER BY pos_first)),
        cand4 AS (
          SELECT *, row_number() OVER chw - 1 AS p,
                 first_value(rlen >= 2 OR (rlen = 1 AND spref_exists))
                     OVER chw AS head_m
          FROM cand3
          WINDOW chw AS (PARTITION BY user_id, chain ORDER BY pos_first)),
        cand5 AS (
          SELECT *, CASE WHEN p = 0
                         THEN (rlen >= 2 OR (rlen = 1 AND spref_exists))
                         ELSE head_m <> (p % 2 = 1) END AS matched
          FROM cand4),
        cand6 AS (
          SELECT *, (zg AND COALESCE(lag(matched) OVER cw, FALSE))
                     AS contended
          FROM cand5
          WINDOW cw AS (PARTITION BY user_id ORDER BY pos_first)),
        m AS (
          SELECT *, (spref_exists AND NOT contended) AS spref
          FROM cand6 WHERE matched)"""

ORACLES = {
    "b53_match_recognize_vshape": _VSHAPE_CTE + """
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY pos_first)
                   AS match_no,
               CASE WHEN spref THEN prev_l_event_id ELSE f_event_id END
                   AS start_event,
               CASE WHEN spref THEN prev_l_value ELSE f_value END
                   AS start_value,
               l_value AS bottom_value,
               l_value_1 AS end_value,
               l_event_id_1 AS end_event,
               CAST(CASE WHEN spref THEN rlen ELSE rlen - 1 END AS BIGINT)
                   AS down_steps,
               CAST(cand_end
                    - (CASE WHEN spref THEN pos_first - 1 ELSE pos_first END)
                    + 1 AS BIGINT) AS match_len
        FROM m ORDER BY user_id, match_no
    """,
    # b55: the ALL ROWS PER MATCH form — the same matched candidates
    # expanded to their member rows via per-variable position spans
    # (START = the resolved start row; DOWN = the anchor run minus the
    # row START consumed in-run; UP = the following run), joined back to
    # the positioned row layer
    "b55_match_recognize_all_rows": _VSHAPE_CTE + """,
        mm AS (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY pos_first) AS match_no,
                 CASE WHEN spref THEN pos_first - 1 ELSE pos_first END
                     AS start_pos
          FROM m),
        spans AS (
          SELECT user_id, match_no, 'STRT' AS cls,
                 start_pos AS lo, start_pos AS hi,
                 l_value AS bottom, l_value_1 AS end_v,
                 CAST(cand_end - start_pos + 1 AS BIGINT) AS mlen
          FROM mm
          UNION ALL
          SELECT user_id, match_no, 'DOWN',
                 CASE WHEN spref THEN pos_first ELSE pos_first + 1 END,
                 pos_last, l_value, l_value_1,
                 CAST(cand_end - start_pos + 1 AS BIGINT)
          FROM mm
          UNION ALL
          SELECT user_id, match_no, 'UP', pos_last + 1, cand_end,
                 l_value, l_value_1,
                 CAST(cand_end - start_pos + 1 AS BIGINT)
          FROM mm)
        SELECT r.user_id, r.event_id, r.value,
               CAST(s.match_no AS BIGINT) AS match_no,
               s.cls AS classifier, s.bottom AS bottom_value,
               s.end_v AS end_value, s.mlen AS match_len
        FROM rr r JOIN spans s
          ON r.user_id = s.user_id AND r.pos BETWEEN s.lo AND s.hi
        ORDER BY r.user_id, s.match_no, r.pos
    """,
}
