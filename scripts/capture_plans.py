"""Regenerate PLANS.md: captured physical plans for the headline queries.

Run from the repo root at the same commit as the round's bench run so plan
evidence and timings correspond (VERDICT r3 hygiene note):

    python scripts/capture_plans.py          # writes PLANS.md at sf0.01

Each entry is ``df.explain('simple')`` output plus a one-line property
annotation. The properties themselves are PINNED in tests/test_plans.py;
this file is the human-readable evidence trail.
"""

from __future__ import annotations

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from oss_data_lake_spark.operators import all_queries  # noqa: E402
from oss_data_lake_spark.plans.audit import explain_str  # noqa: E402
from oss_data_lake_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# query → one-line property annotation (what the plan should show)
CAPTURE: dict[str, str] = {
    "a13_flagship_daily_avg":
        "single-shuffle partial/final aggregate + TakeOrdered",
    "b01_tpch_q1_pricing_summary":
        "scan-heavy multi-aggregate with pruned ReadSchema",
    "b02_topk_revenue_orders":
        "broadcast joins + pushed filters + TakeOrdered",
    "b03_star_join_revenue_by_nation":
        "all four dimensions broadcast (no shuffle joins)",
    "p01_pruned_daily_events":
        "NON-EMPTY PartitionFilters: only 7 of 30 date= dirs opened",
    "p02_pruned_month_lineitem":
        "NON-EMPTY PartitionFilters on the monthly lineitem lake",
    "p03_fileskip_orders_year":
        "manifest-stats file skipping: InMemoryFileIndex lists ONLY the "
        "files whose bounds admit 1997 (4 of 24 at this sf) + exact "
        "residual filter",
    "e32_interval_open_orders":
        "interval sweep: groupBy(day) deltas + calendar-bounded cumulative "
        "window + broadcast point lookup (NO range join / BNLJ)",
    "b38_salted_hot_user_agg":
        "two-phase salted aggregation: partial on (user_id, __salt)",
    "e11_minhash_lsh_pairs":
        "banded LSH self-join + candidate-only verify over cached shingles",
    "e22_ann_ivf_topk":
        "Arrow/BLAS IVF: 2 MapInPandas assigns + cogrouped scoring, 1 Window",
    "e26_ivf_neardup_pairs":
        "IVF-blocked near-dup: MapInPandas + FlatMapGroupsInPandas, no join",
    "e27_binary_quantized_topk":
        "XOR+popcount Hamming prefilter inside the broadcast join condition",
    "e28_pq_topk":
        "PQ ANN: MapInPandas encode -> broadcast ADC lookup join + decimal "
        "fold -> exact rerank join of the 50 survivors only",
    "e30_asof_error_before_purchase":
        "one-shuffle union + keyed window as-of join",
    "e75_decontamination":
        "eval 8-gram set broadcast; corpus side never shuffles pre-agg",
    "m01_merge_upsert_orders":
        "single anti-join MERGE (no cartesian)",
    # round 6 additions
    "p04_sql_fileskip_orders_year":
        "SQL-TEXT skipping: extracted WHERE backs the view with a pruned "
        "scan — InMemoryFileIndex lists only the admitted files, same as "
        "the p03 API path",
    "m04_row_level_dml_orders":
        "post-DML head read: the surviving original files + the two "
        "rewrite dirs, grouped into flat scans (no per-commit union arms)",
    "m05_snapshot_merge_orders":
        "snapshot-native CoW merge head read: one flat scan over the "
        "rewrite output + untouched files",
    # round 7 additions
    "m07_change_feed_orders":
        "change data feed over a merge-on-read wave: per-commit manifest "
        "diffs — tombstone-file semi-joins (the dv IS the delete delta) "
        "+ the appended dirs as inserts, unioned and aggregated; no "
        "full-table diffing anywhere. Round 8: pure-append steps FOLD "
        "into one multi-path scan with a dir->version stamp, so the "
        "plan's arm count tracks DML steps, never history length",
    # round 10 additions
    "b50_recursive_user_tree":
        "native recursive CTE (UnionLoop) over the localCheckpointed "
        "user dimension — the fact table appears ONCE, joined to the "
        "final closure, never inside the loop",
    "e80_semdedup_report":
        "IVF assignment (ArrowEvalPython batch) -> ONE group-by-cluster "
        "exchange -> FlatMapGroupsInPandas sweep (round 11: tiled "
        "blk*blk partials, bounded task memory) -> per-cluster "
        "aggregation; no all-pairs join anywhere",
    "e78_token_budget_mixing":
        "round 11: corpus scanned exactly TWICE — one per-(source,bkt) "
        "aggregate all metadata (totals/grand/budgets/offsets) derives "
        "from via windows over the tiny table, one placement pass with "
        "the metadata broadcast back; document-scale window still "
        "partitioned by (source, bkt)",
    # round 11 additions
    "b52_window_nulls_groups_frames":
        "IGNORE NULLS navigation family over ONE reused "
        "partitionBy(o_custkey) exchange; the GROUPS frame runs as the "
        "dense_rank + RANGE rewrite (Spark has no GROUPS mode)",
    "e83_dsir_resampling":
        "hashed-bucket model fit (one 32-key aggregate, collected as "
        "the fitted model) -> per-doc integer log-weight aggregate -> "
        "fixed-budget selection as TakeOrderedAndProject (distributed "
        "top-K, never a global sort); corpus at exactly 2 FileScans",
    "b53_match_recognize_vshape":
        "restricted MATCH_RECOGNIZE as pure window arithmetic: one "
        "partitionBy(user_id) exchange, then runs/candidates/parity as "
        "stacked Window nodes over shrinking relations — zero Python, "
        "zero joins, no CartesianProduct",
    "e84_semantic_decontamination":
        "train(nprobe=1) UNION eval(nprobe=3) Arrow assignment -> ONE "
        "group-by-cluster exchange -> FlatMapGroupsInPandas tiled "
        "eval x train cosine scan (e80 block bound) -> per-eval "
        "aggregate; no corpus self-join",
    "e86_bpe_encode_report":
        "word-level encode: the trained word-type lookup BROADCAST to "
        "a per-(source, word) aggregate join — zero per-token corpus "
        "work, zero Python; one corpus scan + one BHJ + one aggregate",
    "b55_match_recognize_all_rows":
        "ALL ROWS PER MATCH as an EQUI-join: matches explode into "
        "(k+1) run-id-keyed spans, joined back to the positioned row "
        "layer — no range join, no BroadcastNestedLoopJoin",
    # round 12 additions
    "b56_quantified_comparisons":
        "quantified comparisons Spark-first: each quantifier side "
        "collapses to an aggregate BEFORE meeting the big side — "
        "per-nation max broadcast-joined to supplier (> ALL), one "
        "scalar max cross-joined (< SOME), a broadcast LEFT SEMI "
        "(= ANY); no per-row subquery anywhere",
    "b57_window_frame_exclude":
        "frame EXCLUDE modes as subtraction identities: ONE "
        "partitionBy(o_custkey) exchange, frame and peer-group "
        "aggregates as stacked Window nodes, CASE guards pure "
        "projection — no self-join",
    "e87_bpe_bytelevel_merge_table":
        "byte-level BPE: regex pre-tokenizer + hex-pair byte alphabet "
        "feed the same bounded pre-token-TYPE table loop as e85 — one "
        "corpus scan, then per-round aggregate + 1-row collect + "
        "Catalyst fold, zero Python",
}


def main() -> None:
    spark = get_spark(app_name="capture_plans", cpus="8")
    queries = all_queries()
    out = [
        "# PLANS — captured physical plans for headline queries",
        "",
        "Generated by `python scripts/capture_plans.py` from"
        " `df.explain('simple')` at sf0.01 (AQE enabled; these are the"
        " pre-adaptive plans — AQE further coalesces at runtime). The plan",
        "properties are pinned as regression tests in `tests/test_plans.py`.",
        "",
    ]
    for name, note in CAPTURE.items():
        df = queries[name](spark, SF_DIR)
        txt = explain_str(df, "simple").rstrip()
        out += [f"## {name}", "", f"*{note}*", "", "```", txt, "```", ""]
    (ROOT / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {ROOT / 'PLANS.md'} ({len(CAPTURE)} plans)")


if __name__ == "__main__":
    main()
