"""Plan-shape pins for headline queries: the 100-TB properties (pushdown,
pruning, broadcast, TakeOrdered) must survive refactors."""

from __future__ import annotations

from pyspark.sql import functions as F

from oss_data_lake_spark.operators.relational import (
    star_join_revenue_by_nation,
    topk_revenue_orders,
    tpch_q1_pricing_summary,
)
from oss_data_lake_spark.operators.tier_a import sort_limit_topn
from oss_data_lake_spark.plans.audit import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    scan_read_schema,
)
from oss_data_lake_spark.sources.loaders import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    assert has_pushed_filters(df), explain_str(df)


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not read all 11 lineitem columns."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    schemas = scan_read_schema(df)
    assert schemas and all("l_extendedprice" not in s for s in schemas), schemas


def test_q1_prunes_columns(spark, sf_dir):
    df = tpch_q1_pricing_summary(spark, sf_dir)
    schemas = scan_read_schema(df)
    # 7 needed columns, not all 11 (l_orderkey/partkey/suppkey/linenumber out)
    assert schemas and all("l_orderkey" not in s for s in schemas), schemas


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    df = star_join_revenue_by_nation(spark, sf_dir)
    txt = explain_str(df)
    assert txt.count("BroadcastHashJoin") >= 4, txt
    assert "CartesianProduct" not in txt


def test_q3_broadcasts_customer(spark, sf_dir):
    df = topk_revenue_orders(spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df)  # date + segment filters reach the scans


def test_topn_is_take_ordered_not_global_sort(spark, sf_dir):
    df = sort_limit_topn(spark, sf_dir)
    assert has_take_ordered(df), explain_str(df)


def test_flagship_single_shuffle(spark, sf_dir):
    """Scan → partial agg → exchange → final agg: exactly one shuffle."""
    from oss_data_lake_spark.operators.tier_a import flagship_daily_avg

    df = flagship_daily_avg(spark, sf_dir)
    assert count_exchanges(df) == 1, explain_str(df)


def test_scalable_global_topk_uses_take_ordered(spark, sf_dir):
    """b30 must plan the global top-k as TakeOrderedAndProject, not a
    cluster-wide sort."""
    from oss_data_lake_spark.operators.relational_more import (
        top_suppliers_scalable,
    )

    df = top_suppliers_scalable(spark, sf_dir)
    assert has_take_ordered(df), explain_str(df)


def test_connectors_fallback(spark):
    from oss_data_lake_spark.sources.connectors import preferred_table_format

    assert preferred_table_format(spark) == "parquet"  # none bundled in v1


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join must be a one-shuffle pipeline (union + keyed window),
    never a range-join candidate blowup."""
    from oss_data_lake_spark.operators.asof import asof_error_before_purchase

    df = asof_error_before_purchase(spark, sf_dir)
    # one exchange for the window key; the final orderBy is TakeOrdered-free
    # (global sort) but bounded output — allow <= 2
    assert count_exchanges(df) <= 2, explain_str(df, "simple")
    assert "CartesianProduct" not in explain_str(df)


def test_similarity_fast_path_broadcasts_queries(spark, sf_dir):
    """Brute-force top-k must broadcast the query side — the candidate scan
    must never shuffle on the pair key."""
    from oss_data_lake_spark.operators.similarity import fast_topk_query

    txt = explain_str(fast_topk_query(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastHashJoin" in txt, txt


def test_no_python_udf_in_relational_plans(spark, sf_dir):
    """Hot-path relational queries must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    for fn in (tpch_q1_pricing_summary, star_join_revenue_by_nation):
        txt = explain_str(fn(spark, sf_dir))
        assert "EvalPython" not in txt, txt


def test_ivf_topk_is_blas_blocked(spark, sf_dir):
    """e22's production plan is the Arrow/BLAS shape: two MapInPandas
    assignments (corpus nprobe=1, queries nprobe=3), cogrouped per-cluster
    scoring (FlatMapCoGroupsInPandas), exactly ONE Window (the bounded
    final top-k) and no join — the n×centroids row explosion and per-pair
    Catalyst lambda folds must never materialize."""
    from oss_data_lake_spark.operators.similarity import ivf_topk

    import re

    txt = explain_str(ivf_topk(spark, sf_dir))
    assert txt.count("MapInPandas") >= 2, txt
    assert "FlatMapCoGroupsInPandas" in txt, txt
    n_windows = len(re.findall(r"\bWindow\s*\[", txt))
    assert n_windows <= 1, f"{n_windows} Window nodes:\n{txt}"
    assert "Join" not in txt, txt


def test_ivf_catalyst_assignment_has_no_per_vector_window(spark, sf_dir):
    """The Catalyst oracle-shape twin's centroid assignment must be an
    aggregation (max_by), never a row_number window over the full
    n×centroids candidate set — at most two Window ops (bounded query-probe
    ranking + final top-k)."""
    from oss_data_lake_spark.operators.similarity import ivf_topk_catalyst

    import re

    txt = explain_str(ivf_topk_catalyst(spark, sf_dir))
    n_windows = len(re.findall(r"\bWindow\s*\[", txt))
    assert n_windows <= 2, f"{n_windows} Window nodes:\n{txt}"
    assert "max_by" in txt or "maxby" in txt.lower(), txt


def test_ivf_neardup_is_blocked_not_joined(spark, sf_dir):
    """e26's plan is the IVF-blocked shape: Arrow-batched assignment
    (MapInPandas), ONE group-by-cluster exchange into the blocked verify
    (FlatMapGroupsInPandas), and no pair join of any kind — the n×centroids
    row explosion and the candidate-pair join must never materialize."""
    from oss_data_lake_spark.operators.similarity import ivf_neardup_pairs

    txt = explain_str(ivf_neardup_pairs(spark, sf_dir))
    assert "MapInPandas" in txt, txt
    assert "FlatMapGroupsInPandas" in txt, txt
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
                "ShuffledHashJoin", "BroadcastHashJoin"):
        assert bad not in txt, (bad, txt)
    # the only wide exchanges: cluster blocking + final distinct/sort
    assert txt.count("Exchange hashpartitioning") <= 2, txt


def test_binary_quantized_broadcasts_queries(spark, sf_dir):
    """e27: the query side (signatures + embeddings) broadcasts; candidates
    stream through one codegen'd filter stage — no shuffle before the
    prefilter."""
    from oss_data_lake_spark.operators.similarity import binary_quantized_topk

    df = binary_quantized_topk(spark, sf_dir)
    txt = explain_str(df)
    # non-equi broadcast → BroadcastNestedLoopJoin with the tiny query side
    # built; crucially the Hamming prefilter is INSIDE the join condition
    # (candidates drop before any downstream operator sees them)
    assert "BroadcastNestedLoopJoin" in txt, txt
    assert "bit_count" in txt.split("Join")[1][:400].lower() or "bit_count" in txt, txt
    assert "CartesianProduct" not in txt


def test_merge_upsert_is_single_anti_join(spark, sf_dir):
    """m01's merge plans exactly one anti join (the NOT-MATCHED survivors),
    no cartesian products."""
    from oss_data_lake_spark.operators.upsert import merge_upsert_orders

    txt = explain_str(merge_upsert_orders(spark, sf_dir), mode="simple")
    assert txt.count("LeftAnti") == 1, txt
    assert "CartesianProduct" not in txt


def test_dedup_queries_share_cached_shingle_table(spark, sf_dir):
    """e11's plan substitutes the cached array-level shingle table
    (InMemoryRelation) for every shingle reference — signatures and both
    verify sides read one materialization instead of re-splitting the
    corpus; e12 picks up the SAME cache by plan equality."""
    from oss_data_lake_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        minhash_dedup_pairs,
        shingle_jaccard_pairs,
    )
    from oss_data_lake_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    e11 = explain_str(minhash_dedup_pairs(docs, JACCARD_THRESHOLD))
    assert "InMemoryTableScan" in e11 or "InMemoryRelation" in e11, e11
    e12 = explain_str(shingle_jaccard_pairs(docs, JACCARD_THRESHOLD))
    assert "InMemoryTableScan" in e12 or "InMemoryRelation" in e12, e12


def test_partition_pruning_events(spark, sf_dir):
    """p01's week filter must reach the FILE INDEX as a PartitionFilter
    (directories outside the range never opened — the behavior the
    reference's day(ts) layout exists for), with column pruning intact
    inside the touched partitions."""
    from oss_data_lake_spark.operators.lake import pruned_daily_events
    from oss_data_lake_spark.plans.audit import partition_filters

    df = pruned_daily_events(spark, sf_dir)
    pf = partition_filters(df)
    assert pf and any("2024-01-08" in f and "2024-01-14" in f for f in pf), (
        pf or explain_str(df)
    )
    schemas = scan_read_schema(df)
    assert schemas and all("props" not in s for s in schemas), schemas


def test_partition_pruning_lineitem(spark, sf_dir):
    """p02's ship-month range is a partition filter on the monthly lake."""
    from oss_data_lake_spark.operators.lake import pruned_month_lineitem
    from oss_data_lake_spark.plans.audit import partition_filters

    df = pruned_month_lineitem(spark, sf_dir)
    pf = partition_filters(df)
    assert pf and any("1995-03" in f and "1995-06" in f for f in pf), (
        pf or explain_str(df)
    )


def test_salted_agg_has_salt_stage(spark, sf_dir):
    """b38's plan must really aggregate on (user_id, __salt) first — two
    exchange stages (partial-on-salted-key, final-on-key) instead of the
    direct form's one."""
    from oss_data_lake_spark.operators.relational_more import (
        salted_hot_user_agg,
    )

    df = salted_hot_user_agg(spark, sf_dir)
    txt = explain_str(df)
    assert "__salt" in txt, txt
    assert count_exchanges(df) >= 2, explain_str(df, "simple")


def test_p03_filescan_lists_only_admitted_files(spark, sf_dir):
    """The file-skipping scan's FileScan must enumerate a strict SUBSET of
    the clustered table's files — the prune is visible in the plan's
    InMemoryFileIndex, not just in our python-side accounting."""
    import re

    from oss_data_lake_spark.operators.lake import (
        ORDERS_DATE_HI,
        ORDERS_DATE_LO,
        orders_clustered,
        skipping_orders_year,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    table = orders_clustered(spark, sf_dir)
    _sel, n_sel, n_skip = table.plan_range_scan(
        "o_orderdate", ORDERS_DATE_LO, ORDERS_DATE_HI
    )
    assert n_skip > 0
    txt = explain_str(skipping_orders_year(spark, sf_dir), "simple")
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", txt)
    assert m, "expected an explicit file-list scan in the plan"
    assert int(m.group(1)) == n_sel
    assert n_sel < n_sel + n_skip


def test_e32_sweep_plan_has_no_nested_loop_join(spark, sf_dir):
    """The interval sweep must never degenerate into the BNLJ range join
    it exists to replace; its point lookup is a broadcast hash join."""
    from oss_data_lake_spark.operators.asof import interval_open_orders
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(interval_open_orders(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastHashJoin" in txt


def test_p04_sql_scan_lists_only_admitted_files(spark, sf_dir):
    """The SQL-TEXT skipping path (p04): the plan of a plain SELECT over
    the registered snapshot table must enumerate exactly the files the
    multi-predicate prune admits — proof the WHERE was extracted and
    routed through read_pruned, not just that results match."""
    import re

    from oss_data_lake_spark.operators.lake import (
        ORDERS_DATE_HI,
        ORDERS_DATE_LO,
        orders_clustered,
        sql_fileskip_orders_year,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    table = orders_clustered(spark, sf_dir)
    _sel, n_sel, n_skip = table.plan_pruned(
        [("o_orderdate", f"{ORDERS_DATE_LO} 00:00:00",
          f"{ORDERS_DATE_HI} 00:00:00")]
    )
    assert n_skip > 0
    txt = explain_str(sql_fileskip_orders_year(spark, sf_dir), "simple")
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", txt)
    assert m, "expected an explicit file-list scan in the plan"
    assert int(m.group(1)) == n_sel


def test_b50_recursion_scans_fact_once_outside_the_loop(spark, sf_dir):
    """b50 (recursive CTE): the 100-TB contract is that the FACT table
    appears exactly once — joined to the final closure — never inside
    the UnionLoop (which would rescan it per depth level). The user
    dimension feeding the loop is materialized once (eager
    localCheckpoint) before the recursion starts."""
    from oss_data_lake_spark.operators.relational_more import (
        recursive_user_tree,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(recursive_user_tree(spark, sf_dir), "simple")
    assert "UnionLoop" in txt  # native recursion, not driver iteration
    # the loop's recursive term joins the MATERIALIZED dimension — a
    # localCheckpoint (round-11: was cache(); checkpoint blocks are
    # ContextCleaner-released, a CacheManager entry is not), so it
    # appears as a lineage-truncated scan, never a per-level recompute
    assert "LogicalRDD" in txt and "UnionLoopRef" in txt
    # the FACT payload (value column) is scanned in exactly ONE node —
    # the closure join outside the loop
    fact_scans = [
        ln for ln in txt.splitlines()
        if "FileScan parquet" in ln and "value" in ln
    ]
    assert len(fact_scans) == 1, fact_scans


def test_e80_semdedup_single_cluster_exchange_no_all_pairs(spark, sf_dir):
    """e80 (SemDeDup): the sweep runs as FlatMapGroupsInPandas behind
    ONE group-by-cluster exchange; no join of the corpus against itself
    (no SortMergeJoin/BroadcastNestedLoopJoin/CartesianProduct over
    embeddings) anywhere in the plan."""
    from oss_data_lake_spark.operators.similarity import semdedup_report
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(semdedup_report(spark, sf_dir), "simple")
    assert "FlatMapGroupsInPandas" in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "SortMergeJoin" not in txt


def test_b51_lateral_decorrelates_to_ranked_join(spark, sf_dir):
    """b51 (LATERAL + correlated LIMIT): Catalyst must de-correlate to a
    window-ranked join — row_number over the join key, filter rn <= 2,
    one equi-join — never a per-row nested-loop re-execution of the
    inner query (the naive lateral plan that dies at 100 TB)."""
    from oss_data_lake_spark.operators.relational_more import (
        lateral_topn_lineitems,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(lateral_topn_lineitems(spark, sf_dir), "simple")
    assert "row_number()" in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastHashJoin" in txt or "SortMergeJoin" in txt


def test_e84_semdecon_grouped_scan_no_all_pairs(spark, sf_dir):
    """e84 (semantic decontamination): the eval-vs-train scan runs as
    FlatMapGroupsInPandas behind ONE group-by-cluster exchange over the
    train(nprobe=1) UNION eval(nprobe=3) assignment; no join of the
    corpus against itself (no SortMergeJoin / BroadcastNestedLoopJoin /
    CartesianProduct over embeddings) anywhere in the plan."""
    from oss_data_lake_spark.operators.similarity import (
        semantic_decontamination,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(semantic_decontamination(spark, sf_dir), "simple")
    assert "FlatMapGroupsInPandas" in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "SortMergeJoin" not in txt
    # exactly one grouping exchange feeds the pandas scan: hashpartitioning
    # on cluster appears, and nothing shuffles the raw corpus twice
    assert txt.count("FlatMapGroupsInPandas") == 1


def test_b56_quantified_sides_are_aggregates_then_broadcast(spark, sf_dir):
    """b56 (quantified comparisons): every quantifier side collapses to
    an aggregate BEFORE meeting the big side — per-nation max broadcast
    to supplier, one scalar max, a broadcast LEFT SEMI — never a per-row
    subquery, never a nested loop over data tables.

    (The plan DOES contain one BroadcastNestedLoopJoin: the final
    combine of the three 1-row aggregate results — a 1×1×1 cross join,
    size-independent by construction.)"""
    from oss_data_lake_spark.operators.relational_more import (
        quantified_comparisons,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(quantified_comparisons(spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt
    assert txt.count("LeftSemi") == 1
    assert "BroadcastHashJoin" in txt  # the per-nation max side


def test_b57_exclude_is_single_exchange_windows(spark, sf_dir):
    """b57 (frame EXCLUDE): all four window aggregates (frame/peer ×
    sum/count) ride ONE hashpartitioning(o_custkey) exchange; the
    EXCLUDE arithmetic is pure projection — no join anywhere."""
    from oss_data_lake_spark.operators.relational_more import (
        window_frame_exclude,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(window_frame_exclude(spark, sf_dir), "simple")
    assert txt.count("hashpartitioning(o_custkey") == 1
    for tok in ("Join", "CartesianProduct"):
        assert tok not in txt


def test_b59_dialect_stays_jvm_side_with_pruned_scan(spark, sf_dir):
    """b59 (Trino dialect): every translated function (timestampdiff/
    timestampadd/locate/date_format/convert_timezone) evaluates inside
    the JVM aggregate — ZERO Python nodes — and the scan is pruned to
    exactly the two referenced columns. Spark plans the mixed
    distinct+plain aggregate as its standard distinct-split (two pruned
    scan subtrees); no joins, no Python, no full-width read."""
    from oss_data_lake_spark.operators.relational_more import (
        trino_dialect_funcs,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(trino_dialect_funcs(spark, sf_dir), "simple")
    assert "Python" not in txt and "BatchEval" not in txt
    assert "Join" not in txt and "CartesianProduct" not in txt
    # column pruning survives the dialect translation: only ts +
    # event_type reach the parquet reader
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        assert cols == {"ts", "event_type"}, cols
    assert "ReadSchema" in txt


def test_e92_pipeline_composes_without_corpus_squared_joins(spark, sf_dir):
    """e92 (corpus pipeline): the composition must inherit its members'
    scale contracts — MinHash verifies candidate pairs only and SemDeDup
    sweeps cluster blocks, so the composed plan may contain NO
    cartesian/nested-loop join over data tables and NO sort-merge join
    of the corpus against itself; the embedding sweep stays the single
    grouped FlatMapGroupsInPandas per stage."""
    from oss_data_lake_spark.operators.pipeline import (
        corpus_pipeline_report,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(corpus_pipeline_report(spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_b61_unnest_explodes_inside_codegen_aggregates_before_join(
    spark, sf_dir
):
    """b61 (UNNEST translator): the LATERAL rewrite must plan as native
    Generate (explode/posexplode) nodes inside whole-stage codegen — no
    Python, no nested-loop/cartesian join carrying exploded rows — and
    both legs aggregate BEFORE the tiny label-grain join, so every
    exchange moves already-aggregated rows, never the expansion."""
    from oss_data_lake_spark.operators.relational_more import (
        unnest_lateral,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(unnest_lateral(spark, sf_dir), "simple")
    assert "Generate" in txt  # explode/posexplode planned natively
    assert "Python" not in txt and "BatchEval" not in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    # the expansion is pre-aggregated: every Generate sits BELOW the
    # first aggregate, so no join input is an exploded row stream
    first_join = txt.find("Join")
    assert first_join != -1
    assert txt.rfind("Generate") > first_join  # deeper in the tree =
    # later in the printed plan: both Generates print under the join's
    # aggregated children


def test_e93_line_dedup_no_pairwise_joins(spark, sf_dir):
    """e93 (line-frequency dedup): the frequency rule must plan as a
    line-keyed aggregate + ONE equi-join back — no cartesian/nested-
    loop join, no Python; the window derivation is pure Catalyst
    (transform/sequence/slice inside codegen)."""
    from oss_data_lake_spark.operators.dedup import line_dedup_report
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(line_dedup_report(spark, sf_dir), "simple")
    assert "Python" not in txt and "BatchEval" not in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "Generate" in txt  # the explode is a native Generate
