"""Library-level EXT operator tests (beyond the driver's oracle checks):
fast paths pinned to exact paths, probabilistic recall floors, plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oss_data_lake_spark.operators.asof import asof_join
from oss_data_lake_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_jaccard_pairs,
    simhash,
)
from oss_data_lake_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
)
from oss_data_lake_spark.operators.similarity import (
    brute_force_topk,
    exact_topk,
    fast_topk_query,
)
from oss_data_lake_spark.operators.windows import sessionize
from oss_data_lake_spark.sources.loaders import load_table


def test_fast_topk_matches_exact(spark, sf_dir):
    """The production cosine path must agree with the oracle-checked exact
    path: identical neighbor sets and |cosine delta| < 1e-6."""
    exact = {
        (r.q_id, r.rank): (r.c_id, r.cosine)
        for r in exact_topk(spark, sf_dir).collect()
    }
    fast = {
        (r.q_id, r.rank): (r.c_id, r.cosine)
        for r in fast_topk_query(spark, sf_dir).collect()
    }
    assert exact.keys() == fast.keys()
    for key, (c_exact, cos_exact) in exact.items():
        c_fast, cos_fast = fast[key]
        assert c_exact == c_fast, f"neighbor mismatch at {key}"
        assert abs(cos_exact - cos_fast) < 1e-6


def test_lsh_candidates_cover_true_pairs(spark, sf_dir):
    """MinHash-LSH recall floor: candidates must cover every true near-dup
    pair at the verification threshold (aggressive 32x2 banding)."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in shingle_jaccard_pairs(docs, JACCARD_THRESHOLD).collect()
    }
    cands = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert truth, "fixture should contain planted near-dup pairs"
    missed = truth - cands
    assert not missed, f"LSH missed true pairs: {missed}"


def test_df_cap_fires_and_capped_lsh_equals_capped_truth(spark, sf_correct):
    """The document-frequency cap (e11/e12 production semantics) must
    actually remove shingles on the sf0.01 fixture, and the capped LSH
    output must equal the capped exhaustive truth (recall contract)."""
    from oss_data_lake_spark.operators.dedup import (
        DF_CAP_FRAC,
        doc_shingle_sets,
        doc_shingle_sets_capped,
        minhash_dedup_pairs,
    )

    docs = load_table(spark, sf_correct, "documents")
    n_uncapped = doc_shingle_sets(docs).select(
        F.sum(F.size("shset"))
    ).first()[0]
    n_capped = doc_shingle_sets_capped(docs).select(
        F.sum(F.size("shset"))
    ).first()[0]
    assert n_capped < n_uncapped, "cap removed nothing at sf0.01"

    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in shingle_jaccard_pairs(
            docs, JACCARD_THRESHOLD, df_cap_frac=DF_CAP_FRAC
        ).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_dedup_pairs(
            docs, JACCARD_THRESHOLD, df_cap_frac=DF_CAP_FRAC
        ).collect()
    }
    assert truth, "capped fixture should still contain near-dup pairs"
    assert lsh == truth


def test_exact_dedup_keeps_min_representative(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "z")], "id long, t string"
    )
    out = exact_dedup(df, ["t"], "id").orderBy("id").collect()
    assert [(r.id, r.t) for r in out] == [(1, "x"), (3, "y"), (5, "z")]


def test_exact_dedup_single_rep_on_order_ties(spark):
    """Rows tied at the minimum order value must still yield exactly one
    representative per key (chosen deterministically by the other columns)."""
    df = spark.createDataFrame(
        [(1, "x", "b"), (1, "x", "a"), (1, "x", "a"), (2, "y", "c")],
        "id long, t string, payload string",
    )
    out = exact_dedup(df, ["t"], "id").orderBy("t").collect()
    assert [(r.id, r.t, r.payload) for r in out] == [(1, "x", "a"), (2, "y", "c")]


def test_simhash_deterministic_and_self_similar(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    b = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert a == b  # stable across runs (seeded murmur3)
    assert len(set(a.values())) > 1  # not degenerate


def test_asof_join_matches_naive(spark, sf_dir):
    """Window-based as-of join vs a driver-side naive reference on sf0.001."""
    events = load_table(spark, sf_dir, "events")
    probe = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    build = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value", "event_id"
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(probe, build, "user_id", "ts", "value").collect()
    }
    builds = sorted(
        build.collect(), key=lambda r: (r.ts, r.event_id)
    )
    for p in probe.collect():
        prior = [b for b in builds if b.user_id == p.user_id and b.ts <= p.ts]
        want = prior[-1].value if prior else None
        assert got[p.event_id] == want, f"event {p.event_id}"


def test_asof_pandas_matches_window(spark, sf_dir):
    """applyInPandas (merge_asof) as-of twin == JVM window formulation."""
    from oss_data_lake_spark.operators.asof import asof_join_pandas

    events = load_table(spark, sf_dir, "events")
    probe = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    build = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value", "event_id"
    )
    window_res = {
        r.event_id: r.asof_value
        for r in asof_join(probe, build, "user_id", "ts", "value").collect()
    }
    pandas_res = {
        r.event_id: r.asof_value
        for r in asof_join_pandas(probe, build, "user_id", "ts", "value").collect()
    }
    assert window_res == pandas_res


def test_sessionize_counts(spark):
    rows = [
        # user 1: two sessions (gap 2h between event 2 and 3)
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:10:00"),
        (3, 1, "2024-01-01 02:30:00"),
        # user 2: one session
        (4, 2, "2024-01-01 05:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = sessionize(df)
    sess = {r.event_id: r.session_id for r in out.collect()}
    assert sess[1] == sess[2] != sess[3]
    assert sess[4] == 0


def test_multimodal_decode_plumbing(spark, sf_dir):
    """Binary → mapInPandas decode path with the deterministic fake codec."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = documents_as_media(docs)
    feats = decode_media(media).collect()
    assert len(feats) == 20
    by_id = {r.doc_id: r for r in feats}
    for r in docs.select("doc_id", "text").collect():
        f = by_id[r.doc_id]
        assert f.n_bytes == len(r.text.encode("utf-8"))
        assert f.feat_dim == 64
        assert f.feat_mean == sum(r.text.encode("utf-8")[:64]) / min(f.n_bytes, 64)


def test_multimodal_strict_decoder_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = documents_as_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(media, decoder="strict").collect()


def test_ivf_recall_floor(spark, sf_dir):
    """Multi-probe IVF must beat a recall floor vs brute force (synthetic
    near-random vectors cluster poorly — 50% at nprobe=3 is the honest bar;
    real embedding manifolds do far better)."""
    from oss_data_lake_spark.operators.similarity import ivf_topk

    bf = {(r.q_id, r.c_id) for r in exact_topk(spark, sf_dir).collect()}
    ivf = {(r.q_id, r.c_id) for r in ivf_topk(spark, sf_dir, nprobe=3).collect()}
    assert len(ivf & bf) / len(bf) >= 0.5


def test_ivf_blas_equals_catalyst_form(spark, sf_dir):
    """The BLAS production path (e22) and the Catalyst oracle-shape twin
    must produce IDENTICAL rows — same assignment, same probes, same
    rounded cosines, same tiebreaks."""
    from oss_data_lake_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_catalyst,
    )

    blas = {tuple(r) for r in ivf_topk(spark, sf_dir).collect()}
    cat = {tuple(r) for r in ivf_topk_catalyst(spark, sf_dir).collect()}
    assert blas == cat


def test_clean_corpus_operator_consistent_with_report(spark, sf_dir):
    """The production cleaning operator (LSH path) must keep exactly the
    survivors the oracle-checked report counts."""
    from oss_data_lake_spark.operators.pipeline import (
        clean_corpus,
        clean_corpus_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    survivors = clean_corpus(docs)
    want = sum(
        r.n_survivors for r in clean_corpus_report(spark, sf_dir).collect()
    )
    assert survivors.count() == want
    # survivors still carry full document schema
    assert set(docs.columns) <= set(survivors.columns)


def test_brute_force_topk_excludes_self(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(emb, queries, k=3).collect()
    assert all(r.q_id != r.c_id for r in out)
    assert len(out) == 9


def test_ivf_neardup_containment_and_recall(spark, sf_dir):
    """e26 (IVF-bucketed blocking) vs e25 (all-pairs truth): bucketed output
    must be a SUBSET of the truth (verification prunes every false
    candidate), and recall on the fixture must clear a floor — the blocking
    tradeoff is bounded, not silent."""
    from oss_data_lake_spark.operators.similarity import (
        embedding_neardup_pairs,
        ivf_neardup_pairs,
    )

    truth = {(r.vec_a, r.vec_b): r.cosine
             for r in embedding_neardup_pairs(spark, sf_dir).collect()}
    blocked = {(r.vec_a, r.vec_b): r.cosine
               for r in ivf_neardup_pairs(spark, sf_dir).collect()}
    assert set(blocked) <= set(truth), "bucketed emitted a non-true pair"
    for k, v in blocked.items():
        assert v == truth[k]  # identical rounded cosines
    recall = len(blocked) / len(truth) if truth else 1.0
    assert recall >= 0.6, f"IVF blocking recall {recall:.2f} below floor"


def test_binary_quantized_topk_recall(spark, sf_dir):
    """e27 (sign-bit quantization + Hamming prefilter + exact rerank) must
    keep most of the unquantized top-k at the default threshold, and every
    returned cosine must equal the unquantized value (rerank is exact)."""
    from pyspark.sql import functions as F

    from oss_data_lake_spark.operators.similarity import (
        N_QUERIES,
        binary_quantized_topk,
        brute_force_topk,
    )
    from oss_data_lake_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bf = {(r.q_id, r.c_id): r.cosine
          for r in brute_force_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES)).collect()}
    bq = {(r.q_id, r.c_id): r.cosine
          for r in binary_quantized_topk(spark, sf_dir).collect()}
    hits = set(bq) & set(bf)
    assert len(hits) / len(bf) >= 0.6, f"recall {len(hits)/len(bf):.2f}"
    for k in hits:
        assert bq[k] == bf[k]  # exact rerank: identical rounded cosines


def test_gopher_quality_rules_consistent(spark, sf_dir):
    """e44: per-source failure counts are internally consistent (pass +
    at-least-one-fail == docs) and each rule matches a hand check on a
    crafted corpus with known violations."""
    from oss_data_lake_spark.operators.text import gopher_quality_report

    rep = gopher_quality_report(spark, sf_dir).collect()
    assert rep, "empty report"
    for r in rep:
        for c in ("n_fail_wordcount", "n_fail_meanlen", "n_fail_symbols",
                  "n_fail_alpha", "n_fail_stopwords", "n_fail_topuni",
                  "n_fail_duplines"):
            assert 0 <= r[c] <= r.n_docs
        assert 0 <= r.n_pass <= r.n_docs
        # a doc passing all rules is not counted in any failure bucket
        assert r.n_pass + max(r.n_fail_wordcount, r.n_fail_meanlen,
                              r.n_fail_symbols, r.n_fail_alpha,
                              r.n_fail_stopwords, r.n_fail_topuni,
                              r.n_fail_duplines) <= r.n_docs


def test_gopher_rules_fire_on_crafted_docs(spark, tmp_path):
    """Each Gopher rule trips on a document built to violate it and only
    it (word-count and stopword side effects controlled)."""
    import os

    from oss_data_lake_spark.operators.text import gopher_quality_report

    # passes everything: in-bounds length, diverse vocab, stopwords present
    base = "the a and of to " + " ".join(f"word{i}" for i in range(20))
    docs = [
        (0, "ok", base),
        (1, "short", "the a of"),                          # wordcount
        (2, "symbols", "the a and of to " + "# " * 24),    # symbol ratio (+meanlen)
        (3, "repeat", "the a and of to " + "spam " * 40),  # top-unigram
        (4, "nostop", ("xx " * 30).strip()),               # stopwords
        (5, "duplines", "the a and of to x\n" + "same line\n" * 20 + "y"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [(i, s, t, "en", len(t)) for i, s, t in docs],
        "doc_id long, source string, text string, lang string, n_chars long",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    rows = {r.source: r for r in gopher_quality_report(spark, sf).collect()}
    assert rows["ok"].n_pass == 1
    assert rows["short"].n_fail_wordcount == 1
    assert rows["symbols"].n_fail_symbols == 1
    assert rows["repeat"].n_fail_topuni == 1
    assert rows["nostop"].n_fail_stopwords == 1
    assert rows["duplines"].n_fail_duplines == 1


def test_pii_redaction_scrubs_exactly(spark):
    """The e74 scrub chain removes every seeded email/phone and nothing
    else — checked on literal strings, not just counts."""
    from oss_data_lake_spark.operators.pipeline import EMAIL_RE, PHONE_RE

    df = spark.createDataFrame(
        [
            ("mail me at a.b+c%d@sub.example.org thanks",
             "mail me at <EMAIL> thanks"),
            ("two: x@y.io and z9@q-r.co end", "two: <EMAIL> and <EMAIL> end"),
            ("call 555-0199 or 800-1234 now", "call <PHONE> or <PHONE> now"),
            ("no pii here 12-34 a@b", "no pii here 12-34 a@b"),
        ],
        "text string, expected string",
    )
    got = df.select(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ).alias("got"),
        "expected",
    ).collect()
    for r in got:
        assert r.got == r.expected, (r.got, r.expected)


def test_gapfill_daily_forward_fills_holes(spark, tmp_path):
    """e31 on a crafted series: day-level collapse takes the latest event
    (event_id tiebreak), holes carry the previous value forward, and the
    filled sum reflects the carried values."""
    import os

    from oss_data_lake_spark.operators.windows import gapfill_daily

    rows = [
        # user 1: events on Jan 1 (two — later ts wins) and Jan 4 → 4 days,
        # Jan 2+3 filled with 20.0; sum = 20+20+20+5
        (1, 1, "2024-01-01 09:00:00", "purchase", 10.0),
        (2, 1, "2024-01-01 18:00:00", "purchase", 20.0),
        (3, 1, "2024-01-04 12:00:00", "purchase", 5.0),
        # user 2: single day
        (4, 2, "2024-01-02 00:00:00", "purchase", 7.0),
        # non-purchase noise must be ignored
        (5, 1, "2024-01-02 10:00:00", "click", 99.0),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
        F.lit("{}").alias("props"),
    )
    df.write.parquet(os.path.join(sf, "events.parquet"))
    out = {r.user_id: r for r in gapfill_daily(spark, sf).collect()}
    u1, u2 = out[1], out[2]
    assert (u1.n_days, u1.n_event_days, u1.n_gap_days) == (4, 2, 2)
    assert u1.sum_filled == 20.0 + 20.0 + 20.0 + 5.0
    assert (u2.n_days, u2.n_event_days, u2.n_gap_days) == (1, 1, 0)
    assert u2.sum_filled == 7.0


def test_connected_components_transitive_closure(spark):
    """Chain a-b-c plus isolated pair d-e: components must close
    transitively (a,b,c share one cluster labeled by the min vertex)."""
    from oss_data_lake_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_connected_components_path_graph_logn_rounds(spark):
    """Adversarial DEEP component: a 64-vertex path 0-1-2-...-63. Min-label
    propagation needs diameter (63) rounds — it would blow the 25-round
    cap. The large-star/small-star engine must converge in O(log n)
    rounds (pinned: ≤ 2·log2(64) + 2 = 14) and still label the whole path
    as ONE cluster rooted at vertex 0."""
    from oss_data_lake_spark.operators.dedup import (
        connected_components_with_rounds,
    )

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels, rounds = connected_components_with_rounds(edges)
    assert rounds <= 14, f"path graph took {rounds} rounds (want O(log n))"
    got = {(r.doc_id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}


def _union_find_clusters(edge_list):
    """Driver-side union-find truth for CC tests."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every vertex → its component's min vertex
    return {v: find(v) for v in parent}


def test_connected_components_random_graph_vs_union_find(spark):
    """Star-alternation vs a driver-side union-find truth AND the retired
    min-label engine, on a seeded random graph with mixed shapes (chains,
    triangles, stars, isolated pairs, self-loops)."""
    import random

    from oss_data_lake_spark.operators.dedup import (
        _connected_components_minlabel,
        connected_components,
    )

    rng = random.Random(1234)
    edge_list = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ] + [(500, 500), (601, 602)]  # self-loop + far island
    edges = spark.createDataFrame(edge_list, "doc_a long, doc_b long")
    truth = _union_find_clusters(edge_list)
    star = {
        r.doc_id: r.cluster_id for r in connected_components(edges).collect()
    }
    assert star == truth
    minlabel = {
        r.doc_id: r.cluster_id
        for r in _connected_components_minlabel(edges).collect()
    }
    assert minlabel == truth


def test_neardup_clusters_cover_all_paired_docs(spark, sf_correct):
    """Every doc in a verified near-dup pair lands in exactly one cluster;
    the cluster id is the min member (the surviving representative)."""
    from oss_data_lake_spark.operators.dedup import (
        DF_CAP_FRAC,
        minhash_dedup_pairs,
        neardup_clusters_query,
    )

    docs = load_table(spark, sf_correct, "documents")
    pairs = minhash_dedup_pairs(
        docs, JACCARD_THRESHOLD, df_cap_frac=DF_CAP_FRAC
    ).collect()
    paired = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    clusters = neardup_clusters_query(spark, sf_correct).collect()
    assert {r.doc_id for r in clusters} == paired
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert all(
            r.n_members == len(members)
            for r in clusters
            if r.cluster_id == cid
        )


def test_decontamination_flags_only_true_leaks(spark, sf_correct):
    """At the 8-gram grain only the eval holdout's near-dup copies are
    contaminated (3-grams would flag hundreds of idiom matches — pinned
    in the operator's docstring)."""
    from oss_data_lake_spark.operators.pipeline import decontamination_report

    rep = decontamination_report(spark, sf_correct).collect()
    total = sum(r.n_contaminated for r in rep)
    assert 0 < total <= 5
    # contaminated docs share MANY 8-grams (copied text), not one or two
    assert max(r.max_shared for r in rep) > 20


def test_interval_sweep_matches_naive_range_join(spark):
    """The e32 sweep (delta decomposition + cumulative calendar) must agree
    with the naive range join it replaces — crafted case covering nested,
    disjoint, single-day, and point-outside-span shapes."""
    import datetime as dt

    from oss_data_lake_spark.operators.asof import interval_open_count

    D = dt.date
    intervals = spark.createDataFrame(
        [
            (D(2024, 1, 1), D(2024, 1, 10)),   # long
            (D(2024, 1, 3), D(2024, 1, 5)),    # nested
            (D(2024, 1, 5), D(2024, 1, 5)),    # single day
            (D(2024, 2, 1), D(2024, 2, 2)),    # disjoint later
        ],
        "start_d date, end_d date",
    )
    points = spark.createDataFrame(
        [(D(2024, 1, 1),), (D(2024, 1, 4),), (D(2024, 1, 5),),
         (D(2024, 1, 11),), (D(2024, 2, 2),), (D(2023, 12, 1),),
         (D(2024, 3, 1),)],
        "p date",
    )
    swept = {
        (r["p"], r["open_cnt"])
        for r in interval_open_count(
            points, intervals, "p", "start_d", "end_d"
        ).collect()
    }
    naive_rows = points.join(
        intervals,
        (F.col("p") >= F.col("start_d")) & (F.col("p") <= F.col("end_d")),
        "left",
    ).groupBy("p").agg(
        F.count("start_d").cast("long").alias("open_cnt")
    ).collect()
    naive = {(r["p"], r["open_cnt"]) for r in naive_rows}
    assert swept == naive
    assert (D(2024, 1, 4), 2) in swept and (D(2023, 12, 1), 0) in swept


def test_pq_topk_recall_and_exact_rerank(spark, sf_dir):
    """e28 (PQ codes + ADC + exact rerank): the returned neighbors must
    keep a meaningful share of the exact top-k, every returned cosine must
    equal the unquantized value (the rerank is exact), and the code table
    must be the compressed artifact PQ promises (M codes in [0, K))."""
    from pyspark.sql import functions as F

    from oss_data_lake_spark.operators.similarity import (
        N_QUERIES,
        PQ_K,
        PQ_M,
        _pq_codebook,
        _pq_encode,
        brute_force_topk,
        pq_topk,
    )
    from oss_data_lake_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bf = {
        (r.q_id, r.c_id): r.cosine
        for r in brute_force_topk(
            emb, emb.filter(F.col("vec_id") < N_QUERIES)
        ).collect()
    }
    pq = {(r.q_id, r.c_id): r.cosine for r in pq_topk(spark, sf_dir).collect()}
    hits = set(pq) & set(bf)
    # floor RAISED 0.4 -> 0.5 with the round-6 k-means-trained codebook
    # (measured 0.58 at sf0.001, 0.68 at sf0.01; the stride sample alone
    # sat at the old bar)
    assert len(hits) / len(bf) >= 0.5, f"recall {len(hits)/len(bf):.2f}"
    for key in hits:
        assert pq[key] == bf[key], f"rerank not exact at {key}"

    codes = _pq_encode(emb, _pq_codebook(emb)).collect()
    assert len(codes) == emb.count()
    for r in codes[:50]:
        assert len(r["codes"]) == PQ_M
        assert all(0 <= c < PQ_K for c in r["codes"])


def test_pq_lloyd_training_reduces_distortion(spark, sf_dir):
    """k-means' own objective: the trained codebook's total quantization
    error (sum over vectors and subspaces of the assigned centroid's
    squared distance) must not exceed the stride-sample seed's — Lloyd
    iterations are monotonically non-increasing in distortion, and on
    real data strictly better."""
    import numpy as np

    from pyspark.sql import functions as F

    from oss_data_lake_spark.operators.similarity import (
        IVF_CENTROID_STRIDE,
        PQ_K,
        PQ_M,
        PQ_SUB,
        _pq_codebook,
    )
    from oss_data_lake_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.filter(F.col("vec_id") % IVF_CENTROID_STRIDE == 0)
        .select("vec_id", "embedding").orderBy("vec_id").limit(PQ_K).collect()
    )
    seed = [[float(x) for x in r["embedding"]] for r in seed_rows]
    trained = _pq_codebook(emb)
    assert trained != seed, "training must move the centroids"

    E = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in emb.select("embedding").collect()]
    )

    def distortion(cb):
        C = np.asarray(cb, dtype=np.float64)
        total = 0.0
        for m in range(PQ_M):
            sl = slice(m * PQ_SUB, (m + 1) * PQ_SUB)
            d2 = ((E[:, None, sl] - C[None, :, sl]) ** 2).sum(axis=2)
            total += d2.min(axis=1).sum()
        return total

    d_seed, d_trained = distortion(seed), distortion(trained)
    assert d_trained < d_seed, (
        f"trained distortion {d_trained:.3f} not below seed {d_seed:.3f}"
    )


def test_pq_codebook_cache_equals_retrain(spark, sf_dir, tmp_path, monkeypatch):
    """Train-once cache: the persisted codebook must be bit-identical to
    a fresh training run (training is deterministic), and a stale stamp
    must retrain instead of serving the old model."""
    import json
    import os

    from oss_data_lake_spark.operators.similarity import _pq_codebook
    from oss_data_lake_spark.sources.loaders import load_table

    monkeypatch.setenv("SPARK_GRAFT_LAKE_DIR", str(tmp_path / "lake"))
    emb = load_table(spark, sf_dir, "embeddings")
    first = _pq_codebook(emb, sf_dir)   # trains + persists
    sf = os.path.basename(os.path.normpath(sf_dir))
    cache = tmp_path / "lake" / sf / "pq_codebook.json"
    assert cache.exists()
    cached = _pq_codebook(emb, sf_dir)  # served from disk
    retrained = _pq_codebook(emb)       # no cache path
    assert first == cached == retrained
    # corrupt the stamp: must retrain (and re-persist), not serve stale
    doc = json.loads(cache.read_text())
    doc["stamp"] = "stale"
    doc["codebook"] = [[0.0] * 64 for _ in doc["codebook"]]
    cache.write_text(json.dumps(doc))
    again = _pq_codebook(emb, sf_dir)
    assert again == retrained


def test_e78_prefix_sum_window_is_bucket_partitioned(spark, sf_dir):
    """Round-10 scale pin (the round-9 verdict's one named scale
    defect): e78's survivorship running total must NEVER run a window
    partitioned by source alone — domain count does not grow with data,
    so that sort puts a whole domain in one task at 100 TB. The
    two-level prefix sum's BIG window (the one whose input is document-
    scale, ordered by rnd) must be partitioned by (source, bkt); the
    only source-alone window allowed is the offsets window over the
    (domains x 4096 buckets) metadata-scale table, whose order key is
    bkt, not rnd."""
    import re

    from oss_data_lake_spark.operators.pipeline import (
        token_budget_mixing_report,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    txt = explain_str(token_budget_mixing_report(spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", txt)
    assert specs, "no window in the e78 plan?"
    for spec in specs:
        head = spec.split(",")[:2]
        if "rnd" in spec:
            # the document-scale running total: bucket-partitioned
            assert any("bkt" in h for h in head), (
                f"document-scale window not bucket-partitioned: {spec}"
            )
        else:
            # round-11: the remaining windows run over the metadata-scale
            # per-(source, bkt) aggregate (domains × 4096 rows). They are
            # either bkt-ordered (offsets / first-bucket rank) or
            # UNORDERED whole-frame sums — an ordered non-bkt window
            # would be the round-9 whole-domain-sort straggler again
            assert (
                any("bkt" in part for part in spec.split(","))
                or ("ASC" not in spec and "DESC" not in spec)
            ), spec
    # round-11 (verdict #3): the corpus is scanned exactly twice — once
    # for the per-bucket aggregate all metadata derives from, once for
    # the placement pass (the old DAG had 5 documents FileScans)
    doc_scans = sum(
        1
        for line in txt.splitlines()
        if "Location" in line and "documents" in line
    )
    assert doc_scans <= 2, f"{doc_scans} documents scans in the e78 plan"


def test_e78_two_level_equals_single_window(spark, sf_dir):
    """The two-level prefix sum is an EXACT twin of the naive
    per-domain running total — same kept set, same report, row for
    row (the md5-prefix bucket is a contiguous range of the order
    key, so offsets compose)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from oss_data_lake_spark.operators.pipeline import (
        MIX_TOTAL_FRACTION_DEN,
        MIX_TOTAL_FRACTION_NUM,
        MIX_WEIGHT_MOD,
        _md5_bucket,
        token_budget_mixing_report,
    )
    from oss_data_lake_spark.sources.loaders import load_table

    got = {
        r["source"]: (r["n_kept"], r["kept_tokens"], r["overshoot_tokens"])
        for r in token_budget_mixing_report(spark, sf_dir).collect()
    }

    # the naive single-window reference, computed independently
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("rnd"),
    ).withColumn("weight", _md5_bucket(F.col("source")) % MIX_WEIGHT_MOD + 1)
    totals = toks.groupBy("source", "weight").agg(
        F.sum("n_tok").cast("long").alias("total_tokens")
    )
    grand = totals.agg(
        F.sum("total_tokens").alias("gt"), F.sum("weight").alias("ws")
    )
    budgets = totals.crossJoin(F.broadcast(grand)).select(
        "source",
        F.floor(
            F.col("weight") * F.col("gt") * MIX_TOTAL_FRACTION_NUM
            / (F.col("ws") * MIX_TOTAL_FRACTION_DEN)
        ).cast("long").alias("budget_tokens"),
    )
    win = (
        Window.partitionBy("source")
        .orderBy("rnd", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = (
        toks.withColumn(
            "before", F.coalesce(F.sum("n_tok").over(win), F.lit(0))
        )
        .join(F.broadcast(budgets), "source")
        .withColumn("keep", F.col("before") < F.col("budget_tokens"))
        .groupBy("source")
        .agg(
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("long").alias("kept_tokens"),
            F.greatest(
                F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
                .cast("long")
                - F.max("budget_tokens"),
                F.lit(0),
            ).cast("long").alias("overshoot_tokens"),
        )
    )
    want = {
        r["source"]: (r["n_kept"], r["kept_tokens"], r["overshoot_tokens"])
        for r in ref.collect()
    }
    assert got == want


def test_e76_scale_contract_is_documented(spark, sf_dir):
    """e76's per-source window is sound ONLY under the bounded-shard
    contract (source = a dataloader shard whose size is bounded; shard
    count scales with data). The round-9 verdict required the contract
    pinned: the docstring must state it, and the packing window must
    partition by source exactly (no silent repartitioning that would
    change block layout)."""
    import re

    from oss_data_lake_spark.operators.pipeline import (
        sequence_packing_report,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    doc = sequence_packing_report.__doc__
    assert "SCALE CONTRACT" in doc and "shard" in doc
    txt = explain_str(sequence_packing_report(spark, sf_dir))
    specs = [
        s for s in re.findall(r"windowspecdefinition\(([^)]*)\)", txt)
        if "doc_id" in s  # the packing window orders by doc_id
    ]
    assert specs and all("source" in s.split(",")[0] for s in specs)


def test_e80_semdedup_sweep_matches_brute_force(spark, sf_dir):
    """e80's per-cluster greedy keep-first sweep, re-derived by brute
    force on the driver (small fixture): a member is removed iff SOME
    lower-id cluster-mate sits at rounded-cosine >= threshold — and the
    sweep never looks across clusters."""
    import numpy as np

    from oss_data_lake_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        _ivf_assign,
        _ivf_model,
        semdedup_report,
    )
    from oss_data_lake_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_ids, cent_mat = _ivf_model(emb)
    assigned = _ivf_assign(emb, cent_ids, cent_mat, 1).collect()
    by_cluster: dict = {}
    for r in assigned:
        by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    want = {}
    for cl, members in by_cluster.items():
        members.sort(key=lambda t: t[0])
        E = np.asarray([m[1] for m in members])
        norms = np.sqrt((E * E).sum(axis=1))
        sims = np.round((E @ E.T) / np.outer(norms, norms), 9)
        removed = sum(
            1
            for i in range(1, len(members))
            if sims[i, :i].max() >= SEMDEDUP_THRESHOLD
        )
        want[cl] = (len(members), removed)
    got = {
        r["cluster"]: (r["n_members"], r["n_removed"])
        for r in semdedup_report(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(n for n, _ in want.values()) == emb.count()  # partition


def test_e83_dsir_selection_budget_and_target_tilt(spark, sf_dir):
    """e83 (DSIR importance resampling): the Gumbel-top-k selection
    spends EXACTLY the fixed budget, and the importance weights do
    their job — the curated target domain is selected at a higher rate
    than the raw average (the whole point of the log-ratio weights)."""
    from oss_data_lake_spark.operators.pipeline import (
        DSIR_SELECT_K,
        POS_SOURCE,
        dsir_resampling_report,
    )
    from oss_data_lake_spark.plans.audit import explain_str

    df = dsir_resampling_report(spark, sf_dir)
    # pin the PRE-EXECUTION plan: after collect, AQE's final-plan text
    # re-prints the reused per-doc subtree once per consumer
    txt = explain_str(df, "simple")
    rows = {r["source"]: r for r in df.collect()}
    assert sum(r["n_selected"] for r in rows.values()) == DSIR_SELECT_K
    assert sum(r["selected_tokens"] for r in rows.values()) > 0
    rates = {s: r["selection_rate"] for s, r in rows.items()}
    mean_rate = sum(rates.values()) / len(rates)
    assert rates[POS_SOURCE] > mean_rate
    # scale pins: the fixed-budget selection is a distributed
    # TakeOrdered (never a global sort of the corpus), and the corpus
    # is scanned exactly twice (model fit + the per-doc pass)
    assert "TakeOrderedAndProject" in txt
    doc_scans = sum(
        1
        for line in txt.splitlines()
        if "FileScan" in line and "documents" in line
    )
    assert doc_scans <= 2, f"{doc_scans} documents scans in the e83 plan"


def test_e80_tiled_sweep_identical_to_full_matrix(spark, sf_dir, monkeypatch):
    """Round-11: e80's removal sweep is tiled (block×block partials with
    a running max, bounded memory for skewed clusters). With the default
    2048 block the sf-fixture clusters fit in ONE tile, so this pin
    forces block=7 — multi-tile rows, partial diagonal tiles, ragged
    tails — and demands the report be value-identical (including
    max_intra_cosine at full float precision) to the default run."""
    from oss_data_lake_spark.operators import similarity as sim

    baseline = [tuple(r) for r in sim.semdedup_report(spark, sf_dir).collect()]
    monkeypatch.setattr(sim, "SEMDEDUP_SWEEP_BLOCK", 7)
    tiled = [tuple(r) for r in sim.semdedup_report(spark, sf_dir).collect()]
    assert tiled == baseline
    # sanity: at least one cluster actually spanned multiple 7-row tiles
    assert any(r[1] > 7 for r in baseline)


def test_e26_tiled_verify_identical_to_full_matrix(spark, sf_dir, monkeypatch):
    """Round-11: e26's per-cluster verify sweep shares e80's tile bound
    (blk×blk partials, O(blk² + m·dim + matches) memory). Forced tiny
    tiles must emit the exact same (pair, cosine) set as the default
    single-tile run — including values at full float precision."""
    from oss_data_lake_spark.operators import similarity as sim

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    baseline = rows(sim.ivf_neardup_pairs(spark, sf_dir))
    assert baseline  # the fixture produces matches — a vacuous pin is no pin
    monkeypatch.setattr(sim, "SEMDEDUP_SWEEP_BLOCK", 5)
    assert rows(sim.ivf_neardup_pairs(spark, sf_dir)) == baseline


def test_e84_semantic_decontamination_matches_brute_force(spark, sf_dir):
    """e84 (semantic decontamination), re-derived by brute force on the
    driver: train vectors take their single IVF home (nprobe=1), eval
    vectors probe NEARDUP_NPROBE clusters, candidates are the union of
    the probed clusters' train members (disjoint by construction), and
    the report carries exact candidate/close counts + 9-dp max cosine
    with the -2.0 no-candidate sentinel."""
    import numpy as np

    from oss_data_lake_spark.operators.similarity import (
        NEARDUP_NPROBE,
        SEMDECON_EVAL_MOD,
        SEMDECON_EVAL_RES,
        SEMDECON_THRESHOLD,
        _SEMDECON_NONE,
        _ivf_assign,
        _ivf_model,
        semantic_decontamination,
    )
    from pyspark.sql import functions as F
    from oss_data_lake_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_ids, cent_mat = _ivf_model(emb)
    is_eval = F.col("vec_id") % SEMDECON_EVAL_MOD == SEMDECON_EVAL_RES
    train_rows = _ivf_assign(emb.filter(~is_eval), cent_ids, cent_mat, 1).collect()
    probe_rows = _ivf_assign(
        emb.filter(is_eval), cent_ids, cent_mat, NEARDUP_NPROBE
    ).collect()
    train_by_cluster: dict = {}
    for r in train_rows:
        train_by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    probes_by_eval: dict = {}
    evecs: dict = {}
    for r in probe_rows:
        probes_by_eval.setdefault(r["vec_id"], []).append(r["cluster"])
        evecs[r["vec_id"]] = np.asarray(r["embedding"], dtype=np.float64)
    want = {}
    for eid, clusters in probes_by_eval.items():
        ev = evecs[eid]
        en = np.sqrt((ev * ev).sum())
        n_cand = n_close = 0
        best = -np.inf
        for cl in clusters:
            for _tid, tv in train_by_cluster.get(cl, []):
                cos = round(float(ev @ tv) / (en * np.sqrt((tv * tv).sum())), 9)
                n_cand += 1
                n_close += cos >= SEMDECON_THRESHOLD
                best = max(best, cos)
        mx = best if n_cand else _SEMDECON_NONE
        want[eid] = (n_cand, n_close, mx, int(mx >= SEMDECON_THRESHOLD))
    out = semantic_decontamination(spark, sf_dir).collect()
    got = {
        r["eval_id"]: (
            r["n_candidates"], r["n_close"], r["max_cosine"], r["contaminated"]
        )
        for r in out
    }
    assert got == want
    # one row per eval vector, exactly — the audit covers the whole slice
    n_eval = emb.filter(is_eval).count()
    assert len(out) == n_eval == len(want)
    # internal consistency: contaminated iff some candidate cleared thr
    for n_cand, n_close, mx, flag in got.values():
        assert flag == (n_close >= 1)
        assert (mx == _SEMDECON_NONE) == (n_cand == 0)


def test_e84_tiled_scan_identical_to_full_matrix(spark, sf_dir, monkeypatch):
    """e84's eval-block x train-block scan shares e80's tile bound. Forced
    tiny tiles (multi-tile rows AND columns, ragged tails) must emit the
    exact same per-eval report — counts and full-precision max cosine —
    as the default single-tile run."""
    from oss_data_lake_spark.operators import similarity as sim

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    baseline = rows(sim.semantic_decontamination(spark, sf_dir))
    assert baseline  # the fixture has eval vectors — a vacuous pin is no pin
    assert any(r[1] > 7 for r in baseline)  # some eval sees >7 candidates
    monkeypatch.setattr(sim, "SEMDEDUP_SWEEP_BLOCK", 7)
    assert rows(sim.semantic_decontamination(spark, sf_dir)) == baseline
