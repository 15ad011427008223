"""Tier C EXT — text analysis for LLM-data pipelines (SURVEY.md §2.C E4).

Language-ID (stopword-marker heuristic), quality/statistics scoring, BPE-ish
regex token counting, and document fingerprinting (md5 + rolling hash) over
the ``documents`` fixture. All expressions are JVM-side Catalyst built-ins —
no Python UDFs — so they whole-stage-codegen and scale linearly with
partitions: at 100 TB this is a single narrow scan per query, no shuffle
except the final small aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.functions.deterministic import davg, sql_davg
from oss_data_lake_spark.sources.loaders import load_table

STOPWORDS = ("the", "a", "and", "of", "to")

# Gopher-style quality-rule thresholds (Rae et al. 2021 §A1.1 "quality
# filtering", adapted to the fixture's 10-99-token documents: the paper's
# 50..100k word bounds use the corpus scale, the ratio rules carry over)
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 90
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.1  # '#' or '...' per word
MIN_ALPHA_RATIO = 0.8  # words containing at least one alphabetic char
MIN_DISTINCT_STOPWORDS = 2
MAX_TOP_UNIGRAM_RATIO = 0.15  # most frequent word's share of all tokens
MAX_DUP_LINE_RATIO = 0.3  # repetition: duplicate-line fraction

# language → marker stopwords, tie-broken in this order (deterministic CASE)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "que", "y"),
    "fr": ("le", "les", "des", "et"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

ROLLING_MOD = 1_000_000_007


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 quality scoring: char/token/unique-token counts + stopword ratio."""
    docs = load_table(spark, sf_dir, "documents")
    # token array factored into its own projection (r14, the e44 fix):
    # one split per row instead of three, identical values
    base = docs.select(
        "doc_id", F.length("text").alias("__len"), _tokens().alias("__toks")
    )
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(__toks, t -> t IN ({stop_list})))")
    return (
        base.select(
            "doc_id",
            F.col("__len").cast("long").alias("n_chars_txt"),
            F.size("__toks").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("__toks")).cast("long").alias("n_uniq_tokens"),
            n_stop.cast("long").alias("n_stop"),
        )
        .withColumn(
            "stop_ratio",
            F.col("n_stop").cast("double") / F.col("n_tokens").cast("double"),
        )
        .orderBy("doc_id")
    )


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 language-ID: n-gram/stopword-marker heuristic scored per language,
    argmax with a fixed tie-break order, reported as a confusion matrix
    against the fixture's ``lang`` label."""
    docs = load_table(spark, sf_dir, "documents")
    # one split per row shared by all four language scorers (r14)
    scored = docs.select("lang", _tokens().alias("__toks"))
    for lang, markers in LANG_MARKERS.items():
        marker_list = ", ".join(f"'{m}'" for m in markers)
        scored = scored.withColumn(
            f"s_{lang}",
            F.expr(f"size(filter(__toks, t -> t IN ({marker_list})))"),
        )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # first max wins — fixed tie-break order
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return (
        scored.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 token counting: whitespace tokens plus a BPE-ish regex pre-tokenizer
    (letter runs / digit runs / single symbols), aggregated per source."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(_tokens()).cast("long")
    bpe = F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)).cast("long")
    return (
        docs.select("source", ws.alias("n_ws"), bpe.alias("n_bpe"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("sum_ws_tokens"),
            F.sum("n_bpe").alias("sum_bpe_tokens"),
        )
        .withColumn(
            "avg_bpe_tokens",
            F.col("sum_bpe_tokens").cast("double") / F.col("n_docs").cast("double"),
        )
        .orderBy("source")
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 document fingerprinting: md5 content hash + a rolling polynomial
    hash over token codes (``h = (h*31 + code) mod p`` — order-sensitive, so
    permuted texts fingerprint differently, unlike a bag-of-words hash)."""
    docs = load_table(spark, sf_dir, "documents")
    rolling = F.expr(
        "aggregate(transform(split(text, ' '), t -> cast(ascii(t) * 1000 + length(t) as bigint)), "
        f"0L, (a, x) -> (a * 31 + x) % {ROLLING_MOD})"
    )
    return (
        docs.select(
            "doc_id",
            F.md5(F.col("text").cast("binary")).alias("md5_fp"),
            rolling.alias("rolling_fp"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


def gopher_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 Gopher-style quality rules (Rae et al. 2021) + repetition signals,
    aggregated per source: word-count bounds, mean word length, symbol
    ratio, alphabetic-word ratio, stopword presence, top-unigram share
    (repetition), duplicate-line fraction (repetition).

    Every rule is a JVM-side Catalyst higher-order-function expression over
    one narrow scan of ``documents`` — no Python, no shuffle before the
    final per-source aggregation. The top-unigram share is computed
    in-row (``transform`` over distinct tokens × ``filter`` count), which
    is O(tokens × distinct) per document — bounded by document length, so
    at 100 TB it stays an embarrassingly parallel scan instead of an
    explode + per-doc-word shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # factor the token/line arrays into their own projection (r14): the
    # previous single-projection form re-evaluated split(text, ' ')
    # inside every rule — and inside the top-unigram lambda, once PER
    # DISTINCT TOKEN (the interpreted HOF evaluates its argument tree
    # per element). A multiply-referenced non-cheap alias is exactly
    # what CollapseProject refuses to inline back, so the arrays are
    # now computed once per row; every rule's arithmetic is unchanged.
    base = docs.select(
        "source",
        "text",
        _tokens().alias("__toks"),
        F.split(F.col("text"), "\n").alias("__lines"),
    )
    n = F.size("__toks").cast("double")
    scored = base.select(
        "source",
        F.size("__toks").alias("n_tokens"),
        (
            F.expr("aggregate(__toks, 0L, (a, t) -> a + length(t))").cast(
                "double"
            )
            / n
        ).alias("mean_wl"),
        (F.expr(r"regexp_count(text, '#|\\.\\.\\.')").cast("double") / n).alias(
            "sym_ratio"
        ),
        (
            F.expr("size(filter(__toks, t -> t rlike '[a-zA-Z]'))").cast(
                "double"
            )
            / n
        ).alias("alpha_ratio"),
        F.expr(
            "size(array_intersect(array_distinct(__toks), "
            f"array({', '.join(repr(s) for s in STOPWORDS)})))"
        ).alias("n_stop_distinct"),
        (
            F.expr(
                "array_max(transform(array_distinct(__toks), "
                "d -> size(filter(__toks, t -> t = d))))"
            ).cast("double")
            / n
        ).alias("top_uni_ratio"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("__lines")).cast("double")
            / F.size("__lines").cast("double")
        ).alias("dup_line_ratio"),
    )
    fails = {
        "n_fail_wordcount": ~F.col("n_tokens").between(
            GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS
        ),
        "n_fail_meanlen": ~F.col("mean_wl").between(
            MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN
        ),
        "n_fail_symbols": F.col("sym_ratio") > MAX_SYMBOL_RATIO,
        "n_fail_alpha": F.col("alpha_ratio") < MIN_ALPHA_RATIO,
        "n_fail_stopwords": F.col("n_stop_distinct") < MIN_DISTINCT_STOPWORDS,
        "n_fail_topuni": F.col("top_uni_ratio") > MAX_TOP_UNIGRAM_RATIO,
        "n_fail_duplines": F.col("dup_line_ratio") > MAX_DUP_LINE_RATIO,
    }
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(cond.cast("long")).alias(name)
            for name, cond in fails.items()
        ],
        F.sum(
            (~reduce_or(list(fails.values()))).cast("long")
        ).alias("n_pass"),
        davg("mean_wl", "avg_mean_word_len"),
        davg("top_uni_ratio", "avg_top_unigram_ratio"),
    ]
    return scored.groupBy("source").agg(*aggs).orderBy("source")


def reduce_or(conds: list[F.Column]) -> F.Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e45: per-source keyword extraction by TF-IDF — the standard corpus
    characterization step in a training-data pipeline (what distinguishes
    each source's vocabulary from the corpus at large).

    score(source, term) = tf × idf with
      tf  = occurrences of term in the source (raw count),
      idf = ln(n_docs / df), df = corpus-wide document frequency.
    Stopwords are excluded (they'd dominate tf while idf→0 keeps them
    nonzero on any finite corpus). Top-K terms per source by
    (score desc, term asc) — fully deterministic.

    Scale shape: one explode of the corpus feeding TWO aggregations that
    both partition by term (df) / (source, term) (tf) — the term shuffle is
    the only wide exchange; df joins tf by term (broadcast: the distinct
    vocabulary of a tokenized corpus is millions of rows — small next to
    postings — and at the extreme end a shuffle join on term is the same
    exchange already paid). The per-source top-K window runs over
    sources × vocabulary, not postings. The ln() is one double op on
    exact long counts, so both engines compute the identical score."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a lazy 1-row broadcast (not an eager .count(): that
    # would launch a full scan job at DataFrame-CONSTRUCTION time — paid
    # even by explain-only callers like the plan tests/capture script)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = docs.select(
        "doc_id", "source", F.explode(_tokens()).alias("term")
    ).filter(~F.col("term").isin(*STOPWORDS) & (F.col("term") != ""))
    df_tbl = (
        tok.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    tf_tbl = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scored = (
        tf_tbl.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                ),
                9,
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("source", "rnk", "term", "tf", "df", "score")
        .orderBy("source", "rnk")
    )


VOCAB_TOP_K = 50
RARE_MAX_COUNT = 2  # corpus occurrences at or under this = "rare"
# a document is flagged when rare tokens exceed 3/10 of its tokens —
# compared as integers (n_rare*10 > n_tokens*3) so both engines agree
# exactly, no float ratio in the verified output
RARE_FRAC_NUM, RARE_FRAC_DEN = 3, 10


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e46: vocabulary induction — the first step of tokenizer training
    (BPE/WordPiece start from exactly this table): corpus-wide word
    counts, ranked, with the cumulative token mass the top-k prefix
    covers. All integers — drift-free against the oracle.

    Scale shape: one explode + ONE keyed aggregation on word (the only
    wide exchange; partial aggregation collapses the heavy head words
    map-side), then top-k via a global sort-limit — the window runs
    over K rows, never the vocabulary."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_tokens()).alias("word")).filter(
        F.col("word") != ""
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    topk = counts.orderBy(F.desc("n"), F.asc("word")).limit(VOCAB_TOP_K)
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_n",
            F.sum("n")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .select("rank", "word", "n", "cum_n")
        .orderBy("rank")
    )


def rare_word_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e47: rare-word quality signal (the CCNet-family filter: documents
    dominated by corpus-rare tokens are noise/garble candidates) — per
    source: total/rare/hapax token mass and how many documents cross
    the rare-fraction threshold. Exact integer comparisons throughout.

    Scale shape: explode → per-(doc, word) pre-aggregation (shrinks the
    join input to distinct doc-words), corpus counts re-derived from
    that same table (one extra keyed agg, no second scan), then ONE
    shuffle join on word — AQE's skew split handles the heavy-head
    words — and two cheap aggregations."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(_tokens()).alias("word")
    ).filter(F.col("word") != "")
    dw = tok.groupBy("doc_id", "source", "word").agg(
        F.count(F.lit(1)).alias("k")
    )
    counts = dw.groupBy("word").agg(F.sum("k").alias("cnt"))
    per_doc = (
        dw.join(counts, "word")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.sum(
                F.when(F.col("cnt") <= RARE_MAX_COUNT, F.col("k")).otherwise(
                    F.lit(0)
                )
            ).alias("n_rare"),
            F.sum(
                F.when(F.col("cnt") == 1, F.col("k")).otherwise(F.lit(0))
            ).alias("n_hapax"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_rare").cast("long").alias("rare_tokens"),
            F.sum("n_hapax").cast("long").alias("hapax_tokens"),
            F.max("n_rare").cast("long").alias("max_doc_rare"),
            F.sum(
                F.when(
                    F.col("n_rare") * RARE_FRAC_DEN
                    > F.col("n_tokens") * RARE_FRAC_NUM,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("flagged_docs"),
        )
        .orderBy("source")
    )


QUERIES = {
    "e40_text_stats": text_stats,
    "e41_langid_confusion": langid_confusion,
    "e42_token_count_bpe": token_count_bpe,
    "e43_fingerprints": fingerprints,
    "e44_gopher_quality": gopher_quality_report,
    "e45_tfidf_top_terms": tfidf_top_terms,
    "e46_vocab_coverage": vocab_coverage,
    "e47_rare_word_report": rare_word_report,
}


def _sql_langid_pred() -> str:
    score_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), t -> t IN ({', '.join(repr(m) for m in ms)}))) AS s_{lang}"
        for lang, ms in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join('s_' + lang for lang in langs)})"
    whens = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs)
    return f"""
        WITH scored AS (SELECT lang, {score_cols} FROM documents),
        withbest AS (SELECT *, {best} AS best FROM scored)
        SELECT lang,
               CASE WHEN best = 0 THEN 'und' {whens} END AS pred_lang,
               COUNT(*) AS n
        FROM withbest GROUP BY 1, 2 ORDER BY lang, pred_lang
    """


_TFIDF_STOPLIST = ", ".join(repr(s) for s in STOPWORDS)

ORACLES = {
    "e45_tfidf_top_terms": f"""
        WITH tok AS (
            SELECT doc_id, source, t AS term
            FROM (SELECT doc_id, source,
                         unnest(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t NOT IN ({_TFIDF_STOPLIST}) AND t <> ''),
        ndocs AS (SELECT COUNT(*) AS n FROM documents),
        dftbl AS (SELECT term, COUNT(*) AS df
                  FROM (SELECT DISTINCT doc_id, term FROM tok)
                  GROUP BY term),
        tftbl AS (SELECT source, term, COUNT(*) AS tf
                  FROM tok GROUP BY source, term),
        scored AS (SELECT s.source, s.term, s.tf, d.df,
                          ROUND(CAST(s.tf AS DOUBLE)
                                * ln(CAST((SELECT n FROM ndocs) AS DOUBLE)
                                     / CAST(d.df AS DOUBLE)), 9) AS score
                   FROM tftbl s JOIN dftbl d USING (term)),
        ranked AS (SELECT *,
                          CAST(row_number() OVER (
                              PARTITION BY source
                              ORDER BY score DESC, term) AS BIGINT) AS rnk
                   FROM scored)
        SELECT source, rnk, term, tf, df, score
        FROM ranked WHERE rnk <= {TFIDF_TOP_K}
        ORDER BY source, rnk
    """,
    "e40_text_stats": f"""
        SELECT doc_id,
               LENGTH(text) AS n_chars_txt,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS n_stop,
               CAST(len(list_filter(string_split(text, ' '),
                               t -> t IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
        FROM documents ORDER BY doc_id
    """,
    "e41_langid_confusion": _sql_langid_pred(),
    "e42_token_count_bpe": f"""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
               CAST(SUM(len(regexp_extract_all(text, '{TOKEN_REGEX}'))) AS BIGINT) AS sum_bpe_tokens,
               CAST(SUM(len(regexp_extract_all(text, '{TOKEN_REGEX}'))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS avg_bpe_tokens
        FROM documents GROUP BY source ORDER BY source
    """,
    "e43_fingerprints": f"""
        SELECT doc_id,
               md5(text) AS md5_fp,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                                      t -> CAST(ascii(t) * 1000 + length(t) AS BIGINT))),
                   (a, x) -> (a * 31 + x) % {ROLLING_MOD}) AS rolling_fp
        FROM documents ORDER BY doc_id LIMIT 200
    """,
    "e44_gopher_quality": f"""
        WITH scored AS (
          SELECT source,
                 len(string_split(text, ' ')) AS n_tokens,
                 CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_wl,
                 CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sym_ratio,
                 CAST(len(list_filter(string_split(text, ' '),
                                      t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS alpha_ratio,
                 len(list_intersect(list_distinct(string_split(text, ' ')),
                                    [{", ".join(repr(s) for s in STOPWORDS)}])) AS n_stop_distinct,
                 CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
                        x -> len(list_filter(string_split(text, ' '), t -> t = x)))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS top_uni_ratio,
                 CAST(1 AS DOUBLE)
                   - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE)
                     / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS dup_line_ratio
          FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN NOT (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}) THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_wordcount,
               CAST(SUM(CASE WHEN NOT (mean_wl BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}) THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_meanlen,
               CAST(SUM(CASE WHEN sym_ratio > {MAX_SYMBOL_RATIO} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_symbols,
               CAST(SUM(CASE WHEN alpha_ratio < {MIN_ALPHA_RATIO} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
               CAST(SUM(CASE WHEN n_stop_distinct < {MIN_DISTINCT_STOPWORDS} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopwords,
               CAST(SUM(CASE WHEN top_uni_ratio > {MAX_TOP_UNIGRAM_RATIO} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_topuni,
               CAST(SUM(CASE WHEN dup_line_ratio > {MAX_DUP_LINE_RATIO} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_duplines,
               CAST(SUM(CASE WHEN (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
                             AND (mean_wl BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
                             AND sym_ratio <= {MAX_SYMBOL_RATIO}
                             AND alpha_ratio >= {MIN_ALPHA_RATIO}
                             AND n_stop_distinct >= {MIN_DISTINCT_STOPWORDS}
                             AND top_uni_ratio <= {MAX_TOP_UNIGRAM_RATIO}
                             AND dup_line_ratio <= {MAX_DUP_LINE_RATIO}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               {sql_davg("mean_wl")} AS avg_mean_word_len,
               {sql_davg("top_uni_ratio")} AS avg_top_unigram_ratio
        FROM scored GROUP BY source ORDER BY source
    """,
    "e46_vocab_coverage": f"""
        WITH words AS (
            SELECT t AS word
            FROM (SELECT unnest(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t <> ''),
        counts AS (SELECT word, COUNT(*) AS n FROM words GROUP BY word),
        ranked AS (SELECT word, n,
                          CAST(row_number() OVER (
                              ORDER BY n DESC, word) AS BIGINT) AS rank
                   FROM counts)
        SELECT rank, word, n,
               CAST(SUM(n) OVER (ORDER BY rank
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
        FROM ranked WHERE rank <= {VOCAB_TOP_K} ORDER BY rank
    """,
    "e47_rare_word_report": f"""
        WITH tok AS (
            SELECT doc_id, source, t AS word
            FROM (SELECT doc_id, source,
                         unnest(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE t <> ''),
        dw AS (SELECT doc_id, source, word, COUNT(*) AS k
               FROM tok GROUP BY 1, 2, 3),
        counts AS (SELECT word, SUM(k) AS cnt FROM dw GROUP BY word),
        per_doc AS (
            SELECT d.doc_id, d.source,
                   SUM(d.k) AS n_tokens,
                   SUM(CASE WHEN c.cnt <= {RARE_MAX_COUNT}
                            THEN d.k ELSE 0 END) AS n_rare,
                   SUM(CASE WHEN c.cnt = 1 THEN d.k ELSE 0 END) AS n_hapax
            FROM dw d JOIN counts c USING (word)
            GROUP BY 1, 2)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_rare) AS BIGINT) AS rare_tokens,
               CAST(SUM(n_hapax) AS BIGINT) AS hapax_tokens,
               CAST(MAX(n_rare) AS BIGINT) AS max_doc_rare,
               CAST(SUM(CASE WHEN n_rare * {RARE_FRAC_DEN}
                                  > n_tokens * {RARE_FRAC_NUM}
                             THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs
        FROM per_doc GROUP BY source ORDER BY source
    """,
}
