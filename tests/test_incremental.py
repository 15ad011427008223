"""Incremental corpus ingestion: quality gate + cross-corpus LSH dedup +
snapshot append, batch after batch (`operators/incremental.py`)."""

from __future__ import annotations

import pytest

from oss_data_lake_spark.operators.dedup import band_table, minhash_signatures
from oss_data_lake_spark.operators.incremental import IncrementalCorpus


def _text(i: int, n_tokens: int = 25) -> str:
    # quality-passing: 20..90 tokens, no stopwords
    return " ".join(f"tok{i}w{j}" for j in range(n_tokens))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_first_ingest_gates_quality_and_intra_dups(spark, tmp_path):
    c = IncrementalCorpus(spark, str(tmp_path / "corpus"))
    batch = _docs(
        spark,
        [
            (1, _text(1), "web"),
            (2, _text(2), "web"),
            (3, _text(2), "web"),  # intra-batch exact dup of 2 -> drops (larger id)
            (4, "too short", "web"),  # quality fail
        ],
    )
    stats = c.ingest(batch)
    assert stats == {
        "n_arrived": 4,
        "n_quality_failed": 1,
        "n_dup_cross": 0,
        "n_dup_intra": 1,
        "n_appended": 2,
        "version": 1,
    }
    assert sorted(r.doc_id for r in c.read().collect()) == [1, 2]


def test_second_ingest_dedups_against_corpus_not_just_batch(spark, tmp_path):
    c = IncrementalCorpus(spark, str(tmp_path / "corpus"))
    c.ingest(_docs(spark, [(1, _text(1), "web"), (2, _text(2), "web")]))

    stats = c.ingest(
        _docs(
            spark,
            [
                (10, _text(1), "crawl"),  # duplicates corpus doc 1 -> cross drop
                (11, _text(3), "crawl"),  # genuinely new
            ],
        )
    )
    assert stats["n_dup_cross"] == 1
    assert stats["n_appended"] == 1
    assert stats["version"] == 2
    assert sorted(r.doc_id for r in c.read().collect()) == [1, 2, 11]
    # time travel: version 1 is the pre-batch corpus
    assert sorted(r.doc_id for r in c.read(1).collect()) == [1, 2]


def test_reingesting_same_batch_is_all_cross_dups(spark, tmp_path):
    c = IncrementalCorpus(spark, str(tmp_path / "corpus"))
    batch = _docs(spark, [(1, _text(1), "web"), (2, _text(2), "web")])
    c.ingest(batch)
    stats = c.ingest(batch)
    assert stats["n_dup_cross"] == 2 and stats["n_appended"] == 0
    assert c.read().count() == 2


def test_crash_between_commits_repairs_index(spark, tmp_path):
    """Docs committed but index commit lost: next ingest rebuilds the
    missing index rows and still catches the cross-duplicate."""
    c = IncrementalCorpus(spark, str(tmp_path / "corpus"))
    c.ingest(_docs(spark, [(1, _text(1), "web")]))
    # simulate the crash: append docs directly, index never updated
    c.docs.commit(_docs(spark, [(2, _text(2), "web")]), mode="append")

    stats = c.ingest(_docs(spark, [(20, _text(2), "crawl")]))
    assert stats["n_dup_cross"] == 1 and stats["n_appended"] == 0
    # index now covers both corpus docs
    idx_docs = {r.doc_id for r in c.index.read().select("doc_id").distinct().collect()}
    assert idx_docs == {1, 2}


def test_band_index_matches_fresh_computation(spark, tmp_path):
    """The persisted index rows equal band_table(minhash_signatures(corpus))
    — the invariant that makes the incremental join equivalent to a full
    re-sign of the corpus."""
    c = IncrementalCorpus(spark, str(tmp_path / "corpus"))
    c.ingest(_docs(spark, [(1, _text(1), "web"), (2, _text(2), "web")]))
    c.ingest(_docs(spark, [(3, _text(3), "web")]))

    stored = {
        (r.doc_id, r.band, r.bucket) for r in c.index.read().collect()
    }
    fresh = {
        (r.doc_id, r.band, r.bucket)
        for r in band_table(minhash_signatures(c.read())).collect()
    }
    assert stored == fresh


def test_streaming_corpus_builder_end_to_end(spark, tmp_path):
    """Landing files -> streaming micro-batches -> deduplicated corpus
    snapshots; a second drain with the same checkpoint ingests nothing
    (exactly-once composition), and a REPLAYED batch (fresh checkpoint over
    the same landing data) lands entirely as cross-dups — idempotent."""
    from oss_data_lake_spark.streaming.corpus_stream import start_corpus_stream

    landing = str(tmp_path / "landing")
    corpus_path = str(tmp_path / "corpus")

    _docs(spark, [(1, _text(1), "web"), (2, _text(2), "web")]).write.parquet(
        landing + "/batch0"
    )
    _docs(spark, [(3, _text(1), "crawl"), (4, _text(4), "crawl")]).write.parquet(
        landing + "/batch1"
    )

    q = start_corpus_stream(
        spark, landing + "/*", corpus_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    c = IncrementalCorpus(spark, corpus_path)
    survivors = {r.doc_id for r in c.read().collect()}
    # doc 3 duplicates doc 1's text -> exactly one of them survives
    assert survivors in ({1, 2, 4}, {2, 3, 4})
    v_after = c.docs.current_version()

    # same checkpoint: nothing re-delivered, corpus untouched
    q2 = start_corpus_stream(
        spark, landing + "/*", corpus_path, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert c.docs.current_version() == v_after

    # fresh checkpoint = full replay: every doc is a cross-dup, no growth
    q3 = start_corpus_stream(
        spark, landing + "/*", corpus_path, str(tmp_path / "ckpt2")
    )
    q3.awaitTermination(120)
    assert {r.doc_id for r in c.read().collect()} == survivors
