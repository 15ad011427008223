"""Batched multi-merge BPE rounds (round 13) — the production-vocab
driver-latency fix. The batching rule must be TRAJECTORY-EXACT: the
merge table (pairs, ranks, AND recorded counts) is byte-identical to
the classic one-merge-per-collect loop, which is why the unbatched
DuckDB replay oracle (tokenizer._bpe_oracle) needs no change and now
doubles as a differential check of the batching itself."""

from __future__ import annotations

from oss_data_lake_spark.operators import tokenizer as tk


class TestSelectBatch:
    """Unit pins for each acceptance condition (module docstring 1-3)."""

    @staticmethod
    def _rows(*triples):
        return [{"l": l, "r": r, "c": c} for l, r, c in triples]

    def test_disjoint_prefix_accepted(self):
        # fully-listed pair table, all mutually disjoint: whole batch
        top = self._rows(("a", "b", 100), ("c", "d", 90), ("e", "f", 80),
                         ("g", "h", 10))
        got = tk._select_batch(top, known=set("abcdefgh"), kmax=8)
        assert [(r["l"], r["r"]) for r in got] == [
            ("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")
        ]

    def test_shared_symbol_ends_prefix(self):
        # (a,c) shares 'a' with the accepted (a,b): prefix ends at 1
        top = self._rows(("a", "b", 100), ("a", "c", 90), ("d", "e", 80))
        got = tk._select_batch(top, known=set("abcde"), kmax=8)
        assert len(got) == 1 and got[0]["l"] == "a"

    def test_merged_spelling_shared_ends_prefix(self):
        # merged 'ab' of pair 1 equals the LEFT symbol of pair 2
        top = self._rows(("a", "b", 100), ("ab", "c", 90), ("d", "e", 80))
        got = tk._select_batch(top, known={"a", "b", "ab", "c", "d", "e"},
                               kmax=8)
        assert len(got) == 1

    def test_merged_collision_with_live_symbol(self):
        # merging (a,b) SPELLS an existing symbol 'ab': other pairs'
        # counts can grow — classic single step only (condition 2)
        top = self._rows(("a", "b", 100), ("c", "d", 90))
        got = tk._select_batch(top, known={"a", "b", "c", "d", "ab"},
                               kmax=8)
        assert len(got) == 1

    def test_tie_at_boundary_shrinks(self):
        # FULL window (list not exhausted): the batch must end on a
        # strict count drop. kmax=3 accepts counts [100, 90, 80], but
        # the next candidate also holds 80 — a new pair born of the
        # batch's merges could tie it and win the (l, r) tiebreak, so
        # the batch shrinks to [100, 90] (90 > 80 is strict).
        counts = [100, 90, 80, 80] + [70 - i for i in
                                      range(tk.BPE_BATCH_TOPM - 4)]
        top = self._rows(*[
            (f"l{i}", f"r{i}", c) for i, c in enumerate(counts)
        ])
        assert len(top) == tk.BPE_BATCH_TOPM
        got = tk._select_batch(top, known=set(), kmax=3)
        assert [r["c"] for r in got] == [100, 90]

    def test_tie_fully_inside_exhausted_list_is_fine(self):
        # ties WITHIN the batch are exact (static tiebreak), and an
        # exhausted pair table has nothing beyond it to tie against
        top = self._rows(("a", "b", 90), ("c", "d", 90), ("e", "f", 90))
        got = tk._select_batch(top, known=set("abcdef"), kmax=8)
        assert len(got) == 3

    def test_window_consumed_shrinks_to_verifiable(self):
        # all kmax accepted but the window may hide an equal count
        # beyond it — only a batch with a VISIBLE strict drop survives
        top = self._rows(*[
            (chr(97 + 2 * i), chr(98 + 2 * i), 100 - i)
            for i in range(tk.BPE_BATCH_TOPM)
        ])
        got = tk._select_batch(top, known=set(), kmax=tk.BPE_BATCH_TOPM)
        assert len(got) < tk.BPE_BATCH_TOPM  # cannot take the whole window

    def test_exhausted_pair_table_takes_all(self):
        # fewer rows than the window size = the pair table is fully
        # listed; nothing exists beyond it, so no drop check needed
        top = self._rows(("a", "b", 5), ("c", "d", 5))
        got = tk._select_batch(top, known=set("abcd"), kmax=8)
        assert len(got) == 2

    def test_kmax_caps_batch(self):
        top = self._rows(("a", "b", 100), ("c", "d", 90), ("e", "f", 80))
        got = tk._select_batch(top, known=set("abcdef"), kmax=2)
        assert len(got) == 2


class TestTrajectoryIdentity:
    """Batched vs classic on the REAL fixture — merge tables must be
    byte-identical (ranks, pairs, and counts)."""

    def test_charlevel_identity(self, spark, sf_dir):
        classic, _ = tk._train(spark, sf_dir, 24, batch_max=1)
        batched, _ = tk._train(spark, sf_dir, 24,
                               batch_max=tk.BPE_BATCH_MAX)
        assert classic == batched
        assert len(batched) == 24

    def test_bytelevel_identity(self, spark, sf_dir):
        classic, _ = tk._train(spark, sf_dir, 24, bytelevel=True,
                               batch_max=1)
        batched, _ = tk._train(spark, sf_dir, 24, bytelevel=True,
                               batch_max=tk.BPE_BATCH_MAX)
        assert classic == batched
        assert len(batched) == 24
