"""Round-12 scale hardening pins (r11 verdict #2): the e80/e84
oversized-cluster split.

- e80 (SemDeDup): clusters over ``SEMDEDUP_MAX_CLUSTER`` re-split with a
  second deterministic IVF level. On a crafted fixture of near-twin
  PAIRS (twin cosine ≈ 0.9999, inter-pair < 0.992, sweep threshold
  0.995) the dedup DECISIONS are invariant under the split — twins
  co-assign to the same sub-centroid by construction of argmax on
  near-identical vectors — pinned split-vs-unsplit, and the unsplit
  report is pinned against an independent numpy reference.
- e84 (semantic decontamination): the chunk split is EXACT by
  construction (the per-eval aggregation sums/maxes across chunks), so
  identity is pinned on the real fixture at a tiny forced cap.
"""

from __future__ import annotations

import numpy as np
import pytest

from oss_data_lake_spark.operators import similarity as sim

THR = 0.995
N_PAIRS = 200
DIM = 32


def _fixture_vectors() -> np.ndarray:
    rng = np.random.RandomState(7)
    vecs = np.zeros((2 * N_PAIRS, DIM))
    for p in range(N_PAIRS):
        u = rng.randn(DIM - 1)
        u /= np.linalg.norm(u)
        base = np.concatenate([[1.0], 0.3 * u])
        base /= np.linalg.norm(base)
        twin = base + 1e-5 * rng.randn(DIM)
        twin /= np.linalg.norm(twin)
        vecs[2 * p] = base
        vecs[2 * p + 1] = twin
    return vecs


@pytest.fixture(scope="module")
def pair_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("semsplit")
    vecs = _fixture_vectors()
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>")\
        .coalesce(1).write.parquet(str(root / "embeddings.parquet"))
    return str(root)


def _report(spark, sf, cap, monkeypatch):
    monkeypatch.setattr(sim, "SEMDEDUP_MAX_CLUSTER", cap)
    return {
        r["cluster"]: (r["n_members"], r["n_removed"], r["n_kept"],
                       r["max_intra_cosine"])
        for r in sim.semdedup_report(spark, sf, threshold=THR).collect()
    }


def test_fixture_separates_twins_from_pairs():
    """Precondition the pins rely on: twin cosine over THR, inter-pair
    under it, with margin beyond the 9-dp rounding."""
    vecs = _fixture_vectors()
    # float32 round-trip (the parquet column is array<float>)
    vecs = vecs.astype(np.float32).astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    twins = np.array([sims[2 * p, 2 * p + 1] for p in range(N_PAIRS)])
    assert twins.min() > THR + 1e-3
    inter = sims.copy()
    for p in range(N_PAIRS):
        inter[2 * p, 2 * p + 1] = inter[2 * p + 1, 2 * p] = 0
    np.fill_diagonal(inter, 0)
    assert inter.max() < THR - 1e-3


def test_e80_split_preserves_dedup_decisions(spark, pair_sf, monkeypatch):
    """The identity pin: with the cap forced below the cluster sizes
    (~50 members vs cap 30), every cluster re-splits — and the
    per-cluster membership/removal decisions are IDENTICAL to the
    unsplit sweep, because each removal is driven by the victim's own
    co-located twin."""
    unsplit = _report(spark, pair_sf, 10**9, monkeypatch)
    split = _report(spark, pair_sf, 30, monkeypatch)
    assert set(split) == set(unsplit)
    for c in unsplit:
        assert split[c][:3] == unsplit[c][:3], (
            f"cluster {c}: split={split[c][:3]} unsplit={unsplit[c][:3]}"
        )
    # the cap genuinely fired: at least one cluster exceeds it
    assert max(v[0] for v in unsplit.values()) > 30


def test_e80_unsplit_matches_numpy_reference(spark, pair_sf, monkeypatch):
    """Independent full-report reference (assignment + greedy sweep from
    first principles — no tiling, no sub-levels)."""
    got = _report(spark, pair_sf, 10**9, monkeypatch)
    vecs = _fixture_vectors().astype(np.float32).astype(np.float64)
    n = len(vecs)
    norms = np.linalg.norm(vecs, axis=1)
    cents = [i for i in range(n) if i % sim.IVF_CENTROID_STRIDE == 0]
    csims = np.round(
        (vecs @ vecs[cents].T) / np.outer(norms, norms[cents]), 9
    )
    # (sim desc, centroid id asc): stable argsort over ascending ids
    assign = np.asarray(cents)[
        np.argsort(-csims, axis=1, kind="stable")[:, 0]
    ]
    want: dict = {}
    for c in sorted(set(assign.tolist())):
        members = [i for i in range(n) if assign[i] == c]
        removed, mx = 0, sim._SEMDEDUP_NONE
        for pos, i in enumerate(members):
            if pos == 0:
                continue
            lows = members[:pos]
            best = np.round(
                (vecs[lows] @ vecs[i]) / (norms[lows] * norms[i]), 9
            ).max()
            mx = max(mx, best)
            if best >= THR:
                removed += 1
        want[c] = (len(members), removed, len(members) - removed, mx)
    assert got == want


def test_e84_chunk_split_is_exact_identity(spark, monkeypatch):
    """e84's split is exact by construction — pin it on the REAL
    fixture: a forced cap of 7 (every cluster chunks, eval probes
    replicate) must reproduce the uncapped report bit-for-bit."""
    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(sim, "SEMDEDUP_MAX_CLUSTER", 10**9)
    base = sim.semantic_decontamination(spark, sf).collect()
    monkeypatch.setattr(sim, "SEMDEDUP_MAX_CLUSTER", 7)
    capped = sim.semantic_decontamination(spark, sf).collect()
    assert capped == base
    assert len(base) > 0
