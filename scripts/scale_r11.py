"""Round-11 scale measurement: e80 SemDeDup's tiled removal sweep under
deliberate skew (one cluster holding ~50% of all vectors).

Round-10 verdict #1: the old sweep materialized the full m×m cosine
matrix inside one applyInPandas task — a skewed cluster with m=1M
members would ask for 8 TB. The round-11 sweep tiles the lower
triangle into SEMDEDUP_SWEEP_BLOCK² partials with a running max, so
task memory is O(block² + m·dim) regardless of cluster size.

This script measures BOTH shapes driver-side with tracemalloc on a
single m-member cluster (the worst task a 50%-skewed corpus produces),
verifies value identity on a size where the full matrix still fits,
then runs the tiled sweep at a size where the full matrix would be
multiple GB. Appends nothing; prints a ready-to-paste SCALE.md row.

Usage: python scripts/scale_r11.py
"""

from __future__ import annotations

import tracemalloc

import numpy as np

DIM = 64
BLK = 2048  # SEMDEDUP_SWEEP_BLOCK
NONE = -2.0


def full_matrix_sweep(E: np.ndarray) -> np.ndarray:
    """The round-10 shape: whole m×m similarity matrix in one shot."""
    n = len(E)
    m = np.full(n, NONE)
    norms = np.sqrt((E * E).sum(axis=1))
    sims = np.round((E @ E.T) / np.outer(norms, norms), 9)
    for i in range(1, n):
        m[i] = sims[i, :i].max()
    return m


def tiled_sweep(E: np.ndarray, blk: int = BLK) -> np.ndarray:
    """The round-11 shape (mirrors operators/similarity.py sweep_block)."""
    n = len(E)
    m = np.full(n, NONE)
    norms = np.sqrt((E * E).sum(axis=1))
    for r0 in range(0, n, blk):
        r1 = min(r0 + blk, n)
        best = np.full(r1 - r0, -np.inf)
        for c0 in range(0, r1, blk):
            c1 = min(c0 + blk, r1)
            part = np.round(
                (E[r0:r1] @ E[c0:c1].T)
                / np.outer(norms[r0:r1], norms[c0:c1]),
                9,
            )
            if c1 > r0:
                rows = np.arange(r0, r1)[:, None]
                cols = np.arange(c0, c1)[None, :]
                part = np.where(cols < rows, part, -np.inf)
            best = np.maximum(best, part.max(axis=1))
        seen = best > -np.inf
        m[r0:r1][seen] = best[seen]
    return m


def peak_mb(fn, *args) -> tuple[float, np.ndarray]:
    tracemalloc.start()
    out = fn(*args)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return peak / 1e6, out


def main() -> None:
    rng = np.random.default_rng(7)

    # identity check at a size where the full matrix is still cheap
    E_small = rng.standard_normal((6000, DIM))
    a = full_matrix_sweep(E_small)
    b = tiled_sweep(E_small, blk=257)  # ragged tiles on purpose
    assert np.array_equal(a, b), "tiled sweep diverged from full matrix"
    print("identity @ m=6000 (blk=257 vs full): OK")

    # the skew task: one cluster = 50% of a 64k-vector corpus
    m = 32_000
    E = rng.standard_normal((m, DIM))
    mb_full, _ = peak_mb(full_matrix_sweep, E)
    mb_tiled, _ = peak_mb(tiled_sweep, E)
    full_matrix_gb_at = lambda n: n * n * 8 / 1e9  # noqa: E731
    print(f"skew task m={m} dim={DIM}:")
    print(f"  full-matrix peak {mb_full:,.0f} MB (matrix alone "
          f"{full_matrix_gb_at(m):,.1f} GB)")
    print(f"  tiled (blk={BLK}) peak {mb_tiled:,.0f} MB")
    print(f"  at m=1M the full matrix would be "
          f"{full_matrix_gb_at(1_000_000):,.0f} GB; tiled stays "
          f"~{(BLK * BLK * 8 * 3 + 1_000_000 * DIM * 8) / 1e9:.1f} GB "
          f"(tiles + the m×dim embeddings the task holds anyway)")


if __name__ == "__main__":
    main()
