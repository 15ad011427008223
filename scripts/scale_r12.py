"""Round-12 scale measurement: e80's oversized-cluster re-split at
PRODUCTION embedding width (dim=1024).

Round-11 verdict #1 residual: the tiled sweep bounded the similarity
tiles, but one applyInPandas task still held the whole cluster's m×dim
embedding matrix — ~6-12 GB/task for a 1M-member hot cluster at
dim 768-1536. Round 12 re-splits clusters over SEMDEDUP_MAX_CLUSTER
with a second deterministic IVF level, so the WORST sweep task holds a
sub-cluster: memory O(cap·dim + blk²) regardless of corpus duplication
structure.

This script measures the worst-task peak driver-side with tracemalloc
at dim=1024: the UNCAPPED task at growing hot-cluster sizes (peak grows
linearly with m — the embedding matrix dominates), then the CAPPED
worst task (one sub-cluster) which stays constant. Prints ready-to-
paste SCALE.md rows. Value identity of the split is pinned separately
in tests/test_semdedup_split.py.

Usage: python scripts/scale_r12.py
"""

from __future__ import annotations

import tracemalloc

import numpy as np

DIM = 1024
BLK = 2048        # SEMDEDUP_SWEEP_BLOCK
CAP = 16384       # a scaled-down SEMDEDUP_MAX_CLUSTER for the audit
NONE = -2.0


def tiled_sweep(E: np.ndarray, blk: int = BLK) -> np.ndarray:
    """Mirrors operators/similarity.py sweep_block (arithmetic only)."""
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


def peak_mb(fn, *args) -> float:
    tracemalloc.start()
    fn(*args)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return peak / 1e6


def main() -> None:
    rng = np.random.RandomState(0)
    print(f"dim={DIM} blk={BLK} audit-cap={CAP}")
    print("UNCAPPED worst task (whole hot cluster in one sweep):")
    for m in (CAP, 2 * CAP, 4 * CAP):
        E = rng.randn(m, DIM)
        # the task receives the embeddings as input (not counted by the
        # sweep's own allocations) — add their resident size explicitly
        held = E.nbytes / 1e6
        p = peak_mb(tiled_sweep, E)
        print(f"  m={m:>7,}: sweep-alloc peak {p:8.1f} MB "
              f"+ {held:8.1f} MB held embeddings = {p + held:8.1f} MB")
        del E
    print(f"CAPPED worst task (one sub-cluster of ~cap/2={CAP // 2:,} "
          f"members, ANY parent size):")
    E = rng.randn(CAP // 2, DIM)
    held = E.nbytes / 1e6
    p = peak_mb(tiled_sweep, E)
    print(f"  m={CAP // 2:>7,}: sweep-alloc peak {p:8.1f} MB "
          f"+ {held:8.1f} MB held embeddings = {p + held:8.1f} MB")
    print(
        f"production bound at SEMDEDUP_MAX_CLUSTER=65,536, dim=1024: "
        f"{65536 * DIM * 8 / 1e6:,.0f} MB embeddings "
        f"+ ~3×{BLK * BLK * 8 / 1e6:.0f} MB live tiles per task"
    )


if __name__ == "__main__":
    main()
