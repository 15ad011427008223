"""Interleaved HEAD/old bench protocol → BENCH_INTERLEAVED.json.

This sandbox shows ±40% (occasionally ±3x) wall-clock drift between
identical runs (BASELINE.md "Host variance"), so a single-process bench
sum cannot adjudicate a round. The comparison unit is per-query MEDIANS
from INTERLEAVED full-headline passes — HEAD, old, HEAD, old — so host
drift lands on both sides symmetrically. bench.py embeds this file's
content into its JSON line, putting the comparison unit in the
BENCH_r{N}.json artifact itself (round-9 verdict #7).

Usage:
    python scripts/bench_interleaved.py [old_ref] [passes_per_side]

``old_ref`` defaults to the previous round's final commit; each pass is
one full-headline bench.py run (SPARK_GRAFT_BENCH_RUNS=1) in its own
process, on its own checkout (git worktree), at the same sf dir.
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
import subprocess
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
DEFAULT_OLD_REF = "44b14e3"  # round-9 final


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — this sandbox is a KVM
    guest with time-varying neighbor steal (r14: 0.9% idle vs 5.9%+ under
    load), which is exactly the non-canceling contamination an ABBA
    interleave cannot cancel when the neighbor's activity has structure
    on the per-pass timescale. Recording per-pass steal makes a
    contaminated artifact diagnosable from the artifact alone."""
    with open("/proc/stat") as fh:
        vals = list(map(int, fh.readline().split()[1:]))
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _run_pass(checkout: pathlib.Path) -> tuple[dict[str, float], float]:
    env = {**os.environ, "SPARK_GRAFT_BENCH_RUNS": "1"}
    s0, t0 = _cpu_ticks()
    out = subprocess.run(
        [sys.executable, str(checkout / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(checkout),
        timeout=1800,
    )
    s1, t1 = _cpu_ticks()
    steal_pct = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
    line = [
        ln for ln in out.stdout.strip().splitlines()
        if ln.startswith("{")
    ][-1]
    return json.loads(line)["queries"], steal_pct


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OLD_REF
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # optional cooldown between passes (r14): back-to-back passes keep the
    # box under sustained 32-core load for ~an hour; a pause lets hypervisor
    # neighbor bursts decorrelate from pass boundaries
    cooldown_s = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    old_dir = pathlib.Path(tempfile.mkdtemp(prefix="bench_old_")) / "wt"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(old_dir), old_ref],
        cwd=str(ROOT), check=True, capture_output=True,
    )
    try:
        head_runs: list[dict] = []
        old_runs: list[dict] = []
        head_steal: list[float] = []
        old_steal: list[float] = []
        first_run = True  # r14 ADVICE: sleep before every run but the
        # very first — inferring "first" from the per-side sinks skipped
        # the cooldown before pass 0's SECOND run, making the inter-run
        # decorrelation asymmetric in the first pair
        for i in range(passes):
            # ABBA interleave (round 11): strict HEAD-first alternation
            # gave OLD the warmer slot every pair (positions 2,4,6 ride
            # the page cache + thermal state the position-1 pass paid
            # for), showing up as a reproducible ~1.25x on I/O-heavy
            # queries whose files were byte-identical across the trees
            # (e14/m04/m08 — adjudicated by a solo A/B at 1.05x).
            # Alternating the STARTING side each pair cancels the
            # position bias in the per-side medians.
            first, second = (
                (("HEAD", ROOT, head_runs, head_steal),
                 (old_ref, old_dir, old_runs, old_steal))
                if i % 2 == 0
                else ((old_ref, old_dir, old_runs, old_steal),
                      ("HEAD", ROOT, head_runs, head_steal))
            )
            for label, checkout, sink, steal_sink in (first, second):
                print(f"pass {i + 1}/{passes}: {label}", file=sys.stderr)
                if cooldown_s and not first_run:
                    import time as _time

                    _time.sleep(cooldown_s)
                first_run = False
                q, steal = _run_pass(checkout)
                sink.append(q)
                steal_sink.append(steal)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(old_dir)],
            cwd=str(ROOT), capture_output=True,
        )
    shared = sorted(
        set.intersection(*[set(r) for r in head_runs + old_runs])
    )
    head_med = {
        q: round(statistics.median(r[q] for r in head_runs), 3)
        for q in shared
    }
    old_med = {
        q: round(statistics.median(r[q] for r in old_runs), 3)
        for q in shared
    }
    doc = {
        "protocol": f"interleaved HEAD/{old_ref} x{passes}, "
                    "median per query per side, shared queries only",
        "old_ref": old_ref,
        "passes_per_side": passes,
        "cooldown_s": cooldown_s,
        # raw per-pass walls + hypervisor steal%% per pass (r14): lets a
        # reader separate host contamination (per-pass uniform inflation,
        # high steal) from real per-query movement without re-running
        "head_passes": head_runs,
        "old_passes": old_runs,
        "head_steal_pct": head_steal,
        "old_steal_pct": old_steal,
        "head_median": head_med,
        "old_median": old_med,
        "ratio": {
            q: round(head_med[q] / old_med[q], 3) if old_med[q] else None
            for q in shared
        },
        "head_total": round(sum(head_med.values()), 3),
        "old_total": round(sum(old_med.values()), 3),
        "total_ratio": round(
            sum(head_med.values()) / sum(old_med.values()), 3
        ),
    }
    with open(ROOT / "BENCH_INTERLEAVED.json", "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
