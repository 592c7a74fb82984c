"""Fused-kernel micro-bench: best-of-4 warm timing at 2^20 sims x 57 laps.

This is the harness behind docs/KERNEL_DESIGN.md's ablation/roofline tables
(run one fresh process per MCGP_KERNEL_ABLATE leg — jit caches by traced
structure) and the tile-size sweeps (the optimum MOVES with the kernel's op
mix; re-sweep after any substantial kernel change, CLAUDE.md invariant).

Usage (real TPU):
    python benchmarks/kernel_bench.py [sims_per_tile]
    MCGP_KERNEL_ABLATE=overtakes python benchmarks/kernel_bench.py
    for t in 128 256 512 1024; do python benchmarks/kernel_bench.py $t; done
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from benchmarks.common import stage_on_device, standard_params

N_SIMS = 1_048_576
LAPS = 57


def main() -> None:
    import jax

    from monte_carlo_gp_tpu.ops.pallas_engine import (
        DEFAULT_SIMS_PER_TILE,
        run_monte_carlo_pallas,
    )

    tile = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_SIMS_PER_TILE
    ablate = os.environ.get("MCGP_KERNEL_ABLATE", "")
    print(f"tile={tile} ablate={ablate!r}", file=sys.stderr, flush=True)

    params = standard_params()
    key = jax.random.PRNGKey(42)
    np.asarray(jax.numpy.ones(8).sum())  # backend init outside the timings
    params, keys = stage_on_device(params, key, n_keys=4)

    t0 = time.perf_counter()
    probs = np.asarray(
        run_monte_carlo_pallas(params, keys[0], N_SIMS, LAPS, sims_per_tile=tile)
    )
    print(f"cold: {time.perf_counter() - t0:.2f}s", file=sys.stderr, flush=True)
    if not ablate:  # ablated kernels do not produce valid histograms
        assert abs(probs.sum() - params.n_drivers) < 1e-3, probs.sum()

    times = []
    for k in keys:
        t0 = time.perf_counter()
        np.asarray(
            run_monte_carlo_pallas(params, k, N_SIMS, LAPS, sims_per_tile=tile)
        )
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"times: {[f'{t:.3f}' for t in times]}", file=sys.stderr)
    print(f"best {best:.3f}s -> {N_SIMS / best / 1e6:.3f}M sims/s")


if __name__ == "__main__":
    main()
