"""Cold-compile bisect harness for the fused pallas kernel.

Times the FIRST execution (on the remote backend `.compile()` defers the
heavy Mosaic work to first run), separated from tunnel/backend setup by a
tiny-op warmup. This is the harness that bisected the 28x cold-compile
regression to the DRS sign-bit bitcast (KERNEL_DESIGN.md round 4), driven
leg by leg through MCGP_KERNEL_ABLATE with the persistent compile cache
disabled.

Usage: MCGP_COMPILE_CACHE=0 [MCGP_KERNEL_ABLATE=...] \
           python benchmarks/compile_time.py [tile] [laps] [n_tiles]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from benchmarks.common import standard_params


def main() -> None:
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    laps = int(sys.argv[2]) if len(sys.argv) > 2 else 57
    n_tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    import jax

    from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas

    print(
        f"ablate={os.environ.get('MCGP_KERNEL_ABLATE', '')!r} "
        f"cache={os.environ.get('MCGP_COMPILE_CACHE', '')!r} "
        f"tile={tile} laps={laps} n_tiles={n_tiles}",
        flush=True,
    )
    params = standard_params()
    key = jax.random.PRNGKey(42)
    n_sims = tile * n_tiles

    t0 = time.perf_counter()
    np.asarray(jax.numpy.ones(8).sum())
    print(f"backend warmup: {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    out = np.asarray(
        run_monte_carlo_pallas(params, key, n_sims, laps, sims_per_tile=tile)
    )
    print(
        f"cold (compile+run): {time.perf_counter() - t0:.2f}s "
        f"sum={out.sum():.3f}",
        flush=True,
    )
    t0 = time.perf_counter()
    np.asarray(
        run_monte_carlo_pallas(
            params, jax.random.fold_in(key, 1), n_sims, laps, sims_per_tile=tile
        )
    )
    print(f"warm: {time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
