"""monte_carlo_gp_tpu — TPU-native stochastic F1 race simulator.

A ground-up JAX/XLA rebuild of the capabilities of dan-lee-gh/monte-carlo-gp
(reference mounted at /root/reference): Monte Carlo race simulation (tire
degradation, pit stops, safety cars, VSC, red flags, DRS, overtakes, DNFs),
dual qualifying/race Elo ratings, feature engineering over historical lap
archives, weekend prediction orchestration, and Brier-score backtesting.

Architecture (TPU-first, not a port):
  - The per-lap simulation loop (reference: serial Python for-loop at
    simulation.py:83) is a `lax.scan` over laps carrying a struct-of-arrays
    car-state pytree of shape (n_sims, n_drivers), batched directly over
    simulations and sharded across chips via `jax.sharding`.
  - All stochastic event draws are counter-based threefry samples
    (`jax_threefry_partitionable=True`), so results are bitwise-reproducible
    per seed under any device sharding.
  - Sorting/position logic becomes rank computations + one-hot permutation
    matmuls (MXU/VPU friendly, no data-dependent control flow).
  - Elo updates (reference: elo.py) become a `lax.scan` over a padded event
    tensor with vectorized O(n^2) pairwise expected-score matrices.
  - The data layer is off the hot path (pandas/numpy), emits dense jnp
    tensors, and supports real offline/cached operation (the reference README
    promises this but never implemented it — see SURVEY.md).
"""

import os

import jax

# Bitwise reproducibility of RNG under any sharding: partitionable threefry
# makes jax.random draws independent of the device mesh layout.
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: TPU compiles of the race engine are tens of
# seconds; cache them across processes (CLI invocations, backtests). Opt out
# with MCGP_COMPILE_CACHE=0 or point it elsewhere with a path.
#
# The cache lives under a HOST-FINGERPRINT subdirectory: $HOME can outlive
# the machine (shared/portable home dirs), and XLA:CPU AOT executables
# compiled on a host with different CPU features load with a "could lead to
# SIGILL" warning and non-identical float codegen — observed to flip
# Monte Carlo outcomes and destabilize the statistical accuracy gates. A
# per-CPU-flags cache directory makes every entry host-compatible; moving
# to a new machine type just pays one fresh compile set.


def _host_fingerprint() -> str:
    import hashlib
    import platform

    probe = platform.machine() + ";" + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    probe += ";" + line.strip()
                    break
    except OSError:
        pass
    return hashlib.sha256(probe.encode()).hexdigest()[:12]


def _cache_dir() -> str | None:
    """Resolved persistent-cache directory, or None when opted out
    (MCGP_COMPILE_CACHE=0). Single source of truth — utils/jax_setup.py
    reuses this so the CLIs and the library never disagree on the path."""
    target = os.environ.get("MCGP_COMPILE_CACHE", "")
    if target == "0":
        return None
    base = target or os.path.expanduser("~/.cache/mcgp_jax")
    return os.path.join(base, _host_fingerprint())


_cache = _cache_dir()
if _cache is not None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

# Development-time numeric sanitizer (SURVEY.md §5): MCGP_DEBUG_NANS=1 makes
# any NaN produced under jit raise immediately with a traceback.
if os.environ.get("MCGP_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)

__version__ = "0.1.0"
