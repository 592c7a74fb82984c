"""Counter-based RNG stream derivation.

All stochastic draws in the engine come from a single base key, fanned out by
(lap, stream) with `fold_in`. Because `jax_threefry_partitionable` is enabled
(package __init__), full-shape draws like `normal(key, (D, S))` produce the
same global values under any device sharding — this is the bitwise
reproducibility contract from BASELINE.md.

The reference consumes one global Python/NumPy RNG stream in data-dependent
order (simulation.py passim), which is impossible (and pointless) to match
bitwise; the contract there is distributional equality at fixed seed.
"""

from __future__ import annotations

import jax

# Stream ids — one per independent random decision in the event model.
STREAM_GRID = 0          # grid sampling gumbels
STREAM_RACE_CONTROL = 1  # red-flag / SC / VSC uniforms
STREAM_VSC_REFUND = 2    # 30% tire-age refund draw under VSC
STREAM_DNF = 3           # per-car DNF Bernoulli
STREAM_LAP_NOISE = 4     # per-car lap-time gaussian
STREAM_START = 5         # lap-1 start-delta gaussian
STREAM_OVERTAKE = 6      # overtake success draws (subkeys per pass/phase)

_N_STREAMS = 16  # spacing between lap counters; > number of streams above


def lap_stream(key: jax.Array, lap, stream: int) -> jax.Array:
    """Derive the key for (lap, stream). `lap` may be a traced int."""
    return jax.random.fold_in(key, lap * _N_STREAMS + stream)


def subkey(key: jax.Array, i: int) -> jax.Array:
    """Derive the i-th subkey of a stream key (e.g. overtake pass/phase)."""
    return jax.random.fold_in(key, i)
