"""Counter-based RNG stream derivation.

All stochastic draws in the engine come from a single base key, fanned out by
(lap, stream) with `fold_in`. Because `jax_threefry_partitionable` is enabled
(package __init__), full-shape draws like `normal(key, (S, D))` produce the
same global values under any device sharding — this is the bitwise
reproducibility contract from BASELINE.md.

The reference consumes one global Python/NumPy RNG stream in data-dependent
order (simulation.py passim), which is impossible (and pointless) to match
bitwise; the contract there is distributional equality at fixed seed.
"""

from __future__ import annotations

import os

import jax

# Bit-source implementation for the XLA engine's bulk draws.
#   threefry2x32 — pure-software counter-based bits; bitwise stable across
#     backends and JAX versions (the repo's long-standing portable contract;
#     the default everywhere except on TPU).
#   rbg — key derivation (fold_in/split) still threefry over the key data,
#     but bulk bit *generation* lowers to the XLA RngBitGenerator op, which
#     is hardware-accelerated on TPU (the software threefry costs the XLA
#     engine ~300 (D,S)-op equivalents per lap, ~30% of its op budget —
#     docs/KERNEL_DESIGN.md; measured 0.85M -> 1.05M sims/s on v5e).
#     Sharding/device-count bitwise invariance holds (validated in
#     tests/test_rng_impl.py); values are NOT stable across backends or XLA
#     versions, so rbg results differ from threefry results at the same seed.
#
# Default resolution: MCGP_RNG_IMPL if set, else rbg when the default JAX
# backend is TPU, else threefry2x32. On TPU the flagship Pallas kernel
# already draws from the on-core hardware PRNG with exactly rbg's stability
# semantics (stable per seed within a backend/version, not across), so the
# XLA engine defaulting to the hardware bit source there is consistent —
# and threefry remains one env var (or `rng_impl=` argument) away.


def default_impl() -> str:
    """Resolve the bit-source default (see comment above).

    MCGP_RNG_IMPL is read at call time, not import time, so setting the
    env var after the package is imported still takes effect.
    """
    impl = os.environ.get("MCGP_RNG_IMPL")
    if impl:
        return impl
    return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"

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


def engine_key(key: jax.Array, impl: str | None = None) -> jax.Array:
    """Convert the engine's base key to the configured bit-source impl.

    `impl=None` resolves via `default_impl()` (MCGP_RNG_IMPL if set, else
    rbg on TPU / threefry elsewhere). For 'rbg' the (2,)-word threefry key
    data is doubled into the (4,)-word rbg layout; all stream structure
    still comes from `fold_in`, so the threefry and rbg draw trees are
    derived identically — only the bulk bit generation differs.
    """
    impl = impl or default_impl()
    if impl == "threefry2x32":
        return key
    import jax.numpy as jnp

    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    return jax.random.wrap_key_data(jnp.concatenate([data, data]), impl=impl)
