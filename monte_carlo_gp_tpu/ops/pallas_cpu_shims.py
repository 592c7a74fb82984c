"""CPU lowerings for the Mosaic primitives the race kernel uses, enabling
the GENERIC Pallas interpreter (`pallas_call(..., interpret=True)`) to run
the kernel off-TPU.

Why this exists: the TPU interpret mode (`pltpu.force_tpu_interpret_mode`)
emulates a TPU's DMAs/semaphores through host callbacks with process-local
emulator state — under a `shard_map` whose mesh spans MULTIPLE PROCESSES
(the gloo-backed multihost dryrun, tests/test_multihost.py) its execution
deadlocks: every worker compiles, passes the coordination barrier, then
wedges inside the emulated kernel (measured with both `on_wait` and
`eager` DMA modes; a plain-HLO shard_map body and a generic-interpreter
pallas_call both execute fine in the same harness). The generic
interpreter lowers the kernel to ordinary HLO, which the multi-process
CPU runtime executes like any other program — it only lacks lowering
rules for three `pltpu` primitives:

  * prng_seed       -> no-op (stateful TPU PRNG seeding)
  * prng_random_bits-> zeros (MATCHES the TPU interpreter, whose PRNG also
                       returns zeros off-hardware — CLAUDE.md; so generic
                       and TPU-interpreter runs are bit-identical)
  * bitcast         -> lax.bitcast_convert_type (same-width reinterpret)

Registration is idempotent and CPU-only; real TPU lowering (Mosaic) is
untouched. Test infrastructure — the production path never interprets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.interpreters import mlir

_REGISTERED = False


def register_cpu_shims() -> None:
    """Idempotently register CPU lowerings for prng_seed / prng_random_bits
    / bitcast so the generic Pallas interpreter can run the race kernel."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax._src.pallas.mosaic import primitives as mp

    def _seed_impl(*seeds, **params):
        return []

    mlir.register_lowering(
        mp.prng_seed_p,
        mlir.lower_fun(_seed_impl, multiple_results=True),
        platform="cpu",
    )

    def _bits_impl(*, shape):
        # int32 zeros: the exact dtype/value the TPU interpreter produces
        # (its PRNG returns zeros off-hardware).
        return jnp.zeros(shape, jnp.int32)

    mlir.register_lowering(
        mp.prng_random_bits_p,
        mlir.lower_fun(_bits_impl, multiple_results=False),
        platform="cpu",
    )

    def _bitcast_impl(x, *, ty):
        # Same-bitwidth reinterpret (the kernel only uses 32 <-> 32).
        return jax.lax.bitcast_convert_type(x, ty)

    mlir.register_lowering(
        mp.bitcast_p,
        mlir.lower_fun(_bitcast_impl, multiple_results=False),
        platform="cpu",
    )
    _REGISTERED = True
