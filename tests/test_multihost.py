"""Multi-process (multi-'host') dryrun — SURVEY.md §5 distributed backend.

Spawns N separate python processes, each owning ONE CPU device, joined via
`jax.distributed.initialize` with gloo collectives (parallel/distributed.py)
— the hardware-free stand-in for N TPU hosts on a pod slice. The sharded
Monte Carlo must produce a histogram BITWISE identical to the
single-process virtual-mesh run: collectives and counter-based seeding
survive process boundaries.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_barrier_is_noop_without_distributed_runtime():
    """`parallel.distributed.barrier` must be callable in single-process
    mode (no jax.distributed client) — library code can call it
    unconditionally between compile and first collective."""
    from monte_carlo_gp_tpu.parallel.distributed import barrier

    barrier("not-distributed")  # must not raise


def _run_workers(tmp_path, engine: str, n_procs: int = 4):
    """Launch N gloo-joined single-device workers; return process-0's saved
    histogram. One retry: on an oversubscribed single-core host,
    coordination-service barriers can time out even with generous limits
    (a scheduling flake, not a correctness property of the code under
    test)."""
    worker = Path(__file__).parent / "multihost_worker.py"

    # Strip the sandbox's TPU auto-registration (sitecustomize initializes
    # the XLA backend at interpreter start when PALLAS_AXON_POOL_IPS is set,
    # which jax.distributed.initialize must precede) and any platform pins.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }

    def attempt(out):
        coordinator = f"127.0.0.1:{_free_port()}"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), coordinator, str(n_procs),
                 str(i), str(out), engine],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
            for i in range(n_procs)
        ]
        outputs = [p.communicate(timeout=540) for p in procs]
        return [(p.returncode, se.decode()[-2000:]) for p, (so, se) in zip(procs, outputs)]

    out = tmp_path / f"mp_probs_{engine}.npy"
    results = attempt(out)
    if any(rc != 0 for rc, _ in results):
        out = tmp_path / f"mp_probs_{engine}_retry.npy"
        results = attempt(out)
    for rc, err in results:
        assert rc == 0, err
    assert out.exists()
    return np.load(out)


@pytest.mark.slow
def test_multiprocess_sharded_monte_carlo_bitwise(tmp_path):
    """Production shape (20 drivers x 57 laps — the bench shape) across
    REAL process boundaries: 4 gloo-joined single-device workers must
    reproduce the single-process virtual-mesh histogram bitwise."""
    n_procs = 4
    multi = _run_workers(tmp_path, "xla", n_procs)

    # single-process reference on the in-process virtual mesh — the SAME
    # params/shape the workers ran (imported, so they cannot drift)
    import jax
    from multihost_worker import N_SIMS, TOTAL_LAPS, dryrun_params

    from monte_carlo_gp_tpu.parallel.mesh import make_mesh, sharded_monte_carlo

    params = dryrun_params()
    mesh = make_mesh({"sims": n_procs}, devices=jax.devices()[:n_procs])
    single = np.asarray(
        sharded_monte_carlo(
            params, jax.random.PRNGKey(11), n_sims=N_SIMS,
            total_laps=TOTAL_LAPS, mesh=mesh,
        )
    )
    np.testing.assert_array_equal(multi, single)


@pytest.mark.slow
def test_multiprocess_pallas_sharded_bitwise(tmp_path):
    """The FUSED KERNEL's sharded entry across real process boundaries
    (VERDICT r4 #3): 4 gloo-joined workers drive
    `run_monte_carlo_pallas_sharded` (interpreter mode off-TPU) through the
    AOT-compile -> barrier -> execute discipline, and the psum'd histogram
    must equal the single-process virtual-mesh run bitwise AND a
    single-DEVICE run (device-count invariance of the global tile
    seeding). Interpreter PRNG is all-zeros, so this validates the
    process-boundary mechanics — shard_map over a multi-process mesh,
    per-process pallas_call, the histogram collective, global tile-id
    layout — not the stochastic draws (hardware tests cover those)."""
    n_procs = 4
    multi = _run_workers(tmp_path, "pallas", n_procs)

    import jax
    from multihost_worker import N_SIMS, TOTAL_LAPS, dryrun_params

    from monte_carlo_gp_tpu.ops.pallas_engine import (
        run_monte_carlo_pallas,
        run_monte_carlo_pallas_sharded,
    )
    from monte_carlo_gp_tpu.parallel.mesh import make_mesh

    params = dryrun_params()
    key = jax.random.PRNGKey(11)
    mesh = make_mesh({"sims": n_procs}, devices=jax.devices()[:n_procs])
    single = np.asarray(
        run_monte_carlo_pallas_sharded(
            params, key, N_SIMS, TOTAL_LAPS, mesh=mesh, interpret="generic"
        )
    )
    np.testing.assert_array_equal(multi, single)
    # Device-count invariance AND cross-interpreter equality: a single-
    # DEVICE run under the TPU interpreter (the interpreter every other
    # CPU test uses) must match the 4-process generic-interpreter run —
    # both PRNGs return zeros off-hardware, and the global tile seeding
    # makes counts layout-blind.
    one_device = np.asarray(
        run_monte_carlo_pallas(params, key, N_SIMS, TOTAL_LAPS, interpret=True)
    )
    np.testing.assert_array_equal(multi, one_device)
