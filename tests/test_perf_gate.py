"""On-TPU performance regression gates (VERDICT r4 #6).

Run with:  MCGP_TEST_TPU=1 pytest tests/test_perf_gate.py -q

Catches kernel/engine perf regressions in-round instead of at bench time:
the fused Pallas kernel and the XLA lap-scan engine must hold a floor at
the scored bench shape (20 drivers x 57 laps). Thresholds sit well below
the healthy-tunnel headlines (3.0M / 1.11M sims/s measured this round) so
ordinary tunnel jitter cannot flake them, while a real regression (e.g.
the round-2 28x compile pathology's runtime cousins) still fails.

Tunnel-sickness aware, in both observed failure modes (CLAUDE.md):
  * hard outage — ABORTED/UNAVAILABLE on any device touch: SKIPPED via
    the shared signature classifier;
  * silent degradation — no errors, but a tiny op takes seconds-to-
    minutes (observed >8 min for 5+ hours): a tiny-op wall-clock sanity
    check runs before each gate AND again before declaring a failure, so
    a slow measurement on a sick tunnel SKIPS instead of blaming the
    kernel.

The TPU platform check is env-driven (MCGP_TEST_TPU, the same switch
tests/conftest.py uses) — never `jax.devices()` at import time, which
would turn an outage into a collection error before any skip could run.
"""

import os
import time

import numpy as np
import pytest

ON_TPU = os.environ.get("MCGP_TEST_TPU") == "1"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not ON_TPU, reason="perf gates need real TPU (set MCGP_TEST_TPU=1)"
    ),
]

N_DRIVERS = 20
LAPS = 57
PALLAS_SIMS = 1_048_576
PALLAS_FLOOR = 2.5e6  # sims/s (headline ~3.0M)
XLA_SIMS = 262_144
XLA_FLOOR = 0.9e6  # sims/s (headline ~1.11M)
TINY_OP_SANE_S = 10.0  # a healthy tunnel answers a tiny op in <~1 s


def _skip_on_outage(fn):
    from monte_carlo_gp_tpu.utils.outage import is_backend_outage

    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — classify, re-raise non-outage
        if is_backend_outage(e):
            pytest.skip(f"TPU tunnel outage: {str(e)[:120]}")
        raise


def _tiny_op_seconds():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.ones(8).sum() + jax.random.uniform(jax.random.PRNGKey(0)))
    return time.perf_counter() - t0


def _require_sane_tunnel(context: str):
    dt = _skip_on_outage(_tiny_op_seconds)
    if dt > TINY_OP_SANE_S:
        pytest.skip(
            f"tunnel degraded ({context}): tiny op took {dt:.1f}s "
            f"(> {TINY_OP_SANE_S:.0f}s sanity bound)"
        )


def _best_of(run, keys):
    times = []
    for k in keys:
        t0 = time.perf_counter()
        np.asarray(run(k))
        times.append(time.perf_counter() - t0)
    return min(times)


def _gate(run, n_sims, floor, label):
    """Compile, verify, measure; skip on outage or degraded tunnel, fail
    only when the tunnel re-verifies healthy after a below-floor read."""
    import jax

    def stage():
        from benchmarks.common import stage_on_device, standard_params

        params = standard_params(N_DRIVERS)
        key = jax.random.PRNGKey(42)
        return stage_on_device(params, key, n_keys=3)

    _require_sane_tunnel("before staging")
    params, keys = _skip_on_outage(stage)
    probs = _skip_on_outage(lambda: np.asarray(run(params, keys[0])))
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    best = _skip_on_outage(
        lambda: _best_of(lambda k: run(params, k), keys)
    )
    sims_per_sec = n_sims / best
    if sims_per_sec < floor:
        # Re-verify before blaming the code: a silently-degraded tunnel
        # produces arbitrarily slow measurements with no error raised.
        _require_sane_tunnel("after below-floor measurement")
        pytest.fail(
            f"{label} regressed: {sims_per_sec/1e6:.2f}M sims/s "
            f"< {floor/1e6:.1f}M floor (best {best:.3f}s)"
        )


def test_pallas_kernel_throughput_floor():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas

    def run(params, k):
        return run_monte_carlo_pallas(params, k, PALLAS_SIMS, LAPS)

    _gate(run, PALLAS_SIMS, PALLAS_FLOOR, "fused kernel")


def test_xla_engine_throughput_floor():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from monte_carlo_gp_tpu.ops.engine import DEFAULT_BLOCK, run_monte_carlo

    def run(params, k):
        return run_monte_carlo(
            params, k, XLA_SIMS, LAPS,
            sims_per_block=min(DEFAULT_BLOCK, XLA_SIMS),
        )

    _gate(run, XLA_SIMS, XLA_FLOOR, "XLA engine")
