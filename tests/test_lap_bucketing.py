"""Lap-count compile bucketing (kills per-circuit recompiles, VERDICT r1 #7).

The predictor compiles engines at lap-count buckets (multiples of 16) and
passes the circuit's actual length as the traced `race_laps` scalar. BOTH
engines are bitwise bucket-independent: the XLA engine because draws are
keyed by (key, lap, stream) — ops/rng.py — so dead laps' draws are simply
discarded; the fused Pallas kernel because `race_laps` is the lap loop's
DYNAMIC trip count, so padded laps never execute (no dead-lap compute or
PRNG draws). Verified bitwise here (interpreter) and on TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from monte_carlo_gp_tpu.config import make_sim_params
from monte_carlo_gp_tpu.models.predictor import _lap_bucket
from monte_carlo_gp_tpu.ops.engine import run_monte_carlo
from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas

ON_TPU = jax.devices()[0].platform == "tpu"


def params(d=8):
    gp = np.exp(
        -((np.arange(d)[None, :] - np.arange(d)[:, None]) ** 2) / 6.0
    ).astype(np.float32)
    gp /= gp.sum(1, keepdims=True)
    return make_sim_params(
        grid_probs=gp,
        base_pace=90 + 0.12 * np.arange(d),
        tire_deg=np.full(d, 0.05),
        variance=np.full(d, 0.15),
        dnf_rate=np.full(d, 0.001),
        team_dnf_rate=np.full(d, 0.002),
        pit_loss=21.0,
        overtake_delta=0.6,
    )


def test_lap_bucket_math():
    assert _lap_bucket(44) == 48
    assert _lap_bucket(57) == 64
    assert _lap_bucket(64) == 64
    assert _lap_bucket(78) == 80
    assert _lap_bucket(5) == 16
    # the 2025 calendar's 22 distinct lap counts fall into 5 buckets
    from monte_carlo_gp_tpu.config import CIRCUITS

    buckets = {_lap_bucket(int(c["laps"])) for c in CIRCUITS.values()}
    assert len(buckets) <= 5, buckets


def test_xla_bucketed_run_is_bitwise_exact():
    """run_monte_carlo at a padded bucket with race_laps masking must equal
    the exact-length compile bit for bit (per-lap keyed draws)."""
    p = params()
    key = jax.random.PRNGKey(11)
    exact = np.asarray(run_monte_carlo(p, key, 2048, 25))
    bucketed = np.asarray(
        run_monte_carlo(p, key, 2048, 32, race_laps=jnp.int32(25))
    )
    np.testing.assert_array_equal(exact, bucketed)


@pytest.mark.skipif(
    ON_TPU,
    reason="force_tpu_interpret_mode ABORTS the axon TPU client, poisoning "
    "the whole test process (CLAUDE.md outage signature); this is a CPU-mesh "
    "structure test — the hardware contract is the _on_tpu test below",
)
def test_pallas_bucketed_masking_structure():
    """Interpreter mode (zero PRNG -> fully deterministic procession): the
    bucket-masked kernel must match the exact-length kernel exactly; a
    broken mask would keep racing past race_laps and change pit/fuel state."""
    p = params()
    key = jax.random.PRNGKey(0)
    with pltpu.force_tpu_interpret_mode():
        exact = np.asarray(
            run_monte_carlo_pallas(p, key, 256, 12, sims_per_tile=128)
        )
        masked = np.asarray(
            run_monte_carlo_pallas(
                p, key, 256, 16, sims_per_tile=128, race_laps=jnp.int32(12)
            )
        )
    np.testing.assert_array_equal(exact, masked)
    np.testing.assert_allclose(masked.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
@pytest.mark.slow
def test_pallas_bucketed_is_bitwise_bucket_independent_on_tpu():
    """The dynamic lap-loop trip count makes the hardware-PRNG result a
    function of race_laps alone: a padded bucket must be EXACTLY the
    exact-length compile, same key (matching the XLA engine's contract)."""
    p = params()
    key = jax.random.PRNGKey(4)
    exact = np.asarray(
        run_monte_carlo_pallas(p, key, 16384, 25, sims_per_tile=1024)
    )
    masked = np.asarray(
        run_monte_carlo_pallas(
            p, key, 16384, 32, sims_per_tile=1024, race_laps=jnp.int32(25)
        )
    )
    np.testing.assert_array_equal(exact, masked)


def test_simulate_plan_buckets_and_stays_valid(tmp_path):
    """End-to-end: Bahrain (57 laps -> bucket 64) through simulate_plan on
    both engine paths produces valid, deterministic histograms."""
    from monte_carlo_gp_tpu.data.synthetic import SyntheticBackend
    from monte_carlo_gp_tpu.models.predictor import F1Predictor

    p = F1Predictor(cache_dir=tmp_path, backend=SyntheticBackend(seed=5, n_events=1))
    plan = p.prepare_weekend(2024, "Bahrain")
    assert plan.total_laps == 57
    a = p.simulate_plan(plan, 512, seed=3)
    b = p.simulate_plan(plan, 512, seed=3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a.sum(axis=1), 1.0, atol=1e-4)
