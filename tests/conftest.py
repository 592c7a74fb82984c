"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax initializes, so
every multi-chip sharding path is exercised without TPU hardware
(SURVEY.md §4). Must run before any jax import in the test session.

Set MCGP_TEST_TPU=1 to keep the real TPU backend instead — this enables the
hardware-only stochastic Pallas tests (interpreter-mode PRNG returns zeros,
so they skip on CPU):  MCGP_TEST_TPU=1 pytest tests/ -m slow -k tpu
"""

import os

_USE_TPU = os.environ.get("MCGP_TEST_TPU") == "1"

if not _USE_TPU:
    # The sandbox's sitecustomize force-registers the TPU backend in every
    # interpreter regardless of JAX_PLATFORMS, so the env var alone is not
    # enough — override the platform through jax.config after import.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))  # for tests.oracle imports

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def std_setup():
    """A 20-driver parameter set shared by engine tests."""
    import jax
    from monte_carlo_gp_tpu.config import make_sim_params

    d = 20
    rng = np.random.default_rng(7)
    grid_probs = np.zeros((d, d), np.float32)
    for i in range(d):
        for p in range(d):
            grid_probs[i, p] = np.exp(-((p - i) ** 2) / 8.0)
    grid_probs /= grid_probs.sum(axis=1, keepdims=True)
    params = make_sim_params(
        grid_probs=grid_probs,
        base_pace=90.0 + 0.06 * np.arange(d),
        tire_deg=np.clip(0.05 + 0.015 * rng.standard_normal(d), 0.01, 0.15),
        variance=np.full(d, 0.15, np.float32),
        dnf_rate=np.full(d, 0.0008, np.float32),
        team_dnf_rate=np.full(d, 0.002, np.float32),
        pit_loss=21.0,
        overtake_delta=0.6,
    )
    return params, jax.random.PRNGKey(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: statistical oracle comparisons (minutes)"
    )
