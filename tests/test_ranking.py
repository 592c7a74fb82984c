"""Unit tests for the rank/permutation primitives (ops/ranking.py).

DRIVER-MAJOR layout: arrays are (..., D, S) — driver axis second-to-last,
simulation batch on the lanes (ops/ranking.py module docstring)."""

import jax.numpy as jnp
import numpy as np

from monte_carlo_gp_tpu.ops.ranking import (
    gather_at_rank,
    rank_by,
    rank_by_unique,
    scatter_by_rank,
    value_of_car_ahead,
)


def _dm(x):
    """(S, D) test construction -> driver-major (D, S)."""
    return jnp.asarray(np.asarray(x).T)


def test_rank_matches_stable_argsort():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 20)).astype(np.float32)  # (S, D) host layout
    ranks = np.asarray(rank_by(_dm(x))).T
    expected = np.argsort(np.argsort(x, axis=-1, kind="stable"), axis=-1)
    np.testing.assert_array_equal(ranks, expected)


def test_rank_tie_break_by_index():
    x = _dm([[1.0, 0.0, 1.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(rank_by(x)).T, [[2, 0, 3, 1]])


def test_scatter_gather_roundtrip():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((8, 20)).astype(np.float32)
    keys = rng.standard_normal((8, 20)).astype(np.float32)
    rank = rank_by(_dm(keys))
    sorted_vals = scatter_by_rank(_dm(vals), rank)
    # position p holds the value of the car with rank p
    sv = np.asarray(sorted_vals).T
    for s in range(8):
        order = np.argsort(keys[s], kind="stable")
        np.testing.assert_allclose(sv[s], vals[s][order], rtol=1e-6)
    back = gather_at_rank(sorted_vals, rank)
    np.testing.assert_allclose(np.asarray(back).T, vals, rtol=1e-6)


def test_scatter_int_and_bool_dtypes():
    keys = _dm([[3.0, 1.0, 2.0]])
    rank = rank_by(keys)  # [2, 0, 1]
    ints = scatter_by_rank(_dm(np.asarray([[10, 20, 30]], np.int32)), rank)
    np.testing.assert_array_equal(np.asarray(ints).T, [[20, 30, 10]])
    assert ints.dtype == jnp.int32


def test_value_of_car_ahead():
    keys = _dm([[5.0, 1.0, 3.0]])  # ranks: [2, 0, 1]
    vals = _dm([[50.0, 10.0, 30.0]])
    ahead = value_of_car_ahead(vals, rank_by(keys), fill=-1.0)
    # car 1 leads -> fill; car 2 is behind car 1 -> 10; car 0 behind car 2 -> 30
    np.testing.assert_allclose(np.asarray(ahead).T, [[30.0, -1.0, 10.0]])


def test_rank_by_unique_matches_exact_at_20():
    """Race-scale separated keys: the quantized fast path must agree with
    the exact lexicographic rank, with and without a dnf mask."""
    rng = np.random.default_rng(3)
    keys = _dm(rng.uniform(100.0, 9000.0, (64, 20)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(rank_by_unique(keys)), np.asarray(rank_by(keys))
    )
    dnf = _dm(rng.random((64, 20)) < 0.2)
    masked = jnp.where(dnf, jnp.float32(1e30), keys)
    np.testing.assert_array_equal(
        np.asarray(rank_by_unique(keys, dnf)), np.asarray(rank_by(masked))
    )


def test_rank_by_unique_wide_fields_match_exact():
    """The widened (Q=3, M=64) packing for 33..64-row fields must agree
    with the exact lexicographic rank whenever keys are separated by more
    than the 8-ULP quantization bucket (every real race state)."""
    rng = np.random.default_rng(4)
    for d in (33, 40, 64):
        keys = _dm(rng.uniform(100.0, 9000.0, (64, d)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(rank_by_unique(keys)), np.asarray(rank_by(keys))
        )
        # dnf cars sort last, like where(dnf, INF, keys)
        dnf = _dm(rng.random((64, d)) < 0.2)
        masked = jnp.where(dnf, jnp.float32(1e30), keys)
        np.testing.assert_array_equal(
            np.asarray(rank_by_unique(keys, dnf)), np.asarray(rank_by(masked))
        )


def test_rank_by_unique_wide_field_ties_break_by_index():
    """Exact ties inside a wide (>32) field arbitrate by row index — the
    stable-sort semantics both engines and both oracles share."""
    d = 40
    keys = jnp.full((d, 1), 91.5, jnp.float32)
    ranks = np.asarray(rank_by_unique(keys))[:, 0]
    np.testing.assert_array_equal(ranks, np.arange(d))


def test_rank_by_unique_above_64_takes_exact_path():
    """Fields beyond the 64-row packing fall back to the exact
    lexicographic rank (still a correct permutation)."""
    rng = np.random.default_rng(5)
    keys = _dm(rng.uniform(80.0, 120.0, (8, 70)).astype(np.float32))
    ranks = np.asarray(rank_by_unique(keys))
    for row in ranks.T:
        np.testing.assert_array_equal(np.sort(row), np.arange(70))
