"""Unit tests for the rank/permutation primitives (ops/ranking.py)."""

import jax.numpy as jnp
import numpy as np

from monte_carlo_gp_tpu.ops.ranking import (
    gather_at_rank,
    rank_by,
    scatter_by_rank,
    value_of_car_ahead,
)


def test_rank_matches_stable_argsort():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 20)).astype(np.float32)
    ranks = np.asarray(rank_by(jnp.asarray(x)))
    expected = np.argsort(np.argsort(x, axis=-1, kind="stable"), axis=-1)
    np.testing.assert_array_equal(ranks, expected)


def test_rank_tie_break_by_index():
    x = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(rank_by(x)), [[2, 0, 3, 1]])


def test_scatter_gather_roundtrip():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((8, 20)).astype(np.float32)
    keys = rng.standard_normal((8, 20)).astype(np.float32)
    rank = rank_by(jnp.asarray(keys))
    sorted_vals = scatter_by_rank(jnp.asarray(vals), rank)
    # position p holds the value of the car with rank p
    for s in range(8):
        order = np.argsort(keys[s], kind="stable")
        np.testing.assert_allclose(np.asarray(sorted_vals)[s], vals[s][order], rtol=1e-6)
    back = gather_at_rank(sorted_vals, rank)
    np.testing.assert_allclose(np.asarray(back), vals, rtol=1e-6)


def test_scatter_int_and_bool_dtypes():
    keys = jnp.asarray([[3.0, 1.0, 2.0]])
    rank = rank_by(keys)  # [2, 0, 1]
    ints = scatter_by_rank(jnp.asarray([[10, 20, 30]], jnp.int32), rank)
    np.testing.assert_array_equal(np.asarray(ints), [[20, 30, 10]])
    assert ints.dtype == jnp.int32


def test_value_of_car_ahead():
    keys = jnp.asarray([[5.0, 1.0, 3.0]])  # ranks: [2, 0, 1]
    vals = jnp.asarray([[50.0, 10.0, 30.0]])
    ahead = value_of_car_ahead(vals, rank_by(keys), fill=-1.0)
    # car 1 leads -> fill; car 2 is behind car 1 -> 10; car 0 behind car 2 -> 30
    np.testing.assert_allclose(np.asarray(ahead), [[30.0, -1.0, 10.0]])
