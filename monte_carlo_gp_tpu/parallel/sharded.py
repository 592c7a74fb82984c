"""Season-scale sharded simulation: many races x many simulations on a 2D
(race, sims) mesh in one compile.

This is BASELINE.md's "full-season backtest sharded across chips" config:
per-race `SimParams` are stacked into one race-batched pytree (padding the
driver axis to the largest entry list), lap counts become a traced per-race
scalar over a fixed max-lap scan, and a single vmapped+jitted program
simulates every (race, simulation) pair with GSPMD partitioning both axes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from monte_carlo_gp_tpu.config import SimParams
from monte_carlo_gp_tpu.ops.engine import simulate_races


def stack_params(params_list: list[SimParams]) -> tuple[SimParams, int]:
    """Stack per-race SimParams into one race-batched pytree.

    Pads the driver axis to the widest race; padding slots get active=False
    (they start retired and classify last — engine contract). Returns
    (stacked params, max drivers D).
    """
    d_max = max(p.n_drivers for p in params_list)

    def pad(p: SimParams) -> SimParams:
        d = p.n_drivers
        if d == d_max:
            return p
        extra = d_max - d

        def pad1(x):
            return jnp.pad(x, (0, extra))

        return dataclasses.replace(
            p,
            grid_probs=jnp.pad(p.grid_probs, ((0, extra), (0, extra))),
            base_pace=pad1(p.base_pace),
            tire_deg=pad1(p.tire_deg),
            variance=pad1(p.variance),
            dnf_rate=pad1(p.dnf_rate),
            team_dnf_rate=pad1(p.team_dnf_rate),
            active=jnp.pad(p.active, (0, extra), constant_values=False),
        )

    padded = [pad(p) for p in params_list]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded)
    return stacked, d_max


# Measured note (one v5e): the race-vmap costs ~5x per sim vs the flat
# engine (5.9s vs 1.1s for 200k sims x 78 masked laps) — XLA lays out the
# batched (R, S, D[, D]) intermediates less favorably. Tolerable: this path
# exists for multi-chip scale-out and its warm device time is a small
# fraction of the walk-forward host prep; the fused Pallas kernel is the
# single-host flagship.
@functools.partial(
    jax.jit,
    static_argnames=("n_sims", "max_laps", "mesh", "race_axis", "sims_axis"),
)
def _season_probs(
    stacked: SimParams,
    race_laps: jax.Array,
    keys: jax.Array,
    n_sims: int,
    max_laps: int,
    mesh: Mesh,
    race_axis: str,
    sims_axis: str,
) -> jax.Array:
    def one_race(params, laps, key):
        positions = simulate_races(params, key, n_sims, max_laps, race_laps=laps)
        return positions

    positions = jax.vmap(one_race)(stacked, race_laps, keys)  # (R, S, D)
    positions = jax.lax.with_sharding_constraint(
        positions, NamedSharding(mesh, P(race_axis, sims_axis, None))
    )
    d = positions.shape[-1]
    onehot = positions[..., None] == jnp.arange(1, d + 1, dtype=positions.dtype)
    counts = jnp.sum(onehot, axis=1, dtype=jnp.int32)  # psum over sims shards
    return counts.astype(jnp.float32) / n_sims


def simulate_season_sharded(
    params_list: list[SimParams],
    laps_list: list[int],
    key: jax.Array,
    n_sims: int,
    mesh: Mesh | None = None,
    race_axis: str = "race",
    sims_axis: str = "sims",
) -> np.ndarray:
    """Simulate a whole season: returns (n_races, D, D) finish probabilities.

    One compile serves all races (variable lap counts via masked scan).
    Race r uses fold_in(key, r), so per-race results are identical to
    running that race alone with the same subkey.
    """
    if mesh is None:
        from monte_carlo_gp_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        race_dim = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
        mesh = make_mesh({race_axis: race_dim, sims_axis: n_dev // race_dim})
    stacked, _ = stack_params(params_list)
    max_laps = int(max(laps_list))
    race_laps = jnp.asarray(laps_list, jnp.int32)
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
        jnp.arange(len(params_list))
    )
    with jax.set_mesh(mesh):
        probs = _season_probs(
            stacked, race_laps, keys, n_sims, max_laps, mesh, race_axis, sims_axis
        )
    return np.asarray(probs)
