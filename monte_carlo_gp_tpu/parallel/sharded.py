"""Season-scale sharded simulation: many races x many simulations in one
compile, simulations GSPMD-sharded across the whole mesh.

This is BASELINE.md's "full-season backtest sharded across chips" config:
per-race `SimParams` are stacked into one race-batched pytree (padding the
driver axis to the largest entry list), lap counts become a traced per-race
scalar over a fixed max-lap scan, and a single jitted program runs the
races as a `lax.map` of flat single-race engine calls — sims sharded over
every device, races sequential (see the measured note at `_season_probs`:
vmapping the race axis cost 20.8x in XLA layout pathology and buys nothing
for equal-sized independent races).
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


# Measured note (one v5e, benchmarks/season_vmap.py): batching the race
# axis with `vmap` cost 20.8x per sim vs the flat engine (5.89s vs 0.283s
# for the same 204,800 sims x 78 masked laps) — XLA lays out the batched
# (R, S, D[, D]) intermediates pathologically, and the gap *grew* as the
# flat engine got faster (round 2 measured 5.9s vs 1.1s = 5x; the vmap
# time never moved). Races are therefore run as a `lax.map` (sequential
# scan) of flat single-race programs inside ONE compile: each iteration is
# exactly the well-tiled flat engine, the sims axis stays GSPMD-sharded
# across every mesh device, and per-race results remain bitwise equal to
# solo launches (same fold_in(key, r) keys, same (S, D) draw shapes).
# Sequential races lose nothing — races are equal-sized independent work,
# so race-sharding and race-sequencing have identical total throughput —
# and peak memory drops by R (positions die per iteration; the carried
# histogram is (D, D)).
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
    # Shard the sims dim over every mesh axis: a (race, sims) mesh folds
    # both axes into the sims partition, so legacy 2D meshes use all their
    # devices (the race axis is sequential now).
    axes = tuple(a for a in (race_axis, sims_axis) if a in mesh.axis_names)
    if not axes:
        raise ValueError(
            f"mesh axes {mesh.axis_names} contain neither {race_axis!r} "
            f"nor {sims_axis!r}; build the mesh with make_mesh({{'sims': "
            f"n_devices}}) or pass matching axis names"
        )
    spec = P(axes if len(axes) > 1 else axes[0], None)

    def one_race(args):
        params, laps, key = args
        positions = simulate_races(params, key, n_sims, max_laps, race_laps=laps)
        positions = jax.lax.with_sharding_constraint(
            positions, NamedSharding(mesh, spec)
        )
        d = positions.shape[-1]
        onehot = positions[..., None] == jnp.arange(1, d + 1, dtype=positions.dtype)
        counts = jnp.sum(onehot, axis=0, dtype=jnp.int32)  # psum over shards
        return counts.astype(jnp.float32) / n_sims

    return jax.lax.map(one_race, (stacked, race_laps, keys))


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

        # Races run sequentially (lax.map), so the whole device fleet goes
        # on the sims axis; a legacy (race, sims) mesh still uses every
        # device (both axes fold into the sims partition).
        mesh = make_mesh({sims_axis: len(jax.devices())})
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
