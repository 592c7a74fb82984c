"""Rank and permutation primitives over the (small, static) driver axis.

The reference engine calls Python `sorted()` on car lists several times per
lap (simulation.py:179, :506, :549). On TPU we replace every sort with:

  * `rank_by`    — O(D^2) pairwise comparison ranks (ties broken by index,
                   matching Python's stable sort over list order),
  * `scatter_by_rank` / `gather_at_rank` — relational permutation chains
                   that move values between car-indexed and position-indexed
                   layouts without gather/scatter engines.

LAYOUT: arrays are DRIVER-MAJOR — (..., D, S) with the driver axis
second-to-last and the simulation batch on the minor (lane) axis. TPU
vector units are 8 sublanes x 128 lanes: a (S, D) layout at D≈20 pads the
lane axis 20 -> 128 and wastes ~84% of every vector op AND 6.4x the HBM
traffic of every materialized intermediate; driver-major puts the huge
sims axis on the lanes (full utilization) and pads only the 8-sublane
driver axis (20 -> 24). This is the same layout the fused Pallas kernel
uses, for the same reason.

Every function is an UNROLLED relational loop over the D drivers (D is
small and static): each step is an elementwise (..., D, S) op XLA fuses,
and nothing materializes a (..., D, D, S) pairwise tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_IKEY_BASE = 0x3E800000  # bitcast(0.25f)
_IKEY_FLOOR = 0.25  # keys clamp here first: sub-floor values tie -> index
_DNF_KEY_BASE = 2_100_000_000


def _row_iota(d: int) -> jnp.ndarray:
    return jnp.arange(d, dtype=jnp.int32)[:, None]  # (D, 1)


def rank_by_unique(keys: jnp.ndarray, dnf: jnp.ndarray | None = None) -> jnp.ndarray:
    """`rank_by` for non-negative f32 time keys, one compare per pair step.

    Builds strictly-unique int32 keys via the monotone f32 bit pattern —
    ((bitcast(max(k, 0.25)) - bitcast(0.25)) >> Q) * M + index — so the
    pairwise comparison needs ONE compare instead of the three-op
    lexicographic tie-break. The packing widens with the field:
    (Q=2, M=32) up to 32 rows (the original layout — every D<=32 result
    stays bitwise unchanged) and (Q=3, M=64) for 33..64; both scale
    quantized keys by M >> Q = 8, so the int32 headroom is identical.
    Exact f32 ties, pairs within 2^Q ULP (≈4-8 ms at race scale), and
    values below 0.25 s arbitrate by index — the same arbitration `rank_by`
    applies to exact ties, validated against the native oracle at 262k sims
    (sub-noise-floor TV; mirrors ops/pallas_engine.rank_key).
    Exact-ordering domain: [0.25, ~5e8) s — make_sim_params caps lap pace
    at 15,000 s, keeping any plausible race orders of magnitude inside.
    `dnf` marks cars that sort last (distinct keys)."""
    d = keys.shape[-2]
    if d > 64:
        # the *M+index packing is only injective for <=64 rows; rare
        # oversize fields take the exact lexicographic path instead
        masked = keys if dnf is None else jnp.where(dnf, jnp.float32(1e30), keys)
        return rank_by(masked)
    q_shift, row_mult = (2, 32) if d <= 32 else (3, 64)
    idx = _row_iota(d)
    bits = jax.lax.bitcast_convert_type(jnp.maximum(keys, _IKEY_FLOOR), jnp.int32)
    ikey = ((bits - _IKEY_BASE) >> q_shift) * row_mult + idx
    if dnf is not None:
        ikey = jnp.where(dnf, _DNF_KEY_BASE + idx, ikey)
    r = jnp.zeros(keys.shape, jnp.int32)
    for j in range(d):
        r += (ikey[..., j : j + 1, :] < ikey).astype(jnp.int32)
    return r


def rank_by(keys: jnp.ndarray) -> jnp.ndarray:
    """Dense competition ranks of `keys` along the DRIVER axis, ascending.

    rank_i = #{ j : k_j < k_i  or  (k_j == k_i and j < i) }

    Ties broken by index, which reproduces Python's stable `sorted()` over a
    list held in index order. Works for any leading batch dims. Returns int32
    — always an exact permutation of 0..D-1 per lane.
    """
    d = keys.shape[-2]
    idx = _row_iota(d)
    r = jnp.zeros(keys.shape, jnp.int32)
    for j in range(d):
        kj = keys[..., j : j + 1, :]
        before = (kj < keys) | ((kj == keys) & (j < idx))
        r += before.astype(jnp.int32)
    return r


def scatter_by_rank(values: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Reorder car-indexed `values` into position-indexed order.

    out[..., p, :] = values of the car whose rank is p. `rank` must be a
    permutation per lane (as produced by `rank_by`).
    """
    return scatter_by_rank_multi((values,), rank)[0]


def scatter_by_rank_multi(values: tuple, rank: jnp.ndarray) -> list:
    """`scatter_by_rank` for several arrays sharing ONE rank permutation:
    the D relational eq masks are built once and reused across every
    payload (explicitly — not relying on XLA CSE), so k arrays cost
    D*(1 eq + k selects) instead of D*k*(eq + select). Mirrors the fused
    kernel's gather_rows_multi mask sharing."""
    d = rank.shape[-2]
    pos = _row_iota(d)
    outs = [jnp.zeros_like(v) for v in values]
    for c in range(d):
        # car c lands at position rank[..., c, :]
        eq = rank[..., c : c + 1, :] == pos
        outs = [
            jnp.where(eq, v[..., c : c + 1, :], o) for v, o in zip(values, outs)
        ]
    return outs


def gather_at_rank(sorted_values: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `scatter_by_rank`: read position-indexed values back to cars.

    out[..., c, :] = sorted_values[..., rank[c], :].
    """
    d = rank.shape[-2]
    out = jnp.zeros_like(sorted_values)
    for p in range(d):
        # position p's value goes to every car whose rank is p (exactly one)
        out = jnp.where(rank == p, sorted_values[..., p : p + 1, :], out)
    return out


def value_of_car_ahead(
    values: jnp.ndarray, rank: jnp.ndarray, fill: float = 0.0
) -> jnp.ndarray:
    """For each car, the `values` entry of the car one rank ahead of it.

    Rank-0 cars (the leader) get `fill`. This is the vectorized form of the
    reference's car-ahead lookups (dirty air at simulation.py:179-183, DRS
    gap at :556-559, overtake pairs at :508-512).

    One direct relational chain — out_i = values_j where rank_j == rank_i-1
    — mirroring the fused kernel's value_of_ahead_multi.
    """
    d = rank.shape[-2]
    out = jnp.full(values.shape, fill, values.dtype)
    rm1 = rank - 1
    for j in range(d):
        eq = rank[..., j : j + 1, :] == rm1
        out = jnp.where(eq, values[..., j : j + 1, :], out)
    return out
