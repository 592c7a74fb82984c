"""Fused whole-race Pallas TPU kernel.

The XLA engine (ops/engine.py) round-trips every (D, n_sims) state array
through HBM once per lap — measured HBM-bound (~0.57M sims/s/chip in its
original sims-major form; ops/ranking.py documents the layout flip). This
kernel keeps the ENTIRE car state resident in VMEM for all laps of a tile of
simulations: HBM traffic is one parameter read and one (D, D) histogram
write per tile, making the engine compute-bound on the VPU.

Design (driver-major layout, (D, S_tile) blocks):
  * grid = one program per tile of `sims_per_tile` simulations;
  * per-tile counter-based seeding (seed array is scalar-prefetched), all
    draws from the on-core PRNG in a fixed order -> bitwise reproducible for
    a fixed (seed, tile size), independent of how tiles map to chips;
  * every sort of the reference event model is an unrolled O(D^2) pairwise
    rank loop over (D, S) registers — no gathers, no scatters, no (S, D, D)
    materialization;
  * "value of car ahead" and the overtake time-rewrite chain are relational
    one-row broadcasts (out = where(rank_j == rank-1, q_j, out));
  * the mandatory two-compound rule tracks three booleans instead of a
    bitmask.

Event-model semantics are identical to ops/lap_engine.py (which documents
the reference mapping, simulation.py line by line); equality with the XLA
engine is distributional (different RNG stream layout), validated in
tests/test_pallas_engine.py. Produces its own deterministic stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monte_carlo_gp_tpu import config as cfg
from monte_carlo_gp_tpu.config import SimParams

# Swept on hardware per kernel revision (KERNEL_DESIGN.md "Sizing"): after
# the round-3 gather/closed-form-chain work, 128-lane tiles (one vreg-row
# of lanes, ~3x the grid parallelism) beat 1024 by +22% — 3.00M vs 2.46M
# sims/s. 128 is the floor of full lane utilization; results remain keyed
# to (key, n_sims, sims_per_tile).
DEFAULT_SIMS_PER_TILE = 128
INF = 1e30
NAN = float("nan")

# scalar pack layout (SMEM)
(
    _PIT_LOSS, _OVERTAKE_DELTA, _DRS_DELTA, _SC_P, _VSC_P, _RED_P,
    _DIRTY_THRESH, _DIRTY_PEN, _TRACK_COND,
    _CPACE0, _CPACE1, _CPACE2, _CPACE3, _CPACE4,
    _CDEG0, _CDEG1, _CDEG2, _CDEG3, _CDEG4,
    _COPT0, _COPT1, _COPT2, _COPT3, _COPT4,
    _RACE_LAPS,  # traced actual lap count (<= the static compile bucket)
    _N_SCALARS,
) = range(26)

# per-driver parameter matrix columns (VMEM, (D, 8))
_BASE, _DEG, _VAR, _DNF, _TEAMDNF, _ACTIVE = range(6)
_N_PCOLS = 8  # padded to a lane-friendly width


def _pack_inputs(params: SimParams, race_laps: jax.Array):
    d = params.n_drivers
    pmat = jnp.zeros((d, _N_PCOLS), jnp.float32)
    pmat = pmat.at[:, _BASE].set(params.base_pace)
    pmat = pmat.at[:, _DEG].set(params.tire_deg)
    pmat = pmat.at[:, _VAR].set(params.variance)
    pmat = pmat.at[:, _DNF].set(params.dnf_rate)
    pmat = pmat.at[:, _TEAMDNF].set(params.team_dnf_rate)
    pmat = pmat.at[:, _ACTIVE].set(params.active.astype(jnp.float32))
    scal = jnp.concatenate(
        [
            jnp.stack(
                [
                    params.pit_loss, params.overtake_delta, params.drs_delta,
                    params.sc_prob, params.vsc_prob, params.red_flag_prob,
                    params.dirty_air_threshold, params.dirty_air_penalty,
                    params.track_condition.astype(jnp.float32),
                ]
            ),
            params.compound_pace,
            params.compound_deg,
            params.compound_optimal.astype(jnp.float32),
            jnp.asarray(race_laps, jnp.float32)[None],
        ]
    )
    safe = jnp.maximum(params.grid_probs, 0.0)
    grid_log = jnp.where(safe > 0, jnp.log(jnp.maximum(safe, 1e-38)), -INF)
    return pmat, scal, grid_log.astype(jnp.float32)


def _ablate_flags() -> frozenset:
    """Dev-only trace-time ablation switches (MCGP_KERNEL_ABLATE, comma-
    separated) used by the roofline/compile-time bisect harnesses
    (docs/KERNEL_DESIGN.md): 'overtakes' drops the whole 3-pass block,
    'ot_chain' the rewrite chain + write-back, 'ot_decide' the pair
    decisions, 'ot_extract' the permutation extracts, 'grid' the Gumbel
    grid sampler. Default (unset) is the production kernel; jit caches by
    traced structure, so flipping the env var requires a fresh process."""
    import os

    raw = os.environ.get("MCGP_KERNEL_ABLATE", "")
    return frozenset(f for f in raw.split(",") if f)


def _race_kernel(total_laps: int, d: int, s: int, season: bool = False):
    """Build the kernel body for static (laps, drivers, tile sims).

    `season=True` builds the race-batched variant: the (flattened) grid
    spans every race's tiles, the seed row carries the race id (column 3),
    per-race pmat/grid_log blocks are routed by seed-driven BlockSpec index
    maps, and scal becomes a (R, _N_SCALARS) table indexed per tile. The
    simulation body is byte-for-byte the same code."""
    ablate = _ablate_flags()

    def uniform(rows: int = d):
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows, s)), jnp.uint32)
        # >>8 leaves 24 bits, always positive, so the int32 view is exact
        # (Mosaic has no uint32 -> f32 cast).
        top24 = pltpu.bitcast(bits >> 8, jnp.int32)
        return top24.astype(jnp.float32) * (1.0 / 16777216.0)

    def normal():
        u1 = jnp.maximum(uniform(), 5.9604645e-8)
        u2 = uniform()
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(6.2831853 * u2)

    def rank_of(key):
        """Ascending ranks over the driver axis: r_i = #{j: k_j < k_i}.

        Keys must be UNIQUE (build with `rank_key`). The rank passes are the
        kernel's dominant VPU cost; this 2-op pairwise loop replaces the
        5-op (value, index)-lexicographic compare for +~10% whole-kernel."""
        r = jnp.zeros((d, s), jnp.int32)
        for j in range(d):
            r += (key[j : j + 1, :] < key).astype(jnp.int32)
        return r

    def rank_of_tiebreak(key):
        """Exact (value, row-index)-lexicographic ranks over possibly-tied
        f32 keys — the reference's stable-sort semantics. Used once per race
        (classification); per-lap ranks use `rank_key` + `rank_of`."""
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (d, s), 0)
        r = jnp.zeros((d, s), jnp.int32)
        for j in range(d):
            kj = key[j : j + 1, :]
            before = (kj < key) | ((kj == key) & (j < row_iota))
            r += before.astype(jnp.int32)
        return r

    def gather_rows_multi(xs, idx):
        """out_k[i, lane] = xs[k][idx[i, lane], lane], idx in [0, d) — a
        per-lane SUBLANE gather via tpu.dynamic_gather (take_along_axis).
        Mosaic supports it only with idx.shape == src.shape and a single
        source vreg (<=8 rows) along the gather dim, so the d-row gather is
        decomposed into (8-row out) x (8-row src) blocks combined by range
        selects: ~9 one-vreg gathers + 6 selects per array at D=20, an
        order of magnitude fewer vreg-ops than the 20-step broadcast/select
        extraction chain it replaces (and bitwise-identical values). Rows
        pad to a multiple of 8; pad rows are never selected (idx < d).
        Gathering several arrays by ONE index shares the per-block local
        index and range masks across all of them (explicitly — not relying
        on Mosaic CSE)."""
        d8 = -(-d // 8) * 8
        ip = idx
        xps = list(xs)
        if d8 != d:
            pad = lambda a: jnp.concatenate(
                [a, jnp.zeros((d8 - d, s), a.dtype)], axis=0
            )
            ip = pad(idx)
            xps = [pad(x) for x in xps]
        bases = list(range(0, d8, 8))
        out_blocks = [[] for _ in xps]
        for ob in bases:
            idx_b = ip[ob : ob + 8, :]
            accs = [None] * len(xps)
            for sb in bases:
                local = jnp.clip(idx_b - sb, 0, 7)
                in_range = idx_b >= sb
                for k, xp in enumerate(xps):
                    g = jnp.take_along_axis(xp[sb : sb + 8, :], local, axis=0)
                    accs[k] = g if accs[k] is None else jnp.where(
                        in_range, g, accs[k]
                    )
            for k in range(len(xps)):
                out_blocks[k].append(accs[k])
        outs = []
        for blocks in out_blocks:
            out = blocks[0] if len(blocks) == 1 else jnp.concatenate(
                blocks, axis=0
            )
            outs.append(out[:d, :])
        return outs

    def gather_rows(x, idx):
        return gather_rows_multi((x,), idx)[0]

    # Unique integer sort keys ~ (cum, row index) lexicographic.
    #
    # Exact f32 cum ties are REAL and systematic, not measure-zero: cum sits
    # on an f32 quantization grid (ULP ~5e-4 s at cum~4e3 s), so close cars
    # land on the same grid point ~0.04% of adjacent pairs per lap. A shared
    # rank corrupts the overtake row write-back (both cars read the SUM of
    # their times), so ties must break by row index — exactly like the
    # reference's stable sort and the oracles.
    #
    # bitcast(f32) is strictly monotone for non-negative floats, so
    #   ((bitcast(max(cum, 0.25)) - bitcast(0.25)) >> Q) * M + row
    # orders by (cum quantized to 2^Q ULP, row index) in int32. The packing
    # widens with the (static) field size: (Q=2, M=32) up to 32 rows — the
    # original layout, so every D<=32 result stays bitwise unchanged —
    # (Q=3, M=64) for 33..64 rows, and (Q=4, M=128) for 65..128 rows
    # (guarded in run_monte_carlo_pallas). Every tier
    # scales quantized cum by M >> Q = 8, so the int32 headroom is identical:
    # live keys stay below the 2.1e9 DNF sentinel for cum < ~5e8 s
    # (make_sim_params caps lap pace at 15,000 s, keeping any plausible race
    # orders of magnitude inside), and the 0.25 s floor keeps tiny/zero
    # times in-domain (sub-floor values tie -> index).
    # Pairs distinct-but-within-2^Q-ULP (milliseconds at race scale)
    # arbitrate by index instead of value — the same arbitration applied to
    # exact ties, far inside measurement noise (validated vs the native
    # oracle at 262k sims). Mirrors ops/ranking.rank_by_unique.
    _IKEY_BASE = 0x3E800000  # bitcast(0.25f)
    _Q_SHIFT, _ROW_MULT = (
        (2, 32) if d <= 32 else ((3, 64) if d <= 64 else (4, 128))
    )

    def rank_key(cum, row_iota, dnf=None):
        ikey = pltpu.bitcast(jnp.maximum(cum, 0.25), jnp.int32)
        ikey = ((ikey - _IKEY_BASE) >> _Q_SHIFT) * _ROW_MULT + row_iota
        if dnf is None:
            return ikey
        # DNF cars sort last (mirrors where(dnf, INF, cum)), distinct keys.
        return jnp.where(dnf, 2_100_000_000 + row_iota, ikey)

    def row_pick(mask, q):
        """sum_j where(mask_j, q_j, 0) -> (1, S); mask selects <=1 row/lane."""
        return jnp.sum(jnp.where(mask, q, 0.0), axis=0, keepdims=True)

    def value_of_ahead_multi(qs, rank, fills):
        """out_k[i] = qs[k][j] with rank[j] == rank[i]-1; leaders get
        fills[k]. One shared eq-mask pass serves every payload: the DRS gap
        (cum) and the next lap's dirty-air lookup (last_lap) ride the same
        chain instead of two independent O(D^2) passes."""
        outs = [jnp.full((d, s), f, jnp.float32) for f in fills]
        rm1 = rank - 1
        for j in range(d):
            eq = rank[j : j + 1, :] == rm1
            outs = [
                jnp.where(eq, q[j : j + 1, :], o) for q, o in zip(qs, outs)
            ]
        return outs

    def compound_tables(scal, compound):
        """All three 5-entry table lookups (deg, pace, optimal) in one
        masked pass — the eq masks are shared, so 5 eq + 15 selects replace
        the 30 ops of three independent select chains."""
        deg = jnp.zeros(compound.shape, jnp.float32)
        pace = jnp.zeros(compound.shape, jnp.float32)
        opt = jnp.zeros(compound.shape, jnp.float32)
        for c in range(5):
            m = compound == c
            deg = jnp.where(m, scal[_CDEG0 + c], deg)
            pace = jnp.where(m, scal[_CPACE0 + c], pace)
            opt = jnp.where(m, scal[_COPT0 + c], opt)
        return deg, pace, opt

    def condition_compound(track_cond, remaining):
        dry = jnp.where(
            remaining > 30, cfg.HARD, jnp.where(remaining > 15, cfg.MEDIUM, cfg.SOFT)
        )
        return jnp.where(
            track_cond == cfg.FULL_WET,
            cfg.WET,
            jnp.where(track_cond == cfg.DAMP, cfg.INTERMEDIATE, dry),
        ).astype(jnp.int32)

    def kernel(seeds_ref, pmat_ref, scal_ref, gridlog_ref, out_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (d, s), 0)
        # 0.1 * position, hoisted for the overtake chain's closed form
        # (Mosaic's tpu.iota is integer-only, so cast rather than f32-iota).
        tenth_iota = row_iota.astype(jnp.float32) * 0.1
        tile = pl.program_id(0)
        # Two 32-bit words per tile (the folded threefry key's full data) —
        # a single int32 seed would birthday-collide across many tiles.
        # A third word flags padding tiles (multi-chip sharding pads the tile
        # count to a device multiple); their histograms are zeroed so counts
        # are bitwise identical under any device count. Season grids add a
        # fourth word: the tile's race id (global, so sharding-invariant).
        pltpu.prng_seed(seeds_ref[tile, 0], seeds_ref[tile, 1])
        tile_valid = seeds_ref[tile, 2]
        if season:
            # Materialize the race's scalar row into registers ONCE: every
            # consumer uses a STATIC index, and reading the row lazily via
            # scal_ref[rid, k] inside the lap loop re-issues dynamic SMEM
            # loads per lap that Mosaic does not hoist (measured ~2x
            # whole-kernel).
            rid = seeds_ref[tile, 3]
            scal = [scal_ref[rid, k] for k in range(_N_SCALARS)]
            pmat = pmat_ref[0]  # (1, D, P) race block -> (D, P)
            gridlog = gridlog_ref[0]
        else:
            scal = scal_ref
            pmat = pmat_ref
            gridlog = gridlog_ref
        active = pmat[:, _ACTIVE : _ACTIVE + 1] > 0.5  # (D, 1)
        active_b = jnp.broadcast_to(active, (d, s))
        base_pace = pmat[:, _BASE : _BASE + 1]
        driver_deg = pmat[:, _DEG : _DEG + 1]
        variance = pmat[:, _VAR : _VAR + 1]
        dnf_rate = pmat[:, _DNF : _DNF + 1]
        team_dnf = pmat[:, _TEAMDNF : _TEAMDNF + 1]
        track_cond = scal[_TRACK_COND].astype(jnp.int32)
        drs_delta = scal[_DRS_DELTA]
        overtake_delta = scal[_OVERTAKE_DELTA]

        # ---- grid sampling: masked Gumbel-max per slot ---------------------
        remaining = active_b
        start_pos = jnp.full((d, s), d, jnp.int32)
        if "grid" in ablate:
            start_pos = row_iota
        for pos in range(d if "grid" not in ablate else 0):
            col = gridlog[:, pos : pos + 1]  # (D, 1)
            masked = jnp.where(remaining, col, -INF)
            col_max = jnp.max(masked, axis=0, keepdims=True)
            col_empty = col_max <= -INF / 2
            logits = jnp.where(col_empty & remaining, 0.0, masked)
            u = jnp.maximum(uniform(), 5.9604645e-8)
            score = logits + (-jnp.log(-jnp.log(u)))
            score = jnp.where(remaining, score, -INF)
            best = jnp.max(score, axis=0, keepdims=True)
            is_best = (score == best) & remaining
            first = jnp.min(jnp.where(is_best, row_iota, d), axis=0, keepdims=True)
            win = row_iota == first  # exactly one row per lane (or none)
            any_rem = jnp.max(remaining.astype(jnp.int32), axis=0, keepdims=True) > 0
            take = win & any_rem
            start_pos = jnp.where(take, pos, start_pos)
            remaining = remaining & ~take

        # ---- init cars (simulation.py:244-273) ------------------------------
        top10 = start_pos < 10
        dry_compound = jnp.where(top10, cfg.SOFT, cfg.MEDIUM)
        compound = jnp.where(
            track_cond == cfg.FULL_WET,
            cfg.WET,
            jnp.where(track_cond == cfg.DAMP, cfg.INTERMEDIATE, dry_compound),
        ).astype(jnp.int32)
        age = jnp.where((track_cond == cfg.DRY) & top10, 4.0, 0.0)
        used_s = compound == cfg.SOFT
        used_m = compound == cfg.MEDIUM
        used_h = compound == cfg.HARD
        fuel = jnp.full((d, s), 110.0, jnp.float32)
        cum = jnp.zeros((d, s), jnp.float32)
        last_lap = jnp.zeros((d, s), jnp.float32)
        behind = jnp.zeros((d, s), jnp.float32)
        dnf = ~active_b
        dnf_lap = jnp.zeros((d, s), jnp.float32)
        drs = jnp.zeros((d, s), jnp.bool_)
        laps_done = jnp.zeros((d, s), jnp.float32)
        drs_until = jnp.zeros((1, s), jnp.float32)

        def clean_lap_time(comp_deg, comp_pace, age, fuel, drs, noise):
            factor = jnp.where(driver_deg > 0, driver_deg / 0.05, 1.0)
            return (
                base_pace
                + age * comp_deg * factor
                - (110.0 - fuel) * 0.03
                + comp_pace
                - jnp.where(drs, drs_delta, 0.0)
                + variance * noise
            )

        # ---- lap 1 (simulation.py:275-311) ----------------------------------
        u_dnf = uniform()
        lap1_dnf = ~dnf & (u_dnf < team_dnf * 4.0)
        noise = normal()
        comp_deg1, comp_pace1, _ = compound_tables(scal, compound)
        base_lap = clean_lap_time(comp_deg1, comp_pace1, age, fuel, drs, noise)
        position = start_pos.astype(jnp.float32) + 1.0
        sigma = jnp.minimum(1.5, 0.5 + position * 0.1)
        start_delta = sigma * normal()
        start_delta = jnp.where(
            position <= 3, jnp.minimum(start_delta, 1.0), start_delta
        )
        lap_time = base_lap - start_delta * 0.5
        alive = ~dnf & ~lap1_dnf
        dnf = dnf | lap1_dnf
        dnf_lap = jnp.where(lap1_dnf, 1.0, dnf_lap)
        cum = jnp.where(alive, cum + lap_time, cum)
        age = jnp.where(alive, age + 1.0, age)
        fuel = jnp.where(alive, jnp.maximum(0.0, fuel - 1.5), fuel)
        # position update lap 1 (no DRS)
        key1 = jnp.where(dnf, INF, cum)
        leader = jnp.min(key1, axis=0, keepdims=True)
        behind = jnp.where(dnf, behind, cum - leader)
        urank = rank_of(rank_key(cum, row_iota, dnf))

        # ---- laps 2..L -------------------------------------------------------
        race_laps = scal[_RACE_LAPS]  # traced actual laps <= static bucket

        def lap_body(lap_i, state):
            # Carry is all-f32: Mosaic cannot legalize scf.for with mixed
            # bool/int vector carries. Decode to typed values on entry.
            (cum, last_lap, behind, age, compound_f, used_s_f, used_m_f,
             used_h_f, fuel, dnf_f, dnf_lap, drs_f, laps_done,
             drs_until, urank_f, ahead_ll) = state
            compound = compound_f.astype(jnp.int32)
            used_s = used_s_f > 0.5
            used_m = used_m_f > 0.5
            used_h = used_h_f > 0.5
            dnf = dnf_f > 0.5
            drs = drs_f > 0.5
            lap = lap_i.astype(jnp.float32)
            act = ~dnf

            # race control draws (red -> SC -> VSC); fixed 8-row block so
            # the per-sim rows exist even for tiny (<4 driver) grids
            u_rc = uniform(rows=8)
            is_red = u_rc[0:1, :] < scal[_RED_P]
            is_sc = ~is_red & (u_rc[1:2, :] < scal[_SC_P])
            is_vsc = ~is_red & ~is_sc & (u_rc[2:3, :] < scal[_VSC_P])
            vsc_refund = is_vsc & (u_rc[3:4, :] < 0.3)

            key_t = jnp.where(dnf, INF, cum)
            # cum/dnf are untouched since the previous lap's position update,
            # so its rank is exactly this lap's race-control rank.
            rank = urank_f.astype(jnp.int32)
            leader = jnp.min(key_t, axis=0, keepdims=True)
            leader_laps = row_pick((rank == 0) & act, laps_done)
            rank_f = rank.astype(jnp.float32)
            laps_down = leader_laps - laps_done
            sc_time = leader + rank_f * 0.5 + jnp.where(
                laps_down > 0, laps_down * 90.0, 0.0
            )
            vsc_time = leader + (cum - leader) * 0.8
            red_time = leader + rank_f * 0.1

            m_red = is_red & act
            m_sc = is_sc & act
            m_vsc = is_vsc & act
            any_event = m_red | m_sc | m_vsc
            cum = jnp.where(
                m_red, red_time,
                jnp.where(m_sc, sc_time, jnp.where(m_vsc, vsc_time, cum)),
            )
            behind = jnp.where(any_event, cum - leader, behind)
            refund = m_sc | (vsc_refund & act)
            age = jnp.where(
                m_red, 0.0, jnp.where(refund, jnp.maximum(0.0, age - 1.0), age)
            )
            remaining = race_laps - lap
            red_compound = condition_compound(track_cond, remaining)
            compound = jnp.where(m_red, red_compound, compound)
            used_s = used_s | (m_red & (red_compound == cfg.SOFT))
            used_m = used_m | (m_red & (red_compound == cfg.MEDIUM))
            used_h = used_h | (m_red & (red_compound == cfg.HARD))
            drs_until = jnp.where(
                is_red | is_sc, lap + 2.0, jnp.where(is_vsc, lap + 1.0, drs_until)
            )

            # dirty air: last lap of the car one (active) rank ahead.
            # The carried rank is still current: race-control rewrites are
            # monotone in rank among active cars (SC: leader + rank*0.5;
            # VSC: gaps scaled by 0.8; red: leader + rank*0.1) and dnf is
            # untouched since the carry, so re-ranking cum here would
            # reproduce `rank` exactly — up to rank_key QUANTIZE ties a
            # fresh re-rank could arbitrate differently: sub-ULP VSC
            # rounding, and (the wider window) red-flag/bunched spacings
            # finer than the key's 2^Q-ULP bucket (4 ULP at D<=32, 8/16 at
            # the wider tiers), which exceeds the 0.1 s red-flag gap once
            # cum is above ~5e5 s (~2.5e5/~1.3e5 for the wider tiers —
            # all reachable only far inside the validated 15,000 s/lap
            # domain; see the rank-key note at _IKEY_BASE). Either reading
            # only changes WHICH car feeds
            # the dirty-air lookup in those corner states; both engines
            # reuse the carried rank consistently, so the effect is
            # distributionally negligible and cross-engine consistent.
            # Saves one O(D^2) rank pass per lap. The VALUE is carried too:
            # it was computed at the previous lap's position update from
            # exactly this (rank, last_lap) pair, fused with the DRS gap
            # chain — bitwise identical to recomputing it here.
            ahead_llt = ahead_ll

            # DNF draw + lap time
            u_d = uniform()
            new_dnf = act & (u_d < dnf_rate)
            alive = act & ~new_dnf
            # One fused table pass serves the lap-time model AND the pit
            # logic below (compound is unchanged in between).
            comp_deg, comp_pace, opt = compound_tables(scal, compound)
            clean = clean_lap_time(comp_deg, comp_pace, age, fuel, drs, normal())
            in_dirty = (behind > 0) & (ahead_llt > 0) & (behind < scal[_DIRTY_THRESH])
            lap_time = jnp.where(
                in_dirty, jnp.maximum(clean + scal[_DIRTY_PEN], ahead_llt), clean
            )
            dnf = dnf | new_dnf
            dnf_lap = jnp.where(new_dnf, lap, dnf_lap)
            cum = jnp.where(alive, cum + lap_time, cum)
            last_lap = jnp.where(alive, lap_time, last_lap)
            age = jnp.where(alive, age + 1.0, age)
            fuel = jnp.where(alive, jnp.maximum(0.0, fuel - 1.5), fuel)
            laps_done = jnp.where(alive, laps_done + 1.0, laps_done)

            # pit stops (simulation.py:433-494)
            opt_adj = jnp.where(
                driver_deg > 0.05,
                jnp.floor(opt * 0.85),
                jnp.where(driver_deg < 0.02, jnp.floor(opt * 1.1), opt),
            )
            pit = ~dnf & (age > opt_adj) & (remaining > 5)
            new_compound = condition_compound(track_cond, remaining)
            n_used_dry = (
                used_s.astype(jnp.int32)
                + used_m.astype(jnp.int32)
                + used_h.astype(jnp.int32)
            )
            repeats = (
                ((new_compound == cfg.SOFT) & used_s)
                | ((new_compound == cfg.MEDIUM) & used_m)
                | ((new_compound == cfg.HARD) & used_h)
            )
            must_switch = (n_used_dry == 1) & repeats & (track_cond == cfg.DRY)
            alt = jnp.where(
                remaining > 20,
                jnp.where(~used_m, cfg.MEDIUM, cfg.HARD),
                jnp.where(~used_s, cfg.SOFT, cfg.MEDIUM),
            )
            new_compound = jnp.where(must_switch, alt, new_compound).astype(jnp.int32)
            cum = jnp.where(pit, cum + scal[_PIT_LOSS], cum)
            compound = jnp.where(pit, new_compound, compound)
            used_s = used_s | (pit & (new_compound == cfg.SOFT))
            used_m = used_m | (pit & (new_compound == cfg.MEDIUM))
            used_h = used_h | (pit & (new_compound == cfg.HARD))
            age = jnp.where(pit, 0.0, age)

            # overtakes: 3 passes (simulation.py:496-536)
            #
            # Each pass runs fully in POSITION space. One permutation-
            # extract per pass moves (cum, pace, attack-pace) into
            # position-indexed rows with broadcast selects — eq between the
            # attacker row of `orank` and the row iota — instead of the
            # earlier row_pick formulation whose 2D-1 cross-sublane
            # reductions dominated the block (+9% whole-kernel measured).
            # Row p of R_* is the value of the car with rank p, so the pair
            # decision (reference: pace delta incl. attacker's DRS vs the
            # circuit overtake delta) is one adjacent-row subtraction, the
            # 19-step sequential time-rewrite chain runs on (1,S) row
            # slices, and one relational select per position writes the
            # rewritten times back to driver space. DNF'd cars keep their
            # frozen cum position in the chain; their NaN pace makes any
            # pair involving them ineligible, as before.
            #
            # Three PLAIN f32 arrays are extracted per pass. An earlier
            # round packed the DRS flag into the pace sign bit (two arrays,
            # `abs` + `pltpu.bitcast` sign test after extraction) — that
            # bitcast on the 20-select extraction chain sent the Mosaic
            # compile from ~25 s to ~450 s (28x cold-compile regression,
            # bisected with MCGP_KERNEL_ABLATE); the third extraction costs
            # ~1% runtime and compiles in seconds. `att` (pace net of the
            # attacker's DRS bonus) is computed in driver space first, so
            # `delta` is bitwise identical to both earlier formulations.
            pace = jnp.where(dnf, NAN, base_pace + age * driver_deg)
            att = pace - jnp.where(drs, drs_delta, 0.0)
            pass_active = jnp.ones((1, s), jnp.bool_)
            n_passes = 3 if d > 1 and "overtakes" not in ablate else 0
            for _ in range(n_passes):
                orank = rank_of(rank_key(cum, row_iota))
                # inverse permutation: inv[p] = driver at position p (one
                # relational chain); the three position-space arrays then
                # come from ONE index via sublane gathers instead of three
                # 20-step broadcast/select chains — bitwise-identical
                # values, measured ~0.5x the vreg-ops. (A 5-bit packed
                # scatter-sum alternative — bits [5*orank, 5*orank+5) of
                # ceil(d/6) words assembled by sublane sums — produced
                # bitwise-identical inv but measured 0.7% SLOWER overall
                # and +40 s compile: the (D,S)->(1,S) reductions cost what
                # the eq/select rows save. See KERNEL_DESIGN.md.)
                inv = jnp.zeros((d, s), jnp.int32)
                if "ot_extract" not in ablate:
                    for j in range(d):
                        inv = jnp.where(orank[j : j + 1, :] == row_iota, j, inv)
                r_cum, r_pace, r_att = gather_rows_multi((cum, pace, att), inv)
                if "ot_decide" not in ablate:
                    # attacker at position p (rows 1..d-1) vs the car at
                    # p-1: delta = ahead_pace - my_pace + my_drs_bonus
                    # (NaN -> False)
                    delta = r_pace[: d - 1, :] - r_att[1:, :]
                    prob = jnp.minimum(0.5, delta * 0.5)
                    u = uniform()
                    swap = (delta > overtake_delta) & (u[1:, :] < prob) & pass_active
                else:
                    swap = (uniform()[1:, :] < 0.1) & pass_active
                if "ot_chain" not in ablate:
                    # The reference's sequential time-rewrite chain
                    #   for p in 1..d-1:
                    #     nb = max(0.1, rows[p-1] - 0.1)
                    #     if swap[p]: rows[p-1] = nb + 0.3; rows[p] = nb
                    # reduces to the recurrence (a_p = rows[p] as read by
                    # step p+1):
                    #   a_p = swap[p] ? max(0.1, a_{p-1} - 0.1) : r_cum[p]
                    # with swap[0] = False. Runs of consecutive swaps have
                    # the CLOSED FORM a_p = max(0.1, r_cum[j] - 0.1*(p-j))
                    # where j = j(p) is the last unswapped row <= p. And
                    # because r_cum is SORTED (it is cum in position order),
                    # z_q = r_cum[q] + 0.1*q is increasing, so the last
                    # unswapped row is also the arg-max of z among unswapped
                    # rows — one log2(d)-level Kogge–Stone prefix-MAX of
                    #   z = where(swapped, -inf, r_cum + 0.1*q)
                    # replaces the earlier two-sequence (c, b) affine-max
                    # scan at half the per-level cost (1 shift + 1 max vs
                    # 2 shifts + 3 ALU), and a 19-step sequential (1,S) row
                    # chain entirely (latency-bound; see KERNEL_DESIGN.md).
                    # FP caveats: (i) a_p is evaluated as
                    # (r_cum[j] + 0.1*j) - 0.1*p, which can differ by ULPs
                    # from the reference's one-by-one subtraction — far
                    # below the rank-key quantization already documented,
                    # and validated vs the native oracle at 262k sims;
                    # (ii) within a rank-key tie bucket r_cum may locally
                    # DECREASE by up to 4 ULP (index-arbitrated ranks), so
                    # z-monotonicity needs the +0.1 step to dominate —
                    # true for cum below ~5e5 s, the same regime bound as
                    # the carried-rank note above; beyond it the picked
                    # run-start can differ within the bucket, a
                    # bucket-width-bounded perturbation in states the
                    # ranking already arbitrates by index.
                    # Concatenate in f32, not bool: Mosaic can't vreg-cast
                    # i1 vectors inside concatenate (same legalization gap
                    # as the bool fori_loop carries).
                    swap_f = jnp.concatenate(
                        [jnp.zeros((1, s), jnp.float32),
                         swap.astype(jnp.float32)], axis=0
                    )
                    swapped = swap_f > 0.5
                    z = jnp.where(swapped, -INF, r_cum + tenth_iota)
                    dist = 1
                    while dist < d:
                        z = jnp.maximum(
                            z,
                            jnp.concatenate(
                                [jnp.full((dist, s), -INF, jnp.float32),
                                 z[: d - dist, :]], axis=0
                            ),
                        )
                        dist *= 2
                    a = jnp.where(
                        swapped,
                        jnp.maximum(0.1, z - tenth_iota),
                        r_cum,
                    )
                    # final[p] = swap[p+1] ? max(0.1, a_p - 0.1) + 0.3 : a_p
                    swap_next = jnp.concatenate(
                        [swap_f[1:, :], jnp.zeros((1, s), jnp.float32)],
                        axis=0,
                    ) > 0.5
                    final = jnp.where(
                        swap_next, jnp.maximum(0.1, a - 0.1) + 0.3, a
                    )
                    # write-back = gather by each driver's own position
                    cum = gather_rows(final, orank)
                else:
                    cum = cum + 0.0 * r_cum
                pass_active = pass_active & jnp.any(
                    swap, axis=0, keepdims=True
                )

            # position / DRS update (simulation.py:538-560)
            key_t = jnp.where(dnf, INF, cum)
            urank = rank_of(rank_key(cum, row_iota, dnf))
            leader = jnp.min(key_t, axis=0, keepdims=True)
            behind = jnp.where(dnf, behind, cum - leader)
            ahead_cum, ahead_ll = value_of_ahead_multi(
                (cum, last_lap), urank, (0.0, 0.0)
            )
            gap_ahead = cum - ahead_cum
            drs_disabled = lap <= drs_until
            drs = (
                (lap > 2.0)
                & ~drs_disabled
                & (urank > 0)
                & (gap_ahead < 1.0)
                & ~dnf
            )
            f32 = lambda b: b.astype(jnp.float32)
            return (cum, last_lap, behind, age, compound.astype(jnp.float32),
                    f32(used_s), f32(used_m), f32(used_h), fuel, f32(dnf),
                    dnf_lap, f32(drs), laps_done, drs_until,
                    urank.astype(jnp.float32), ahead_ll)

        f32 = lambda b: b.astype(jnp.float32)
        # ahead_ll carry: value_of_ahead(last_lap, urank) as of the end of
        # lap 1 — last_lap is still all-zero there, so the carry starts 0.
        state = (cum, last_lap, behind, age, compound.astype(jnp.float32),
                 f32(used_s), f32(used_m), f32(used_h), fuel, f32(dnf),
                 dnf_lap, f32(drs), laps_done, drs_until,
                 urank.astype(jnp.float32), jnp.zeros((d, s), jnp.float32))
        # DYNAMIC trip count: the loop runs to the race's ACTUAL lap count
        # (traced scalar from SMEM), not the static compile bucket — padded
        # laps are never executed, so no freeze selects and no dead-lap PRNG
        # draws. This makes the result a function of (key, n_sims, tile,
        # race_laps) and bitwise INDEPENDENT of the compile bucket — the
        # same property the XLA engine has (test_lap_bucketing.py), and it
        # is what makes short season races cost only their own laps.
        # `total_laps` only bounds compile-time shapes; the wrapper guards
        # race_laps <= total_laps.
        upper = jnp.minimum(race_laps, float(total_laps)).astype(jnp.int32) + 1
        state = jax.lax.fori_loop(2, upper, lap_body, state)
        (cum, last_lap, behind, age, _compound_f, _us, _um, _uh,
         fuel, dnf_f, dnf_lap, _drs_f, laps_done, drs_until, _urank_f,
         _ahead_ll) = state
        dnf = dnf_f > 0.5

        # ---- classification (simulation.py:230-242) --------------------------
        key_t = jnp.where(dnf, INF, cum)
        active_rank = rank_of_tiebreak(key_t)
        n_active = jnp.sum((~dnf).astype(jnp.int32), axis=0, keepdims=True)
        dnf_rank = jnp.zeros((d, s), jnp.int32)
        for j in range(d):
            lap_j = dnf_lap[j : j + 1, :]
            cum_j = cum[j : j + 1, :]
            greater = (lap_j > dnf_lap) | (
                (lap_j == dnf_lap)
                & ((cum_j > cum) | ((cum_j == cum) & (j < row_iota)))
            )
            dnf_rank += (greater & dnf[j : j + 1, :] & dnf).astype(jnp.int32)
        final_pos = jnp.where(dnf, n_active + dnf_rank, active_rank) + 1

        # ---- histogram -------------------------------------------------------
        cols = []
        for p in range(d):
            cols.append(
                jnp.sum((final_pos == p + 1).astype(jnp.int32), axis=1, keepdims=True)
            )
        out_ref[0, :, :] = jnp.concatenate(cols, axis=1) * tile_valid

    return kernel


def _key_words(k: jax.Array) -> jax.Array:
    """Fold a PRNG key's data words down to exactly two int32 words, so the
    seed-row layout — and the kernel's hardcoded column indices — never
    depend on jax_default_prng_impl (rbg has four words, threefry two)."""
    data = (
        jax.random.key_data(k)
        if jnp.issubdtype(k.dtype, jax.dtypes.prng_key)
        else k
    )
    words = jax.lax.bitcast_convert_type(data, jnp.int32).reshape(-1)
    n = words.shape[0]  # static per prng impl
    if n == 1:
        return jnp.concatenate([words, words])
    if n > 2:
        w0, w1 = words[0], words[1]
        for i in range(2, n):
            if i % 2 == 0:
                w0 = w0 ^ words[i]
            else:
                w1 = w1 ^ words[i]
        return jnp.stack([w0, w1])
    return words


def _tile_seeds(key: jax.Array, n_tiles: int, n_valid: int) -> jax.Array:
    """(n_tiles, 3) int32: two seed words derived from each GLOBAL tile
    index's folded key, plus a validity flag (0 for padding tiles beyond
    `n_valid`)."""

    def tile_seed(t):
        words = _key_words(jax.random.fold_in(key, t))
        return jnp.concatenate([words, (t < n_valid).astype(jnp.int32)[None]])

    return jax.vmap(tile_seed)(jnp.arange(n_tiles))


def _tile_seeds_season(
    key: jax.Array, n_races: int, tiles_per_race: int, n_total: int
) -> jax.Array:
    """(n_total, 4) int32 season seed rows for flat tile r*T + t:
    [w0, w1, valid, race_id] with (w0, w1) = words(fold_in(fold_in(key, r),
    t)) — EXACTLY the per-race single-launch seeding for race key
    fold_in(key, r), which is what makes the season launch bitwise equal,
    race by race, to R independent `run_monte_carlo_pallas` calls. Rows at
    or beyond n_races*tiles_per_race are sharding pads (valid 0, race 0)."""
    n_valid = n_races * tiles_per_race

    def row(flat):
        r = flat // tiles_per_race
        t = flat % tiles_per_race
        words = _key_words(jax.random.fold_in(jax.random.fold_in(key, r), t))
        valid = (flat < n_valid).astype(jnp.int32)
        rid = jnp.where(flat < n_valid, r, 0).astype(jnp.int32)
        return jnp.concatenate([words * valid, valid[None], rid[None]])

    return jax.vmap(row)(jnp.arange(n_total))


# Mosaic allocates each scalar-prefetch ROW 512 bytes of SMEM regardless of
# its width (observed: a (2048, 3) int32 seed array claims u8[1048576] —
# the full 1 MB of SMEM — and the compile dies "Ran out of memory in memory
# space smem"). Launches are therefore chunked at this many programs; the
# kernel indexes seeds by LOCAL program id, so slicing the global seed rows
# per chunk is bitwise-equivalent to one big launch (same property the
# sharded paths rely on).
_MAX_PREFETCH_ROWS = 1024


def _chunked_over_rows(fn, seeds, n_rows):
    """Run fn(seeds_chunk, n_chunk) over <=_MAX_PREFETCH_ROWS slices of the
    global seed rows and concatenate the per-program outputs."""
    if n_rows <= _MAX_PREFETCH_ROWS:
        return fn(seeds, n_rows)
    outs = []
    for lo in range(0, n_rows, _MAX_PREFETCH_ROWS):
        hi = min(lo + _MAX_PREFETCH_ROWS, n_rows)
        outs.append(fn(seeds[lo:hi], hi - lo))
    return jnp.concatenate(outs, axis=0)


def _pallas_counts(
    kernel, seeds, pmat, scal, grid_log, n_tiles, d, interpret=False
) -> jax.Array:
    """Invoke the fused kernel over `n_tiles` programs -> (n_tiles, D, D).

    `interpret=True` runs the Pallas TPU interpreter (needed off-TPU:
    Mosaic primitives like prng_seed have no CPU lowering; interpreter PRNG
    returns zeros, so this validates structure, not distributions)."""
    return _chunked_over_rows(
        lambda se, n: _pallas_counts_one(kernel, se, pmat, scal, grid_log, n, d, interpret),
        seeds, n_tiles,
    )


def _pallas_counts_one(
    kernel, seeds, pmat, scal, grid_log, n_tiles, d, interpret=False
) -> jax.Array:
    """`interpret` accepts False (Mosaic, real TPU), True (the TPU
    interpreter — single-process off-TPU validation), or "generic" (the
    generic Pallas interpreter with the CPU primitive shims). "generic" is
    REQUIRED when the surrounding shard_map's mesh spans multiple
    PROCESSES: the TPU interpreter's callback-based DMA/semaphore
    emulation deadlocks across process boundaries (measured — see
    ops/pallas_cpu_shims.py), while the generic interpreter lowers to
    plain HLO the multi-process CPU runtime executes normally. Both
    interpreters produce identical results (zero PRNG off-hardware)."""

    def call(generic: bool = False):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((d, _N_PCOLS), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((d, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, d, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles, d, d), jnp.int32),
            interpret=generic,
        )(seeds, pmat, scal, grid_log)

    if interpret == "generic":
        from monte_carlo_gp_tpu.ops.pallas_cpu_shims import register_cpu_shims

        register_cpu_shims()
        return call(generic=True)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return call()
    return call()


def _pallas_counts_season(
    kernel, seeds, pmat_s, scal_s, grid_log_s, n_prog, d, interpret=False
) -> jax.Array:
    """Season variant: one flat grid over every race's tiles. Per-race
    (pmat, grid_log) blocks are routed by the seed row's race-id column via
    scalar-prefetch-driven index maps; scal is a full (R, _N_SCALARS) SMEM
    table indexed inside the kernel. Chunked at _MAX_PREFETCH_ROWS programs
    (SMEM prefetch-row budget) like the single-race launch."""
    return _chunked_over_rows(
        lambda se, n: _pallas_counts_season_one(
            kernel, se, pmat_s, scal_s, grid_log_s, n, d, interpret
        ),
        seeds, n_prog,
    )


def _pallas_counts_season_one(
    kernel, seeds, pmat_s, scal_s, grid_log_s, n_prog, d, interpret=False
) -> jax.Array:
    def call():
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_prog,),
                in_specs=[
                    pl.BlockSpec(
                        (1, d, _N_PCOLS),
                        lambda i, seeds: (seeds[i, 3], 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(
                        (1, d, d),
                        lambda i, seeds: (seeds[i, 3], 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, d, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((n_prog, d, d), jnp.int32),
        )(seeds, pmat_s, scal_s, grid_log_s)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return call()
    return call()


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_sims_per_race", "total_laps", "sims_per_tile", "mesh", "sims_axis",
        "interpret",
    ),
)
def _season_pallas_probs(
    stacked: SimParams,
    race_laps: jax.Array,
    key: jax.Array,
    n_sims_per_race: int,
    total_laps: int,
    sims_per_tile: int,
    mesh,
    sims_axis: str,
    interpret: bool,
) -> jax.Array:
    d = stacked.base_pace.shape[-1]
    n_races = stacked.base_pace.shape[0]
    tiles_per_race = n_sims_per_race // sims_per_tile
    n_valid = n_races * tiles_per_race
    pmat_s, scal_s, grid_log_s = jax.vmap(_pack_inputs)(
        stacked, race_laps.astype(jnp.float32)
    )
    kernel = _race_kernel(total_laps, d, sims_per_tile, season=True)

    if mesh is None:
        seeds = _tile_seeds_season(key, n_races, tiles_per_race, n_valid)
        counts = _pallas_counts_season(
            kernel, seeds, pmat_s, scal_s, grid_log_s, n_valid, d, interpret
        )
    else:
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape[sims_axis]
        n_prog = -(-n_valid // n_dev) * n_dev
        seeds = _tile_seeds_season(key, n_races, tiles_per_race, n_prog)
        local_prog = n_prog // n_dev

        def local_fn(seeds_local, pmat_s, scal_s, grid_log_s):
            return _pallas_counts_season(
                kernel, seeds_local, pmat_s, scal_s, grid_log_s,
                local_prog, d, interpret,
            )

        counts = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(sims_axis), P(), P(), P()),
            out_specs=P(sims_axis),
            check_vma=False,
        )(seeds, pmat_s, scal_s, grid_log_s)
        counts = counts[:n_valid]

    per_race = jnp.sum(
        counts.reshape(n_races, tiles_per_race, d, d), axis=1
    )
    return per_race.astype(jnp.float32) / n_sims_per_race


def run_monte_carlo_pallas_season(
    params_list: list[SimParams],
    race_laps_list: list[int],
    key: jax.Array,
    n_sims_per_race: int,
    total_laps: int | None = None,
    sims_per_tile: int = DEFAULT_SIMS_PER_TILE,
    mesh=None,
    sims_axis: str = "sims",
    interpret: bool | None = None,
) -> jax.Array:
    """Race-batched fused kernel: ONE Pallas launch whose flat tile grid
    spans every race of a season -> (R, D, D) finish probabilities.

    This is BASELINE.md's "full-season backtest sharded across chips"
    configuration on the flagship kernel: per-race parameters are stacked
    (driver axis padded to the widest field, inactive slots retire before
    the start), each race's actual lap count is the tile's dynamic lap-loop
    trip count under a shared compile bucket (short races cost only their
    own laps), and with a mesh the flat tile grid is sharded over `sims_axis` — chips
    process whole tiles regardless of race boundaries, so load balance does
    not depend on tiles_per_race >= n_chips.

    Contract: race r's probabilities are BITWISE equal to
    `run_monte_carlo_pallas(params_r, fold_in(key, r), n_sims_per_race,
    total_laps, sims_per_tile, race_laps=laps_r)` — the season launch is
    the same computation with the per-race host sync and launch overhead
    removed — and independent of device count (global seed rows +
    padded-tile zeroing)."""
    from monte_carlo_gp_tpu.parallel.sharded import stack_params

    if n_sims_per_race % sims_per_tile != 0:
        raise ValueError(
            f"n_sims_per_race={n_sims_per_race} must be a multiple of "
            f"sims_per_tile={sims_per_tile}"
        )
    stacked, d_max = stack_params(params_list)
    if d_max > 128:
        raise ValueError(
            "the fused kernel's rank keys pack *128+row (rank_key): driver "
            "axis is limited to 128; use the XLA season path for larger fields"
        )
    if len(race_laps_list) != len(params_list):
        raise ValueError("race_laps_list must match params_list")
    if total_laps is None:
        total_laps = max(int(l) for l in race_laps_list)
    if any(int(l) > total_laps for l in race_laps_list):
        raise ValueError("race_laps beyond the compile bucket")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    race_laps = jnp.asarray([int(l) for l in race_laps_list], jnp.int32)
    return _season_pallas_probs(
        stacked, race_laps, key, n_sims_per_race, total_laps, sims_per_tile,
        mesh, sims_axis, interpret,
    )


def run_monte_carlo_pallas(
    params: SimParams,
    key: jax.Array,
    n_sims: int,
    total_laps: int,
    sims_per_tile: int = DEFAULT_SIMS_PER_TILE,
    interpret: bool | str = False,
    race_laps: jax.Array | None = None,
) -> jax.Array:
    """Pallas backend for `run_monte_carlo`: (D, D) finish probabilities.

    Bitwise deterministic for fixed (key, n_sims, sims_per_tile, total_laps);
    matches the XLA engine distributionally (tests/test_pallas_engine.py).

    `race_laps` (traced scalar <= total_laps) sets the lap loop's DYNAMIC
    trip count so one compile at a padded `total_laps` bucket serves many
    circuits. Padded laps are never executed (no dead-lap compute or PRNG
    draws): the result is bitwise independent of the bucket — running at
    (total_laps=64, race_laps=57) equals (total_laps=57) exactly, the same
    contract the XLA engine has (tests/test_lap_bucketing.py).
    """
    if n_sims % sims_per_tile != 0:
        raise ValueError(
            f"n_sims={n_sims} must be a multiple of sims_per_tile={sims_per_tile}"
        )
    if params.n_drivers > 128:
        raise ValueError(
            "the fused kernel's rank keys pack *128+row (rank_key): driver "
            "axis is limited to 128; use the XLA engine for larger fields"
        )
    return _run_pallas_jit(
        params, key, n_sims, total_laps, sims_per_tile, interpret, race_laps
    )


@functools.partial(
    jax.jit, static_argnames=("n_sims", "total_laps", "sims_per_tile", "interpret")
)
def _run_pallas_jit(
    params: SimParams,
    key: jax.Array,
    n_sims: int,
    total_laps: int,
    sims_per_tile: int,
    interpret: bool,
    race_laps: jax.Array | None,
) -> jax.Array:
    d = params.n_drivers
    n_tiles = n_sims // sims_per_tile
    pmat, scal, grid_log = _pack_inputs(
        params, total_laps if race_laps is None else race_laps
    )
    seeds = _tile_seeds(key, n_tiles, n_tiles)
    kernel = _race_kernel(total_laps, d, sims_per_tile)
    counts = _pallas_counts(
        kernel, seeds, pmat, scal, grid_log, n_tiles, d, interpret
    )
    return jnp.sum(counts, axis=0).astype(jnp.float32) / n_sims


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_sims", "total_laps", "sims_per_tile", "mesh", "sims_axis", "interpret"
    ),
)
def _sharded_pallas_probs(
    params: SimParams,
    key: jax.Array,
    n_sims: int,
    total_laps: int,
    sims_per_tile: int,
    mesh,
    sims_axis: str,
    interpret: bool,
    race_laps: jax.Array | None = None,
) -> jax.Array:
    from jax.sharding import PartitionSpec as P

    d = params.n_drivers
    n_tiles = n_sims // sims_per_tile
    n_dev = mesh.shape[sims_axis]
    # Pad the tile grid to a device multiple; padding tiles emit zero counts
    # (validity word), so the summed histogram — and therefore the returned
    # probabilities — are bitwise identical for ANY device count.
    n_tiles_padded = -(-n_tiles // n_dev) * n_dev
    pmat, scal, grid_log = _pack_inputs(
        params, total_laps if race_laps is None else race_laps
    )
    seeds = _tile_seeds(key, n_tiles_padded, n_tiles)
    kernel = _race_kernel(total_laps, d, sims_per_tile)
    local_tiles = n_tiles_padded // n_dev

    def local_fn(seeds_local, pmat, scal, grid_log):
        counts = _pallas_counts(
            kernel, seeds_local, pmat, scal, grid_log, local_tiles, d, interpret
        )
        return jax.lax.psum(jnp.sum(counts, axis=0), sims_axis)

    # check_vma=False: pallas_call's ShapeDtypeStruct carries no varying-mesh
    # annotation, so shard_map's vma checker cannot type the kernel output.
    counts = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(sims_axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(seeds, pmat, scal, grid_log)
    return counts.astype(jnp.float32) / n_sims


def run_monte_carlo_pallas_sharded(
    params: SimParams,
    key: jax.Array,
    n_sims: int,
    total_laps: int,
    mesh=None,
    sims_per_tile: int = DEFAULT_SIMS_PER_TILE,
    sims_axis: str = "sims",
    interpret: bool | str | None = None,
    race_laps: jax.Array | None = None,
) -> jax.Array:
    """Multi-chip fused kernel: the tile grid is sharded over the mesh's
    `sims_axis` via shard_map (one per-chip `pallas_call` each), with a
    single (D, D) int32 histogram psum — the only cross-chip traffic.

    Per-chip throughput equals the single-chip fused kernel (~2.6x the
    vmapped XLA engine), and results are bitwise identical to
    `run_monte_carlo_pallas(params, key, n_sims, total_laps, sims_per_tile)`
    regardless of device count (global tile seeding + padded-tile zeroing).

    `interpret=None` auto-selects Mosaic on TPU and the Pallas interpreter
    elsewhere (CPU interpreter PRNG returns zeros — structure validation
    only; see CLAUDE.md). Pass `interpret="generic"` when `mesh` spans
    multiple PROCESSES: the TPU interpreter's emulation deadlocks across
    process boundaries (ops/pallas_cpu_shims.py), the generic interpreter
    does not, and both produce identical (zero-PRNG) results.
    """
    if n_sims % sims_per_tile != 0:
        raise ValueError(
            f"n_sims={n_sims} must be a multiple of sims_per_tile={sims_per_tile}"
        )
    if params.n_drivers > 128:
        raise ValueError(
            "the fused kernel's rank keys pack *128+row (rank_key): driver "
            "axis is limited to 128; use the XLA engine for larger fields"
        )
    if mesh is None:
        from monte_carlo_gp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh({sims_axis: len(jax.devices())})
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _sharded_pallas_probs(
        params, key, n_sims, total_laps, sims_per_tile, mesh, sims_axis,
        interpret, race_laps,
    )
