"""Pallas engine: structural checks in interpreter mode (CPU) and full
distributional validation against the XLA engine on real TPU hardware.

The TPU hardware PRNG (`pltpu.prng_random_bits`) returns zeros in
interpreter mode, so anything stochastic is TPU-only (bench/verify cover it
on hardware); CPU CI validates structure: valid doubly-stochastic
histograms, determinism, padding behavior.
"""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from monte_carlo_gp_tpu.config import make_sim_params
from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas

ON_TPU = jax.devices()[0].platform == "tpu"


def small_params(d=8):
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


@pytest.mark.skipif(
    ON_TPU,
    reason="force_tpu_interpret_mode ABORTS the axon TPU client, poisoning "
    "the whole test process (CLAUDE.md outage signature); CPU-mesh test — "
    "hardware coverage is the *_on_tpu suite",
)
def test_interpret_mode_structure():
    """With the interpreter's all-zero PRNG the race is the deterministic
    pace-order procession — still a valid doubly stochastic histogram."""
    params = small_params()
    with pltpu.force_tpu_interpret_mode():
        probs = np.asarray(
            run_monte_carlo_pallas(
                params, jax.random.PRNGKey(0), 256, 12, sims_per_tile=128
            )
        )
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(probs.sum(axis=0), 1.0, atol=1e-5)


def test_rejects_bad_tile_split():
    params = small_params()
    with pytest.raises(ValueError):
        run_monte_carlo_pallas(params, jax.random.PRNGKey(0), 100, 12, sims_per_tile=64)


def test_rejects_negative_pace_and_deg():
    """Negative base_pace / tire_deg (both physically meaningless) are
    rejected at SimParams construction. Historical note: round 2's kernel
    packed the DRS flag into the pace sign bit, which REQUIRED this;
    round 3 removed the packing (Mosaic bitcast compile bomb,
    KERNEL_DESIGN.md) but the validation stays — it is a documented,
    tested tightening (ADVICE r2 #2)."""
    d = 4
    gp = np.eye(d, dtype=np.float32)
    common = dict(
        grid_probs=gp,
        variance=np.full(d, 0.15),
        dnf_rate=np.full(d, 0.001),
        team_dnf_rate=np.full(d, 0.002),
    )
    with pytest.raises(ValueError, match="non-negative"):
        make_sim_params(
            base_pace=np.array([90.0, 90.0, -1.0, 90.0]),
            tire_deg=np.full(d, 0.05),
            **common,
        )
    with pytest.raises(ValueError, match="non-negative"):
        make_sim_params(
            base_pace=np.full(d, 90.0),
            tire_deg=np.array([0.05, -0.01, 0.05, 0.05]),
            **common,
        )


def test_rejects_rank_key_domain_overflow():
    """Cumulative times beyond ~1.5e6 s would wrap the engines' int32 rank
    keys; validation happens at SimParams construction (host-side numpy —
    checking device arrays would cost a tunnel round-trip per call)."""
    d = 8
    gp = np.eye(d, dtype=np.float32)
    with pytest.raises(ValueError, match="rank-key domain"):
        make_sim_params(
            grid_probs=gp,
            base_pace=np.full(d, 1e6),
            tire_deg=np.full(d, 0.05),
            variance=np.full(d, 0.15),
            dnf_rate=np.full(d, 0.001),
            team_dnf_rate=np.full(d, 0.002),
        )


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
@pytest.mark.slow
def test_matches_native_oracle_high_n_on_tpu():
    """The flagship kernel vs the independent C++ ground truth at 262k sims
    each, full 20-driver 57-lap configuration — per-driver TV must sit at
    the Monte Carlo noise floor (measured 0.0055; bound 3x)."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d = 20
    gp = np.exp(
        -((np.arange(d)[None, :] - np.arange(d)[:, None]) ** 2) / 8.0
    ).astype(np.float32)
    gp /= gp.sum(1, keepdims=True)
    rng = np.random.default_rng(7)
    params = make_sim_params(
        grid_probs=gp,
        base_pace=90.0 + 0.06 * np.arange(d),
        tire_deg=np.clip(0.05 + 0.015 * rng.standard_normal(d), 0.01, 0.15),
        variance=np.full(d, 0.15),
        dnf_rate=np.full(d, 0.0008),
        team_dnf_rate=np.full(d, 0.002),
        pit_loss=21.0,
        overtake_delta=0.6,
    )
    n = 262_144
    pallas = np.asarray(
        run_monte_carlo_pallas(params, jax.random.PRNGKey(1), n, 57)
    )
    native = run_native_oracle(params, seed=42, n_sims=n, total_laps=57)
    tv = 0.5 * np.abs(pallas - native).sum(axis=1)
    assert tv.max() < 0.017, tv


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
@pytest.mark.slow
def test_pallas_stress_matrix_on_tpu():
    """Pallas vs XLA engine across adversarial regimes the normal-scenario
    tests never enter: full wet, event chaos (damp + high SC/VSC/red), pit
    churn (max driver deg -> 0.85-scaled stints), and an overtake frenzy
    (anticorrelated grid/pace, tiny overtake_delta, big DRS) that keeps all
    three cascade passes live. All cases share one compile per engine
    (params are traced); TV bound 0.07 vs a ~0.04 MC noise floor at 16k
    sims per side."""
    from monte_carlo_gp_tpu.ops.engine import run_monte_carlo

    d, laps, n = 20, 30, 16_384
    rng = np.random.default_rng(3)
    gp = np.exp(
        -((np.arange(d)[None, :] - np.arange(d)[:, None]) ** 2) / 8.0
    ).astype(np.float32)
    gp /= gp.sum(1, keepdims=True)
    base = dict(
        grid_probs=gp,
        base_pace=90.0 + 0.06 * np.arange(d),
        tire_deg=np.clip(0.05 + 0.015 * rng.standard_normal(d), 0.01, 0.15),
        variance=np.full(d, 0.15),
        dnf_rate=np.full(d, 0.0008),
        team_dnf_rate=np.full(d, 0.002),
        pit_loss=21.0,
        overtake_delta=0.6,
    )
    scenarios = {
        "full_wet": {**base, "track_condition": "wet", "variance": np.full(d, 0.4)},
        "event_chaos": {
            **base,
            "track_condition": "damp",
            "sc_prob": 0.08,
            "vsc_prob": 0.10,
            "red_flag_prob": 0.01,
        },
        "pit_churn": {
            **base,
            "tire_deg": np.full(d, 0.15),
            "pit_loss": 30.0,
        },
        "overtake_frenzy": {
            **base,
            # fast cars start last: gp reversed against pace order
            "grid_probs": gp[::-1].copy(),
            "overtake_delta": 0.15,
            "drs_delta": 0.8,
            "variance": np.full(d, 0.05),
        },
    }
    for name, kw in scenarios.items():
        params = make_sim_params(**kw)
        pallas = np.asarray(
            run_monte_carlo_pallas(params, jax.random.PRNGKey(5), n, laps)
        )
        xla = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(6), n, laps))
        np.testing.assert_allclose(
            pallas.sum(axis=1), 1.0, atol=1e-5, err_msg=name
        )
        tv = 0.5 * np.abs(pallas - xla).sum(axis=1)
        assert tv.max() < 0.07, (name, tv)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
@pytest.mark.slow
def test_matches_xla_engine_on_tpu():
    from monte_carlo_gp_tpu.ops.engine import run_monte_carlo

    params = small_params()
    pallas = np.asarray(
        run_monte_carlo_pallas(
            params, jax.random.PRNGKey(0), 8192, 20, sims_per_tile=2048
        )
    )
    xla = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(1), 8192, 20))
    tv = 0.5 * np.abs(pallas - xla).sum(axis=1)
    assert tv.max() < 0.05, tv
    again = np.asarray(
        run_monte_carlo_pallas(
            params, jax.random.PRNGKey(0), 8192, 20, sims_per_tile=2048
        )
    )
    np.testing.assert_array_equal(pallas, again)


def test_sharded_matches_single_bitwise_any_device_count():
    """The shard_map'd tile grid must return BITWISE the same probabilities
    as the single-device kernel for the same (key, n_sims, tile), for any
    device count — global per-tile seeding + padded-tile zeroing. Includes a
    non-divisible tile count (10 tiles over 8 and 4 devices)."""
    from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas_sharded
    from monte_carlo_gp_tpu.parallel.mesh import make_mesh

    params = small_params()
    key = jax.random.PRNGKey(3)
    single = np.asarray(
        run_monte_carlo_pallas(params, key, 1280, 12, sims_per_tile=128,
                               interpret=not ON_TPU)
    )
    for n_dev in (len(jax.devices()), max(1, len(jax.devices()) // 2)):
        mesh = make_mesh({"sims": n_dev}, devices=jax.devices()[:n_dev])
        sharded = np.asarray(
            run_monte_carlo_pallas_sharded(
                params, key, 1280, 12, sims_per_tile=128, mesh=mesh
            )
        )
        np.testing.assert_array_equal(single, sharded)


def test_season_launch_matches_per_race_bitwise():
    """The race-batched season launch must be bitwise equal, race by race,
    to independent single-race launches with keys fold_in(key, r) — its
    documented contract — including a padded mixed-driver-count season and
    per-race lap masking. (On CPU both sides run the interpreter with the
    all-zero PRNG; the same equality is re-verified with live draws on TPU
    below.)"""
    from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas_season
    from monte_carlo_gp_tpu.parallel.sharded import stack_params

    plist = [small_params(8), small_params(7), small_params(6)]
    laps = [12, 10, 9]
    key = jax.random.PRNGKey(7)
    season = np.asarray(
        run_monte_carlo_pallas_season(
            plist, laps, key, 256, total_laps=12, sims_per_tile=64
        )
    )
    assert season.shape == (3, 8, 8)
    stacked, _ = stack_params(plist)
    for r in range(3):
        pr = jax.tree_util.tree_map(lambda x: x[r], stacked)
        single = np.asarray(
            run_monte_carlo_pallas(
                pr, jax.random.fold_in(key, r), 256, 12, sims_per_tile=64,
                interpret=not ON_TPU,
                race_laps=jax.numpy.int32(laps[r]),
            )
        )
        np.testing.assert_array_equal(season[r], single)
        # real drivers always classify inside positions 1..d (padded slots
        # retire before the start and rank last)
        d = plist[r].n_drivers
        np.testing.assert_allclose(season[r][:d, :d].sum(axis=1), 1.0, atol=1e-4)


def test_season_launch_sharded_bitwise_any_device_count():
    """Sharding the season's flat tile grid over any device count must not
    change a bit (global seed rows carry the race id + validity)."""
    from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas_season
    from monte_carlo_gp_tpu.parallel.mesh import make_mesh

    plist = [small_params(8), small_params(6)]
    laps = [10, 9]
    key = jax.random.PRNGKey(11)
    # 2 races x 5 tiles = 10 tiles: not divisible by 8 or 4 devices
    base = np.asarray(
        run_monte_carlo_pallas_season(
            plist, laps, key, 160, total_laps=10, sims_per_tile=32
        )
    )
    for n_dev in (len(jax.devices()), max(1, len(jax.devices()) // 2)):
        mesh = make_mesh({"sims": n_dev}, devices=jax.devices()[:n_dev])
        sharded = np.asarray(
            run_monte_carlo_pallas_season(
                plist, laps, key, 160, total_laps=10, sims_per_tile=32,
                mesh=mesh,
            )
        )
        np.testing.assert_array_equal(base, sharded)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
@pytest.mark.slow
def test_season_launch_matches_per_race_bitwise_on_tpu():
    """Hardware re-run of the season<->single-race bitwise contract with
    live PRNG draws (the CPU interpreter's zero PRNG makes every car DNF on
    lap 1, so only the TPU run exercises param routing distributionally)."""
    from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas_season
    from monte_carlo_gp_tpu.parallel.sharded import stack_params

    p0 = small_params(8)
    import dataclasses

    p1 = dataclasses.replace(
        p0, base_pace=jax.numpy.asarray(np.asarray(p0.base_pace)[::-1].copy())
    )
    plist = [p0, p1]
    laps = [12, 10]
    key = jax.random.PRNGKey(5)
    season = np.asarray(
        run_monte_carlo_pallas_season(
            plist, laps, key, 2048, total_laps=12, sims_per_tile=256
        )
    )
    stacked, _ = stack_params(plist)
    for r in range(2):
        pr = jax.tree_util.tree_map(lambda x: x[r], stacked)
        single = np.asarray(
            run_monte_carlo_pallas(
                pr, jax.random.fold_in(key, r), 2048, 12, sims_per_tile=256,
                race_laps=jax.numpy.int32(laps[r]),
            )
        )
        np.testing.assert_array_equal(season[r], single)
    # reversed pace must actually route: race 1's finish order inverts
    mp0 = (season[0] * (np.arange(8) + 1)).sum(axis=1)
    mp1 = (season[1] * (np.arange(8) + 1)).sum(axis=1)
    assert mp0[0] < mp0[7] and mp1[0] > mp1[7], (mp0, mp1)


def test_simulate_plan_uses_sharded_pallas_on_multidevice(tmp_path):
    """simulate_plan(engine='pallas') on a multi-device host must route
    through the sharded kernel and produce a valid histogram."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from monte_carlo_gp_tpu.data.synthetic import SyntheticBackend
    from monte_carlo_gp_tpu.models import predictor as predictor_mod
    from monte_carlo_gp_tpu.models.predictor import F1Predictor

    p = F1Predictor(cache_dir=tmp_path, backend=SyntheticBackend(seed=5, n_events=2))
    plan = p.prepare_weekend(2024, "Bahrain")
    # structure-only on CPU (interpreter PRNG): bypass the off-TPU guard
    predictor_mod._ALLOW_PALLAS_OFF_TPU = True
    try:
        probs = p.simulate_plan(plan, 300, seed=1, engine="pallas")
    finally:
        predictor_mod._ALLOW_PALLAS_OFF_TPU = False
    # n_sims rounds UP to whole kernel tiles (surfaced, not silent)
    from monte_carlo_gp_tpu.ops.pallas_engine import DEFAULT_SIMS_PER_TILE

    tile = min(DEFAULT_SIMS_PER_TILE, 300)
    assert p.last_effective_sims == -(-300 // tile) * tile
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)


def _wide_field_plan(d: int):
    from monte_carlo_gp_tpu.models.predictor import WeekendPlan

    gp = np.full((d, d), 1.0 / d, np.float32)
    params = make_sim_params(
        grid_probs=gp,
        base_pace=90 + 0.05 * np.arange(d),
        tire_deg=np.full(d, 0.05),
        variance=np.full(d, 0.15),
        dnf_rate=np.full(d, 0.001),
        team_dnf_rate=np.full(d, 0.002),
        pit_loss=21.0,
        overtake_delta=0.6,
    )
    drivers = [f"D{i:02d}" for i in range(d)]
    return WeekendPlan(
        params=params,
        total_laps=10,
        drivers=drivers,
        quali_probs={dr: [1.0 / d] * d for dr in drivers},
        weather={},
        prediction_point="fp2",
        grid_is_actual=False,
    )


def _bare_predictor():
    from monte_carlo_gp_tpu.models.predictor import F1Predictor

    p = F1Predictor.__new__(F1Predictor)  # engine routing needs no loader
    p._sims_per_block = None
    p._engine = "xla"
    return p


def test_simulate_plan_pallas_handles_33_to_64_drivers():
    """The widened rank-key packing (rank*64+row for 33..64-row fields)
    makes the fused kernel take any field the reference simulator takes up
    to 64 drivers (simulation.py:59-100 is size-generic) — so a 40-driver
    field must run the PALLAS path, not fall back."""
    from monte_carlo_gp_tpu.models import predictor as predictor_mod
    from monte_carlo_gp_tpu.ops.pallas_engine import DEFAULT_SIMS_PER_TILE

    d = 40
    plan = _wide_field_plan(d)
    p = _bare_predictor()
    predictor_mod._ALLOW_PALLAS_OFF_TPU = True
    try:
        probs = p.simulate_plan(plan, 300, seed=0, engine="pallas")
    finally:
        predictor_mod._ALLOW_PALLAS_OFF_TPU = False
    assert probs.shape == (d, d)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    # Pallas path ran: sims round UP to whole kernel tiles.
    tile = min(DEFAULT_SIMS_PER_TILE, 300)
    assert p.last_effective_sims == -(-300 // tile) * tile


@pytest.mark.slow
def test_simulate_plan_pallas_handles_65_to_128_drivers():
    """The (Q=4, M=128) rank-key tier extends the fused kernel to 128-row
    fields (simulation.py:59-100 is size-generic) — an 80-driver field must
    run the PALLAS path, not fall back."""
    from monte_carlo_gp_tpu.models import predictor as predictor_mod
    from monte_carlo_gp_tpu.ops.pallas_engine import DEFAULT_SIMS_PER_TILE

    d = 80
    plan = _wide_field_plan(d)
    p = _bare_predictor()
    predictor_mod._ALLOW_PALLAS_OFF_TPU = True
    try:
        probs = p.simulate_plan(plan, 256, seed=0, engine="pallas")
    finally:
        predictor_mod._ALLOW_PALLAS_OFF_TPU = False
    assert probs.shape == (d, d)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    tile = min(DEFAULT_SIMS_PER_TILE, 256)
    assert p.last_effective_sims == -(-256 // tile) * tile


def test_simulate_plan_falls_back_to_xla_above_128_drivers():
    """Beyond 128 drivers the rank-key packing runs out of int32 headroom:
    simulate_plan(engine='pallas') must fall back to the size-generic XLA
    engine and succeed, not raise from the pallas guard."""
    from monte_carlo_gp_tpu.models import predictor as predictor_mod

    d = 129
    plan = _wide_field_plan(d)
    p = _bare_predictor()
    predictor_mod._ALLOW_PALLAS_OFF_TPU = True
    try:
        probs = p.simulate_plan(plan, 128, seed=0, engine="pallas")
    finally:
        predictor_mod._ALLOW_PALLAS_OFF_TPU = False
    assert probs.shape == (d, d)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    # XLA path ran: effective sims are the exact request (no tile rounding).
    assert p.last_effective_sims == 128


def test_engine_pallas_off_tpu_raises_clearly(tmp_path):
    """Explicitly requesting the pallas engine off-TPU must fail with a
    clear error, not a Mosaic lowering crash (interpreter PRNG would return
    zeros — statistically meaningless results)."""
    if jax.devices()[0].platform == "tpu":
        pytest.skip("TPU host: pallas is valid here")
    from monte_carlo_gp_tpu.models.predictor import resolve_engine

    with pytest.raises(ValueError, match="requires a TPU"):
        resolve_engine("pallas")


def test_prefetch_chunking_bitwise(monkeypatch):
    """Launches above _MAX_PREFETCH_ROWS programs are split into chunked
    pallas_calls (Mosaic budgets 512 B of SMEM per scalar-prefetch ROW, so
    ~2k seed rows exhaust the 1 MB SMEM and the compile dies). The kernel
    indexes seeds by LOCAL program id, so chunking must be bitwise-invisible
    — asserted here by forcing a tiny chunk size on both the single-race
    and season launches."""
    from monte_carlo_gp_tpu.ops import pallas_engine as pe
    from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas_season

    params = small_params()
    key = jax.random.PRNGKey(9)
    kw = dict(interpret=not ON_TPU)
    base = np.asarray(
        run_monte_carlo_pallas(params, key, 640, 10, sims_per_tile=64, **kw)
    )
    plist = [small_params(8), small_params(6)]
    season_base = np.asarray(
        run_monte_carlo_pallas_season(
            plist, [10, 9], key, 192, total_laps=10, sims_per_tile=64
        )
    )
    monkeypatch.setattr(pe, "_MAX_PREFETCH_ROWS", 3)
    chunked = np.asarray(
        run_monte_carlo_pallas(params, key, 640, 10, sims_per_tile=64, **kw)
    )
    np.testing.assert_array_equal(base, chunked)
    season_chunked = np.asarray(
        run_monte_carlo_pallas_season(
            plist, [10, 9], key, 192, total_laps=10, sims_per_tile=64
        )
    )
    np.testing.assert_array_equal(season_base, season_chunked)


@pytest.mark.skipif(
    ON_TPU,
    reason="force_tpu_interpret_mode ABORTS the axon TPU client, poisoning "
    "the whole test process (CLAUDE.md outage signature); CPU-mesh test",
)
def test_small_grid_traces():
    """Grids with fewer than 4 drivers must still trace (race-control draws
    use a fixed 8-row block, not per-driver rows)."""
    params = small_params(d=3)
    with pltpu.force_tpu_interpret_mode():
        probs = np.asarray(
            run_monte_carlo_pallas(
                params, jax.random.PRNGKey(0), 64, 8, sims_per_tile=64
            )
        )
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


# -- closed-form overtake chain: high-cum regime bound (ADVICE r3 #4) ---------


def _sequential_chain(r_cum: np.ndarray, swap: np.ndarray) -> np.ndarray:
    """The reference's sequential time-rewrite chain (simulation.py:503-534)
    on position-ordered f32 times: for p in 1..d-1, if swap[p]:
    rows[p-1] = max(0.1, rows[p-1]-0.1) + 0.3; rows[p] = the max term."""
    rows = r_cum.astype(np.float32).copy()
    for p in range(1, len(rows)):
        if swap[p]:
            nb = np.float32(max(np.float32(0.1), rows[p - 1] - np.float32(0.1)))
            rows[p - 1] = nb + np.float32(0.3)
            rows[p] = nb
    return rows


def _closed_form_chain(r_cum: np.ndarray, swap: np.ndarray) -> np.ndarray:
    """The kernel's prefix-max closed form (ops/pallas_engine.py lap_body
    'ot_chain' block), reproduced in numpy f32 with the same op order."""
    d = len(r_cum)
    iota = np.arange(d, dtype=np.float32) * np.float32(0.1)
    swapped = swap.astype(bool)
    z = np.where(swapped, np.float32(-1e30), r_cum.astype(np.float32) + iota)
    z = np.maximum.accumulate(z)  # prefix max == the kernel's Kogge-Stone
    a = np.where(
        swapped,
        np.maximum(np.float32(0.1), z - iota),
        r_cum.astype(np.float32),
    )
    swap_next = np.concatenate([swapped[1:], [False]])
    return np.where(
        swap_next,
        np.maximum(np.float32(0.1), a - np.float32(0.1)) + np.float32(0.3),
        a,
    ).astype(np.float32)


def test_overtake_chain_closed_form_matches_sequential_in_domain():
    """At race-scale cum (~4e3 s) r_cum is genuinely sorted, z = r_cum+0.1p
    is strictly increasing, and the closed form picks exactly the
    sequential chain's run-start: values agree to FP association ULPs."""
    rng = np.random.default_rng(0)
    for trial in range(200):
        d = int(rng.integers(2, 33))
        r_cum = np.sort(
            rng.uniform(3000.0, 5000.0, d).astype(np.float32)
        )
        swap = np.zeros(d, bool)
        swap[1:] = rng.random(d - 1) < 0.4
        seq = _sequential_chain(r_cum, swap)
        clo = _closed_form_chain(r_cum, swap)
        np.testing.assert_allclose(clo, seq, rtol=1e-6, atol=1e-3)


@pytest.mark.parametrize("q_shift", [2, 4])
def test_overtake_chain_closed_form_high_cum_bound(q_shift):
    """The documented divergence regime, PINNED (ADVICE r3): once cum
    exceeds ~5e5 s (Q=2; proportionally lower for the wider tiers) the
    rank-key quantization bucket (2^Q ULP) is wider than the 0.1 s chain
    step, so index-arbitrated ranks can hand
    the chain a LOCALLY DECREASING r_cum; z is then non-monotone and the
    prefix-max can pick a different run-start than the sequential chain.
    The divergence is bounded by the bucket width: |closed - sequential|
    <= max in-bucket out-of-orderness (z[j'] and z[j_true] lie in one
    quantization bucket). Asserted at cum ~1e6 s (4 ULP = 0.25 s at Q=2;
    the Q=4 tier for 65..128-row fields has a 4x wider bucket)."""
    rng = np.random.default_rng(1)
    base = np.float32(1.0e6)
    ulp = np.float32(np.spacing(base))  # 0.0625 at 1e6
    bucket = (1 << q_shift) * ulp
    assert bucket > 0.1, (bucket, "regime premise: bucket wider than chain step")
    worst = 0.0
    diverged = 0
    for trial in range(500):
        d = int(rng.integers(4, 33))
        # sorted-by-quantized-key order: non-decreasing buckets, but values
        # within a bucket out of order by up to the bucket width
        steps = rng.choice([0.0, float(bucket)], d - 1, p=[0.7, 0.3])
        sorted_vals = base + np.cumsum(np.concatenate([[0.0], steps]))
        jitter = rng.uniform(-float(bucket) / 2, float(bucket) / 2, d)
        r_cum = (sorted_vals + jitter).astype(np.float32)
        swap = np.zeros(d, bool)
        swap[1:] = rng.random(d - 1) < 0.5
        seq = _sequential_chain(r_cum, swap)
        clo = _closed_form_chain(r_cum, swap)
        diff = np.abs(clo - seq).max()
        worst = max(worst, float(diff))
        if diff > 1e-2:
            diverged += 1
    # the chain DOES diverge in this regime (the test would be vacuous
    # otherwise), and the divergence never exceeds the documented bound
    assert diverged > 0, "high-cum construction never diverged — vacuous test"
    # one bucket of run-start slack + one bucket of value jitter
    assert worst <= 2 * float(bucket) + 1e-3, (worst, float(bucket))


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
@pytest.mark.slow
def test_matches_xla_engine_at_40_drivers_on_tpu():
    """The widened rank-key packing (rank*64+row for 33..64-row fields) must
    leave the fused kernel distributionally equal to the size-generic XLA
    engine ABOVE the old 32-driver cap — the reference simulator takes any
    field (simulation.py:59-100). 16k sims per side at D=40; TV bound 0.07
    vs a ~0.04 MC noise floor (same budget as the stress matrix)."""
    from monte_carlo_gp_tpu.ops.engine import run_monte_carlo

    d, laps, n = 40, 30, 16_384
    rng = np.random.default_rng(9)
    gp = np.exp(
        -((np.arange(d)[None, :] - np.arange(d)[:, None]) ** 2) / 8.0
    ).astype(np.float32)
    gp /= gp.sum(1, keepdims=True)
    params = make_sim_params(
        grid_probs=gp,
        base_pace=90.0 + 0.05 * np.arange(d),
        tire_deg=np.clip(0.05 + 0.015 * rng.standard_normal(d), 0.01, 0.15),
        variance=np.full(d, 0.15),
        dnf_rate=np.full(d, 0.0008),
        team_dnf_rate=np.full(d, 0.002),
        pit_loss=21.0,
        overtake_delta=0.6,
    )
    pallas = np.asarray(
        run_monte_carlo_pallas(params, jax.random.PRNGKey(5), n, laps)
    )
    xla = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(6), n, laps))
    np.testing.assert_allclose(pallas.sum(axis=1), 1.0, atol=1e-5)
    tv = 0.5 * np.abs(pallas - xla).sum(axis=1)
    assert tv.max() < 0.07, tv


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires real TPU")
@pytest.mark.slow
def test_matches_xla_engine_at_80_drivers_on_tpu():
    """The (Q=4, M=128) rank-key tier (65..128-row fields) must leave the
    fused kernel distributionally equal to the size-generic XLA engine above
    the 64-driver tier — same methodology as the D=40 test: 16k sims per
    side, TV bound 0.07 vs a ~0.04 MC noise floor."""
    from monte_carlo_gp_tpu.ops.engine import run_monte_carlo

    d, laps, n = 80, 30, 16_384
    rng = np.random.default_rng(10)
    gp = np.exp(
        -((np.arange(d)[None, :] - np.arange(d)[:, None]) ** 2) / 8.0
    ).astype(np.float32)
    gp /= gp.sum(1, keepdims=True)
    params = make_sim_params(
        grid_probs=gp,
        base_pace=90.0 + 0.05 * np.arange(d),
        tire_deg=np.clip(0.05 + 0.015 * rng.standard_normal(d), 0.01, 0.15),
        variance=np.full(d, 0.15),
        dnf_rate=np.full(d, 0.0008),
        team_dnf_rate=np.full(d, 0.002),
        pit_loss=21.0,
        overtake_delta=0.6,
    )
    pallas = np.asarray(
        run_monte_carlo_pallas(params, jax.random.PRNGKey(7), n, laps)
    )
    xla = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(8), n, laps))
    np.testing.assert_allclose(pallas.sum(axis=1), 1.0, atol=1e-5)
    tv = 0.5 * np.abs(pallas - xla).sum(axis=1)
    assert tv.max() < 0.07, tv
