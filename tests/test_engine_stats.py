"""Statistical-tolerance tests: the TPU engine's finish-order distributions
must match the sequential NumPy oracle (reference semantics, SURVEY.md §2)
at fixed seed. Bitwise equality is impossible by construction (different RNG
stream structure); the contract is distributional equality (BASELINE.md)."""

import jax
import numpy as np
import pytest
from scipy import stats

from monte_carlo_gp_tpu.config import make_sim_params
from monte_carlo_gp_tpu.ops.engine import run_monte_carlo

from oracle.reference_sim import OracleConfig, run_oracle_monte_carlo

ON_TPU = jax.devices()[0].platform == "tpu"


def scenario(d=10, seed=5):
    rng = np.random.default_rng(seed)
    grid_probs = np.zeros((d, d), np.float32)
    for i in range(d):
        for p in range(d):
            grid_probs[i, p] = np.exp(-((p - i) ** 2) / 6.0)
    grid_probs /= grid_probs.sum(axis=1, keepdims=True)
    return dict(
        grid_probs=grid_probs,
        base_pace=(90.0 + 0.12 * np.arange(d) + 0.05 * rng.standard_normal(d)).astype(np.float32),
        tire_deg=np.clip(0.05 + 0.02 * rng.standard_normal(d), 0.01, 0.15).astype(np.float32),
        variance=np.full(d, 0.15, np.float32),
        dnf_rate=np.full(d, 0.001, np.float32),
        team_dnf_rate=np.full(d, 0.002, np.float32),
    )


@pytest.mark.slow
def test_finish_distribution_matches_oracle():
    d, laps = 10, 30
    sc = scenario(d)
    ocfg = OracleConfig(
        total_laps=laps, pit_loss=21.0, overtake_delta=0.6,
        sc_prob=0.01, vsc_prob=0.015, red_prob=0.002,
    )
    # 6,000 oracle sims (~30 s) halve the old 1,200-sim MC floor: these
    # shields now resolve at the same order as the native-oracle tests.
    n_oracle = 6000
    oracle_probs = run_oracle_monte_carlo(
        seed=42, cfg=ocfg,
        grid_probs=sc["grid_probs"], base_pace=sc["base_pace"],
        tire_deg=sc["tire_deg"], variance=sc["variance"],
        dnf_rate=sc["dnf_rate"], team_dnf_rate=sc["team_dnf_rate"],
        n_sims=n_oracle,
    )
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    n_tpu = 16384
    tpu_probs = np.asarray(
        run_monte_carlo(params, jax.random.PRNGKey(42), n_tpu, laps)
    )

    # Mean finish position per driver must agree within combined MC error.
    positions = np.arange(1, d + 1)
    mean_o = oracle_probs @ positions
    mean_t = tpu_probs @ positions
    var_o = oracle_probs @ positions**2 - mean_o**2
    var_t = tpu_probs @ positions**2 - mean_t**2
    se = np.sqrt(var_o / n_oracle + var_t / n_tpu)
    z = (mean_o - mean_t) / np.maximum(se, 1e-6)
    assert (np.abs(z) < 4.0).all(), (mean_o, mean_t, z)

    # Full-distribution agreement (observed 0.020 at these sizes).
    tv = 0.5 * np.abs(oracle_probs - tpu_probs).sum(axis=1)
    assert tv.max() < 0.04, tv

    # Rank correlation of win probabilities.
    rho = stats.spearmanr(oracle_probs[:, 0], tpu_probs[:, 0]).statistic
    assert rho > 0.8, (oracle_probs[:, 0], tpu_probs[:, 0])

    # Podium probabilities agree within Monte Carlo error.
    pod_o = oracle_probs[:, :3].sum(1)
    pod_t = tpu_probs[:, :3].sum(1)
    se_pod = np.sqrt(
        pod_o * (1 - pod_o) / n_oracle + pod_t * (1 - pod_t) / n_tpu
    )
    z_pod = (pod_o - pod_t) / np.maximum(se_pod, 1e-3)
    assert (np.abs(z_pod) < 4.5).all(), (pod_o, pod_t, z_pod)


@pytest.mark.slow
def test_dnf_rate_matches_oracle():
    """With elevated DNF rates, the per-driver probability of finishing in
    the bottom group must match the oracle (classification + DNF model)."""
    d, laps = 8, 25
    sc = scenario(d)
    sc["dnf_rate"] = np.full(d, 0.01, np.float32)
    sc["team_dnf_rate"] = np.full(d, 0.01, np.float32)
    ocfg = OracleConfig(total_laps=laps, overtake_delta=0.6)
    oracle_probs = run_oracle_monte_carlo(
        seed=7, cfg=ocfg, n_sims=6000,
        grid_probs=sc["grid_probs"], base_pace=sc["base_pace"],
        tire_deg=sc["tire_deg"], variance=sc["variance"],
        dnf_rate=sc["dnf_rate"], team_dnf_rate=sc["team_dnf_rate"],
    )
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    tpu_probs = np.asarray(
        run_monte_carlo(params, jax.random.PRNGKey(7), 16384, laps)
    )
    # expected per-race DNF count: lap1 4*0.01 + 24 laps * 0.01 ~ 0.28/driver
    # compare mean finish distributions overall
    tv = 0.5 * np.abs(oracle_probs - tpu_probs).sum(axis=1)
    assert tv.max() < 0.04, tv  # observed 0.017 at 6k/16k sims


@pytest.mark.slow
def test_native_oracle_matches_python_oracle():
    """The C++ oracle (native/oracle.cpp) and the Python oracle implement
    identical semantics — distributions must agree tightly."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d, laps = 10, 30
    sc = scenario(d)
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    # This is the ARBITER between the two independent ground-truth oracles:
    # if the engine ever disagrees with one of them, this test decides
    # whether the C++ or the Python reading of the reference is at fault —
    # so its resolution must be comparable to the engine-vs-native bounds,
    # not a loose sanity check. 12k python sims (~55 s at ~200 sims/s) puts
    # the MC floor at ~0.015 observed; bound = 2x observed.
    native = run_native_oracle(params, seed=42, n_sims=160_000, total_laps=laps)
    ocfg = OracleConfig(total_laps=laps, pit_loss=21.0, overtake_delta=0.6)
    py = run_oracle_monte_carlo(
        seed=42, cfg=ocfg, n_sims=12_000,
        grid_probs=sc["grid_probs"], base_pace=sc["base_pace"],
        tire_deg=sc["tire_deg"], variance=sc["variance"],
        dnf_rate=sc["dnf_rate"], team_dnf_rate=sc["team_dnf_rate"],
    )
    tv = 0.5 * np.abs(native - py).sum(axis=1)
    assert tv.max() < 0.03, tv  # observed 0.0148 at these sizes


@pytest.mark.slow
def test_engine_matches_native_oracle_high_n():
    """High-N validation the Python oracle cannot afford: 400k native oracle
    sims vs 65k XLA-engine sims. Bound 0.012 = 3x the measured agreement
    (0.0041) — tight enough that dropping a single event-model rule fails it
    (test_mutation_two_compound_rule_is_detected proves this)."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d, laps = 10, 30
    sc = scenario(d)
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    n_nat, n_tpu = 400_000, 65_536
    native = run_native_oracle(params, seed=7, n_sims=n_nat, total_laps=laps)
    engine = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(7), n_tpu, laps))

    positions = np.arange(1, d + 1)
    mean_n = native @ positions
    mean_e = engine @ positions
    var_n = native @ positions**2 - mean_n**2
    var_e = engine @ positions**2 - mean_e**2
    se = np.sqrt(var_n / n_nat + var_e / n_tpu)
    z = (mean_n - mean_e) / np.maximum(se, 1e-6)
    assert (np.abs(z) < 4.0).all(), (mean_n, mean_e, z)
    tv = 0.5 * np.abs(native - engine).sum(axis=1)
    assert tv.max() < 0.012, tv


@pytest.mark.slow
def test_engine_matches_native_oracle_d40():
    """Large-field distributional anchor (D=40): the size-generic XLA engine
    is the ONLY engine above the fused kernel's 128-driver ceiling and the
    fallback for 33..128-driver fields off-TPU, yet every other oracle
    comparison runs at D<=10 (the D=40 pallas-vs-XLA A/B is TPU-gated).
    200k native-oracle sims vs 32k engine sims at 40 drivers; bound 0.025 =
    2.2x the measured agreement (TV max 0.0112, mean-z 2.26)."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d, laps = 40, 30
    rng = np.random.default_rng(5)
    grid_probs = np.zeros((d, d), np.float32)
    for i in range(d):
        for p in range(d):
            grid_probs[i, p] = np.exp(-((p - i) ** 2) / 6.0)
    grid_probs /= grid_probs.sum(axis=1, keepdims=True)
    sc = dict(
        grid_probs=grid_probs,
        base_pace=(
            90.0 + 0.06 * np.arange(d) + 0.05 * rng.standard_normal(d)
        ).astype(np.float32),
        tire_deg=np.clip(0.05 + 0.02 * rng.standard_normal(d), 0.01, 0.15).astype(
            np.float32
        ),
        variance=np.full(d, 0.15, np.float32),
        dnf_rate=np.full(d, 0.001, np.float32),
        team_dnf_rate=np.full(d, 0.002, np.float32),
    )
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    n_nat, n_eng = 200_000, 32_768
    native = run_native_oracle(params, seed=7, n_sims=n_nat, total_laps=laps)
    engine = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(7), n_eng, laps))

    tv = 0.5 * np.abs(native - engine).sum(axis=1)
    assert tv.max() < 0.025, tv
    positions = np.arange(1, d + 1)
    mean_n = native @ positions
    mean_e = engine @ positions
    var_n = native @ positions**2 - mean_n**2
    var_e = engine @ positions**2 - mean_e**2
    se = np.sqrt(var_n / n_nat + var_e / n_eng)
    z = (mean_n - mean_e) / np.maximum(se, 1e-6)
    assert (np.abs(z) < 4.5).all(), (mean_n, mean_e, z)


@pytest.mark.skipif(not ON_TPU, reason="XLA engine at D=80 needs TPU (CPU ~9 sims/s)")
@pytest.mark.slow
def test_engine_matches_native_oracle_d80():
    """Anchor for the (Q=4, M=128) rank-key tier (65..128-row fields): the
    XLA engine vs the native C++ oracle of the reference semantics at D=80.
    Together with the TPU-gated D=80 pallas-vs-XLA A/B this chains the
    widest packing tier back to the reference event model (native <-> XLA
    <-> pallas). 100k native sims vs 16k engine sims; bounds scaled from
    the D=40 anchor for the halved sim budgets. TPU-gated: the engine's
    (S, D, D) rank intermediates run ~9 sims/s on host CPU at this width
    (measured), so the CPU suite's anchor stays the D=40 test above."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d, laps = 80, 30
    rng = np.random.default_rng(6)
    grid_probs = np.zeros((d, d), np.float32)
    for i in range(d):
        for p in range(d):
            grid_probs[i, p] = np.exp(-((p - i) ** 2) / 6.0)
    grid_probs /= grid_probs.sum(axis=1, keepdims=True)
    sc = dict(
        grid_probs=grid_probs,
        base_pace=(
            90.0 + 0.05 * np.arange(d) + 0.05 * rng.standard_normal(d)
        ).astype(np.float32),
        tire_deg=np.clip(0.05 + 0.02 * rng.standard_normal(d), 0.01, 0.15).astype(
            np.float32
        ),
        variance=np.full(d, 0.15, np.float32),
        dnf_rate=np.full(d, 0.001, np.float32),
        team_dnf_rate=np.full(d, 0.002, np.float32),
    )
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    n_nat, n_eng = 100_000, 16_384
    native = run_native_oracle(params, seed=11, n_sims=n_nat, total_laps=laps)
    engine = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(11), n_eng, laps))

    tv = 0.5 * np.abs(native - engine).sum(axis=1)
    assert tv.max() < 0.04, tv
    positions = np.arange(1, d + 1)
    mean_n = native @ positions
    mean_e = engine @ positions
    var_n = native @ positions**2 - mean_n**2
    var_e = engine @ positions**2 - mean_e**2
    se = np.sqrt(var_n / n_nat + var_e / n_eng)
    z = (mean_n - mean_e) / np.maximum(se, 1e-6)
    assert (np.abs(z) < 4.5).all(), (mean_n, mean_e, z)


def _two_compound_scenario(d=10):
    """Every car starts SOFT (d<=10 grid slots are 'top 10'); at 24 laps the
    pit window lands at remaining<=15, so the condition-based pick is SOFT
    again and the mandatory two-dry-compound rule fires for most of the
    field — the rule's effect on finish distributions is ~25x the Monte
    Carlo noise here (TV ~0.10 vs floor ~0.004)."""
    return scenario(d), 24


@pytest.mark.slow
def test_mutation_two_compound_rule_is_detected():
    """Mutation-sensitivity proof (VERDICT r1 #4): a seeded rule defect —
    the native oracle with the two-compound rule DROPPED — must FAIL the
    tight tolerance that the real engine passes in the same scenario.

    (The other candidate mutation, dropping the front-row start-gain clamp,
    is distribution-INVISIBLE: it only caps the winning margin of cars
    already in front, never their finishing order — measured effect equals
    the MC noise floor at 400k sims in every scenario tried. No
    finish-distribution test can detect it, regardless of tolerance.)"""
    from monte_carlo_gp_tpu.validate.native_oracle import (
        MUT_NO_TWO_COMPOUND_RULE,
        available,
        run_native_oracle,
    )

    if not available():
        pytest.skip("g++ unavailable")
    sc, laps = _two_compound_scenario()
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    engine = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(9), 65_536, laps))

    good = run_native_oracle(params, seed=42, n_sims=400_000, total_laps=laps)
    tv_good = 0.5 * np.abs(good - engine).sum(axis=1)
    assert tv_good.max() < 0.012, ("engine must pass the tight bound", tv_good)

    mutated = run_native_oracle(
        params, seed=42, n_sims=400_000, total_laps=laps,
        mutation=MUT_NO_TWO_COMPOUND_RULE,
    )
    tv_bad = 0.5 * np.abs(mutated - engine).sum(axis=1)
    assert tv_bad.max() > 0.05, (
        "the dropped rule must blow the tolerance", tv_bad
    )


@pytest.mark.slow
def test_event_heavy_race_matches_native_oracle():
    """Stress the SC/VSC/red-flag handlers distributionally: with event
    rates cranked up (~10 SC periods per race), the engine must still match
    the native oracle."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d, laps = 10, 40
    sc = scenario(d, seed=13)
    params = make_sim_params(
        pit_loss=21.0, overtake_delta=0.6,
        sc_prob=0.15, vsc_prob=0.15, red_flag_prob=0.03,
        **sc,
    )
    native = run_native_oracle(params, seed=3, n_sims=200_000, total_laps=laps)
    engine = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(3), 16_384, laps))
    tv = 0.5 * np.abs(native - engine).sum(axis=1)
    assert tv.max() < 0.04, tv  # noise is the 16k engine side (~0.02)


@pytest.mark.slow
def test_wet_race_matches_native_oracle():
    """Damp track: intermediate tires, no two-compound rule, wet pit picks."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d, laps = 10, 35
    sc = scenario(d, seed=17)
    params = make_sim_params(
        pit_loss=21.0, overtake_delta=0.6, track_condition="damp", **sc
    )
    native = run_native_oracle(params, seed=5, n_sims=200_000, total_laps=laps)
    engine = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(5), 16_384, laps))
    tv = 0.5 * np.abs(native - engine).sum(axis=1)
    assert tv.max() < 0.04, tv  # noise is the 16k engine side (~0.02)


@pytest.mark.slow
def test_exact_default_deg_matches_native_oracle():
    """Regression: drivers with tire_deg EXACTLY 0.05 (the default). The
    f32 value rounds to 0.0500000007, which must not trip the '> 0.05'
    high-degradation pit adjustment — comparisons must happen at f32
    precision in engine and oracles alike (this mismatch once skewed mean
    finishes by ~3 positions)."""
    from monte_carlo_gp_tpu.validate.native_oracle import available, run_native_oracle

    if not available():
        pytest.skip("g++ unavailable")
    d, laps = 10, 40
    sc = scenario(d, seed=23)
    sc["tire_deg"] = np.full(d, 0.05, np.float32)  # all exactly default
    sc["base_pace"] = (90.0 + 0.08 * np.arange(d)).astype(np.float32)
    # grid anti-correlated with pace: fastest car starts last
    gp = np.zeros((d, d), np.float32)
    gp[np.arange(d), d - 1 - np.arange(d)] = 1.0
    sc["grid_probs"] = gp
    params = make_sim_params(pit_loss=21.0, overtake_delta=0.6, **sc)
    native = run_native_oracle(params, seed=11, n_sims=20_000, total_laps=laps)
    engine = np.asarray(run_monte_carlo(params, jax.random.PRNGKey(11), 16_384, laps))
    positions = np.arange(1, d + 1)
    diff = np.abs(native @ positions - engine @ positions)
    assert diff.max() < 0.25, (native @ positions, engine @ positions)
