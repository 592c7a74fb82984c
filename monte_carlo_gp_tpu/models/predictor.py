"""Weekend prediction orchestrator.

Capability-parity rebuild of the reference `F1Predictor`
(/root/reference/src/predictor.py): incremental chronological Elo builds over
(season-1, season) with the 2018 floor, FP-session fallback chains per
prediction point, actual-grid override for quali/sprint points, grid-penalty
distribution shifts, practice-data extraction of base pace / tire degradation
/ circuit-specific compound deltas, clutch-factor variance shaping with
prediction-point uncertainty multipliers, team-trend and wet-skill pace
adjustments, and the Monte Carlo race simulation.

TPU-native differences:
  * the Monte Carlo subtree is the jitted engine (`ops.engine.run_monte_carlo`)
    — one `lax.scan` over laps across all simulations at once;
  * `--simulations` is honored (the reference parses it and then hardcodes
    10000, predictor.py:284 / main.py:14-15 — SURVEY.md preamble);
  * Elo state persists through the 3-level cache priority the reference
    README promises (data/elo_cache.py);
  * all per-driver dicts become dense arrays at this boundary.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from monte_carlo_gp_tpu import config as cfg
from monte_carlo_gp_tpu.data.elo_cache import load_with_priority, save_elo
from monte_carlo_gp_tpu.data.loader import F1DataLoader
from monte_carlo_gp_tpu.models.elo import F1EloSystem
from monte_carlo_gp_tpu.models.features import F1FeatureEngine
from monte_carlo_gp_tpu.models.safety import InsufficientDataError
from monte_carlo_gp_tpu.ops.engine import run_monte_carlo
from monte_carlo_gp_tpu.utils.logging import log_event

# FP-session fallback chains per prediction point (reference predictor.py:312-318).
SESSION_CHAINS: dict[str, list[str]] = {
    "fp1": ["FP1"],
    "fp2": ["FP2", "FP1"],
    "fp3": ["FP3", "FP2", "FP1"],
    "quali": ["FP3", "FP2", "FP1"],
    "sprint": ["FP3", "FP2", "FP1"],
}
DEFAULT_CHAIN = ["FP2", "FP3", "FP1"]

# Variance multipliers per prediction point (reference predictor.py:386-392).
UNCERTAINTY_MULTIPLIER = {
    "fp1": 1.5,
    "fp2": 1.2,
    "fp3": 1.0,
    "quali": 0.9,
    "sprint": 0.85,
}
CONFIDENCE_LEVELS = {
    "fp1": "low",
    "fp2": "moderate",
    "fp3": "good",
    "quali": "high",
    "sprint": "high",
}

DEFAULT_PACE = 90.0
DEFAULT_DEG = 0.05
ELO_SEASON_FLOOR = 2017  # seasons must be > this (predictor.py:275)
LAP_BUCKET = 16  # compile buckets for variable lap counts (44..78 laps)


def _lap_bucket(total_laps: int) -> int:
    """Round a circuit's lap count up to the compile bucket. One compiled
    program (engine scan / pallas kernel at the bucket length, trailing laps
    masked via the traced `race_laps` scalar) serves every circuit in the
    bucket — a season backtest compiles ~4 programs instead of ~15, each
    cold TPU compile costing tens of seconds."""
    return max(LAP_BUCKET, -(-int(total_laps) // LAP_BUCKET) * LAP_BUCKET)


def resolve_engine(engine: str) -> str:
    """Single engine policy for CLIs and the predictor: 'auto' picks the
    fused Pallas kernel on any TPU host — single chip runs it directly,
    multi-chip hosts shard the tile grid via shard_map
    (ops/pallas_engine.run_monte_carlo_pallas_sharded) at the same per-chip
    throughput. Non-TPU hosts use the XLA lap-scan engine."""
    # engine='xla' must NOT touch jax.devices(): that initializes the XLA
    # backend, which must not happen before jax.distributed.initialize on
    # multi-host launches (parallel/distributed.py). Only the choices that
    # genuinely depend on the platform look at it.
    if engine == "auto":
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if engine not in ("xla", "pallas"):
        raise ValueError(f"unknown engine {engine!r} (use 'xla' or 'pallas')")
    if (
        engine == "pallas"
        and not _ALLOW_PALLAS_OFF_TPU
        and jax.devices()[0].platform != "tpu"
    ):
        # Fail with intent instead of a Mosaic lowering error: off-TPU the
        # kernel would need interpreter mode, whose PRNG returns zeros —
        # structurally valid but statistically meaningless results.
        raise ValueError(
            "engine='pallas' requires a TPU (the fused kernel's hardware "
            "PRNG has no CPU lowering); use engine='xla' or 'auto'"
        )
    return engine


# Structure-only escape hatch for tests exercising the pallas plumbing on
# the CPU interpreter (tests/test_pallas_engine.py); never set in production.
_ALLOW_PALLAS_OFF_TPU = False


import dataclasses


@dataclasses.dataclass(frozen=True)
class WeekendPlan:
    """A fully prepared race weekend: simulation inputs + result-assembly
    context. `prepare_weekend` produces it; `assemble_result` consumes it
    along with a simulated (D, D) finish-probability matrix."""

    params: cfg.SimParams
    total_laps: int
    drivers: list[str]
    quali_probs: dict[str, list[float]]
    weather: dict
    prediction_point: str
    grid_is_actual: bool


class F1Predictor:
    """Reference-compatible orchestrator (predictor.py:157-464)."""

    def __init__(
        self,
        cache_dir: str | Path = "./cache",
        offline: bool = False,
        backend=None,
        external_elo_cache: str | Path | None = None,
        use_elo_cache: bool = False,
        now: pd.Timestamp | None = None,
        sims_per_block: int | None = None,
        engine: str = "xla",
        rookie_prior: bool = False,
        quali_model: str = "elo",
    ):
        self.data_loader = F1DataLoader(
            cache_dir=cache_dir, offline=offline, backend=backend, now=now
        )
        self.feature_engine = F1FeatureEngine(self.data_loader)
        self.elo_system = F1EloSystem()
        self._processed_seasons: set[int] = set()
        self._features_loaded = False
        self._features_now = None  # loader clock at last feature load
        self.last_effective_sims: int | None = None
        self._elo_cache_path = Path(cache_dir) / "elo_ratings.json"
        self._use_elo_cache = use_elo_cache
        self._sims_per_block = sims_per_block
        self._engine = resolve_engine(engine)
        self._rookie_prior = rookie_prior
        if quali_model not in ("elo", "bayesian", "gbm"):
            raise ValueError(
                f"unknown quali_model {quali_model!r} "
                "(use 'elo', 'bayesian' or 'gbm')"
            )
        self._quali_model = quali_model
        self._bayes_model = None  # built lazily on first alt-model prediction
        if use_elo_cache:
            loaded = load_with_priority(external_elo_cache, self._elo_cache_path)
            if loaded is not None:
                self.elo_system, seasons, _src = loaded
                self._processed_seasons = set(seasons)

    # -- small helpers (reference predictor.py:165-242) ------------------------

    def _get_circuit_info(self, race: str) -> dict:
        return cfg.circuit_info(race)

    def apply_grid_penalties(
        self, quali_positions: dict[str, int], penalties: dict[str, int | str]
    ) -> dict[str, int]:
        """Re-rank a grid after penalties; quali position breaks ties
        (reference predictor.py:214-242)."""
        resolved = {d: cfg.resolve_penalty(p) for d, p in penalties.items()}
        ranked = sorted(quali_positions.items(), key=lambda kv: kv[1])
        penalized = [(d, pos + resolved.get(d, 0), pos) for d, pos in ranked]
        penalized.sort(key=lambda x: (x[1], x[2]))
        return {d: i + 1 for i, (d, _, _) in enumerate(penalized)}

    # -- Elo construction (reference predictor.py:271-302) ----------------------

    def _build_elo(self, season: int) -> list[int]:
        historical = sorted(
            s for s in range(season - 1, season + 1) if s > ELO_SEASON_FLOOR
        )
        added = False
        for hist in historical:
            if hist in self._processed_seasons:
                continue
            try:
                years_ago = season - hist
                data = self.data_loader.load_season_data(hist)
                total = len(data["qualifying"])
                for idx, ev in enumerate(data["qualifying"]):
                    self.elo_system.set_recency_weight(years_ago, idx, total)
                    self.elo_system.update_quali_ratings(ev)
                for idx, ev in enumerate(data.get("sprint_qualifying", [])):
                    self.elo_system.set_recency_weight(years_ago, idx, total)
                    self.elo_system.update_quali_ratings(ev)
                for idx, ev in enumerate(data["races"]):
                    self.elo_system.set_recency_weight(years_ago, idx, total)
                    self.elo_system.update_race_ratings(ev)
                for idx, ev in enumerate(data.get("sprints", [])):
                    self.elo_system.set_recency_weight(years_ago, idx, total)
                    self.elo_system.update_race_ratings(ev)
                self._processed_seasons.add(hist)
                added = True
            except Exception:  # noqa: BLE001 — skip bad seasons (predictor.py:301)
                pass
        # Persist only when this call actually ingested a season: the
        # walk-forward backtest calls prepare_weekend once per race, and an
        # unconditional save re-serialized the full state ~24x/season for
        # nothing.
        if self._use_elo_cache and added and self._processed_seasons:
            save_elo(
                self.elo_system,
                self._elo_cache_path,
                processed_seasons=sorted(self._processed_seasons),
            )
        return historical

    # -- the main pipeline (reference predictor.py:244-464) ---------------------

    def predict_weekend(
        self,
        season: int,
        race: str,
        grid_penalties: dict[str, int | str] | None = None,
        circuit_info: dict | None = None,
        prediction_point: str = "fp2",
        actual_grid: dict[str, int] | None = None,
        n_simulations: int = 10_000,
        seed: int | None = None,
    ) -> dict:
        plan = self.prepare_weekend(
            season,
            race,
            grid_penalties=grid_penalties,
            circuit_info=circuit_info,
            prediction_point=prediction_point,
            actual_grid=actual_grid,
        )
        probs = self.simulate_plan(plan, n_simulations, seed)
        return self.assemble_result(plan, probs)

    def prepare_weekend(
        self,
        season: int,
        race: str,
        grid_penalties: dict[str, int | str] | None = None,
        circuit_info: dict | None = None,
        prediction_point: str = "fp2",
        actual_grid: dict[str, int] | None = None,
    ) -> "WeekendPlan":
        """Everything up to (but not including) the Monte Carlo: data loads,
        Elo builds, features, practice extraction, SimParams assembly.

        Separated from `predict_weekend` so whole seasons of prepared races
        can be simulated as ONE sharded batch (validate/backtest.py batched
        mode, parallel/sharded.py)."""
        grid_penalties = grid_penalties or {}
        circuit_info = circuit_info or self._get_circuit_info(race)

        historical_seasons = self._build_elo(season)
        # Features load once per loader clock: in normal operation the clock
        # never moves so this is a single load (reference features.py:16-72);
        # when the walk-forward backtest re-pins the clock per race
        # (loader.set_now), the archive is rebuilt so feature inputs only see
        # races strictly before the one being predicted (no look-ahead).
        loader_now = self.data_loader.now
        if historical_seasons and (
            not self._features_loaded or self._features_now != loader_now
        ):
            self.feature_engine.load_historical_data(historical_seasons)
            self._features_loaded = True
            self._features_now = loader_now

        # FP data via fallback chain.
        fp_data = pd.DataFrame()
        for session in SESSION_CHAINS.get(prediction_point, DEFAULT_CHAIN):
            fp_data = self.data_loader.load_session(season, race, session)
            if not fp_data.empty:
                break
        weather = self.data_loader.get_weather(season, race, "R")
        if fp_data.empty:
            # InsufficientDataError is also a ValueError, so pre-existing
            # callers keep working; `safety.safe_predict` degrades it to a
            # uniform fallback (reference predictor.py:188-190 just raises).
            raise InsufficientDataError(
                f"No practice data available for {season} {race}"
            )

        drivers = fp_data["Driver"].unique().tolist()
        # The weekend's driver→team assignment comes from the session frame
        # itself (loader schema guarantees a Team column), NOT the static
        # 2025 cfg.DRIVER_TEAMS table: real-data archives carry FastF1 team
        # names and historical rosters that the static map would silently
        # mismatch (destroying the alt quali models' team signal and
        # mis-seeding rookie priors). The static map is only the fallback
        # for rows whose Team is missing.
        weekend_teams = self._teams_from_fp(fp_data, drivers)

        # Rookie seeding (opt-in): drivers in this weekend's field with no
        # rated history get a teammate-prior Elo instead of the flat initial
        # rating (plan.md:2762-2783; the reference leaves rookies at 1500).
        # Batched so two unrated teammates get order-independent priors.
        if self._rookie_prior:
            rookies = {
                d: weekend_teams.get(d)
                for d in drivers
                if not self.elo_system.has_rating(d)
            }
            if rookies:
                seeded = self.elo_system.initialize_rookies(
                    rookies, weekend_teams
                )
                for d, rating in seeded.items():
                    log_event("rookie_initialized", driver=d, rating=rating)

        # Qualifying probabilities: actual grid or model prediction.
        if actual_grid and prediction_point in ("quali", "sprint"):
            quali_probs = self._grid_to_probs(drivers, actual_grid)
            if grid_penalties:
                quali_probs = self._adjust_for_penalties(quali_probs, grid_penalties)
        else:
            quali_probs = None
            if self._quali_model != "elo":
                # Resolve CLI-style short names ('Bahrain') to the
                # schedule's EventName first: the alt models match circuits
                # EXACTLY against the archive's resolved names (bayesian
                # circuit index, gbm per-circuit gap features), so an
                # unresolved name silently zeroes the circuit signal.
                circuit = self.data_loader._resolve_event(season, race)
                quali_probs = self._predict_quali_alt(
                    drivers, circuit, season, weekend_teams
                )
            if quali_probs is None:
                quali_features = {
                    d: self.feature_engine.calculate_quali_features(d, race)
                    for d in drivers
                }
                quali_probs = self._predict_quali(drivers, quali_features)
            if grid_penalties:
                quali_probs = self._adjust_for_penalties(quali_probs, grid_penalties)

        # Practice-data extraction.
        base_pace = self._extract_race_pace(fp_data)
        tire_deg = self._extract_tire_deg(fp_data)
        dynamic_compounds = self._extract_tire_compound_deltas(fp_data)

        race_features = {
            d: self.feature_engine.calculate_race_features(d, race, weather)
            for d in drivers
        }
        # Clutch-shaped variance, then prediction-point multiplier, cap 0.3
        # (predictor.py:378-397).
        mult = UNCERTAINTY_MULTIPLIER.get(prediction_point, 1.0)
        driver_variance = {
            d: min(
                0.3,
                max(0.05, min(0.25, 0.15 * (1 - race_features[d].get("clutch_factor", 0) * 0.2)))
                * mult,
            )
            for d in drivers
        }

        total_laps = int(circuit_info.get("laps", 58))
        driver_dnf_rates = {
            d: race_features[d].get("dnf_probability", 0.05) / total_laps
            for d in drivers
        }

        track_condition = "damp" if weather.get("rainfall", False) else "dry"

        # Team-trend and wet-skill pace adjustments (predictor.py:416-426).
        for d in drivers:
            base_pace[d] = base_pace.get(d, DEFAULT_PACE) - (
                race_features[d].get("team_trend", 0) * 0.6
            )
        if track_condition in ("damp", "wet"):
            for d in drivers:
                base_pace[d] -= race_features[d].get("wet_performance", 0) * 0.5

        params = self._make_params(
            drivers=drivers,
            quali_probs=quali_probs,
            base_pace=base_pace,
            tire_deg=tire_deg,
            driver_variance=driver_variance,
            driver_dnf_rates=driver_dnf_rates,
            circuit_info=circuit_info,
            dynamic_compounds=dynamic_compounds,
            track_condition=track_condition,
        )
        return WeekendPlan(
            params=params,
            total_laps=total_laps,
            drivers=drivers,
            quali_probs=quali_probs,
            weather=weather,
            prediction_point=prediction_point,
            # bool(): the quali branch consumes the grid by TRUTHINESS,
            # so an empty dict must not label a model-predicted grid as
            # actual.
            grid_is_actual=bool(actual_grid)
            and prediction_point in ("quali", "sprint"),
        )

    def simulate_plan(
        self,
        plan: "WeekendPlan",
        n_simulations: int,
        seed: int | None = None,
        engine: str | None = None,
        key: jax.Array | None = None,
    ) -> np.ndarray:
        """Run the Monte Carlo for a prepared weekend; returns the (D, D)
        finish-probability matrix. `engine` overrides the predictor's
        configured backend for this call. `key` (a PRNG key) overrides
        `seed` — callers that derive per-race keys from a season fold_in
        chain (validate/backtest.py) pass it so the seeding contract is
        identical across engine paths."""
        engine = resolve_engine(engine) if engine else self._engine
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)
        # One compile per lap-count bucket serves every circuit (see
        # _lap_bucket); the actual length rides in as a traced scalar.
        bucket = _lap_bucket(plan.total_laps)
        race_laps = (
            None if bucket == plan.total_laps else jnp.int32(plan.total_laps)
        )
        if engine == "pallas" and plan.params.n_drivers > 128:
            # The fused kernel's rank keys pack rank*M+row (pallas_engine
            # `rank_key`, M=32/64/128 by field size), capping the driver
            # axis at 128. The reference simulator is size-generic
            # (simulation.py:59-100), so 'auto' must be too: fall back to
            # the XLA lap-scan engine, which has no field-size limit,
            # instead of raising from the guard.
            log_event(
                "engine_fallback_xla",
                reason="n_drivers>128 exceeds the fused kernel's rank-key packing",
                n_drivers=plan.params.n_drivers,
            )
            engine = "xla"
        if engine == "pallas":
            from monte_carlo_gp_tpu.ops.pallas_engine import (
                DEFAULT_SIMS_PER_TILE,
                run_monte_carlo_pallas,
                run_monte_carlo_pallas_sharded,
            )

            tile = min(DEFAULT_SIMS_PER_TILE, int(n_simulations))
            # Round up to a whole number of kernel tiles; probabilities
            # renormalize over the effective count. Surfaced (not silent):
            # logged here and recorded in `last_effective_sims`, which
            # `assemble_result` copies into the result dict.
            n_eff = -(-int(n_simulations) // tile) * tile
            if n_eff != int(n_simulations):
                log_event(
                    "pallas_sims_rounded",
                    requested=int(n_simulations),
                    effective=n_eff,
                    tile=tile,
                )
            self.last_effective_sims = n_eff
            if len(jax.devices()) > 1:
                # Multi-chip: shard the tile grid; bitwise identical to the
                # single-chip kernel for the same (key, n_eff, tile).
                return np.asarray(
                    run_monte_carlo_pallas_sharded(
                        plan.params, key, n_eff, bucket,
                        sims_per_tile=tile, race_laps=race_laps,
                    )
                )
            return np.asarray(
                run_monte_carlo_pallas(
                    plan.params, key, n_eff, bucket, sims_per_tile=tile,
                    race_laps=race_laps,
                )
            )
        self.last_effective_sims = int(n_simulations)
        return np.asarray(
            run_monte_carlo(
                plan.params, key, int(n_simulations), bucket,
                sims_per_block=self._sims_per_block, race_laps=race_laps,
            )
        )

    def assemble_result(self, plan: "WeekendPlan", probs: np.ndarray) -> dict:
        """Build the reference's result dict (predictor.py:447-464) from a
        (D, D) finish-probability matrix."""
        drivers = plan.drivers
        quali_probs = plan.quali_probs
        n = len(drivers)
        race_probs = {
            d: {p + 1: float(probs[i, p]) for p in range(n) if probs[i, p] > 0}
            for i, d in enumerate(drivers)
        }
        return {
            "pole_probabilities": {
                d: (quali_probs[d][0] if quali_probs.get(d) else 1.0 / max(1, n))
                for d in drivers
            },
            "win_probabilities": {d: race_probs.get(d, {}).get(1, 0.0) for d in drivers},
            "podium_probabilities": {
                d: sum(race_probs.get(d, {}).get(p, 0.0) for p in (1, 2, 3))
                for d in drivers
            },
            "full_distributions": race_probs,
            "weather": plan.weather,
            "prediction_point": plan.prediction_point,
            "confidence": CONFIDENCE_LEVELS.get(plan.prediction_point, "moderate"),
            "grid_is_actual": plan.grid_is_actual,
            # Additive over the reference dict: the sim count actually run
            # (the Pallas kernel rounds up to whole tiles; see simulate_plan).
            "n_simulations_effective": getattr(self, "last_effective_sims", None),
        }

    # -- qualifying model (reference predictor.py:466-520) -----------------------

    @staticmethod
    def _teams_from_fp(
        fp_data: pd.DataFrame, drivers: list[str]
    ) -> dict[str, str | None]:
        """Weekend driver→team from the session frame (first non-null Team
        per driver — one weekend, one team), falling back to the static
        cfg.DRIVER_TEAMS map only for rows with no Team value. Keeps the alt
        quali models and the rookie prior on the archive's own team
        vocabulary (FastF1 names, historical rosters) instead of the
        hardcoded 2025 table."""
        from_frame: dict[str, str] = {}
        if "Team" in fp_data.columns:
            teams = fp_data[["Driver", "Team"]].dropna()
            from_frame = teams.groupby("Driver", sort=False)["Team"].first().to_dict()
        return {
            d: from_frame.get(d) or cfg.DRIVER_TEAMS.get(d) for d in drivers
        }

    def _predict_quali_alt(
        self,
        drivers: list[str],
        race: str,
        season: int,
        driver_teams: dict[str, str | None] | None = None,
    ) -> dict[str, list[float]] | None:
        """Opt-in quali paths from the reference design doc (never shipped
        there): the hierarchical Bayesian model ("Approach B",
        plan.md:1111-1175 → models/bayesian.py) or the gradient-boosting
        ranker ("Approach C", plan.md:1176-1213 → models/ml.py), both fitted
        on the historical Q-lap archive. Returns None — and logs why — when
        the archive can't support a fit, so prepare_weekend falls back to
        the Elo path instead of failing the weekend.

        Deterministic: the fit is cached per archive build (refit when the
        walk-forward clock rebuilds the archive) with a fixed seed, and the
        predictive grid noise is keyed on (season, race) via crc32, not
        Python hash (PYTHONHASHSEED-proof)."""
        laps = self.feature_engine.laps
        if laps.empty:
            log_event(
                "alt_quali_fallback",
                model=self._quali_model,
                reason="empty_archive",
                race=race,
            )
            return None
        if self._bayes_model is None:
            if self._quali_model == "bayesian":
                from monte_carlo_gp_tpu.models.bayesian import BayesianQualiModel

                self._bayes_model = BayesianQualiModel()
            else:
                from monte_carlo_gp_tpu.models.ml import GBMQualiModel

                self._bayes_model = GBMQualiModel()
        import zlib

        noise_seed = zlib.crc32(f"{season}:{race}".encode())
        if driver_teams is None:
            driver_teams = {d: cfg.DRIVER_TEAMS.get(d) for d in drivers}
        try:
            return self._bayes_model.predict(
                laps,
                drivers,
                driver_teams,
                circuit=race,
                seed=noise_seed,
            )
        except ValueError as e:
            log_event(
                "alt_quali_fallback",
                model=self._quali_model,
                reason=str(e),
                race=race,
            )
            return None

    def _predict_quali(
        self, drivers: list[str], features: dict
    ) -> dict[str, list[float]]:
        if not drivers:
            return {}
        elo_probs = self.elo_system.predict_quali_probs(drivers)
        # Teammate boost, clamped [0.5, 1.5] (predictor.py:477-483).
        for d in drivers:
            delta = features.get(d, {}).get("teammate_delta", 0)
            if delta != 0 and d in elo_probs:
                boost = 1 + delta * 0.25
                elo_probs[d] = elo_probs[d] * max(0.5, min(1.5, boost))
        total = sum(elo_probs.values())
        if total > 0:
            elo_probs = {d: p / total for d, p in elo_probs.items()}

        n = len(drivers)
        sigma = max(1.0, n / 4)
        result = {}
        for d in drivers:
            base_prob = elo_probs.get(d, 1 / n)
            f = features.get(d, {})
            adjusted = base_prob * (
                1 + f.get("form_score", 0) * 0.15 + f.get("circuit_affinity", 0) * 0.10
            )
            adjusted = max(0.001, min(0.999, adjusted))
            expected_pos = (1 - adjusted) * n
            pos = np.arange(n, dtype=np.float64)
            probs = np.exp(-((pos - expected_pos) ** 2) / (2 * sigma**2))
            total = probs.sum()
            result[d] = (
                (probs / total).tolist() if total > 0 else [1.0 / n] * n
            )
        return result

    @staticmethod
    def _grid_to_probs(drivers: list[str], actual_grid: dict[str, int]) -> dict:
        """Deterministic position distributions from a known grid
        (predictor.py:334-350); out-of-range or missing drivers go last."""
        n = len(drivers)
        out = {}
        for d in drivers:
            probs = [0.0] * n
            if d in actual_grid and 0 <= actual_grid[d] - 1 < n:
                probs[actual_grid[d] - 1] = 1.0
            else:
                probs[-1] = 1.0
            out[d] = probs
        return out

    def _adjust_for_penalties(
        self, quali_probs: dict, penalties: dict[str, int | str]
    ) -> dict[str, list[float]]:
        """Shift distributions back by penalty positions (predictor.py:522-552)."""
        adjusted = {}
        for d, probs in quali_probs.items():
            penalty = cfg.resolve_penalty(penalties.get(d, 0))
            if penalty > 0 and len(probs) > 0:
                n = len(probs)
                if penalty >= n:
                    shifted = [0.0] * (n - 1) + [1.0]
                else:
                    shifted = [0.0] * n
                    for i, p in enumerate(probs):
                        shifted[min(i + penalty, n - 1)] += p
                adjusted[d] = shifted
            else:
                adjusted[d] = probs
        return adjusted

    # -- practice-data extraction (reference predictor.py:554-714) ----------------

    @staticmethod
    def _extract_race_pace(fp_data: pd.DataFrame) -> dict[str, float]:
        """Long-run pace per driver: median of the middle laps, excluding pit
        in/out laps; 25th percentile fallback below 3 laps; field median for
        drivers without valid times (predictor.py:554-618).

        Same per-driver math as the pandas-groupby original, computed over
        numpy group runs (one column conversion instead of per-(driver,race)
        frame slicing — host-prep hot path, see features._event_partial)."""
        if fp_data.empty:
            return {}
        from monte_carlo_gp_tpu.models.features import _driver_groups, _to_float

        mask = np.ones(len(fp_data), bool)
        for col in ("PitInTime", "PitOutTime"):
            if col in fp_data.columns:
                mask &= np.isnan(_to_float(fp_data[col]))
        drv_all = np.asarray(fp_data["Driver"], dtype=object)
        drv = drv_all[mask]
        lt = _to_float(fp_data["LapTime"])[mask]
        if "LapNumber" in fp_data.columns:
            order = np.lexsort((_to_float(fp_data["LapNumber"])[mask], drv))
        else:
            order = np.argsort(drv, kind="stable")
        names, _, starts, ends = _driver_groups(drv[order])
        lt_s = lt[order]
        result = {}
        for d, a, b in zip(names, starts, ends):
            valid = lt_s[a:b]
            valid = valid[~np.isnan(valid)]
            if valid.size == 0:
                continue
            if valid.size < 3:
                q = np.quantile(valid, 0.25)
                if not np.isnan(q):
                    result[d] = float(q)
                continue
            middle = valid[1:-1] if valid.size > 3 else valid
            if middle.size:
                result[d] = float(np.median(middle))
        default = float(np.median(list(result.values()))) if result else DEFAULT_PACE
        for driver in dict.fromkeys(drv_all):
            result.setdefault(driver, default)
        return result

    @staticmethod
    def _extract_tire_deg(fp_data: pd.DataFrame) -> dict[str, float]:
        """Per-driver linear lap-time slope, clamped [0.01, 0.15]; 0.05 for
        warming-up (negative) slopes or sparse data (predictor.py:665-714).
        Numpy group runs, same math (see _extract_race_pace)."""
        if fp_data.empty:
            return {}
        from monte_carlo_gp_tpu.models.features import _driver_groups, _to_float

        drv = np.asarray(fp_data["Driver"], dtype=object)
        has_lt = "LapTime" in fp_data.columns
        lt = _to_float(fp_data["LapTime"]) if has_lt else None
        if "LapNumber" in fp_data.columns:
            order = np.lexsort((_to_float(fp_data["LapNumber"]), drv))
        else:
            order = np.argsort(drv, kind="stable")
        names, _, starts, ends = _driver_groups(drv[order])
        lt_s = lt[order] if has_lt else None
        result = {}
        for d, a, b in zip(names, starts, ends):
            if b - a < 5 or not has_lt:
                result[d] = DEFAULT_DEG
                continue
            valid = lt_s[a:b]
            valid = valid[~np.isnan(valid)]
            if valid.size < 5:
                result[d] = DEFAULT_DEG
                continue
            x = np.arange(valid.size, dtype=float)
            try:
                slope = np.polyfit(x, valid, 1)[0]
                result[d] = (
                    float(np.clip(slope, 0.01, 0.15)) if slope > 0 else DEFAULT_DEG
                )
            except (np.linalg.LinAlgError, ValueError):
                result[d] = DEFAULT_DEG
        return result

    @staticmethod
    def _extract_tire_compound_deltas(fp_data: pd.DataFrame) -> dict[str, dict]:
        """Circuit-specific compound pace deltas relative to MEDIUM from
        practice, outliers beyond 107% of best removed (predictor.py:620-663)."""
        result = {c: dict(info) for c, info in cfg.TIRE_COMPOUNDS.items()}
        if fp_data.empty or "Compound" not in fp_data.columns:
            return result
        paces = {}
        for compound in ("SOFT", "MEDIUM", "HARD"):
            laps = fp_data[fp_data["Compound"].astype(str).str.upper() == compound]
            if laps.empty or "LapTime" not in laps.columns:
                continue
            valid = laps["LapTime"].dropna()
            if len(valid) < 3:
                continue
            best = valid.min()
            representative = valid[valid < best * 1.07]
            if not representative.empty:
                paces[compound] = float(representative.median())
        if "MEDIUM" in paces:
            for compound, pace in paces.items():
                result[compound]["pace_delta"] = round(pace - paces["MEDIUM"], 2)
        return result

    # -- params assembly ----------------------------------------------------------

    def _make_params(
        self,
        *,
        drivers: list[str],
        quali_probs: dict[str, list[float]],
        base_pace: dict[str, float],
        tire_deg: dict[str, float],
        driver_variance: dict[str, float],
        driver_dnf_rates: dict[str, float],
        circuit_info: dict,
        dynamic_compounds: dict[str, dict],
        track_condition: str,
    ) -> cfg.SimParams:
        n = len(drivers)
        grid = np.zeros((n, n), np.float32)
        for i, d in enumerate(drivers):
            probs = quali_probs.get(d) or []
            grid[i, : len(probs)] = probs[:n]
        team_rate = np.array(
            [
                cfg.DEFAULT_DNF_RATES.get(cfg.DRIVER_TEAMS.get(d, ""), 0.002)
                for d in drivers
            ],
            np.float32,
        )
        return cfg.make_sim_params(
            grid_probs=grid,
            base_pace=np.array(
                [base_pace.get(d, DEFAULT_PACE) for d in drivers], np.float32
            ),
            tire_deg=np.array(
                [tire_deg.get(d, DEFAULT_DEG) for d in drivers], np.float32
            ),
            variance=np.array(
                [driver_variance.get(d, 0.15) for d in drivers], np.float32
            ),
            dnf_rate=np.array(
                [driver_dnf_rates.get(d, team_rate[i]) for i, d in enumerate(drivers)],
                np.float32,
            ),
            team_dnf_rate=team_rate,
            pit_loss=float(circuit_info.get("pit_loss", 22.0)),
            overtake_delta=float(circuit_info.get("overtake_delta", 0.8)),
            track_condition=track_condition,
            compound_table=dynamic_compounds,
        )
