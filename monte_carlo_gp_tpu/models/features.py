"""Feature engineering over historical lap archives.

Capability-parity rebuild of the reference `F1FeatureEngine`
(/root/reference/src/features.py): 8 qualifying features and 10 race
features with the same formulas, clamps and defaults (SURVEY.md §2 row 6).

Design differences (all deliberate):
  * every feature is computed for ALL drivers at once with vectorized pandas
    groupbys over precomputed aggregate tables (the reference re-groups the
    whole archive per driver per feature — O(drivers × features) scans);
  * results are exposed both as the reference's per-driver dicts
    (`calculate_quali_features` / `calculate_race_features`) and as dense
    feature tensors for the predictor (`quali_feature_arrays` /
    `race_feature_arrays`);
  * `teammate_delta` is computed over the full archive. In the reference the
    feature is structurally dead: `calculate_quali_features` passes only the
    driver's own laps into `_calc_teammate_delta` (features.py:81-88), so no
    teammate rows exist and it always returns 0.0;
  * `avg_gap_to_pole_pct` is actually computed (the reference stubs it to a
    constant 1.0, features.py:128-133);
  * `circuit_affinity` matches archive events by short circuit name
    ('Bahrain' ⊂ 'Bahrain Grand Prix'). The reference matches raw labels
    (`features.py:205-209`): its archive stores full event names while the
    similarity table holds short names, so the isin() never matches and the
    feature is 0.0 in practice;
  * the reference's RECENT_LAPS=100 qualifying window (features.py:76-84) is
    consumed ONLY by the gap-to-pole stub (1.0 vs 1.5 branch) and the dead
    teammate feature, so it has no live effect to reproduce — measured by
    tests/test_reference_ab.py.

`reference_compat=True` reproduces the reference's literal behavior for all
three divergent features (for A/B validation against the real code).

Everything here is off the hot path; outputs become jnp tensors at the
predictor boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from monte_carlo_gp_tpu import config as cfg

SESSION_KEY = ["season", "circuit", "session_type"]


def _safe_div(a, b, default=0.0):
    return a / b if b else default


class F1FeatureEngine:
    """Same public surface as the reference (features.py:10-126)."""

    def __init__(self, data_loader, reference_compat: bool = False):
        self.loader = data_loader
        self.laps = pd.DataFrame()
        self.race_results = pd.DataFrame()
        self._tables: dict | None = None
        self.reference_compat = reference_compat
        # per-(season, event, session) annotated frames: event data is
        # immutable, so walk-forward rebuilds (one per race) only annotate
        # events they have not seen before
        self._annotated: dict[tuple, pd.DataFrame] = {}

    # -- loading (reference features.py:16-72) --------------------------------

    def load_historical_data(self, seasons: list[int]) -> None:
        """Combine Q+R laps and race classifications across seasons."""
        all_laps, all_results = [], []
        for season in seasons:
            for ev in self.loader.past_events(season):
                name = ev["EventName"]
                for session_type in ("Q", "R"):
                    key = ("laps", season, name, session_type)
                    cached = self._annotated.get(key)
                    if cached is None:
                        laps = self.loader.load_session(season, name, session_type)
                        if laps.empty:
                            continue
                        cached = laps.assign(
                            season=season, circuit=name, session_type=session_type
                        )
                        self._annotated[key] = cached
                    all_laps.append(cached)
                key = ("results", season, name)
                res = self._annotated.get(key)
                if res is None:
                    raw = self.loader.load_results(season, name, "R")
                    if raw is not None and not raw.empty:
                        res = raw.rename(
                            columns={
                                "Abbreviation": "driver",
                                "GridPosition": "grid",
                                "Position": "finish",
                                "Status": "status",
                            }
                        )[["driver", "grid", "finish", "status"]].assign(
                            season=season, circuit=name
                        )
                        self._annotated[key] = res
                if res is not None:
                    all_results.append(res)
        self.laps = (
            pd.concat(all_laps, ignore_index=True) if all_laps else pd.DataFrame()
        )
        self.race_results = (
            pd.concat(all_results, ignore_index=True)
            if all_results
            else pd.DataFrame()
        )
        self._tables = None

    # -- aggregate tables (computed once per archive) --------------------------

    def _t(self) -> dict:
        if self._tables is not None:
            return self._tables
        t: dict = {}
        if not self.race_results.empty:
            t["results_by_driver"] = {
                d: grp for d, grp in self.race_results.groupby("driver", sort=False)
            }
        laps = self.laps
        if laps.empty or "Driver" not in laps.columns:
            self._tables = t
            return t
        g_drv_session = laps.groupby(["Driver"] + SESSION_KEY)
        t["drv_session_nlaps"] = g_drv_session.size()
        # Event-level tables (season, circuit), combining Q+R sessions — the
        # reference groups `self.laps` by (season, circuit) for sector
        # strength, wet performance and temp sensitivity (features.py:292,
        # :650, :745), so one entry per EVENT, not per session.
        g_event = laps.groupby(["season", "circuit"])
        g_drv_event = laps.groupby(["Driver", "season", "circuit"])
        t["event_best"] = g_event["LapTime"].min()
        t["drv_event_best"] = g_drv_event["LapTime"].min()
        for col in ("Sector1Time", "Sector2Time", "Sector3Time"):
            if col in laps.columns:
                t["event_best_" + col] = g_event[col].min()
                t["drv_event_best_" + col] = g_drv_event[col].min()
        if "TrackTemp" in laps.columns:
            t["event_temp"] = g_event["TrackTemp"].mean()
        if "Rainfall" in laps.columns:
            t["session_wet"] = g_event["Rainfall"].any()
        # race-session driver medians and lap counts (race pace / deg)
        r = laps[laps["session_type"] == "R"]
        if not r.empty:
            gr = r.groupby(["Driver", "season", "circuit"])
            t["r_median"] = gr["LapTime"].median()
            t["r_nlaps"] = gr["LapTime"].count()
            t["deg_slopes"] = _deg_slopes_all(r)
        # qualifying bests pivoted per event (teammate comparisons) and the
        # driver -> team map
        q = laps[laps["session_type"] == "Q"]
        if not q.empty:
            t["q_best_pivot"] = q.pivot_table(
                index=["season", "circuit"], columns="Driver",
                values="LapTime", aggfunc="min",
            )
            if "Team" in q.columns:
                # Team PER EVENT — drivers change teams between seasons, so
                # teammate comparisons must match rosters event by event
                # (reference features.py:159-181 compares within each
                # session's own team grouping).
                t["q_team_pivot"] = q.pivot_table(
                    index=["season", "circuit"], columns="Driver",
                    values="Team", aggfunc="first",
                )
        # per-driver lap-time sums/counts overall and per short circuit name
        # (circuit affinity = mean over laps, reference features.py:214-234)
        lt = laps.dropna(subset=["LapTime"])
        t["drv_lap_sum"] = lt.groupby("Driver")["LapTime"].sum()
        t["drv_lap_n"] = lt.groupby("Driver")["LapTime"].count()
        # map unique names once, not per lap row (~40k rows per rebuild)
        shorts = lt["circuit"].map(
            {c: _short_name(c) for c in lt["circuit"].unique()}
        )
        g_short = lt.groupby(["Driver", shorts])
        t["drv_circuit_sum"] = g_short["LapTime"].sum()
        t["drv_circuit_n"] = g_short["LapTime"].count()

        # ---- whole-field tables (one pass instead of per-driver rescans) ---
        # The walk-forward backtest rebuilds the archive per race; computing
        # these per driver made feature prep the dominant host cost
        # (profiled: _teammate_delta 34s + _quali_gaps 36s per 20-race
        # season). Values are bit-compatible with the per-driver formulas
        # (same float64 ops over the same sets; only summation order may
        # differ) — guarded by tests/test_reference_ab.py field-by-field.
        if "q_best_pivot" in t:
            pivot = t["q_best_pivot"]
            session_best = pivot.min(axis=1)
            t["q_gaps_pivot"] = (
                pivot.sub(session_best, axis=0).div(session_best, axis=0) * 100.0
            )
            if "q_team_pivot" in t:
                teams = t["q_team_pivot"].reindex(columns=pivot.columns)
                v = pivot.to_numpy(float)  # (events, drivers)
                team = teams.to_numpy(object)
                valid = ~np.isnan(v)
                # same_team[e, i, j]: NaN teams compare False, covering the
                # reference's my_team.notna() guard (features.py:159-181)
                same_team = team[:, :, None] == team[:, None, :]
                ok = (
                    valid[:, :, None]
                    & valid[:, None, :]
                    & (np.nan_to_num(v[:, None, :]) > 0)
                    & same_team
                    & ~np.eye(v.shape[1], dtype=bool)[None]
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    delta = (v[:, None, :] - v[:, :, None]) / v[:, None, :] * 100.0
                sums = np.where(ok, delta, 0.0).sum(axis=(0, 2))
                counts = ok.sum(axis=(0, 2))
                t["teammate_delta_all"] = {
                    d: float(sums[i] / counts[i]) if counts[i] else 0.0
                    for i, d in enumerate(pivot.columns)
                }
        if "r_median" in t:
            med = t["r_median"][t["r_nlaps"] >= 5]
            if not med.empty:
                lead = med.groupby(level=[1, 2]).transform("min")
                delta = ((med - lead) / lead * 100.0)[lead > 0]
                t["race_pace_by_driver"] = delta.groupby(level=0).mean()
        # sector strengths: per sector, % advantage vs event best, mean per
        # driver, clipped ±1 (whole field at once)
        for col in ("Sector1Time", "Sector2Time", "Sector3Time"):
            if ("drv_event_best_" + col) not in t:
                continue
            pivot = t["drv_event_best_" + col].unstack(0)
            sb = t["event_best_" + col]
            with np.errstate(divide="ignore", invalid="ignore"):
                deltas = (-pivot.sub(sb, axis=0)).div(sb, axis=0) * 100.0
            out = {}
            for drv in pivot.columns:
                v = deltas[drv].dropna().to_numpy()
                v = v[np.isfinite(v)]
                out[drv] = float(np.clip(v.mean(), -1.0, 1.0)) if v.size else 0.0
            t["sector_strength_" + col] = out
        # wet performance and temp sensitivity share the event-gap pivot
        drv_ev = t["drv_event_best"].unstack(0)
        ev_best = t["event_best"]
        with np.errstate(divide="ignore", invalid="ignore"):
            gaps_ev = drv_ev.sub(ev_best, axis=0).div(ev_best, axis=0) * 100.0
        if "session_wet" in t:
            wet = t["session_wet"].reindex(gaps_ev.index).fillna(False).to_numpy(bool)
            out = {}
            for drv in gaps_ev.columns:
                g = gaps_ev[drv].to_numpy()
                ok = ~np.isnan(g)
                wg, dg = g[ok & wet], g[ok & ~wet]
                out[drv] = (
                    float(np.clip(dg.mean() - wg.mean(), -1.0, 1.0))
                    if wg.size and dg.size
                    else 0.0
                )
            t["wet_performance_all"] = out
        if "event_temp" in t:
            temps = t["event_temp"].reindex(gaps_ev.index).to_numpy(float)
            sb = ev_best.reindex(gaps_ev.index).to_numpy(float)
            out = {}
            for drv in gaps_ev.columns:
                g = gaps_ev[drv].to_numpy(float)
                ok = ~np.isnan(g) & ~np.isnan(temps) & (sb > 0)
                gk, tk = g[ok], temps[ok]
                if len(gk) < 5 or tk.std() < 5:
                    out[drv] = 0.001
                else:
                    slope = np.polyfit(tk, gk, 1)[0]
                    out[drv] = float(np.clip(slope / 100.0, 0.0, 0.005))
            t["temp_sensitivity_all"] = out
        # Q3-rate heuristic: share of Q sessions with >=3 laps per driver
        n = t["drv_session_nlaps"]
        qn = n[n.index.get_level_values("session_type") == "Q"]
        if not qn.empty:
            t["q3_rate_all"] = (qn >= 3).groupby(level=0).mean().to_dict()
        self._tables = t
        return t

    # -- public per-driver API (reference features.py:74-126) ------------------

    def calculate_quali_features(self, driver: str, circuit: str) -> dict:
        if self.reference_compat:
            return {
                # Reference stub (features.py:128-133): 1.0 whenever the
                # driver has any recent Q laps, 1.5 otherwise. The tail(100)
                # window cannot change emptiness, so "any Q laps" is exact.
                "avg_gap_to_pole_pct": (
                    1.0
                    if not self.laps.empty
                    and (
                        (self.laps["Driver"] == driver)
                        & (self.laps["session_type"] == "Q")
                    ).any()
                    else 1.5
                ),
                # Dead in the reference: only the driver's own laps reach
                # _calc_teammate_delta (features.py:81-88).
                "teammate_delta": 0.0,
                "circuit_affinity": self._circuit_affinity_compat(driver, circuit),
                "q3_conversion": self._q3_rate(driver),
                "low_speed_strength": self._sector_strength(driver, "low_speed"),
                "high_speed_strength": self._sector_strength(driver, "high_speed"),
                "traction_strength": self._sector_strength(driver, "traction"),
                "form_score": self._form_score(driver),
            }
        return {
            "avg_gap_to_pole_pct": self._gap_to_pole(driver),
            "teammate_delta": self._teammate_delta(driver),
            "circuit_affinity": self._circuit_affinity(driver, circuit),
            "q3_conversion": self._q3_rate(driver),
            "low_speed_strength": self._sector_strength(driver, "low_speed"),
            "high_speed_strength": self._sector_strength(driver, "high_speed"),
            "traction_strength": self._sector_strength(driver, "traction"),
            "form_score": self._form_score(driver),
        }

    def calculate_race_features(self, driver: str, circuit: str, weather: dict) -> dict:
        rainfall = weather.get("rainfall", False)
        if pd.isna(rainfall):
            is_wet = False
        elif isinstance(rainfall, bool):
            is_wet = rainfall
        elif isinstance(rainfall, (int, float)):
            is_wet = rainfall > 0
        else:
            is_wet = str(rainfall).lower() in ("true", "yes", "1")
        track_temp = weather.get("track_temp", 35)
        track_temp = float(track_temp) if pd.notna(track_temp) else 35.0
        return {
            "race_pace_delta": self._race_pace(driver),
            "deg_rate": self._deg_rate(driver),
            "overtake_rate": self._overtake_rate(driver),
            "position_hold_rate": self._defense_rate(driver),
            "dnf_probability": self._dnf_prob(driver),
            "start_delta": self._start_performance(driver),
            "clutch_factor": self._clutch_factor(driver),
            "wet_performance": self._wet_performance(driver) if is_wet else 0,
            "high_temp_deg": self._temp_sensitivity(driver) * track_temp,
            "team_trend": self._team_trend(driver),
        }

    # -- qualifying features ----------------------------------------------------

    def _quali_gaps(self, driver: str) -> pd.Series:
        """Per-Q-session percentage gap of driver's best lap to session best
        ((season, circuit)-ordered). Sliced from the whole-field pivot."""
        t = self._t()
        if not t or "q_gaps_pivot" not in t or driver not in t["q_gaps_pivot"].columns:
            return pd.Series(dtype=float)
        return t["q_gaps_pivot"][driver].dropna()

    def _gap_to_pole(self, driver: str) -> float:
        """Mean % gap to pole in qualifying. Reference stubs this to 1.0 with
        a 1.5 empty-default (features.py:128-133); here it is computed."""
        gaps = self._quali_gaps(driver)
        if gaps.empty:
            return 1.5
        return float(gaps.mean())

    def _teammate_delta(self, driver: str) -> float:
        """Mean % best-lap delta vs teammate per (season, circuit) session
        (features.py:135-185 intent; see module docstring on the reference's
        dead-code form). Positive = faster than teammate. Teammates are
        matched per event, so team changes between seasons compare against
        the right car in each season. Computed for the whole field at once
        in `_t()` ('teammate_delta_all')."""
        t = self._t()
        if not t or "teammate_delta_all" not in t:
            return 0.0
        return t["teammate_delta_all"].get(driver, 0.0)

    def _circuit_affinity(self, driver: str, circuit: str) -> float:
        """Mean lap time at this circuit type vs overall, normalized and
        clamped to ±0.5 (features.py:187-234)."""
        t = self._t()
        if not t or "drv_lap_n" not in t:
            return 0.0
        n_all = t["drv_lap_n"].get(driver, 0)
        if not n_all:
            return 0.0
        # sorted: the accumulation below is float addition in iteration
        # order; a raw set's hash-randomized order would make the feature
        # vary in the last ULP across processes.
        targets = sorted(
            {_short_name(circuit)} | set(cfg.get_similar_tracks(_short_name(circuit)))
        )
        sums = t["drv_circuit_sum"]
        counts = t["drv_circuit_n"]
        total = n = 0.0
        for short in targets:
            key = (driver, short)
            if key in counts.index:
                total += sums[key]
                n += counts[key]
        if n == 0:
            return 0.0
        circuit_avg = total / n
        overall_avg = t["drv_lap_sum"][driver] / n_all
        if overall_avg == 0:
            return 0.0
        return float(np.clip((overall_avg - circuit_avg) / overall_avg, -0.5, 0.5))

    def _circuit_affinity_compat(self, driver: str, circuit: str) -> float:
        """The reference's literal circuit-affinity computation
        (features.py:187-234): archive rows matched by RAW circuit label
        against [circuit] + similar short names. Because the archive stores
        full event names, this is 0.0 for short-name inputs — kept only for
        A/B validation; the default path fixes the matching."""
        if self.laps.empty or "LapTime" not in self.laps.columns:
            return 0.0
        mine = self.laps[self.laps["Driver"] == driver]
        if mine.empty:
            return 0.0
        targets = [circuit] + cfg.get_similar_tracks(circuit)
        at_circuit = mine[mine["circuit"].isin(targets)]
        circuit_avg = at_circuit["LapTime"].dropna().mean()
        overall_avg = mine["LapTime"].dropna().mean()
        if pd.isna(circuit_avg) or pd.isna(overall_avg) or overall_avg == 0:
            return 0.0
        return float(
            np.clip((overall_avg - circuit_avg) / overall_avg, -0.5, 0.5)
        )

    def _q3_rate(self, driver: str) -> float:
        """Share of Q sessions with >=3 laps — the reference's Q3 heuristic
        (features.py:236-259). Whole-field table from `_t()`."""
        t = self._t()
        if not t or "q3_rate_all" not in t:
            return 0.5
        return float(t["q3_rate_all"].get(driver, 0.5))

    def _sector_strength(self, driver: str, sector_type: str) -> float:
        """% advantage vs session best in the mapped sector, mean over all
        sessions, clamped ±1 (features.py:261-320)."""
        col = {
            "high_speed": "Sector1Time",
            "low_speed": "Sector2Time",
            "traction": "Sector3Time",
        }.get(sector_type, "Sector1Time")
        t = self._t()
        if not t or ("sector_strength_" + col) not in t:
            return 0.0
        return t["sector_strength_" + col].get(driver, 0.0)

    def _form_score(self, driver: str, decay: float = 0.85) -> float:
        """Exponential-decay weighted recent qualifying form in [-1, 1]
        (features.py:322-394): per Q session, score = clip(1 - gap%, -1, 1),
        weight = decay^(sessions_ago)."""
        gaps = self._quali_gaps(driver)
        if gaps.empty:
            return 0.0
        scores = np.clip(1.0 - gaps.to_numpy(), -1.0, 1.0)
        n = len(scores)
        weights = decay ** (n - 1 - np.arange(n))
        return float((scores * weights).sum() / weights.sum())

    # -- race features ------------------------------------------------------------

    def _race_pace(self, driver: str) -> float:
        """Mean % gap of driver's median race lap to the fastest qualifying
        (>=5 laps) median in each race (features.py:396-446). Whole-field
        table precomputed in `_t()`."""
        t = self._t()
        if not t or "race_pace_by_driver" not in t:
            return 0.0
        return float(t["race_pace_by_driver"].get(driver, 0.0))

    def _deg_rate(self, driver: str) -> float:
        """Linear lap-time slope per race session, outliers ±10s of median
        removed, slopes kept in (0, 0.5), mean clamped [0.01, 0.15]
        (features.py:448-490). Slopes precomputed once per archive."""
        t = self._t()
        if not t or "deg_slopes" not in t:
            return 0.05
        slopes = t["deg_slopes"]
        if driver not in slopes.index.get_level_values(0):
            return 0.05
        drv = slopes.loc[driver].dropna()
        drv = drv[(drv > 0) & (drv < 0.5)]
        if drv.empty:
            return 0.05
        return float(np.clip(drv.mean(), 0.01, 0.15))

    def _driver_results(self, driver: str) -> pd.DataFrame:
        by_driver = self._t().get("results_by_driver")
        if not by_driver:
            return pd.DataFrame()
        return by_driver.get(driver, self.race_results.iloc[0:0])

    def _overtake_rate(self, driver: str) -> float:
        """Mean grid - finish (features.py:492-514)."""
        races = self._driver_results(driver)
        if races.empty:
            return 0.0
        valid = races[(races["grid"] > 0) & (races["finish"] > 0)]
        if valid.empty:
            return 0.0
        return float((valid["grid"] - valid["finish"]).mean())

    def _defense_rate(self, driver: str) -> float:
        """Share of races finishing within one place of grid, clamped
        [0.3, 0.95] (features.py:516-543)."""
        races = self._driver_results(driver)
        if len(races) < 3:
            return 0.7
        valid = races[(races["grid"] > 0) & (races["finish"] > 0)]
        if valid.empty:
            return 0.7
        held = (valid["finish"] <= valid["grid"] + 1).mean()
        return float(np.clip(held, 0.3, 0.95))

    def _dnf_prob(self, driver: str) -> float:
        """Historical per-race DNF rate from status strings, clamped
        [0.01, 0.20] (features.py:545-566)."""
        races = self._driver_results(driver)
        if len(races) < 5:
            return 0.05
        status = races["status"].astype(str).str.lower()
        dnf = ~(status.str.contains("finished") | status.str.contains(r"\+", regex=True))
        return float(np.clip(dnf.mean(), 0.01, 0.20))

    def _start_performance(self, driver: str) -> float:
        """40% of grid-to-finish gains in point-scoring races, clamped ±3
        (features.py:568-594)."""
        races = self._driver_results(driver)
        if len(races) < 5:
            return 0.0
        valid = races[
            (races["grid"] > 0) & (races["finish"] > 0) & (races["finish"] <= 15)
        ]
        if valid.empty:
            return 0.0
        avg = ((valid["grid"] - valid["finish"]) * 0.4).mean()
        return float(np.clip(avg, -3.0, 3.0))

    def _clutch_factor(self, driver: str) -> float:
        """Normalized outperformance from contested grid slots (2-10),
        clamped ±0.5 (features.py:596-624)."""
        races = self._driver_results(driver)
        if len(races) < 10:
            return 0.0
        valid = races[
            (races["grid"] >= 2) & (races["grid"] <= 10) & (races["finish"] > 0)
        ]
        if valid.empty:
            return 0.0
        avg = ((valid["grid"] - valid["finish"]) / 5.0).mean()
        return float(np.clip(avg, -0.5, 0.5))

    def _wet_performance(self, driver: str) -> float:
        """Gap-to-session-best difference, dry minus wet sessions, clamped ±1
        (features.py:626-685). Positive = relatively faster in the wet."""
        t = self._t()
        if not t or "wet_performance_all" not in t:
            return 0.0
        return t["wet_performance_all"].get(driver, 0.0)

    def _team_trend(self, driver: str, recent_races: int = 5) -> float:
        """Last-5 vs earlier-season average finish, normalized /10, clamped
        ±0.5 (features.py:687-728)."""
        races = self._driver_results(driver)
        if races.empty or "season" not in races.columns:
            return 0.0
        latest = races["season"].max()
        season = races[races["season"] == latest].reset_index(drop=True)
        if len(season) < recent_races + 2:
            return 0.0
        recent = season.tail(recent_races)["finish"].dropna()
        earlier = season.head(len(season) - recent_races)["finish"].dropna()
        if recent.empty or earlier.empty:
            return 0.0
        return float(np.clip((earlier.mean() - recent.mean()) / 10.0, -0.5, 0.5))

    def _temp_sensitivity(self, driver: str) -> float:
        """Slope of gap% vs session track temperature, /100, clamped
        [0, 0.005] (features.py:730-786)."""
        t = self._t()
        if not t or "temp_sensitivity_all" not in t:
            return 0.001
        return t["temp_sensitivity_all"].get(driver, 0.001)

    # -- dense tensors for the predictor ----------------------------------------

    QUALI_KEYS = (
        "avg_gap_to_pole_pct", "teammate_delta", "circuit_affinity",
        "q3_conversion", "low_speed_strength", "high_speed_strength",
        "traction_strength", "form_score",
    )
    RACE_KEYS = (
        "race_pace_delta", "deg_rate", "overtake_rate", "position_hold_rate",
        "dnf_probability", "start_delta", "clutch_factor", "wet_performance",
        "high_temp_deg", "team_trend",
    )

    def quali_feature_arrays(self, drivers: list[str], circuit: str) -> dict[str, np.ndarray]:
        rows = [self.calculate_quali_features(d, circuit) for d in drivers]
        return {
            k: np.array([r[k] for r in rows], np.float32) for k in self.QUALI_KEYS
        }

    def race_feature_arrays(
        self, drivers: list[str], circuit: str, weather: dict
    ) -> dict[str, np.ndarray]:
        rows = [self.calculate_race_features(d, circuit, weather) for d in drivers]
        return {
            k: np.array([r[k] for r in rows], np.float32) for k in self.RACE_KEYS
        }


def _session_deg_slope(secs: np.ndarray) -> float:
    """Degradation slope of one driver-race-session's LapNumber-ordered
    valid lap times (features.py:463-486): needs >=10 valid laps, drops laps
    beyond ±10s of the session median, linear fit over the surviving
    original lap indices."""
    if len(secs) < 10:
        return np.nan
    med = np.median(secs)
    keep = np.abs(secs - med) < 10.0
    idx = np.nonzero(keep)[0]
    if len(idx) < 5:
        return np.nan
    return float(np.polyfit(idx.astype(float), secs[keep], 1)[0])


def _deg_slopes_all(r: pd.DataFrame) -> pd.Series:
    """Per-(Driver, season, circuit) degradation slopes for the whole race
    archive in one pass. Replaces groupby.apply (whose per-group frame
    construction was the single largest table-build cost — the walk-forward
    backtest rebuilds these tables every race): one global sort, group
    boundaries by code changes, then the identical numpy math per group."""
    keys = ["Driver", "season", "circuit"]
    cols = keys + (["LapNumber"] if "LapNumber" in r.columns else [])
    rr = r.dropna(subset=["LapTime"]).sort_values(cols, kind="stable")
    if rr.empty:
        return pd.Series(dtype=float)
    idx = pd.MultiIndex.from_frame(rr[keys])
    # group id per row: increments whenever any key column changes
    codes = np.stack([np.asarray(c) for c in idx.codes])
    change = np.any(codes[:, 1:] != codes[:, :-1], axis=0)
    bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(rr)]])
    vals = rr["LapTime"].to_numpy(float)
    out_index, out_vals = [], []
    for a, b in zip(bounds[:-1], bounds[1:]):
        out_index.append(idx[a])
        out_vals.append(_session_deg_slope(vals[a:b]))
    return pd.Series(
        out_vals, index=pd.MultiIndex.from_tuples(out_index, names=keys)
    )


import functools


@functools.lru_cache(maxsize=512)
def _short_name(event: str) -> str:
    """'Bahrain Grand Prix' -> 'Bahrain' (match against config.CIRCUITS)."""
    low = event.lower()
    for name in cfg.TRACK_TYPES:
        if name.lower() in low:
            return name
    return event
