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
        # ordered (season, name, sessions) list of the events in the current
        # archive, and the per-event aggregate partials memoized across
        # walk-forward rebuilds (see _event_partial)
        self._events: list[tuple] = []
        self._event_parts: dict[tuple, dict] = {}

    # -- loading (reference features.py:16-72) --------------------------------

    def load_historical_data(self, seasons: list[int]) -> None:
        """Combine Q+R laps and race classifications across seasons."""
        all_laps, all_results = [], []
        self._events = []
        for season in seasons:
            for ev in self.loader.past_events(season):
                name = ev["EventName"]
                frames = []
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
                    frames.append(session_type)
                if frames:
                    self._events.append((season, name, tuple(frames)))
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
        # marks the archive as loader-built so _t() may use the memoized
        # per-event partials (a directly-assigned `laps` frame won't match)
        self._laps_id = id(self.laps)
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
            # per-driver numpy bundles for the result-based race features:
            # (grid, finish, is_dnf, season) in archive row order. The seven
            # per-driver feature getters were each slicing/masking a pandas
            # frame per (driver, race) call — ~2-4 ms of frame overhead per
            # call dominated season host prep after the lap tables were
            # memoized. Same values, same order, numpy ops instead.
            rr = self.race_results
            status = rr["status"].astype(str).str.lower()
            is_dnf = ~(
                status.str.contains("finished")
                | status.str.contains(r"\+", regex=True)
            ).to_numpy(bool)
            grid = rr["grid"].to_numpy(float)
            finish = rr["finish"].to_numpy(float)
            seas = (
                rr["season"].to_numpy() if "season" in rr.columns else None
            )
            t["results_np"] = {
                d: (
                    grid[ix],
                    finish[ix],
                    is_dnf[ix],
                    seas[ix] if seas is not None else None,
                )
                for d, ix in rr.groupby("driver", sort=False).indices.items()
            }
        laps = self.laps
        if laps.empty or "Driver" not in laps.columns:
            self._tables = t
            return t
        # Event-level tables (season, circuit), combining Q+R sessions — the
        # reference groups `self.laps` by (season, circuit) for sector
        # strength, wet performance and temp sensitivity (features.py:292,
        # :650, :745), so one entry per EVENT, not per session.
        #
        # ASSEMBLED FROM MEMOIZED PER-EVENT PARTIALS: the walk-forward
        # backtest pins the loader clock and rebuilds the archive once per
        # race, so the archive is APPEND-ONLY — every per-event aggregate
        # for an already-seen event is bit-identical across rebuilds.
        # Whole-archive groupbys (dominated by pyarrow-string `take`) made
        # table rebuilds ~half of season host prep; computing each event's
        # partial once (keyed by (season, name, sessions)) and concatenating
        # makes rebuild k cost O(1 new event). Per-group aggregates
        # (min/median/count/any/first/slopes) are bitwise what the global
        # groupby produced (same rows, same order); only the cross-event
        # accumulations (drv_lap_sum / drv_circuit_sum) change float
        # association — orders of magnitude below the 1e-9 A/B tolerance
        # (tests/test_reference_ab.py) and deterministic (fixed event
        # order). Equality with a from-scratch engine is pinned by
        # tests/test_features.py::test_event_partial_memo_matches_fresh.
        parts = []
        if getattr(self, "_laps_id", None) == id(laps):
            # archive built by load_historical_data: events known, partials
            # memoized across walk-forward rebuilds
            for season, name, sessions in self._events:
                key = (season, name, sessions)
                p = self._event_parts.get(key)
                if p is None:
                    frames = [
                        self._annotated[("laps", season, name, st)]
                        for st in sessions
                    ]
                    ev = (
                        pd.concat(frames, ignore_index=True)
                        if len(frames) > 1
                        else frames[0]
                    )
                    p = _event_partial(ev)
                    self._event_parts[key] = p
                parts.append(((season, name), p))
        else:
            # `laps` assigned directly (tests, A/B harnesses): derive events
            # from the frame in first-appearance order — the same group rows
            # in the same relative order the whole-archive groupbys saw.
            for key, ev in laps.groupby(["season", "circuit"], sort=False):
                parts.append((tuple(key), _event_partial(ev)))

        def series(field, per_driver, dtype=None, name=None):
            """One sorted-MultiIndex Series from the per-event dict pieces,
            with the index level order (and sortedness) of the global
            groupby it replaces: (Driver, season, circuit) for per-driver
            fields, (season, circuit) for per-event scalars."""
            rows = []
            for (season, circuit), p in parts:
                piece = p.get(field)
                if piece is None:
                    continue
                if per_driver:
                    rows.extend(
                        ((drv, season, circuit), v) for drv, v in piece.items()
                    )
                else:
                    rows.append(((season, circuit), piece))
            if not rows:
                return None
            rows.sort(key=lambda r: r[0])
            names = (
                ["Driver", "season", "circuit"]
                if per_driver
                else ["season", "circuit"]
            )
            return pd.Series(
                [v for _, v in rows],
                index=pd.MultiIndex.from_tuples([k for k, _ in rows], names=names),
                dtype=dtype,
                name=name,
            )

        def put(name_, value):
            if value is not None:
                t[name_] = value

        put("event_best", series("best", False, name="LapTime"))
        put("drv_event_best", series("drv_best", True, name="LapTime"))
        for col in ("Sector1Time", "Sector2Time", "Sector3Time"):
            put("event_best_" + col, series("best_" + col, False, name=col))
            put("drv_event_best_" + col, series("drv_best_" + col, True, name=col))
        put("event_temp", series("temp", False, name="TrackTemp"))
        put("session_wet", series("wet", False, dtype=bool, name="Rainfall"))
        # race-session driver medians and lap counts (race pace / deg)
        put("r_median", series("r_median", True, name="LapTime"))
        put("r_nlaps", series("r_nlaps", True, dtype="int64", name="LapTime"))
        # deg rate folded per driver straight from the per-event slopes
        # (events in sorted order — the association the old per-driver
        # pandas slice produced): dropna, keep (0, 0.5), mean clamped
        # [0.01, 0.15], default 0.05 (reference features.py:448-490).
        deg_vals: dict = {}
        for (_, _), p in sorted(parts, key=lambda kp: kp[0]):
            for drv, v in p.get("deg", {}).items():
                if not pd.isna(v) and 0.0 < v < 0.5:
                    deg_vals.setdefault(drv, []).append(v)
        if any("deg" in p for _, p in parts):
            t["deg_rate_all"] = {
                drv: float(np.clip(np.mean(vals), 0.01, 0.15))
                for drv, vals in deg_vals.items()
            }
        # qualifying bests pivoted per event (teammate comparisons) and the
        # driver -> team map: rows = events (sorted), columns = drivers
        # (sorted union), exactly pivot_table(min/first)'s layout; drivers
        # with no non-null value anywhere are dropped like pivot_table's
        # dropna does.
        q_events = [(k, p) for k, p in parts if "q_best" in p]
        if q_events:
            q_events.sort(key=lambda kp: kp[0])
            drivers = sorted(
                {d for _, p in q_events for d in p["q_best"]
                 if not pd.isna(p["q_best"][d])}
            )
            eidx = pd.MultiIndex.from_tuples(
                [k for k, _ in q_events], names=["season", "circuit"]
            )
            cols = pd.Index(drivers, name="Driver")
            vals = np.full((len(q_events), len(drivers)), np.nan)
            pos = {d: j for j, d in enumerate(drivers)}
            for i, (_, p) in enumerate(q_events):
                for d, v in p["q_best"].items():
                    if d in pos:
                        vals[i, pos[d]] = v
            t["q_best_pivot"] = pd.DataFrame(vals, index=eidx, columns=cols)
            if any("q_team" in p for _, p in q_events):
                # Team PER EVENT — drivers change teams between seasons, so
                # teammate comparisons must match rosters event by event
                # (reference features.py:159-181 compares within each
                # session's own team grouping).
                teams = np.full((len(q_events), len(drivers)), np.nan, object)
                for i, (_, p) in enumerate(q_events):
                    for d, v in p.get("q_team", {}).items():
                        if d in pos:
                            teams[i, pos[d]] = v
                t["q_team_pivot"] = pd.DataFrame(
                    teams, index=eidx, columns=cols
                )
        # per-driver lap-time sums/counts overall and per short circuit name
        # (circuit affinity = mean over laps, reference features.py:214-234)
        lap_sum, lap_n = {}, {}
        circ_sum, circ_n = {}, {}
        for (season, name), p in parts:
            short = _short_name(name)
            for drv, v in p["lap_sum"].items():
                lap_sum[drv] = lap_sum.get(drv, 0.0) + v
                circ_sum[(drv, short)] = circ_sum.get((drv, short), 0.0) + v
            for drv, n_ in p["lap_n"].items():
                lap_n[drv] = lap_n.get(drv, 0) + n_
                circ_n[(drv, short)] = circ_n.get((drv, short), 0) + n_
        if lap_sum:
            t["drv_lap_sum"] = pd.Series(lap_sum, name="LapTime").sort_index()
            t["drv_lap_n"] = pd.Series(lap_n, name="LapTime").sort_index()
            cidx = pd.MultiIndex.from_tuples(
                circ_sum.keys(), names=["Driver", "circuit"]
            )
            t["drv_circuit_sum"] = pd.Series(
                list(circ_sum.values()), index=cidx, name="LapTime"
            ).sort_index()
            t["drv_circuit_n"] = pd.Series(
                list(circ_n.values()), index=cidx, name="LapTime"
            ).sort_index()

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
            # per-driver dropna'd gap arrays (event order), extracted once:
            # _gap_to_pole/_form_score were re-slicing the pivot per
            # (driver, race) call
            gv = t["q_gaps_pivot"].to_numpy(float)
            t["q_gaps_np"] = {
                d: gv[~np.isnan(gv[:, j]), j]
                for j, d in enumerate(t["q_gaps_pivot"].columns)
            }
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
        # Q3-rate heuristic: share of Q sessions with >=3 laps per driver —
        # a ratio of counts, accumulated straight from the per-event
        # partials (mean of booleans == hits/total exactly)
        q3_hits: dict = {}
        q3_total: dict = {}
        for _, p in parts:
            for (drv, st), n_ in p["nlaps"].items():
                if st == "Q":
                    q3_total[drv] = q3_total.get(drv, 0) + 1
                    q3_hits[drv] = q3_hits.get(drv, 0) + (1 if n_ >= 3 else 0)
        if q3_total:
            t["q3_rate_all"] = {
                drv: q3_hits[drv] / q3_total[drv] for drv in q3_total
            }
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
        gaps = self._t().get("q_gaps_np", {}).get(driver)
        if gaps is None or not gaps.size:
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
        gaps = self._t().get("q_gaps_np", {}).get(driver)
        if gaps is None or not gaps.size:
            return 0.0
        scores = np.clip(1.0 - gaps, -1.0, 1.0)
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
        (features.py:448-490). Folded per driver once per archive."""
        t = self._t()
        if not t or "deg_rate_all" not in t:
            return 0.05
        return t["deg_rate_all"].get(driver, 0.05)

    _EMPTY_BUNDLE = (np.empty(0), np.empty(0), np.empty(0, bool), None)

    def _result_arrays(self, driver: str):
        """(grid, finish, is_dnf, season) numpy arrays in archive row order
        for the seven result-based features (same rows, same order as the
        reference's per-driver frame rescans, without per-call slicing)."""
        return self._t().get("results_np", {}).get(driver, self._EMPTY_BUNDLE)

    def _overtake_rate(self, driver: str) -> float:
        """Mean grid - finish (features.py:492-514)."""
        grid, finish, _, _ = self._result_arrays(driver)
        m = (grid > 0) & (finish > 0)
        if not m.any():
            return 0.0
        return float((grid[m] - finish[m]).mean())

    def _defense_rate(self, driver: str) -> float:
        """Share of races finishing within one place of grid, clamped
        [0.3, 0.95] (features.py:516-543)."""
        grid, finish, _, _ = self._result_arrays(driver)
        if len(grid) < 3:
            return 0.7
        m = (grid > 0) & (finish > 0)
        if not m.any():
            return 0.7
        held = (finish[m] <= grid[m] + 1).mean()
        return float(np.clip(held, 0.3, 0.95))

    def _dnf_prob(self, driver: str) -> float:
        """Historical per-race DNF rate from status strings, clamped
        [0.01, 0.20] (features.py:545-566)."""
        grid, _, is_dnf, _ = self._result_arrays(driver)
        if len(grid) < 5:
            return 0.05
        return float(np.clip(is_dnf.mean(), 0.01, 0.20))

    def _start_performance(self, driver: str) -> float:
        """40% of grid-to-finish gains in point-scoring races, clamped ±3
        (features.py:568-594)."""
        grid, finish, _, _ = self._result_arrays(driver)
        if len(grid) < 5:
            return 0.0
        m = (grid > 0) & (finish > 0) & (finish <= 15)
        if not m.any():
            return 0.0
        avg = ((grid[m] - finish[m]) * 0.4).mean()
        return float(np.clip(avg, -3.0, 3.0))

    def _clutch_factor(self, driver: str) -> float:
        """Normalized outperformance from contested grid slots (2-10),
        clamped ±0.5 (features.py:596-624)."""
        grid, finish, _, _ = self._result_arrays(driver)
        if len(grid) < 10:
            return 0.0
        m = (grid >= 2) & (grid <= 10) & (finish > 0)
        if not m.any():
            return 0.0
        avg = ((grid[m] - finish[m]) / 5.0).mean()
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
        _, finish, _, seas = self._result_arrays(driver)
        if seas is None or not len(finish):
            return 0.0
        fin = finish[seas == seas.max()]
        if len(fin) < recent_races + 2:
            return 0.0
        recent = fin[-recent_races:]
        recent = recent[~np.isnan(recent)]
        earlier = fin[: len(fin) - recent_races]
        earlier = earlier[~np.isnan(earlier)]
        if not recent.size or not earlier.size:
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


def _event_partial(ev: pd.DataFrame) -> dict:
    """All per-event aggregate pieces of the `_t()` tables for one event's
    combined Q+R laps frame. Computed ONCE per event and memoized across
    walk-forward rebuilds (the archive is append-only under the pinned
    clock, so event data is immutable). Every aggregate here acts on the
    same rows in the same order as the corresponding whole-archive groupby
    group did, so the values are bitwise identical to the pre-memoization
    tables. Stored as plain dicts/scalars: table ASSEMBLY happens once per
    rebuild, and concatenating ~10 pandas Series per table per rebuild was
    itself half the memoized rebuild cost — python lists + one constructor
    call per table are ~50x cheaper."""
    p: dict = {}
    p["nlaps"] = ev.groupby(["Driver", "session_type"]).size().to_dict()
    p["best"] = ev["LapTime"].min()
    p["drv_best"] = ev.groupby("Driver")["LapTime"].min().to_dict()
    for col in ("Sector1Time", "Sector2Time", "Sector3Time"):
        if col in ev.columns:
            p["best_" + col] = ev[col].min()
            p["drv_best_" + col] = ev.groupby("Driver")[col].min().to_dict()
    if "TrackTemp" in ev.columns:
        p["temp"] = ev["TrackTemp"].mean()
    if "Rainfall" in ev.columns:
        p["wet"] = bool(ev["Rainfall"].any())
    r = ev[ev["session_type"] == "R"]
    if not r.empty:
        gr = r.groupby("Driver")["LapTime"]
        p["r_median"] = gr.median().to_dict()
        p["r_nlaps"] = gr.count().to_dict()
        p["deg"] = {k[0]: v for k, v in _deg_slopes_all(r).items()}
    q = ev[ev["session_type"] == "Q"]
    if not q.empty:
        p["q_best"] = q.groupby("Driver")["LapTime"].min().to_dict()
        if "Team" in q.columns:
            # matches pivot_table(aggfunc="first"): first non-null per group
            p["q_team"] = q.groupby("Driver")["Team"].first().to_dict()
    lt = ev.dropna(subset=["LapTime"])
    g = lt.groupby("Driver")["LapTime"]
    p["lap_sum"] = g.sum().to_dict()
    p["lap_n"] = g.count().to_dict()
    return p


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
