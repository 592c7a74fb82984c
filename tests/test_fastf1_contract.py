"""Contract tests for the FastF1 network backend with a stubbed `fastf1`.

fastf1 is not installed in CI, so `FastF1Backend`
(monte_carlo_gp_tpu/data/loader.py) — the production data path mapping the
reference's `F1DataLoader` (reference data_loader.py:15-33, 132-156) — never
executes in any other test. These tests stub the `fastf1` module with fake
sessions returning Timedelta-typed frames (the real library's dtypes) and
assert the backend emits the normalized schema exactly:

  * LapTime / Sector{1,2,3}Time: Timedelta -> float seconds;
  * PitInTime / PitOutTime: notna -> 1.0, NaT -> NaN (downstream code only
    ever tests isna(), reference data_loader.py:97 / predictor.py:560);
  * missing columns -> NaN-filled, full _LAP_COLUMNS schema always present;
  * weather: NaN-safe column means with defaults, rainfall = any();
  * schedule: EventName/Location/EventFormat/EventDate/RoundNumber;
  * session-load failure -> None (graceful degradation,
    reference data_loader.py:31-33);
  * offline mode never touches the network backend.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pandas as pd
import pytest

from monte_carlo_gp_tpu.data.loader import _LAP_COLUMNS, F1DataLoader


class FakeSession:
    def __init__(self, laps=None, results=None, weather=None, fail=False):
        self._laps = laps
        self._results = results
        self._weather = weather
        self._fail = fail
        self.load_calls = []

    def load(self, **kwargs):
        self.load_calls.append(kwargs)
        if self._fail:
            raise RuntimeError("simulated fastf1 network failure")

    @property
    def laps(self):
        return self._laps

    @property
    def results(self):
        return self._results

    @property
    def weather_data(self):
        return self._weather


def make_fake_fastf1(sessions: dict, schedule: pd.DataFrame | None = None):
    """A stub module shaped like fastf1: Cache.enable_cache, get_session,
    get_event_schedule."""
    fake = types.ModuleType("fastf1")
    fake.cache_dirs = []

    class _Cache:
        @staticmethod
        def enable_cache(path):
            fake.cache_dirs.append(path)

    fake.Cache = _Cache
    fake.session_requests = []

    def get_session(season, event, session):
        fake.session_requests.append((season, event, session))
        try:
            return sessions[(season, event, session)]
        except KeyError:
            raise ValueError(f"no such session {(season, event, session)}")

    fake.get_session = get_session
    fake.get_event_schedule = lambda season: schedule
    return fake


def td(seconds):
    return pd.Timedelta(seconds=seconds)


@pytest.fixture()
def backend_for(monkeypatch, tmp_path):
    """Factory: install a fastf1 stub and construct a FastF1Backend on it."""

    def build(sessions, schedule=None):
        fake = make_fake_fastf1(sessions, schedule)
        monkeypatch.setitem(sys.modules, "fastf1", fake)
        from monte_carlo_gp_tpu.data.loader import FastF1Backend

        backend = FastF1Backend(str(tmp_path / "ff1"))
        assert fake.cache_dirs == [str(tmp_path / "ff1")]
        return backend, fake

    return build


# -- laps ---------------------------------------------------------------------


def laps_frame():
    """A realistic fastf1 .laps frame: Timedelta time columns, NaT pit
    columns except in/out laps, one missing column (Position)."""
    return pd.DataFrame(
        {
            "Driver": ["VER", "VER", "HAM"],
            "Team": ["Red Bull Racing", "Red Bull Racing", "Mercedes"],
            "LapTime": [td(92.357), td(91.001), pd.NaT],
            "LapNumber": [1.0, 2.0, 1.0],
            "Sector1Time": [td(28.5), td(28.1), td(29.0)],
            "Sector2Time": [td(35.0), td(34.7), pd.NaT],
            "Sector3Time": [td(28.857), td(28.201), td(29.5)],
            "Compound": ["SOFT", "SOFT", "MEDIUM"],
            "IsAccurate": [True, True, False],
            "PitInTime": [pd.NaT, td(5400.2), pd.NaT],
            "PitOutTime": [td(100.0), pd.NaT, pd.NaT],
            "Deleted": [False, False, True],
            "TrackTemp": [41.2, 41.5, 40.9],
            "Rainfall": [False, False, False],
        }
    )


def test_load_laps_normalizes_schema(backend_for):
    backend, fake = backend_for({(2024, "Bahrain", "FP2"): FakeSession(laps=laps_frame())})
    out = backend.load_laps(2024, "Bahrain", "FP2")

    assert list(out.columns) == _LAP_COLUMNS
    # Timedelta -> float seconds, NaT -> NaN.
    assert out["LapTime"].tolist()[:2] == [92.357, 91.001]
    assert np.isnan(out["LapTime"].iloc[2])
    assert out["Sector1Time"].dtype == np.float64 or np.issubdtype(
        out["Sector1Time"].dtype, np.floating
    )
    assert out["Sector3Time"].iloc[1] == 28.201
    assert np.isnan(out["Sector2Time"].iloc[2])
    # Pit columns: presence flag 1.0 / NaN — the isna() contract downstream.
    assert np.isnan(out["PitInTime"].iloc[0]) and out["PitInTime"].iloc[1] == 1.0
    assert out["PitOutTime"].iloc[0] == 1.0 and np.isnan(out["PitOutTime"].iloc[1])
    # A column fastf1 didn't provide is NaN-filled, not absent.
    assert out["Position"].isna().all()
    # Non-time columns ride through unchanged.
    assert out["Driver"].tolist() == ["VER", "VER", "HAM"]
    assert out["Compound"].tolist() == ["SOFT", "SOFT", "MEDIUM"]
    assert out["IsAccurate"].tolist() == [True, True, False]
    assert out["Deleted"].tolist() == [False, False, True]
    assert out["TrackTemp"].tolist() == [41.2, 41.5, 40.9]


def test_load_laps_feeds_quali_extraction(backend_for):
    """End-to-end: the normalized frame drives extract_quali_results the
    same way the reference's _extract_quali_results consumes raw fastf1
    laps (reference data_loader.py:86-114)."""
    from monte_carlo_gp_tpu.data.loader import extract_quali_results

    backend, _ = backend_for({(2024, "Bahrain", "Q"): FakeSession(laps=laps_frame())})
    out = backend.load_laps(2024, "Bahrain", "Q")
    res = extract_quali_results(out)
    # HAM's only lap is NaT/inaccurate; VER's best accurate lap is 91.001.
    assert res == [("VER", 91.001)]


def test_load_laps_failure_returns_none(backend_for, capsys):
    backend, _ = backend_for(
        {(2024, "Bahrain", "FP1"): FakeSession(laps=laps_frame(), fail=True)}
    )
    assert backend.load_laps(2024, "Bahrain", "FP1") is None
    assert "could not load" in capsys.readouterr().out
    # Unknown session (get_session itself raises) degrades the same way.
    assert backend.load_laps(2024, "Nowhere", "FP1") is None


def test_load_laps_empty_returns_none(backend_for):
    backend, _ = backend_for(
        {(2024, "Bahrain", "FP3"): FakeSession(laps=pd.DataFrame())}
    )
    assert backend.load_laps(2024, "Bahrain", "FP3") is None


# -- results ------------------------------------------------------------------


def test_load_results_selects_reference_columns(backend_for):
    res = pd.DataFrame(
        {
            "Abbreviation": ["VER", "HAM", "SAI"],
            "GridPosition": [1.0, 3.0, 2.0],
            "Position": [1.0, 2.0, np.nan],
            "Status": ["Finished", "Finished", "Engine"],
            "Points": [25.0, 18.0, 0.0],  # extra fastf1 column, dropped
        }
    )
    backend, _ = backend_for({(2024, "Bahrain", "R"): FakeSession(results=res)})
    out = backend.load_results(2024, "Bahrain", "R")
    assert list(out.columns) == ["Abbreviation", "GridPosition", "Position", "Status"]
    assert out["Abbreviation"].tolist() == ["VER", "HAM", "SAI"]
    assert out["Status"].tolist() == ["Finished", "Finished", "Engine"]
    assert np.isnan(out["Position"].iloc[2])


def test_load_results_failure_and_empty(backend_for):
    backend, _ = backend_for(
        {
            (2024, "A", "R"): FakeSession(results=pd.DataFrame(), fail=False),
            (2024, "B", "R"): FakeSession(results=None, fail=True),
        }
    )
    assert backend.load_results(2024, "A", "R") is None
    assert backend.load_results(2024, "B", "R") is None


# -- weather ------------------------------------------------------------------


def test_load_weather_aggregates_with_nan_defaults(backend_for):
    w = pd.DataFrame(
        {
            "AirTemp": [24.0, 26.0, np.nan],
            "TrackTemp": [np.nan, np.nan, np.nan],  # all-NaN -> default 35
            "Humidity": [40.0, 44.0, 48.0],
            "Rainfall": [False, True, False],
            # WindSpeed column absent entirely -> default 5
        }
    )
    backend, fake = backend_for({(2024, "Bahrain", "R"): FakeSession(weather=w)})
    out = backend.load_weather(2024, "Bahrain", "R")
    assert out == {
        "air_temp": 25.0,
        "track_temp": 35,  # NaN-safe default (reference data_loader.py:141-145)
        "humidity": 44.0,
        "rainfall": True,  # any() — one wet reading flags the session
        "wind_speed": 5,
    }
    # Weather loads request only weather data (no laps/telemetry download).
    sess = fake.get_session(2024, "Bahrain", "R")
    assert sess.load_calls[0] == {
        "weather": True, "laps": False, "telemetry": False, "messages": False
    }


def test_load_weather_no_rainfall_column(backend_for):
    w = pd.DataFrame({"AirTemp": [20.0]})
    backend, _ = backend_for({(2024, "X", "Q"): FakeSession(weather=w)})
    out = backend.load_weather(2024, "X", "Q")
    assert out["rainfall"] is False
    assert out["air_temp"] == 20.0


def test_load_weather_failure_and_empty(backend_for):
    backend, _ = backend_for(
        {
            (2024, "A", "R"): FakeSession(weather=pd.DataFrame()),
            (2024, "B", "R"): FakeSession(weather=None, fail=True),
        }
    )
    assert backend.load_weather(2024, "A", "R") is None
    assert backend.load_weather(2024, "B", "R") is None


# -- schedule -----------------------------------------------------------------


def test_get_schedule_normalizes_events(backend_for):
    schedule = pd.DataFrame(
        {
            "EventName": ["Bahrain Grand Prix", "Chinese Grand Prix"],
            "Location": ["Sakhir", "Shanghai"],
            "EventFormat": ["conventional", "sprint_qualifying"],
            "EventDate": [pd.Timestamp("2024-03-02"), pd.Timestamp("2024-04-21")],
            "RoundNumber": [1, 2],
        }
    )
    backend, _ = backend_for({}, schedule=schedule)
    events = backend.get_schedule(2024)
    assert [e["EventName"] for e in events] == [
        "Bahrain Grand Prix", "Chinese Grand Prix"
    ]
    assert events[0]["Location"] == "Sakhir"
    assert events[1]["EventFormat"] == "sprint_qualifying"
    assert events[0]["EventDate"] == pd.Timestamp("2024-03-02")
    assert [e["RoundNumber"] for e in events] == [1, 2]


# -- loader integration: caching + offline ------------------------------------


def test_loader_caches_backend_loads_to_disk(backend_for, tmp_path):
    """First load goes through the stubbed network backend and is persisted;
    a second loader (offline, no backend) serves it from the parquet cache
    byte-identically."""
    backend, fake = backend_for(
        {(2024, "Bahrain Grand Prix", "FP2"): FakeSession(laps=laps_frame())},
        schedule=pd.DataFrame(
            {
                "EventName": ["Bahrain Grand Prix"],
                "Location": ["Sakhir"],
                "EventFormat": ["conventional"],
                "EventDate": [pd.Timestamp("2024-03-02")],
                "RoundNumber": [1],
            }
        ),
    )
    cache_dir = tmp_path / "cache"
    loader = F1DataLoader(cache_dir=cache_dir, backend=backend)
    # 'Bahrain' resolves to the schedule's 'Bahrain Grand Prix'.
    first = loader.load_session(2024, "Bahrain", "FP2")
    assert not first.empty
    n_network = len(fake.session_requests)

    offline = F1DataLoader(cache_dir=cache_dir, offline=True)
    assert offline.backend is None
    cached = offline.load_session(2024, "Bahrain", "FP2")
    pd.testing.assert_frame_equal(first.reset_index(drop=True), cached)
    assert len(fake.session_requests) == n_network  # no new network traffic


def test_offline_loader_never_touches_backend(backend_for, tmp_path):
    """offline=True with an injected backend must not call it — the cache
    alone answers (the reference README's promised-but-unimplemented
    --offline semantics, SURVEY.md preamble)."""
    backend, fake = backend_for(
        {(2024, "Bahrain", "FP2"): FakeSession(laps=laps_frame())}
    )
    loader = F1DataLoader(cache_dir=tmp_path / "empty", offline=True, backend=backend)
    out = loader.load_session(2024, "Bahrain", "FP2")
    assert out.empty
    assert loader.get_schedule(2024) == []
    assert loader.get_weather(2024, "Bahrain", "R")["track_temp"] == 35
    assert fake.session_requests == []
