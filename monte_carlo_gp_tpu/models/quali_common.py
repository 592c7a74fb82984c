"""Shared data-prep and ranking helpers for the two alternative quali
models (`models/bayesian.py` — design-doc "Approach B", plan.md:1111-1175 —
and `models/ml.py` — "Approach C", plan.md:1176-1213).

Both models filter the same archive the same way and convert simulated
gap draws into grid-position distributions with the same Monte-Carlo
ranking fold; they are explicitly documented as comparable on the same
scale, so the semantics live in ONE place instead of two hand-synced
copies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_REQUIRED = {"LapTime", "Driver", "Team", "circuit"}


def needs_refit(cached, frame_token, cached_token) -> bool:
    """Shared walk-forward fit-cache gate for BOTH alt quali models
    (leakage safety — change it HERE, never fork a copy; CLAUDE.md):
    refit when nothing is cached, the frame carries no loader token
    (directly-assigned archives are unverifiable), or the token IDENTITY
    changed (the loader rebuilt the archive — e.g. the walk-forward clock
    advanced — so the cached fit may have seen different data)."""
    return cached is None or frame_token is None or frame_token is not cached_token


def valid_q_rows(
    laps: pd.DataFrame, session_type: str | None = "Q"
) -> pd.DataFrame:
    """The archive-filter preamble shared by both quali models.

    Keeps rows with a positive LapTime and non-null Driver/Team/circuit.
    When `session_type` is requested and the archive carries the column,
    the filter is STRICT: an archive with zero matching rows raises instead
    of silently training a qualifying model on race laps (fuel-heavy
    stints, in/out laps) — the predictor's alt-quali wrapper catches the
    ValueError, logs it, and falls back to the Elo path. Archives without
    a session_type column train on the whole frame, matching the
    reference sketch (it trains on whatever frame it is handed,
    plan.md:1118-1125). Pass session_type=None to skip the session filter.
    """
    if laps.empty or not _REQUIRED.issubset(laps.columns):
        raise ValueError("No valid lap times to build model")
    rows = laps
    if session_type is not None and "session_type" in rows.columns:
        rows = rows[rows["session_type"] == session_type]
        if rows.empty:
            raise ValueError(
                f"no {session_type!r} session laps in the archive to fit "
                "the qualifying model"
            )
    rows = rows.dropna(subset=["LapTime", "Driver", "Team", "circuit"])
    rows = rows[rows["LapTime"] > 0]
    if rows.empty:
        raise ValueError("No valid lap times to build model")
    return rows


def rank_draws_to_probs(
    draws: np.ndarray, drivers: list[str]
) -> dict[str, list[float]]:
    """Monte-Carlo ranking → position distributions.

    `draws` is (S, n) simulated gap values (lower is better). Each draw is
    ranked with a STABLE argsort (deterministic tie-break by driver index,
    matching both models' documented draw semantics); averaging the one-hot
    grids over draws gives each driver's position distribution — the same
    dict[str, list[float]] contract as predictor._predict_quali.
    """
    n = len(drivers)
    s = draws.shape[0]
    order = np.argsort(draws, axis=1, kind="stable")  # (S, n) driver per rank
    counts = np.zeros((n, n), np.float64)  # (driver, position)
    for p in range(n):
        np.add.at(counts[:, p], order[:, p], 1.0)
    probs = counts / s
    return {d: probs[j].tolist() for j, d in enumerate(drivers)}
