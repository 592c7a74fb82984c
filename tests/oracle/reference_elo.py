"""Sequential dict-based oracle of the reference Elo semantics
(/root/reference/src/elo.py, behavior documented in SURVEY.md §2 row 5).
Independent reimplementation used as ground truth for the scan version."""

from __future__ import annotations

import numpy as np


class OracleElo:
    def __init__(self, k: float = 32.0, initial: float = 1500.0):
        self.base_k = k
        self.k = k
        self.initial = initial
        self.ratings: dict[str, dict[str, float]] = {}

    def set_recency_weight(self, years_ago, race_index=0, total_races=24):
        if years_ago <= 0:
            self.k = self.base_k * (0.75 + 0.75 * race_index / max(1, total_races - 1))
        elif years_ago <= 1:
            self.k = self.base_k
        elif years_ago <= 2:
            self.k = self.base_k * 0.7
        else:
            self.k = self.base_k * 0.5

    def _expected(self, ra, rb):
        return 1.0 / (1.0 + 10.0 ** max(-10.0, min(10.0, (rb - ra) / 400.0)))

    def _update(self, results, kind):
        n = len(results)
        if n < 2:
            return
        for d, _ in results:
            self.ratings.setdefault(d, {"quali": self.initial, "race": self.initial})
        deltas = {}
        for i, (da, va) in enumerate(results):
            ra = self.ratings[da][kind]
            delta = 0.0
            for j, (db, vb) in enumerate(results):
                if i == j:
                    continue
                e = self._expected(ra, self.ratings[db][kind])
                a = 1.0 if va < vb else (0.0 if va > vb else 0.5)
                delta += self.k * (a - e) / (n - 1)
            deltas[da] = delta
        for d, delta in deltas.items():
            self.ratings[d][kind] += delta

    def update_quali(self, results):
        self._update(results, "quali")

    def update_race(self, results):
        self._update(results, "race")

    def predict_quali_probs(self, drivers):
        r = np.array(
            [self.ratings.get(d, {}).get("quali", self.initial) for d in drivers]
        )
        s = r / 100.0
        e = np.exp(s - s.max())
        return dict(zip(drivers, e / e.sum()))
