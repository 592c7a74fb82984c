"""Subprocess runner for the genuine reference race engine.

The reference's two-compound-rule fallback picks the replacement compound
with `set.pop()` (/root/reference/src/simulation.py:482-488), whose result
depends on CPython's per-process string-hash randomization — the reference
Monte Carlo is NOT cross-process reproducible at a fixed RNG seed whenever
that branch fires. Our engines fix the choice (HARD for the MEDIUM->MEDIUM
/ remaining>20 case, MEDIUM for the SOFT->SOFT / remaining<=15 case), which
is one valid refinement. A/B comparisons therefore run the reference in a
subprocess whose PYTHONHASHSEED is probed by the parent to reproduce that
refinement (tests/test_reference_ab.py).

Usage: python ref_engine_runner.py <in.npz> <out.npy>
"""

import json
import sys
import types

import numpy as np

sys.modules.setdefault("fastf1", types.ModuleType("fastf1"))
sys.path.insert(0, "/root/reference")


def main(in_path: str, out_path: str) -> None:
    from src.simulation import RaceConfig, RaceSimulator

    data = np.load(in_path, allow_pickle=False)
    meta = json.loads(str(data["meta_json"]))
    d = int(meta["d"])
    names = [f"D{i:02d}" for i in range(d)]
    teams = {n: f"T{i // 2}" for i, n in enumerate(names)}
    config = RaceConfig(
        total_laps=int(meta["laps"]),
        pit_loss=meta["pit_loss"],
        overtake_delta=meta["overtake_delta"],
        sc_probability=meta["sc_p"],
        vsc_probability=meta["vsc_p"],
        red_flag_probability=meta["red_p"],
        dnf_rates={t: 0.002 for t in teams.values()},
        drs_zones=2,
        drs_delta=0.3,
        tire_compounds=meta["tire_compounds"],
        driver_teams=teams,
    )
    grid = data["grid_probs"]
    result = RaceSimulator(config).run_monte_carlo(
        int(meta["n_sims"]),
        grid_probs={n: grid[i].tolist() for i, n in enumerate(names)},
        base_pace={n: float(data["base_pace"][i]) for i, n in enumerate(names)},
        tire_deg={n: float(data["tire_deg"][i]) for i, n in enumerate(names)},
        driver_variance={n: float(data["variance"][i]) for i, n in enumerate(names)},
        driver_dnf_rates={n: float(data["dnf_rate"][i]) for i, n in enumerate(names)},
        seed=int(meta["seed"]),
        track_condition=meta["track_condition"],
    )
    probs = np.zeros((d, d))
    for i, n in enumerate(names):
        for pos, p in result.get(n, {}).items():
            probs[i, pos - 1] = p
    np.save(out_path, probs)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
