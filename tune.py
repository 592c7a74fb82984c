"""Tune event-model parameters against historical results: sweep simulation
scalars (safety-car rate, DRS delta, variance scale, ...) over a grid and
rank configurations by backtest metric.

No reference analogue — the reference hardcodes these scalars
(/root/reference/src/predictor.py:59-64) and re-running its minutes-long
backtest per candidate is the only way to compare them. Here the host
preparation runs once and every configuration reuses one compiled device
program under common random numbers (see monte_carlo_gp_tpu/validate/tune.py).

    python tune.py --seasons 2024 --synthetic \
        --grid sc_prob=0.005,0.01,0.02 --grid variance_scale=0.8,1.0,1.25
"""

import argparse


def parse_grid(specs: list[str]) -> dict[str, list[float]]:
    grid: dict[str, list[float]] = {}
    for spec in specs:
        key, _, values = spec.partition("=")
        if not values:
            raise SystemExit(
                f"--grid expects KEY=V1,V2,... (got {spec!r})"
            )
        key = key.strip()
        try:
            parsed = [float(v) for v in values.split(",") if v.strip()]
        except ValueError:
            raise SystemExit(f"--grid {spec!r}: values must be numbers")
        if not parsed:
            raise SystemExit(f"--grid {spec!r}: no values")
        # A repeated axis extends it (dedup, order-preserving) rather than
        # silently replacing the earlier values.
        merged = list(dict.fromkeys(grid.get(key, []) + parsed))
        grid[key] = merged
    return grid


def main():
    parser = argparse.ArgumentParser(
        description="Sweep simulation parameters against backtest metrics"
    )
    parser.add_argument("--seasons", type=int, nargs="+", default=[2024])
    parser.add_argument(
        "--grid", action="append", default=[], metavar="KEY=V1,V2,...",
        help="Sweep axis (repeatable; configs are the Cartesian product). "
             "Keys: SimParams scalars (sc_prob, vsc_prob, red_flag_prob, "
             "drs_delta, overtake_delta, pit_loss, dirty_air_threshold, "
             "dirty_air_penalty) or *_scale multipliers (variance_scale, "
             "tire_deg_scale, dnf_scale, team_dnf_scale)",
    )
    parser.add_argument(
        # pole_brier is not offered: race-sim scalars cannot affect quali
        # probabilities, so it is identical across configs (sweep_backtest
        # rejects it; it is still reported on every record).
        "--metric", choices=["win_brier", "podium_accuracy"],
        default="win_brier",
    )
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--simulations", type=int, default=10000)
    parser.add_argument("--offline", action="store_true",
                        help="Serve everything from the local cache")
    parser.add_argument("--cache-dir", type=str, default="./cache")
    parser.add_argument("--synthetic", action="store_true",
                        help="Use the deterministic synthetic data backend")
    parser.add_argument("--synthetic-seed", type=int, default=2718)
    parser.add_argument(
        "--engine", choices=["auto", "xla", "pallas"], default="auto",
    )
    args = parser.parse_args()
    if not args.grid:
        raise SystemExit("at least one --grid KEY=V1,V2,... is required")
    grid = parse_grid(args.grid)

    from monte_carlo_gp_tpu.models.predictor import F1Predictor, resolve_engine
    from monte_carlo_gp_tpu.utils.jax_setup import (
        enable_persistent_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    from monte_carlo_gp_tpu.validate.tune import sweep_backtest

    enable_persistent_compilation_cache(args.cache_dir)

    def predictor_factory():
        backend = None
        if args.synthetic:
            from monte_carlo_gp_tpu.data.synthetic import SyntheticBackend

            backend = SyntheticBackend(seed=args.synthetic_seed)
        return F1Predictor(
            cache_dir=args.cache_dir, offline=args.offline, backend=backend,
            engine=args.engine,
        )

    n_configs = 1
    for vals in grid.values():
        n_configs *= len(vals)
    print(f"\n{'='*60}")
    print("Parameter sweep")
    print(f"Seasons: {args.seasons} | configs: {n_configs} | "
          f"metric: {args.metric}")
    print(f"{'='*60}\n")

    out = sweep_backtest(
        predictor_factory,
        args.seasons,
        grid,
        seed=args.seed,
        n_simulations=args.simulations,
        engine=resolve_engine(args.engine),
        metric=args.metric,
    )

    keys = list(grid)
    header = " | ".join(f"{k:>18}" for k in keys)
    print(f"{header} | {'win_brier':>9} | {'pole_brier':>10} | {'podium':>6}")
    print("-" * (21 * len(keys) + 32))
    for rec in out["results"]:
        cells = " | ".join(f"{rec['overrides'][k]:>18g}" for k in keys)
        print(f"{cells} | {rec['win_brier']:>9.4f} | "
              f"{rec['pole_brier']:>10.4f} | {rec['podium_accuracy']:>6.1%}")

    best = out["best"]
    print(f"\nBest by {args.metric}: {best['overrides']} "
          f"-> {best[args.metric]:.4f}")
    if out["default"] is not None:
        d = out["default"]
        print(f"Default (no overrides):{'':<15} -> {d[args.metric]:.4f}")
        delta = best[args.metric] - d[args.metric]
        sign = "improves" if (
            delta < 0 if args.metric != "podium_accuracy" else delta > 0
        ) else "does not improve"
        print(f"Best config {sign} on the default by {abs(delta):.4f}")
    print(f"\n{'='*60}")
    print("Sweep complete!")


if __name__ == "__main__":
    main()
