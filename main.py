"""Run F1 race predictions (CLI-parity with the reference main.py, plus the
offline/cache flags its README promises: --offline, --build-cache).

Examples:
    python main.py --race Bahrain --season 2024
    python main.py --race Monaco --prediction-point fp3 --simulations 100000
    python main.py --race Bahrain --season 2024 --offline
    python main.py --build-cache --seasons 2023 2024
    python main.py --race Bahrain --season 2024 --synthetic   # no-network demo
"""

import argparse
import sys


def build_predictor(args):
    from monte_carlo_gp_tpu.models.predictor import F1Predictor
    from monte_carlo_gp_tpu.utils.jax_setup import (
        enable_persistent_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()

    enable_persistent_compilation_cache(args.cache_dir)
    backend = None
    if args.synthetic:
        from monte_carlo_gp_tpu.data.synthetic import SyntheticBackend

        backend = SyntheticBackend(seed=args.synthetic_seed)
    return F1Predictor(
        cache_dir=args.cache_dir,
        offline=args.offline,
        backend=backend,
        external_elo_cache=args.elo_cache,
        use_elo_cache=args.use_elo_cache or args.offline,
        engine=args.engine,
        rookie_prior=args.rookie_prior,
        quali_model=args.quali_model,
    )


def main():
    parser = argparse.ArgumentParser(description="F1 Race Prediction")
    parser.add_argument("--season", type=int, default=2025, help="Season year")
    parser.add_argument("--race", type=str, help='Race name (e.g., "Abu Dhabi")')
    parser.add_argument(
        "--prediction-point",
        type=str,
        default="fp2",
        choices=["fp1", "fp2", "fp3", "quali", "sprint"],
        help="When to predict from (default: fp2)",
    )
    parser.add_argument(
        "--simulations",
        type=int,
        default=10000,
        help="Number of Monte Carlo simulations (default: 10000)",
    )
    parser.add_argument("--seed", type=int, default=None, help="Simulation seed")
    parser.add_argument(
        "--offline", action="store_true",
        help="Serve everything from the local cache; never touch the network",
    )
    parser.add_argument(
        "--build-cache", action="store_true",
        help="Download and persist session data for --seasons, then exit",
    )
    parser.add_argument(
        "--seasons", type=int, nargs="+", default=None,
        help="Seasons for --build-cache",
    )
    parser.add_argument("--cache-dir", type=str, default="./cache")
    parser.add_argument(
        "--elo-cache", type=str, default=None,
        help="External Elo ratings cache (highest priority)",
    )
    parser.add_argument(
        "--use-elo-cache", action="store_true",
        help="Load/persist Elo ratings from the local cache",
    )
    parser.add_argument(
        "--synthetic", action="store_true",
        help="Use the deterministic synthetic data backend (demo, no network)",
    )
    parser.add_argument("--synthetic-seed", type=int, default=2718)
    parser.add_argument(
        "--engine", choices=["auto", "xla", "pallas"], default="auto",
        help="Simulation backend: fused Pallas kernel (TPU) or XLA lap-scan",
    )
    parser.add_argument(
        "--quali-model", choices=["elo", "bayesian", "gbm"], default="elo",
        help="Qualifying model: the reference's Elo+feature path (default), "
             "the design doc's hierarchical Bayesian model (pure-JAX HMC) "
             "or its gradient-boosting ranker (sklearn HGBR), both fitted "
             "on the Q-lap archive (fall back to elo when it is empty)",
    )
    parser.add_argument(
        "--rookie-prior", action="store_true",
        help="Seed unrated (rookie) drivers from a teammate-average Elo "
             "prior instead of the flat initial rating",
    )
    parser.add_argument(
        "--safe", action="store_true",
        help="Degrade to uniform fallback predictions when the weekend has "
             "no usable data instead of exiting with an error",
    )
    parser.add_argument(
        "--trace", type=str, default=None, metavar="DIR",
        help="Write a TensorBoard profiler trace of the prediction to DIR",
    )
    parser.add_argument(
        "--timings", action="store_true",
        help="Print per-phase wall-clock timings",
    )
    args = parser.parse_args()

    if args.build_cache:
        predictor = build_predictor(args)
        seasons = args.seasons or [args.season - 1, args.season]
        n = predictor.data_loader.build_cache(seasons)
        print(f"Cached {n} session artifacts for seasons {seasons} "
              f"under {args.cache_dir}")
        return

    if not args.race:
        parser.error("--race is required unless --build-cache is given")

    print(f"\n{'='*60}")
    print(f"F1 Race Prediction: {args.season} {args.race}")
    print(f"Prediction point: {args.prediction_point}")
    print(f"{'='*60}\n")

    print("Loading data and running simulations...")
    predictor = build_predictor(args)

    from monte_carlo_gp_tpu.utils.profiling import Phase, phase_report, trace

    timers = Phase()
    try:
        with trace(args.trace):
            with timers("prepare (data + Elo + features)"):
                plan = predictor.prepare_weekend(
                    season=args.season,
                    race=args.race,
                    prediction_point=args.prediction_point,
                )
            with timers("simulate (Monte Carlo)"):
                probs = predictor.simulate_plan(plan, args.simulations, args.seed)
            results = predictor.assemble_result(plan, probs)
    except ValueError as e:
        from monte_carlo_gp_tpu.models.safety import (
            InsufficientDataError,
            generate_fallback_predictions,
        )

        if args.safe and isinstance(e, InsufficientDataError):
            # Same degrade contract as safety.safe_predict (which wraps the
            # one-shot predict_weekend; the CLI uses the split prepare/
            # simulate/assemble path for --timings/--trace, so it mirrors
            # the wrapper here) — including the structured event, so
            # MCGP_LOG_JSON consumers see CLI fallbacks too.
            from monte_carlo_gp_tpu.utils.logging import log_event

            print(f"Warning: {e}, using fallback predictions")
            log_event(
                "prediction_fallback",
                season=args.season, race=args.race, reason=str(e),
            )
            results = generate_fallback_predictions(
                args.season, args.race, args.prediction_point
            )
        else:
            # Reference-style message on stdout, but a NONZERO exit so
            # scripts ('main.py ... && deploy') see the failure.
            print(f"Error: {e}")
            sys.exit(1)
    if args.timings:
        print()
        print(phase_report(timers))
        sim_t = timers.totals.get("simulate (Monte Carlo)", 0.0)
        if sim_t > 0.0:  # absent when --safe degraded before simulating
            sims_per_s = args.simulations / sim_t
            print(f"  {sims_per_s:,.0f} sims/sec (includes any compile)")

    print(f"\nWeather: {'Wet' if results['weather'].get('rainfall') else 'Dry'}")
    print(f"Track temp: {results['weather'].get('track_temp', 'N/A')}C")
    print(f"Confidence: {results['confidence']}\n")

    for title, key in (
        ("POLE POSITION PROBABILITIES", "pole_probabilities"),
        ("RACE WINNER PROBABILITIES", "win_probabilities"),
        ("PODIUM PROBABILITIES", "podium_probabilities"),
    ):
        print(title)
        print("-" * 40)
        ranked = sorted(results[key].items(), key=lambda kv: kv[1], reverse=True)
        for i, (driver, prob) in enumerate(ranked[:10], 1):
            bar = "#" * int(prob * 30)
            print(f"{i:2}. {driver:4} {prob:6.1%} {bar}")
        print()

    print(f"{'='*60}")
    print("Prediction complete!")


if __name__ == "__main__":
    main()
