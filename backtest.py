"""Backtest the F1 prediction model against historical results
(CLI-parity with the reference backtest.py, plus --offline/--synthetic/
--simulations/--checkpoint)."""

import argparse


def interpret_brier(score: float) -> str:
    if score < 0.1:
        return "Excellent"
    if score < 0.15:
        return "Good"
    if score < 0.2:
        return "Fair"
    if score < 0.25:
        return "Poor"
    return "Bad"


def main():
    parser = argparse.ArgumentParser(description="Backtest F1 Predictions")
    parser.add_argument(
        "--seasons", type=int, nargs="+", default=[2024],
        help="Seasons to backtest (e.g., --seasons 2023 2024)",
    )
    parser.add_argument(
        "--seed", type=int, default=42, help="Random seed for reproducibility"
    )
    parser.add_argument(
        "--simulations", type=int, default=10000,
        help="Monte Carlo simulations per race (default: 10000)",
    )
    parser.add_argument("--offline", action="store_true",
                        help="Serve everything from the local cache")
    parser.add_argument("--cache-dir", type=str, default="./cache")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="JSONL progress file; resumes if it exists")
    parser.add_argument("--synthetic", action="store_true",
                        help="Use the deterministic synthetic data backend")
    parser.add_argument("--synthetic-seed", type=int, default=2718)
    parser.add_argument(
        "--batched", action="store_true",
        help="Simulate every race of a season as one sharded device batch",
    )
    parser.add_argument(
        "--engine", choices=["auto", "xla", "pallas"], default="auto",
        help="Simulation backend: fused Pallas kernel (single TPU) or XLA "
             "lap-scan (CPU / multi-chip)",
    )
    parser.add_argument(
        "--reference-compat-elo-noop", action="store_true",
        help="Reproduce the reference defect where actual-result Elo updates "
             "silently no-op (SURVEY.md §3.2), for A/B comparison",
    )
    parser.add_argument(
        "--rookie-prior", action="store_true",
        help="Seed unrated (rookie) drivers from a teammate-average Elo "
             "prior instead of the flat initial rating (plan.md:2762-2783)",
    )
    parser.add_argument(
        "--quali-model", choices=["elo", "bayesian", "gbm"], default="elo",
        help="Qualifying model (see main.py). NOTE: bayesian/gbm refit per "
             "race under the walk-forward clock (leakage-safe, but each "
             "race pays a model fit)",
    )
    args = parser.parse_args()

    from monte_carlo_gp_tpu.models.predictor import F1Predictor
    from monte_carlo_gp_tpu.utils.jax_setup import (
        enable_persistent_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    from monte_carlo_gp_tpu.validate.backtest import (
        backtest_model,
        backtest_model_batched,
    )

    enable_persistent_compilation_cache(args.cache_dir)

    def predictor_factory():
        backend = None
        if args.synthetic:
            from monte_carlo_gp_tpu.data.synthetic import SyntheticBackend

            backend = SyntheticBackend(seed=args.synthetic_seed)
        return F1Predictor(
            cache_dir=args.cache_dir, offline=args.offline, backend=backend,
            engine=args.engine, rookie_prior=args.rookie_prior,
            quali_model=args.quali_model,
        )

    print(f"\n{'='*60}")
    print("Backtesting F1 Prediction Model")
    print(f"Seasons: {args.seasons}")
    print(f"{'='*60}\n")

    print("Running backtest (this may take several minutes)...")
    print("Loading historical data and simulating predictions...\n")

    if args.batched and args.checkpoint:
        parser.error(
            "--checkpoint is not supported with --batched (the single-"
            "launch season path has no per-race progress to record); "
            "drop --batched to get resumable checkpoints"
        )
    if args.batched:
        from monte_carlo_gp_tpu.models.predictor import resolve_engine

        batched_engine = resolve_engine(args.engine)
        results = backtest_model_batched(
            predictor_factory,
            args.seasons,
            seed=args.seed,
            n_simulations=args.simulations,
            reference_compat_elo_noop=args.reference_compat_elo_noop,
            engine=batched_engine,
        )
    else:
        results = backtest_model(
            predictor_factory,
            args.seasons,
            seed=args.seed,
            n_simulations=args.simulations,
            checkpoint_path=args.checkpoint,
            reference_compat_elo_noop=args.reference_compat_elo_noop,
        )

    print(f"{'='*60}")
    print("BACKTEST RESULTS")
    print(f"{'='*60}\n")
    print(f"Races analyzed: {results['n_races']}")
    print()

    print("BRIER SCORES (lower = better, 0 = perfect)")
    print("-" * 40)
    pole_brier = results["pole_brier"]
    win_brier = results["win_brier"]
    print(f"  Pole position: {pole_brier:.4f} ({interpret_brier(pole_brier)})")
    print(f"  Race winner:   {win_brier:.4f} ({interpret_brier(win_brier)})")
    print()

    from monte_carlo_gp_tpu.validate.metrics import RANDOM_BRIER_BASELINE

    random_brier = RANDOM_BRIER_BASELINE
    print(f"  (Random baseline: {random_brier:.4f})")
    print(f"  Pole improvement vs random: "
          f"{(random_brier - pole_brier) / random_brier * 100:.1f}%")
    print(f"  Win improvement vs random:  "
          f"{(random_brier - win_brier) / random_brier * 100:.1f}%")
    print()

    print("PODIUM ACCURACY")
    print("-" * 40)
    print(f"  Correct podium picks: {results['podium_accuracy']:.1%}")
    print("  (Random baseline: ~15%)")
    print()

    calibration = results["calibration_curve"]
    if calibration["prob_true"] and calibration["prob_pred"]:
        print("CALIBRATION (predicted vs actual probability)")
        print("-" * 40)
        for pred, actual in zip(calibration["prob_pred"], calibration["prob_true"]):
            print(f"  Pred {pred:.0%}: {'#' * int(pred * 50)}")
            print(f"  True {actual:.0%}: {'*' * int(actual * 50)}")
            print()
    else:
        print("(Not enough data for calibration analysis)")

    print(f"{'='*60}")
    print("Backtest complete!")
    print()
    print("Interpretation:")
    print("- Brier < 0.15: Model adds value over random guessing")
    print("- Podium > 33%: Model predicts podium better than chance")
    print("- Good calibration: Predicted % matches actual win rate")


if __name__ == "__main__":
    main()
