"""Validation: Brier/podium/calibration metrics and the season backtest."""

from monte_carlo_gp_tpu.validate.backtest import backtest_model, get_actual_results, get_races  # noqa: F401
from monte_carlo_gp_tpu.validate.metrics import (  # noqa: F401
    brier_score,
    calibration_analysis,
    podium_accuracy,
)
