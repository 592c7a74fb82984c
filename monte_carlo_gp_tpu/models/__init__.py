"""Model layer: Elo ratings, feature engineering, and the weekend predictor."""

from monte_carlo_gp_tpu.models.elo import EloParams, F1EloSystem  # noqa: F401
