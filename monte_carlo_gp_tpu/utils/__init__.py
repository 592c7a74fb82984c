"""Utilities: structured logging, profiling counters, numeric guards."""

from monte_carlo_gp_tpu.utils.profiling import Phase, phase_report  # noqa: F401
