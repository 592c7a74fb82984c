"""Utilities: phase timers and structured logging."""

import json
import logging

from monte_carlo_gp_tpu.utils.logging import get_logger, log_event
from monte_carlo_gp_tpu.utils.profiling import Phase, phase_report, sims_per_second


def test_phase_timers_accumulate():
    timers = Phase()
    with timers("a"):
        pass
    with timers("a"):
        pass
    with timers("b"):
        pass
    assert timers.counts == {"a": 2, "b": 1}
    report = phase_report(timers)
    assert "a" in report and "(2x)" in report


def test_sims_per_second():
    assert sims_per_second(1000, 2.0) == 500.0
    assert sims_per_second(1000, 2.0, n_chips=4) == 125.0


def test_log_event_plain_and_json(monkeypatch, caplog):
    get_logger()
    with caplog.at_level(logging.INFO, logger="mcgp"):
        log_event("bench", value=42)
    assert "bench" in caplog.text and "value=42" in caplog.text
    caplog.clear()
    monkeypatch.setenv("MCGP_LOG_JSON", "1")
    with caplog.at_level(logging.INFO, logger="mcgp"):
        log_event("bench", value=42)
    payload = json.loads(caplog.records[-1].message)
    assert payload["event"] == "bench" and payload["value"] == 42
