"""utils/outage.py — the shared TPU-outage classifier and probe.

Three consumers (serving cooldown, bench orchestrator, perf gates) import
these; a drifting signature here would silently stop classifying outages
everywhere, so the contract is locked once, centrally.
"""

import subprocess
import sys

from monte_carlo_gp_tpu.utils.outage import (
    OUTAGE_MARKERS,
    is_backend_outage,
    probe_backend_once,
)


class _FakeXlaRuntimeError(RuntimeError):
    pass


class _XlaRuntimeError(Exception):
    """Name-matched (some jaxlib versions don't subclass RuntimeError)."""


_XlaRuntimeError.__name__ = "XlaRuntimeError"


def test_classifier_matches_observed_signatures():
    assert is_backend_outage(
        _FakeXlaRuntimeError("ABORTED: TPU backend error (Aborted)")
    )
    assert is_backend_outage(
        _FakeXlaRuntimeError("UNAVAILABLE: failed to connect")
    )
    assert is_backend_outage(_XlaRuntimeError("ABORTED: something"))
    # RuntimeError with the marker counts (jaxlib subclasses RuntimeError).
    assert is_backend_outage(RuntimeError("TPU backend error"))


def test_classifier_rejects_non_outages():
    assert not is_backend_outage(ValueError("ABORTED"))  # wrong type
    assert not is_backend_outage(RuntimeError("shape mismatch"))
    assert not is_backend_outage(KeyError("ABORTED"))
    for marker in OUTAGE_MARKERS:
        assert not is_backend_outage(Exception(marker))  # not RuntimeError


def test_probe_success_on_cpu():
    ok, dt, detail = probe_backend_once(platform="cpu", timeout_s=120)
    assert ok, detail
    assert detail.startswith("cpu")
    assert dt > 0


def test_probe_timeout_returns_false(monkeypatch):
    import monte_carlo_gp_tpu.utils.outage as outage

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k["timeout"])

    monkeypatch.setattr(outage.subprocess, "run", fake_run)
    ok, dt, detail = probe_backend_once(timeout_s=1)
    assert not ok and detail == "timeout"


def test_probe_child_failure_returns_last_stderr(monkeypatch):
    import monte_carlo_gp_tpu.utils.outage as outage

    def fake_run(*a, **k):
        return subprocess.CompletedProcess(
            a[0], 1, stdout="", stderr="trace\nABORTED: TPU backend error\n"
        )

    monkeypatch.setattr(outage.subprocess, "run", fake_run)
    ok, dt, detail = probe_backend_once(timeout_s=1)
    assert not ok and "ABORTED" in detail
