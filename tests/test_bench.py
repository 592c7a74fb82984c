"""bench.py orchestration tests (no backend touched).

The judged artifact contract (VERDICT r4 #1): whatever the tunnel does,
``python bench.py`` must print exactly one well-formed JSON line and exit 0.
These tests drive the orchestrator with patched probe/subprocess layers so
the outage, body-failure, and forwarding paths are all locked without a TPU.
"""

import json
import subprocess
import sys

import pytest

import bench


def _capture_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one stdout line, got {out}"
    return json.loads(out[0])


def test_plan_body_tiers():
    full = bench.plan_body(600)
    assert full == {"n_sims": bench.N_SIMS_FULL, "warm": 4, "xla": True}
    mid = bench.plan_body(200)
    assert mid["n_sims"] == bench.N_SIMS_FULL and not mid["xla"]
    small = bench.plan_body(120)
    assert small["n_sims"] == 262_144
    tiny = bench.plan_body(45)
    assert tiny["n_sims"] == 65_536 and tiny["warm"] == 1


def test_plan_body_monotone():
    # More budget never buys a smaller measurement.
    budgets = [30, 90, 180, 300, 600, 3600]
    sims = [bench.plan_body(b)["n_sims"] for b in budgets]
    assert sims == sorted(sims)


def test_outage_emits_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend", lambda: (False, 3))
    bench.main()
    rec = _capture_json(capsys)
    assert rec["metric"] == bench.METRIC
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["error"] == "tpu_outage"
    assert rec["probes_run"] == 3
    assert rec["budget_s"] == bench.TOTAL_BUDGET_S


def test_body_failure_emits_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend", lambda: (True, 1))

    def fake_run(*a, **k):
        return subprocess.CompletedProcess(
            a[0], 1, stdout="", stderr="boom\nJaxRuntimeError: ABORTED")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    rec = _capture_json(capsys)
    assert rec["error"] == "bench_body_failed"
    assert rec["rc"] == 1
    assert "ABORTED" in rec["detail"]


def test_body_timeout_emits_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend", lambda: (True, 1))

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    rec = _capture_json(capsys)
    assert rec["error"] == "tpu_outage_mid_bench"
    assert rec["stage"] == "body_timeout"


def test_zero_probe_budget_reports_insufficient_not_outage(monkeypatch, capsys):
    # A healthy backend must not be labeled an outage when the budget was
    # too small to probe at all.
    monkeypatch.setattr(bench, "probe_backend", lambda: (False, 0))
    bench.main()
    rec = _capture_json(capsys)
    assert rec["error"] == "insufficient_budget"
    assert rec["probes_run"] == 0


def test_body_timeout_salvages_emitted_primary(monkeypatch, capsys):
    # The body prints the primary record BEFORE the XLA secondary; a body
    # that times out afterwards must still yield the judged number.
    monkeypatch.setattr(bench, "probe_backend", lambda: (True, 1))
    payload = json.dumps({
        "metric": bench.METRIC, "value": 2.9e6, "unit": "sims/s",
        "vs_baseline": 5800.0, "cold_s": 9.0, "n_sims": bench.N_SIMS_FULL,
    })

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(
            cmd=a[0], timeout=k.get("timeout", 0),
            output=f"noise\n{payload}\n".encode(), stderr=b"diag")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    rec = _capture_json(capsys)
    assert rec["value"] == 2.9e6


def test_body_crash_after_primary_forwards_it(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend", lambda: (True, 1))
    payload = json.dumps({
        "metric": bench.METRIC, "value": 3.1e6, "unit": "sims/s",
        "vs_baseline": 6200.0, "cold_s": 9.0, "n_sims": bench.N_SIMS_FULL,
    })

    def fake_run(*a, **k):
        return subprocess.CompletedProcess(
            a[0], 1, stdout=f"{payload}\n", stderr="secondary died")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    rec = _capture_json(capsys)
    assert rec["value"] == 3.1e6


def test_body_success_forwarded(monkeypatch, capsys):
    monkeypatch.setattr(bench, "probe_backend", lambda: (True, 1))
    payload = json.dumps({
        "metric": bench.METRIC, "value": 3.0e6, "unit": "sims/s",
        "vs_baseline": 6000.0, "cold_s": 9.0, "n_sims": bench.N_SIMS_FULL,
    })

    def fake_run(*a, **k):
        return subprocess.CompletedProcess(
            a[0], 0, stdout=f"noise\n{payload}\n", stderr="diag")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    rec = _capture_json(capsys)
    assert rec["value"] == 3.0e6 and rec["metric"] == bench.METRIC


def test_probe_respects_body_reserve(monkeypatch):
    # With the budget nearly spent, probing must stop without running a
    # single subprocess (each would otherwise block for its full timeout).
    monkeypatch.setattr(bench, "_START", bench.time.monotonic() - (
        bench.TOTAL_BUDGET_S - bench.BODY_RESERVE_S - 5))

    def no_subprocess(*a, **k):  # pragma: no cover - guard
        raise AssertionError("probe ran a subprocess past the reserve")

    monkeypatch.setattr(
        bench, "probe_backend_once", no_subprocess, raising=False)
    import monte_carlo_gp_tpu.utils.outage as outage

    monkeypatch.setattr(outage.subprocess, "run", no_subprocess)
    ok, probes = bench.probe_backend()
    assert ok is False and probes == 0


@pytest.mark.slow
def test_bench_cli_insufficient_budget_end_to_end():
    """Full-process check: a budget too small to probe -> rc 0 + the
    explicit insufficient_budget marker (never a fake outage), without any
    backend or package import."""
    import os
    env = dict(os.environ)
    env["MCGP_BENCH_BUDGET_S"] = "8"
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=120, env=env, cwd=str(bench.os.path.dirname(
            bench.os.path.abspath(bench.__file__))),
    )
    assert out.returncode == 0, out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["error"] == "insufficient_budget"


@pytest.mark.slow
def test_bench_cli_broken_env_still_emits_json(tmp_path):
    """Full-process check of the always-an-artifact guarantee: even with
    jax itself unimportable (poisoned sys.path shim) the CLI exits 0 with
    a structured error record."""
    shim = tmp_path / "jax.py"
    shim.write_text("raise ImportError('forced by test')\n")
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path}{os.pathsep}" + env.get("PYTHONPATH", "")
    env["MCGP_BENCH_BUDGET_S"] = "60"
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=120, env=env, cwd=str(bench.os.path.dirname(
            bench.os.path.abspath(bench.__file__))),
    )
    assert out.returncode == 0, out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["error"] in (
        "tpu_outage", "bench_body_failed", "bench_orchestrator_error",
    )
