"""CLI smoke tests: drive main.py / backtest.py as subprocesses on the
synthetic backend (the reference-parity surface)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    # the sitecustomize overrides JAX_PLATFORMS; CLIs must still work on CPU
    # because conftest tricks don't apply to subprocesses — so we inject the
    # override through JAX's own config env var:
    "JAX_PLATFORM_NAME": "cpu",
}


def run_cli(args, tmp_path, timeout=420):
    return subprocess.run(
        [sys.executable, *args, "--cache-dir", str(tmp_path / "cache")],
        cwd=REPO,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_main_cli_synthetic(tmp_path):
    out = run_cli(
        ["main.py", "--race", "Bahrain", "--season", "2024", "--synthetic",
         "--simulations", "512", "--seed", "3", "--engine", "xla"],
        tmp_path,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "POLE POSITION PROBABILITIES" in out.stdout
    assert "RACE WINNER PROBABILITIES" in out.stdout
    assert "PODIUM PROBABILITIES" in out.stdout
    assert "Prediction complete!" in out.stdout
    # output format parity: rank lines like " 1. VER   12.3% ###"
    assert any(
        line.strip().startswith("1.") and "%" in line
        for line in out.stdout.splitlines()
    )


@pytest.mark.slow
def test_main_cli_build_cache_then_offline(tmp_path):
    built = run_cli(
        ["main.py", "--build-cache", "--seasons", "2024", "--synthetic"],
        tmp_path,
    )
    assert built.returncode == 0, built.stderr[-2000:]
    assert "Cached" in built.stdout
    # now fully offline (no --synthetic): everything must come from disk
    out = run_cli(
        ["main.py", "--race", "Bahrain", "--season", "2024", "--offline",
         "--simulations", "256", "--engine", "xla"],
        tmp_path,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Prediction complete!" in out.stdout


@pytest.mark.slow
def test_main_cli_requires_race(tmp_path):
    out = run_cli(["main.py", "--synthetic"], tmp_path, timeout=120)
    assert out.returncode != 0
    assert "--race is required" in out.stderr
