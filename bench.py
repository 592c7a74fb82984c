"""Benchmark harness: race simulations/second/chip at 20 drivers x 57 laps.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference (dan-lee-gh/monte-carlo-gp) is a serial pure-Python
engine that completes ~10k sims in minutes-order time on CPU — order 500
sims/sec (BASELINE.md "reference comparison point"). vs_baseline = value/500.

Run on real TPU hardware (the default interpreter here registers the TPU
backend). Human-readable diagnostics go to stderr; stdout carries only the
JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_SIMS_PER_SEC = 500.0  # serial Python reference, CPU (BASELINE.md)
N_DRIVERS = 20
TOTAL_LAPS = 57
N_SIMS = 1_048_576

# Tunnel-outage resilience (VERDICT r3 #1): the remote TPU backend can be
# transiently UNAVAILABLE or hang for minutes; a one-shot jax.devices() in
# this process would either raise or wedge the whole bench. Probe with a
# tiny op in a *subprocess* (so a hung backend init can be killed) under a
# bounded retry/backoff loop before committing this process to the backend.
# Observed outages range from minutes to hours; the default schedule spans
# ~28 min worst-case (a medium outage), overridable for longer waits via
# MCGP_BENCH_PROBE_ATTEMPTS (repeats the last timeout/backoff entries).
PROBE_TIMEOUTS_S = (90, 120, 150, 180, 240, 300, 300)  # per-attempt budget
PROBE_BACKOFF_S = (10, 20, 40, 60, 90, 120)  # sleep between attempts
PROBE_ATTEMPTS = int(
    os.environ.get("MCGP_BENCH_PROBE_ATTEMPTS", len(PROBE_TIMEOUTS_S))
)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def probe_backend() -> bool:
    """Return True once a tiny op completes on the default backend.

    Each attempt runs in a fresh subprocess with a hard timeout, because a
    sick tunnel makes backend init *hang* (observed >9 min) rather than
    fail fast, and a poisoned in-process backend cannot be retried.
    """
    snippet = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "d = jax.devices();"
        "v = float(np.asarray(jnp.ones(8).sum()));"
        "print(d[0].platform, v)"
    )
    for i in range(PROBE_ATTEMPTS):
        budget = PROBE_TIMEOUTS_S[min(i, len(PROBE_TIMEOUTS_S) - 1)]
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, "-c", snippet],
                capture_output=True, text=True,
                timeout=budget,
            )
        except subprocess.TimeoutExpired:
            log(f"probe {i + 1}/{PROBE_ATTEMPTS}: timed out after "
                f"{budget}s")
        else:
            dt = time.perf_counter() - t0
            if out.returncode == 0:
                log(f"probe {i + 1}/{PROBE_ATTEMPTS}: ok in {dt:.1f}s "
                    f"({out.stdout.strip()})")
                return True
            tail = (out.stderr or "").strip().splitlines()
            log(f"probe {i + 1}/{PROBE_ATTEMPTS}: rc={out.returncode} "
                f"after {dt:.1f}s: {tail[-1] if tail else '?'}")
        if i < PROBE_ATTEMPTS - 1:
            time.sleep(PROBE_BACKOFF_S[min(i, len(PROBE_BACKOFF_S) - 1)])
    return False


def standard_params():
    # Single source of truth for the scored scenario, shared with every
    # harness in benchmarks/ (they import the same function, so a scenario
    # tweak here cannot desynchronize them from the scored bench shape).
    from benchmarks.common import standard_params as _std

    return _std(N_DRIVERS)


def main() -> None:
    if not probe_backend():
        log("backend unreachable after bounded probe/retry; emitting "
            "structured failure")
        print(json.dumps({
            "metric": "race_sims_per_sec_per_chip_20drv_57laps",
            "value": None,
            "unit": "sims/s",
            "vs_baseline": None,
            "error": "backend_unavailable_after_probe_retries",
            "probe_attempts": PROBE_ATTEMPTS,
        }))
        sys.exit(2)

    import jax

    devices = jax.devices()
    log(f"devices: {devices}")
    params = standard_params()
    key = jax.random.PRNGKey(42)
    on_tpu = devices[0].platform == "tpu"

    # Backend: the fused Pallas whole-race kernel on TPU (state resident in
    # VMEM across all laps); the XLA lap-scan engine elsewhere.
    if on_tpu:
        from monte_carlo_gp_tpu.ops.pallas_engine import run_monte_carlo_pallas

        def run(k):
            return run_monte_carlo_pallas(params, k, N_SIMS, TOTAL_LAPS)

        log("backend: pallas (fused whole-race kernel)")
    else:
        from monte_carlo_gp_tpu.ops.engine import DEFAULT_BLOCK, run_monte_carlo

        def run(k):
            return run_monte_carlo(
                params, k, N_SIMS, TOTAL_LAPS,
                sims_per_block=min(DEFAULT_BLOCK, N_SIMS),
            )

        log("backend: xla lap-scan")

    # Separate backend/tunnel initialization from the compile measurement:
    # the remote TPU tunnel's first dispatch in a process varies from ~3 s
    # to minutes with tunnel health, which would swamp cold_s.
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.ones(8).sum())
    log(f"backend init (tiny op): {time.perf_counter() - t0:.2f}s")

    # Stage inputs on device once: host-numpy args re-upload on every call,
    # and per-call transfer latency over the remote tunnel varies by session
    # (CLAUDE.md measurement trap) — it belongs to neither cold_s nor the
    # warm timing.
    params = jax.device_put(params)
    key = jax.device_put(key)

    t0 = time.perf_counter()
    arr = np.asarray(run(key))
    compile_s = time.perf_counter() - t0
    log(f"cold (compile+run): {compile_s:.2f}s")

    # Best of 4 warm runs with distinct keys; np.asarray forces full host
    # materialization (block_until_ready alone under-reports on the remote
    # TPU tunnel).
    warm_keys = [jax.device_put(jax.random.fold_in(key, i)) for i in range(4)]
    times = []
    for k in warm_keys:
        t0 = time.perf_counter()
        arr = np.asarray(run(k))
        times.append(time.perf_counter() - t0)
    best = min(times)

    assert np.allclose(arr.sum(axis=1), 1.0, atol=1e-4), "invalid histogram"

    sims_per_sec = N_SIMS / best
    log(
        f"{N_SIMS} sims x {TOTAL_LAPS} laps x {N_DRIVERS} drivers: "
        f"best {best:.3f}s -> {sims_per_sec/1e6:.3f}M sims/s/chip "
        f"(runs: {[f'{t:.3f}' for t in times]})"
    )

    # Secondary metric: the XLA lap-scan engine (the portable path) is
    # regression-tracked alongside the flagship kernel (VERDICT r1 #9).
    xla_sims_per_sec = None
    if on_tpu:
        from monte_carlo_gp_tpu.ops.engine import DEFAULT_BLOCK, run_monte_carlo

        n_xla = N_SIMS // 4

        def run_xla(k):
            return run_monte_carlo(
                params, k, n_xla, TOTAL_LAPS,
                sims_per_block=min(DEFAULT_BLOCK, n_xla),
            )

        np.asarray(run_xla(key))  # compile
        xla_keys = [
            jax.device_put(jax.random.fold_in(key, 10 + i)) for i in range(4)
        ]
        xla_times = []
        for k in xla_keys:
            t0 = time.perf_counter()
            np.asarray(run_xla(k))
            xla_times.append(time.perf_counter() - t0)
        xla_sims_per_sec = round(n_xla / min(xla_times), 1)
        log(f"xla engine: {xla_sims_per_sec/1e6:.3f}M sims/s/chip")

    record = {
        "metric": "race_sims_per_sec_per_chip_20drv_57laps",
        "value": round(sims_per_sec, 1),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_sec / REFERENCE_SIMS_PER_SEC, 1),
        # Cold start (compile+run, before the persistent cache warms). The
        # round-2 DRS sign-bit packing regressed this 28x (24 -> 681 s via
        # a Mosaic bitcast pathology, bisected + fixed in round 3); tracked
        # here so any regression is visible to the driver.
        "cold_s": round(compile_s, 2),
    }
    if xla_sims_per_sec is not None:
        record["xla_sims_per_sec"] = xla_sims_per_sec
    print(json.dumps(record))


if __name__ == "__main__":
    main()
