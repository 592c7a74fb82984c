"""Benchmark harness: race simulations/second/chip at 20 drivers x 57 laps.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference (dan-lee-gh/monte-carlo-gp) is a serial pure-Python
engine that completes ~10k sims in minutes-order time on CPU — order 500
sims/sec (BASELINE.md "reference comparison point"). vs_baseline = value/500.

Deadline-aware by construction (VERDICT r4 #1): the whole run fits inside a
total wall-clock budget (MCGP_BENCH_BUDGET_S, default 600 s) so the driver's
command window can never expire before the JSON line lands. The budget is
split between a TPU-outage probe phase and the bench body:

  - probes run in killable subprocesses with escalating timeouts, but each
    is clamped so that a body reserve always remains inside the budget;
  - the body itself runs in a subprocess with a hard timeout — if the
    tunnel dies mid-measurement (ABORTED on every device touch, see
    CLAUDE.md outage signature) the parent still prints well-formed JSON
    with an explicit outage marker instead of dying rc!=0 / rc=124;
  - when recovery comes late, the body shrinks: fewer warm reps, then a
    262k-sim shape (still resolves M-sims/s to ~1%), then 65k.

Exit code is 0 whenever a JSON line was printed (including the outage
marker) so the driver's `parsed` field is never null.

Run on real TPU hardware (the default interpreter here registers the TPU
backend). Human-readable diagnostics go to stderr; stdout carries only the
JSON line.
"""

import json
import os
import subprocess
import sys
import time

METRIC = "race_sims_per_sec_per_chip_20drv_57laps"
REFERENCE_SIMS_PER_SEC = 500.0  # serial Python reference, CPU (BASELINE.md)
N_DRIVERS = 20
TOTAL_LAPS = 57
N_SIMS_FULL = 1_048_576

TOTAL_BUDGET_S = float(os.environ.get("MCGP_BENCH_BUDGET_S", "600"))
_START = time.monotonic()

# Escalating per-attempt probe timeouts; the deadline clamps each one so a
# body reserve always survives. Backoffs between failed attempts let a
# medium outage clear. (Observed outages range from minutes to hours; a
# multi-hour outage is reported as such, not waited out.)
PROBE_TIMEOUTS_S = (60, 90, 120, 150, 180, 240, 300, 300, 300, 300)
PROBE_BACKOFF_S = (5, 10, 20, 30, 45, 60, 60, 60, 60)
# Body reserve: 90 s fits the minimal plan (65k sims, 1 warm rep) on a
# just-recovered tunnel with a warm persistent compile cache; everything
# above it is spent probing, which maximizes the chance of a real number
# on a flaky day. For tiny budgets the reserve scales down so at least
# one probe can still run (a 100 s budget must not report an outage
# without ever probing).
BODY_RESERVE_S = min(90.0, max(30.0, 0.4 * TOTAL_BUDGET_S))
FINAL_MARGIN_S = 10.0   # parent bookkeeping / JSON print headroom


def remaining() -> float:
    return TOTAL_BUDGET_S - (time.monotonic() - _START)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def emit(record: dict) -> None:
    print(json.dumps(record), flush=True)


def probe_backend() -> tuple[bool, int]:
    """(backend_ok, probes_attempted) once a tiny op completes on the
    default backend or the schedule exhausts.

    Each attempt runs in a fresh subprocess with a hard timeout, because a
    sick tunnel makes backend init *hang* (observed >9 min) rather than
    fail fast, and a poisoned in-process backend cannot be retried. The
    schedule is sized to the budget: no attempt (or backoff) may eat into
    the body reserve. Uses the shared probe helper (utils/outage.py).
    """
    i = 0
    while True:
        budget = PROBE_TIMEOUTS_S[min(i, len(PROBE_TIMEOUTS_S) - 1)]
        budget = min(budget, remaining() - BODY_RESERVE_S)
        if budget < 15:
            log(f"probe schedule exhausted (remaining {remaining():.0f}s, "
                f"reserve {BODY_RESERVE_S:.0f}s, probes run: {i})")
            return False, i
        # Imported lazily (after the budget check): the insufficient-budget
        # path must not depend on the package importing cleanly.
        from monte_carlo_gp_tpu.utils.outage import probe_backend_once

        ok, dt, detail = probe_backend_once(timeout_s=budget)
        if ok:
            log(f"probe {i + 1}: ok in {dt:.1f}s ({detail})")
            return True, i + 1
        log(f"probe {i + 1}: failed after {dt:.1f}s: {detail}")
        backoff = PROBE_BACKOFF_S[min(i, len(PROBE_BACKOFF_S) - 1)]
        time.sleep(min(backoff, max(0.0, remaining() - BODY_RESERVE_S)))
        i += 1


def plan_body(budget_s: float) -> dict:
    """Size the measurement to the time actually left.

    262k sims still resolve M-sims/s to ~1% at the measured ~0.35 s/M-sim
    kernel rate, so shrinking trades a little resolution for a guaranteed
    artifact.
    """
    if budget_s >= 300:
        return {"n_sims": N_SIMS_FULL, "warm": 4, "xla": True}
    if budget_s >= 180:
        return {"n_sims": N_SIMS_FULL, "warm": 2, "xla": False}
    if budget_s >= 90:
        return {"n_sims": 262_144, "warm": 2, "xla": False}
    return {"n_sims": 65_536, "warm": 1, "xla": False}


# ---------------------------------------------------------------------------
# Body: the actual measurement, run as a subprocess of the orchestrator so a
# mid-measurement tunnel death cannot take the JSON line with it.
# ---------------------------------------------------------------------------

def standard_params():
    # Single source of truth for the scored scenario, shared with every
    # harness in benchmarks/ (they import the same function, so a scenario
    # tweak here cannot desynchronize them from the scored bench shape).
    from benchmarks.common import standard_params as _std

    return _std(N_DRIVERS)


def run_body(n_sims: int, warm: int, want_xla: bool) -> None:
    import numpy as np
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
            return run_monte_carlo_pallas(params, k, n_sims, TOTAL_LAPS)

        log("backend: pallas (fused whole-race kernel)")
    else:
        from monte_carlo_gp_tpu.ops.engine import DEFAULT_BLOCK, run_monte_carlo

        def run(k):
            return run_monte_carlo(
                params, k, n_sims, TOTAL_LAPS,
                sims_per_block=min(DEFAULT_BLOCK, n_sims),
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

    # Best of `warm` runs with distinct keys; np.asarray forces full host
    # materialization (block_until_ready alone under-reports on the remote
    # TPU tunnel).
    warm_keys = [
        jax.device_put(jax.random.fold_in(key, i)) for i in range(warm)
    ]
    times = []
    for k in warm_keys:
        t0 = time.perf_counter()
        arr = np.asarray(run(k))
        times.append(time.perf_counter() - t0)
    best = min(times)

    assert np.allclose(arr.sum(axis=1), 1.0, atol=1e-4), "invalid histogram"

    sims_per_sec = n_sims / best
    log(
        f"{n_sims} sims x {TOTAL_LAPS} laps x {N_DRIVERS} drivers: "
        f"best {best:.3f}s -> {sims_per_sec/1e6:.3f}M sims/s/chip "
        f"(runs: {[f'{t:.3f}' for t in times]})"
    )

    record = {
        "metric": METRIC,
        "value": round(sims_per_sec, 1),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_sec / REFERENCE_SIMS_PER_SEC, 1),
        # Cold start (compile+run, before the persistent cache warms). The
        # round-2 DRS sign-bit packing regressed this 28x (24 -> 681 s via
        # a Mosaic bitcast pathology, bisected + fixed in round 3); tracked
        # here so any regression is visible to the driver.
        "cold_s": round(compile_s, 2),
        "n_sims": n_sims,
    }
    # The primary metric is the judged artifact: print it NOW, before the
    # optional secondary, so a tunnel death (or hang) during the XLA leg
    # cannot discard an already-measured number — the parent forwards the
    # LAST JSON line it finds, even from a timed-out/crashed body.
    emit(record)

    # Secondary metric: the XLA lap-scan engine (the portable path) is
    # regression-tracked alongside the flagship kernel (VERDICT r1 #9).
    if on_tpu and want_xla:
        try:
            from monte_carlo_gp_tpu.ops.engine import (
                DEFAULT_BLOCK,
                run_monte_carlo,
            )

            n_xla = n_sims // 4

            def run_xla(k):
                return run_monte_carlo(
                    params, k, n_xla, TOTAL_LAPS,
                    sims_per_block=min(DEFAULT_BLOCK, n_xla),
                )

            np.asarray(run_xla(key))  # compile
            xla_keys = [
                jax.device_put(jax.random.fold_in(key, 10 + i))
                for i in range(4)
            ]
            xla_times = []
            for k in xla_keys:
                t0 = time.perf_counter()
                np.asarray(run_xla(k))
                xla_times.append(time.perf_counter() - t0)
            xla = round(n_xla / min(xla_times), 1)
            log(f"xla engine: {xla/1e6:.3f}M sims/s/chip")
            record["xla_sims_per_sec"] = xla
            emit(record)  # enriched record supersedes (parent takes last)
        except Exception as e:  # noqa: BLE001 — secondary must not cost the primary
            log(f"xla secondary failed (primary already emitted): "
                f"{str(e)[:200]}")


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

def outage_record(reason: str, **extra) -> dict:
    rec = {
        "metric": METRIC,
        "value": None,
        "unit": "sims/s",
        "vs_baseline": None,
        "error": reason,
        "budget_s": TOTAL_BUDGET_S,
        "elapsed_s": round(time.monotonic() - _START, 1),
    }
    rec.update(extra)
    return rec


def _last_json_line(stdout_text: str):
    return next(
        (ln for ln in reversed((stdout_text or "").splitlines())
         if ln.startswith("{")), None)


def main() -> None:
    ok, probes_run = probe_backend()
    if not ok:
        if probes_run == 0:
            # The budget was too small to even attempt a probe: that is a
            # configuration problem, not evidence of an outage.
            log("budget too small to probe; emitting insufficient_budget")
            emit(outage_record("insufficient_budget", probes_run=0))
            return
        log("backend unreachable within budget; emitting structured outage")
        emit(outage_record("tpu_outage", probes_run=probes_run))
        return  # exit 0: the artifact exists; the outage is the result

    body_budget = remaining() - FINAL_MARGIN_S
    plan = plan_body(body_budget)
    log(f"body plan: {plan} (budget {body_budget:.0f}s)")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--body",
             str(plan["n_sims"]), str(plan["warm"]),
             "1" if plan["xla"] else "0"],
            capture_output=True, text=True,
            timeout=max(30.0, body_budget),
        )
    except subprocess.TimeoutExpired as e:
        def _txt(x):
            return x.decode(errors="replace") if isinstance(x, bytes) else (x or "")
        log(_txt(e.stderr))
        # Salvage: the body emits the primary record BEFORE the optional
        # secondary, so even a timed-out body may have the judged number
        # in its captured stdout.
        line = _last_json_line(_txt(e.stdout))
        if line is not None:
            log("body timed out after emitting the primary record; "
                "forwarding it")
            print(line, flush=True)
            return
        emit(outage_record("tpu_outage_mid_bench", stage="body_timeout"))
        return
    log(out.stderr.rstrip())
    line = _last_json_line(out.stdout)
    if line is not None:
        if out.returncode != 0:
            log(f"body exited rc={out.returncode} after emitting a record; "
                "forwarding it")
        print(line, flush=True)
        return
    tail = (out.stderr or "").strip().splitlines()
    emit(outage_record(
        "bench_body_failed", rc=out.returncode,
        detail=(tail[-1][:300] if tail else "?"),
    ))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--body":
        run_body(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4] == "1")
    else:
        try:
            main()
        except Exception as e:  # noqa: BLE001 — the artifact must ALWAYS exist
            log(f"orchestrator error: {type(e).__name__}: {e}")
            emit(outage_record(
                "bench_orchestrator_error",
                detail=f"{type(e).__name__}: {e}"[:300],
            ))
