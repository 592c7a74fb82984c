"""TPU-tunnel outage classification and probing — the single home.

The tunnel's failure mode (CLAUDE.md): every device touch — even an array
upload — raises ABORTED/UNAVAILABLE for minutes to hours, surfacing as
jaxlib XlaRuntimeError (a RuntimeError subclass) with the gRPC status
name in the message; a sick tunnel can also HANG rather than fail fast,
so probes must run in killable subprocesses. Consumers: the serving
layer's cooldown policy (monte_carlo_gp_tpu/serve.py), the bench
orchestrator (bench.py), and the on-TPU perf gates
(tests/test_perf_gate.py) — previously three drifting copies.
"""

from __future__ import annotations

import subprocess
import sys
import time

OUTAGE_MARKERS = ("ABORTED", "UNAVAILABLE", "TPU backend error")


def is_backend_outage(exc: BaseException) -> bool:
    """True when `exc` matches the TPU-backend outage signature."""
    if not isinstance(exc, RuntimeError) and type(exc).__name__ not in (
        "XlaRuntimeError",
        "JaxRuntimeError",
    ):
        return False
    msg = str(exc)
    return any(marker in msg for marker in OUTAGE_MARKERS)


def probe_backend_once(
    platform: str | None = None, timeout_s: float = 20.0
) -> tuple[bool, float, str]:
    """One tiny op on `platform` (default: the process's default backend)
    in a killable subprocess. Returns (ok, seconds, detail) — detail is
    the child's stdout on success, its last stderr line (or 'timeout')
    otherwise."""
    force = (
        f"jax.config.update('jax_platforms', {platform!r});"
        if platform
        else ""
    )
    snippet = (
        "import jax;"
        + force
        + "import numpy as np, jax.numpy as jnp;"
        "d = jax.devices();"
        "v = float(np.asarray(jnp.ones(8).sum()));"
        "print(d[0].platform, v)"
    )
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-c", snippet],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, time.perf_counter() - t0, "timeout"
    except OSError as e:
        return False, time.perf_counter() - t0, str(e)
    dt = time.perf_counter() - t0
    if out.returncode == 0:
        return True, dt, out.stdout.strip()
    tail = (out.stderr or "").strip().splitlines()
    return False, dt, (tail[-1] if tail else f"rc={out.returncode}")
