"""Process-level JAX configuration used by the CLIs.

The reference is pure NumPy and pays no compile costs; here every distinct
(engine, lap bucket, sim count) is an XLA program whose cold TPU compile
costs tens of seconds over the remote-compile tunnel. The persistent
compilation cache makes those one-time costs per machine instead of per
process, which is most of a cold season-backtest's wall clock.
"""

from __future__ import annotations

from pathlib import Path


def honor_platform_env() -> None:
    """Make an explicit JAX_PLATFORMS env request actually win.

    Some environments (this sandbox's sitecustomize among them)
    force-register an out-of-process TPU plugin in every python
    interpreter, which silently overrides JAX_PLATFORMS=cpu — the env var
    is consumed before the plugin registers. Re-asserting the request
    through jax.config BEFORE the backend initializes restores the
    documented env-var semantics, and keeps a process that asked for CPU
    from ever touching the remote-TPU tunnel (whose first contact can
    hang for minutes when the tunnel is degraded). Called by the CLIs at
    startup; a no-op when JAX_PLATFORMS is unset.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except (AttributeError, ValueError):
            pass


def enable_persistent_compilation_cache(cache_dir: str | Path | None = None) -> None:
    """Ensure JAX's persistent compilation cache is active.

    The package __init__ already points the cache at ~/.cache/mcgp_jax
    (override with MCGP_COMPILE_CACHE); this keeps ONE machine-wide cache
    shared by the CLIs, the library, and the benchmark, so every lap-bucket
    program compiles once per machine. `cache_dir` is accepted for
    compatibility but no longer redirects the cache — per-run directories
    fragmented it and left big entries cold.

    Safe to call multiple times; silently ignores unsupported jax versions.
    """
    import os

    import jax

    del cache_dir
    try:
        # Single source of truth for the path (incl. the host-fingerprint
        # subdirectory — foreign-machine XLA:CPU AOT entries are unsafe).
        from monte_carlo_gp_tpu import _cache_dir

        target = _cache_dir()
        if target is not None:
            path = Path(target)
            try:
                path.mkdir(parents=True, exist_ok=True)
            except OSError:
                # read-only $HOME etc. — run uncached rather than crash
                return
            jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache everything that took meaningful compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (AttributeError, ValueError):  # older/newer jax without these flags
        pass
