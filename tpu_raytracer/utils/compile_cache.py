"""Persistent XLA compilation cache.

TPU compiles for the packet kernels run 1-5 minutes (CLAUDE.md); the
reference pays its analogous cost once per nvcc build, while a JAX
process pays it per run. Enabling JAX's persistent compilation cache
makes repeat runs of an unchanged kernel/jit start in seconds: compiled
executables are serialized under ``TRT_COMPILE_CACHE_DIR`` (default
``~/.cache/tpu_raytracer/xla``) keyed on the computation, compile
options, and backend version, so correctness is unaffected.

Opt-out with ``TRT_COMPILE_CACHE=0``. The app driver, the interactive
viewers, and the bench entry points all call :func:`enable` — library
users embedding ``tpu_raytracer`` call it themselves (JAX global
config, so the embedding application should own the decision).
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> bool:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns True if the cache is active after the call."""
    global _enabled
    if os.environ.get("TRT_COMPILE_CACHE", "1") in ("0", ""):
        return False
    if _enabled:
        return True
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("TRT_COMPILE_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "tpu_raytracer", "xla"
        )
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every computation that takes >=1s to compile (the big
        # pallas kernel jits take minutes; tiny jits stay uncached to
        # keep the cache dir lean)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # pragma: no cover - config name skew across jax
        return False
    return True
