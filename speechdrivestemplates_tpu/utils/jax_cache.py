"""Persistent XLA compilation cache (single shared implementation).

On remote-compile backends the first compile of a full train step costs
minutes of wall; the persistent cache keys compiled executables by HLO hash
and reuses them across processes and runs.  The production CLI (main.py,
via ``SYS.COMPILE_CACHE_DIR``), the bench harness (bench.py) and the
profiler (bench_profile.py) all enable it through this one function — the
reference pays its warmup cost per process with no equivalent
(reference core/pipelines/trainer.py:367-405 re-traces every run).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/sdt_jax"


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Resolution order: explicit ``cache_dir`` argument, then the
    ``JAX_COMPILATION_CACHE_DIR`` env var, then ``~/.cache/sdt_jax``.
    Returns the directory in use, or None when jax is unavailable or the
    directory cannot be created (never raises: a missing cache must degrade
    to a slow run, not a failed one).
    """
    try:
        import jax

        cache_dir = os.path.expanduser(
            cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every non-trivial compile: steady-state steps are milliseconds,
        # so anything that takes >=1 s to compile is worth persisting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
