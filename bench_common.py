"""Shared outage policy for the bench harnesses (bench.py, bench_profile.py,
bench_e2e.py): one device-liveness probe and one compile-cache switch, so the
three tools cannot drift apart (round 3's rc=124 was exactly two of them
disagreeing about budgets).

The chip is reached through a remote tunnel that has been observed to wedge
for tens of minutes, and ``jax.devices()`` can return instantly while any
EXECUTION hangs forever — so the probe runs a tiny jitted op in a SUBPROCESS
(a hang there cannot wedge the caller) and waits for recovery.
"""

from __future__ import annotations

import subprocess
import sys
import time

from speechdrivestemplates_tpu.utils.jax_cache import enable_compile_cache  # noqa: F401  (re-export)

# The probe EXECUTES a tiny jitted op: the 2026-08-18 outage had
# jax.devices() return instantly while any execution wedged forever, so an
# enumeration-only probe green-lights a dead device.
PROBE_SRC = ("import jax, jax.numpy as jnp; "
             "jax.jit(lambda x: x + 1)(jnp.zeros((8, 8))).block_until_ready()")


def wait_for_device(max_wait_s: float = 420, probe_timeout: float = 90,
                    tag: str = "bench") -> bool:
    """Wait until a tiny jitted execution succeeds on the default backend;
    False once ``max_wait_s`` expires.  The wait budget is deliberately SHORT
    by default (7 min): round 3's 30-min budget outlived the driver's own
    process timeout, so the honest zero-value JSON line never printed and the
    round artifact was an opaque rc=124.  The budget must expire — and the
    error line must be on stdout — strictly inside the caller's window."""
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE_SRC],
                timeout=min(probe_timeout, max(5.0, remaining)),
                capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"[{tag}] device unreachable (probe {attempt}); retrying",
              file=sys.stderr, flush=True)
        time.sleep(15)
