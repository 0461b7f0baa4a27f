"""Test environment: force JAX onto CPU with 8 virtual devices so sharding/collective
tests run anywhere (the TPU analog of a gloo fake backend; see SURVEY.md §4).

The dev image pre-registers a TPU ('axon') backend from sitecustomize, so the env
var alone is not enough — jax.config is updated explicitly before any test touches
a device.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/sdt_jax_tests"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the e2e tests compile multi-minute CPU graphs; caching
# them across runs (and across the CLI test's subprocesses) cuts suite time ~10x.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
