"""Test harness: force an 8-virtual-device CPU backend so multi-chip
sharding paths are testable without TPU hardware (the reference has no test
infrastructure at all — SURVEY.md section 4).

Note: the environment preloads a TPU PJRT plugin via sitecustomize *before*
conftest runs, so setting JAX_PLATFORMS in os.environ is too late — we must
update the latched jax config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the SPMD pipeline programs take tens of
# seconds to compile on an 8-virtual-device CPU mesh; cache them across
# test processes/reruns (keyed on HLO + flags, so code changes re-compile).
jax.config.update("jax_compilation_cache_dir", "/tmp/fastlivo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
