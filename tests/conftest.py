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
# NOT "all": the XLA-internal kernel caches store AOT machine code
# targeted at the COMPILE machine's CPU features; in this environment the
# remote-compile service can differ from the host (observed: avx512-full
# compile machine, leaner host), and loading such an entry SIGILLs the
# test process (segfault in test_sharded, round 5). The top-level
# executable cache alone keeps recompiles cheap and is rebuilt per host.
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
