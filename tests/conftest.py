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
# NO persistent compilation cache for the suite (round-5 regression hunt):
# on this jaxlib, executable (de)serialization for the on-disk cache is
# unstable once a long-lived full-suite process has ~100 tests of compiled
# state behind it — reproduced four times at the first big compile past
# the 45% mark, as (a) a SIGILL loading kernel-AOT entries whose
# "+prefer-no-scatter" pseudo-features fail host validation (cache mode
# "all"), (b) segfault/abort inside put_executable_and_time (mode
# "none"), and (c) once inside backend_compile_and_load itself. Every
# crashing test passes in isolation under either cache mode. Cold
# compiles cost the suite a few minutes; a crashed suite costs the round.
# The FLAG (not just the dir) must be off: run.py's run_log sets a cache
# dir when none is configured, which would re-arm the cache mid-suite for
# every later compile (that was crash #5, at test_vio after
# test_pipeline_sharded ran run_log).
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# Round-5 stability: with ~100 tests of compiled executables live in one
# process, the NEXT large XLA:CPU compile segfaults (reproduced 6x on this
# host at whichever test compiles first past that point — in
# backend_compile_and_load and in cache (de)serialization; every victim
# passes in isolation). Dropping the accumulated executables between test
# modules keeps the compiler's live-state under the crash threshold. Costs
# recompiles of shared small programs (~1 min over the suite), saves the
# suite.
_last_module = [None]


def pytest_runtest_setup(item):
    mod = item.module.__name__
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
