"""Test env: CPU backend with 8 virtual devices (SURVEY.md §4.4) + f64.

Must run before jax initialises its backend, hence top of conftest.
"""
import os

# Persist compiled executables across test runs (first-compile of the
# full solver is the dominant suite cost).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

# Force CPU even when the shell pre-sets a TPU platform: the suite
# validates numerics in f64 and exercises an 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Threads spawned after this (XLA:CPU compile + execution workers)
# inherit the larger stack. With the default 8 MB the full suite
# (~100 tests, each holding compiled executables) segfaulted
# intermittently in the LAST test module — inside backend_compile in
# one run, inside scan tracing in another (round 4, twice) — the
# signature of native stack/map exhaustion late in a long process,
# while any subset of the suite passed.
import resource  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and _soft < 64 * 1024 * 1024:
    _new = 64 * 1024 * 1024 if _hard == resource.RLIM_INFINITY \
        else min(64 * 1024 * 1024, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))

import jax  # noqa: E402
import pytest  # noqa: E402

# The env var alone is not honoured when a TPU PJRT plugin pre-registers;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop live compiled executables between test modules.

    Bounds the per-process accumulation described above; the persistent
    compilation cache (JAX_COMPILATION_CACHE_DIR) makes the re-loads
    cheap, so suite wall-clock is unaffected.
    """
    yield
    jax.clear_caches()
