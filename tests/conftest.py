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

import jax  # noqa: E402

# The env var alone is not honoured when a TPU PJRT plugin pre-registers;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
