"""tpu-admm: a TPU-native ADMM (OSQP-style) solver framework for
astrodynamics optimal-control QPs and SOCPs.

Built from scratch in JAX/XLA/Pallas against the capability spec of
SergioCdV/ADMM-library (the pinned reference at /root/reference is an
empty repo — README.md:1-2 + LICENSE — so the functional spec is
BASELINE.json; see SURVEY.md).
"""
import os as _os

import jax as _jax

# The default 'hybrid' precision strategy finishes every solve with a
# warm-started f64 phase (TPU has no hardware f64; XLA emulates it and
# the final stretch is latency-bound, so this is cheap) — f64 types must
# exist for that. Opt out with ADMM_TPU_NO_X64=1 to keep JAX's default
# 32-bit-only mode; solves then silently degrade to precision='single'.
if not _os.environ.get("ADMM_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

from .api import solve, solve_batch, resolve_backend
from .problem import ConeSpec, QPData, make_qp, objective
from .settings import Settings
from .solution import Solution, Status

__version__ = "0.2.0"

__all__ = [
    "solve", "solve_batch", "resolve_backend",
    "ConeSpec", "QPData", "make_qp", "objective",
    "Settings", "Solution", "Status",
]
