"""tpu-admm: a TPU-native ADMM (OSQP-style) solver framework for
astrodynamics optimal-control QPs and SOCPs.

Built from scratch in JAX/XLA/Pallas against the capability spec of
SergioCdV/ADMM-library (the pinned reference at /root/reference is an
empty repo — README.md:1-2 + LICENSE — so the functional spec is
BASELINE.json; see SURVEY.md).
"""
from .api import solve, solve_batch, resolve_backend
from .problem import ConeSpec, QPData, make_qp, objective
from .settings import Settings
from .solution import Solution, Status

__version__ = "0.1.0"

__all__ = [
    "solve", "solve_batch", "resolve_backend",
    "ConeSpec", "QPData", "make_qp", "objective",
    "Settings", "Solution", "Status",
]
