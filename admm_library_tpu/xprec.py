"""f32 matmul precision policy (TPU correctness-critical).

TPU MXU "default" f32 dot precision computes through truncated-bf16
passes. That is fine for neural-net training and fatal for a convex
solver: measured on v5e (scripts/debug_tpu_inv.py), the in-graph
Cholesky -> triangular-solve -> explicit-inverse factor comes out with
||I - M^-1 M|| = 1.33 (vs 8e-5 for an exact-f32 factor) and the ADMM
iteration itself diverges ~50x/iteration even against a correct factor.
With HIGHEST (exact f32) both are well-behaved, and the factor build is
measured FASTER (1.93 ms vs 2.73 ms — XLA skips pass-splitting setup).

Policy: every dot on the solver path requests HIGHEST explicitly, and
trace-level entry points additionally run under `highest()` so
decomposition lowerings (cholesky, triangular_solve) pick it up too.
Pallas kernels are unaffected — Mosaic f32 dots are exact already.

On CPU these annotations are no-ops, so tests exercise identical code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def einsum(subscripts, *operands, **kw):
    """jnp.einsum pinned to exact-f32 dot precision."""
    kw.setdefault("precision", HIGHEST)
    return jnp.einsum(subscripts, *operands, **kw)


def matmul(a, b):
    """a @ b pinned to exact-f32 dot precision."""
    return jnp.matmul(a, b, precision=HIGHEST)


def highest():
    """Trace-time context: exact-f32 for every dot traced inside,
    including those emitted by decomposition lowerings."""
    return jax.default_matmul_precision("highest")
