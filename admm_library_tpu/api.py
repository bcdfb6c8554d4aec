"""Public solver API (component S1, SURVEY.md §2.2).

`solve(problem, settings)` is traced once per (shapes, Settings) pair and
runs entirely on device: Ruiz scaling, factorisation, the fused ADMM
`lax.while_loop`, and unscaling are one XLA computation. There are exactly
two host<->device boundaries: problem upload and Solution fetch
(SURVEY.md §3.1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .core import admm
from .core.scaling import ruiz_equilibrate, Scaling
from .problem import QPData, objective
from .settings import Settings
from .solution import Solution, Status


def resolve_backend(settings: Settings, qp_n: int | None = None) -> str:
    """Map backend='auto' to a concrete L0 backend at trace time.

    banded when the problem declares MPC block structure; otherwise 'inv'
    on TPU (per-iteration solve = one MXU matmul) and 'chol' elsewhere.
    """
    if settings.backend != "auto":
        return settings.backend
    if settings.band_block > 0:
        return "banded"
    return "inv" if jax.default_backend() == "tpu" else "chol"


def _solve_core(qp: QPData, x0, z0, y0, settings: Settings, backend: str):
    qps, scaling = ruiz_equilibrate(qp, settings.scaling_iters)
    if settings.warm_start:
        xs = scaling.scale_x(x0)
        zs = scaling.scale_z(z0)
        ys = scaling.scale_y(y0)
    else:
        xs, zs, ys = x0, z0, y0
    carry = admm.run_admm(
        qps, scaling, settings, xs, zs, ys, backend,
        band_block=settings.band_block)
    x = scaling.unscale_x(carry.x)
    z = scaling.unscale_z(carry.z)
    y = scaling.unscale_y(carry.y)
    return Solution(
        x=x, z=z, y=y,
        status=carry.status, iters=carry.it,
        r_prim=carry.r_prim, r_dual=carry.r_dual,
        obj=objective(qp, x, z), rho=carry.rho_bar,
        history=carry.hist)


@partial(jax.jit, static_argnames=("settings", "backend"))
def _solve_jit(qp, x0, z0, y0, settings, backend):
    return _solve_core(qp, x0, z0, y0, settings, backend)


def solve(qp: QPData, settings: Settings = Settings(),
          x0=None, z0=None, y0=None) -> Solution:
    """Solve one QP/SOCP. Optional (x0, z0, y0) warm start (A5), unscaled."""
    dtype = qp.dtype
    n, m = qp.n, qp.m
    if x0 is None:
        x0 = jnp.zeros(qp.P.shape[:-2] + (n,), dtype)
    if z0 is None:
        z0 = jnp.zeros(qp.A.shape[:-2] + (m,), dtype)
    if y0 is None:
        y0 = jnp.zeros_like(z0)
    backend = resolve_backend(settings)
    return _solve_jit(qp, x0, z0, y0, settings, backend)


def solve_batch(qp_batch: QPData, settings: Settings = Settings(),
                x0=None, z0=None, y0=None) -> Solution:
    """Solve a batch of independent problems (leading batch axis on every
    array leaf of `qp_batch`) via `vmap` over the full solver (P1 core).

    JAX's while-loop batching freezes converged lanes automatically (the
    batched cond OR-reduces and finished lanes keep their carry), so the
    lockstep loop runs to the slowest problem with per-lane honest
    iteration counts (SURVEY.md §7 "hard parts").

    For Monte-Carlo batches that share (P, A) across scenarios use
    `parallel.batch.solve_batch_shared` — the MXU fast path.
    """
    dtype = qp_batch.dtype
    B = qp_batch.P.shape[0]
    n, m = qp_batch.n, qp_batch.m
    if x0 is None:
        x0 = jnp.zeros((B, n), dtype)
    if z0 is None:
        z0 = jnp.zeros((B, m), dtype)
    if y0 is None:
        y0 = jnp.zeros_like(z0)
    backend = resolve_backend(settings)
    fn = jax.jit(
        jax.vmap(partial(_solve_core, settings=settings, backend=backend)),
        static_argnames=())
    return fn(qp_batch, x0, z0, y0)
