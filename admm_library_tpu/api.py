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


def _solve_one_phase(qp: QPData, x0, z0, y0, settings: Settings,
                     backend: str):
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


def _x64_available() -> bool:
    return jax.config.jax_enable_x64


def _solve_core(qp: QPData, x0, z0, y0, settings: Settings, backend: str):
    """Precision-strategy dispatcher around the single-phase solver.

    'hybrid' runs the bulk of the iterations in f32 (MXU-native; TPU has
    no hardware f64) to a relaxed tolerance, then re-equilibrates in f64
    and warm-starts a second phase to the target tolerance. On TPU the
    f64 phase is XLA-emulated but latency-bound at these problem sizes
    (measured: (128,600)x(600,300) matmul f64 == f32 at ~26 us), so the
    extra cost is a few hundred cheap iterations — this is what makes
    1e-6 primal/dual residuals reachable on TPU (SURVEY.md §7).
    """
    precision = settings.precision
    if precision == "hybrid" and not _x64_available():
        precision = "single"    # no f64 types: best effort in f32

    if precision == "single":
        return _solve_one_phase(qp, x0, z0, y0, settings, backend)

    if precision == "double":
        qp64 = qp.astype(jnp.float64)
        sol = _solve_one_phase(
            qp64, x0.astype(jnp.float64), z0.astype(jnp.float64),
            y0.astype(jnp.float64), settings, backend)
        return sol

    # --- hybrid ---
    eps32 = max(settings.hybrid_eps, settings.eps_abs)
    s32 = settings.replace(
        precision="single",
        eps_abs=eps32,
        eps_rel=max(settings.hybrid_eps, settings.eps_rel),
        history=0)
    sol32 = _solve_one_phase(
        qp.astype(jnp.float32), x0.astype(jnp.float32),
        z0.astype(jnp.float32), y0.astype(jnp.float32), s32, backend)

    s64 = settings.replace(precision="single", warm_start=True)
    qp64 = qp.astype(jnp.float64)
    sol64 = _solve_one_phase(
        qp64, sol32.x.astype(jnp.float64), sol32.z.astype(jnp.float64),
        sol32.y.astype(jnp.float64), s64, backend)

    # Preserve an infeasibility verdict from phase 1 (phase 2 would also
    # find it, but phase 1 saw it first — report consistently).
    p1_inf = (sol32.status == int(Status.PRIMAL_INFEASIBLE)) | (
        sol32.status == int(Status.DUAL_INFEASIBLE))
    status = jnp.where(p1_inf, sol32.status, sol64.status)
    out_dtype = qp.dtype
    return Solution(
        x=sol64.x.astype(out_dtype), z=sol64.z.astype(out_dtype),
        y=sol64.y.astype(out_dtype), status=status,
        iters=sol32.iters + sol64.iters,
        r_prim=sol64.r_prim.astype(out_dtype),
        r_dual=sol64.r_dual.astype(out_dtype),
        obj=sol64.obj.astype(out_dtype),
        rho=sol64.rho.astype(out_dtype), history=sol64.history)


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
