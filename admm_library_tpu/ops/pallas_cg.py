"""Pallas TPU batched conjugate-gradient kernel (K3, SURVEY.md §2.2).

Runs lockstep CG on the condensed system  M x = rhs  for a whole lane
batch inside ONE kernel launch: M (n, n) stays VMEM-resident, each CG
step is a single (B, n) x (n, n) MXU matmul plus VPU vector ops, and
converged lanes freeze via masking (per-problem convergence, BASELINE
"north_star": "batched Pallas CG"). Matrix-free in the ADMM sense: rho
enters only through M's assembly, so adaptive-rho refreshes cost one
einsum, never a factorisation.

Jacobi (diagonal) preconditioning is applied in-kernel: with
D = diag(M), the preconditioned residual z = r / D costs one VPU
multiply per step and cuts the iteration count on the sigma-vs-rho
spread of ADMM condensed systems.

Falls back to interpret mode off-TPU so CPU tests run the identical
kernel code path (cf. ops/fused.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=a.dtype)


def _cg_math(M, dinv, rhs, x0, *, iters, tol):
    """The masked lockstep PCG loop (written once for kernel + fallback).

    M is symmetric, so the (B, n)-batched matvec is rhs-side: v @ M.
    """
    dtype = rhs.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    x = x0
    r = rhs - _mm(x, M)
    z = r * dinv
    p = z
    rz = jnp.sum(r * z, axis=-1, keepdims=True)
    rr = jnp.sum(r * r, axis=-1, keepdims=True)
    tol2 = (tol * tol) * jnp.maximum(
        jnp.sum(rhs * rhs, axis=-1, keepdims=True), 1.0)

    def body(_, carry):
        x, r, z, p, rz, rr = carry
        Mp = _mm(p, M)
        pMp = jnp.sum(p * Mp, axis=-1, keepdims=True)
        active = rr > tol2
        alpha = jnp.where(
            active, rz / jnp.maximum(pMp, tiny), jnp.zeros_like(rz))
        x = x + alpha * p
        r = r - alpha * Mp
        z = r * dinv
        rz_new = jnp.sum(r * z, axis=-1, keepdims=True)
        rr_new = jnp.sum(r * r, axis=-1, keepdims=True)
        beta = jnp.where(
            active, rz_new / jnp.maximum(rz, tiny), jnp.zeros_like(rz))
        p = z + beta * p
        rz = jnp.where(active, rz_new, rz)
        rr = jnp.where(active, rr_new, rr)
        return x, r, z, p, rz, rr

    x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, z, p, rz, rr))
    return x


def _kernel(M_ref, dinv_ref, rhs_ref, x0_ref, out_ref, *, iters, tol):
    out_ref[:] = _cg_math(
        M_ref[:], dinv_ref[:], rhs_ref[:], x0_ref[:],
        iters=iters, tol=tol)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "tol", "interpret", "lane_tile"))
def pallas_cg_solve(M, rhs, x0=None, iters: int = 100, tol: float = 1e-7,
                    interpret: bool = False, lane_tile: int | None = None):
    """Solve M x = rhs for a (B, n) rhs batch with a VMEM-resident PCG
    kernel, gridded over lane tiles. Returns x with rhs's shape.

    M: (n, n) SPD (the shared condensed KKT matrix); rhs: (n,) or
    (B, n). `iters` is the static unroll bound; converged lanes freeze.
    The lane tile auto-fits the VMEM budget (ops.fused.auto_lane_tile)
    unless pinned.
    """
    from .fused import auto_lane_tile

    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[None, :]
    B, n = rhs.shape
    dt = rhs.dtype
    if x0 is None:
        x0 = jnp.zeros_like(rhs)
    elif x0.ndim == 1:
        x0 = x0[None, :]
    dinv = (1.0 / jnp.diagonal(M)).reshape(1, n).astype(dt)

    itemsize = jnp.dtype(dt).itemsize
    shared_bytes = (n * n + n) * itemsize
    per_lane = 9 * n * itemsize     # rhs/x0/out + x/r/z/p/Mp + headroom
    tile = auto_lane_tile(shared_bytes, per_lane, B, lane_tile)
    Bp = ((B + tile - 1) // tile) * tile
    if Bp != B:
        pad = [(0, Bp - B), (0, 0)]
        rhs = jnp.pad(rhs, pad)
        x0 = jnp.pad(x0, pad)

    kern = functools.partial(_kernel, iters=int(iters), tol=float(tol))

    # i32 index maps: x64-mode grid index math is i64, which this
    # Mosaic build cannot legalize (cf. ops/fused.py).
    i32 = jnp.int32

    def const_spec(a):
        zero = lambda i: tuple(i32(0) for _ in a.shape)
        return pl.BlockSpec(a.shape, zero, memory_space=pltpu.VMEM)

    lane = pl.BlockSpec((tile, n), lambda i: (i32(i), i32(0)),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[const_spec(M), const_spec(dinv), lane, lane],
        out_specs=lane,
        out_shape=jax.ShapeDtypeStruct((Bp, n), dt),
        interpret=interpret,
    )(M, dinv, rhs, x0)
    if Bp != B:
        out = out[:B]
    return out[0] if squeeze else out
