"""Modified Ruiz equilibration (component K4, SURVEY.md §2.2; OSQP §5).

Scales the problem data so row/column infinity-norms of [P A; Aᵀ 0]
approach 1 plus a cost normalisation c — required in f32 on TPU to reach
1e-6 residuals robustly (SURVEY.md §7 "hard parts": f64 on TPU).

Scaled problem:  P̄ = c·D P D,  q̄ = c·D q,  Ā = E A D,  l̄ = E l,  ū = E u,
L1 weights λ̄ = c·λ/E. Recovery: x = D x̄, z = E⁻¹ z̄, y = c⁻¹ E ȳ.

SOC blocks must keep their cone geometry: a second-order cone is invariant
only under UNIFORM positive scaling, so E is forced constant within each
SOC block (geometric mean of the block's Ruiz factors) — the standard
SCS-style treatment.

Implemented as a fixed `lax.fori_loop` (static trip count) so the whole
equilibration jits into the solve prologue.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..problem import ConeSpec, QPData


def _scal_flatten(s):
    return ((s.d, s.e, s.c), None)


def _scal_unflatten(cls, aux, children):
    del aux
    return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Scaling:
    """Diagonal scaling state: d (n,), e (m,), cost scalar c."""

    d: jax.Array
    e: jax.Array
    c: jax.Array

    tree_flatten = _scal_flatten
    tree_unflatten = classmethod(_scal_unflatten)

    @classmethod
    def identity(cls, n, m, dtype):
        return cls(d=jnp.ones(n, dtype), e=jnp.ones(m, dtype),
                   c=jnp.ones((), dtype))

    # --- variable recovery (scaled -> unscaled) ---
    def unscale_x(self, xb):
        return self.d * xb

    def unscale_z(self, zb):
        return zb / self.e

    def unscale_y(self, yb):
        return (self.e / self.c) * yb

    # --- warm-start injection (unscaled -> scaled) ---
    def scale_x(self, x):
        return x / self.d

    def scale_z(self, z):
        return self.e * z

    def scale_y(self, y):
        return (self.c / self.e) * y


def _soc_block_uniform(e_step, cone: ConeSpec):
    """Replace per-row factors inside each SOC block by their geomean."""
    if not cone.soc_dims:
        return e_step
    mb = cone.m_box + cone.m_l1
    head = e_step[:mb]
    tail = e_step[mb:]
    parts = []
    if cone.soc_uniform:
        d = cone.soc_dims[0]
        blk = tail.reshape(cone.n_soc, d)
        g = jnp.exp(jnp.mean(jnp.log(blk), axis=1, keepdims=True))
        parts.append(jnp.broadcast_to(g, blk.shape).reshape(-1))
    else:
        off = 0
        for d in cone.soc_dims:
            blk = tail[off:off + d]
            g = jnp.exp(jnp.mean(jnp.log(blk)))
            parts.append(jnp.full((d,), g, e_step.dtype))
            off += d
    return jnp.concatenate([head] + parts)


def ruiz_equilibrate(qp: QPData, iters: int):
    """Return (scaled QPData, Scaling). iters=0 -> identity scaling."""
    n, m = qp.n, qp.m
    dtype = qp.dtype
    if iters <= 0:
        return qp, Scaling.identity(n, m, dtype)

    def norm_cols(M):
        return jnp.max(jnp.abs(M), axis=-2)

    def norm_rows(M):
        return jnp.max(jnp.abs(M), axis=-1)

    def safe_inv_sqrt(v):
        v = jnp.where((v < 1e-10) | ~jnp.isfinite(v), 1.0, v)
        return 1.0 / jnp.sqrt(v)

    def body(_, carry):
        P, q, A, d, e, c = carry
        # Column norms of the symmetric KKT block for the x variables.
        nx = jnp.maximum(norm_cols(P), norm_cols(A))
        dx = safe_inv_sqrt(nx)
        ne = norm_rows(A)
        de = safe_inv_sqrt(ne)
        de = _soc_block_uniform(de, qp.cone)
        P = dx[:, None] * P * dx[None, :]
        q = dx * q
        A = de[:, None] * A * dx[None, :]
        d = d * dx
        e = e * de
        # Cost normalisation (OSQP Alg. 2).
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(norm_cols(P)), jnp.max(jnp.abs(q))), 1e-10)
        P = gamma * P
        q = gamma * q
        c = c * gamma
        return P, q, A, d, e, c

    d0 = jnp.ones(n, dtype)
    e0 = jnp.ones(m, dtype)
    c0 = jnp.ones((), dtype)
    P, q, A, d, e, c = jax.lax.fori_loop(
        0, iters, body, (qp.P, qp.q, qp.A, d0, e0, c0))

    scaling = Scaling(d=d, e=e, c=c)
    l = jnp.where(jnp.isfinite(qp.l), e * qp.l, qp.l)
    u = jnp.where(jnp.isfinite(qp.u), e * qp.u, qp.u)
    mb, ml = qp.cone.m_box, qp.cone.m_l1
    lam = c * qp.lam / e[mb:mb + ml] if ml else qp.lam
    qps = QPData(P=P, q=q, A=A, l=l, u=u, lam=lam, cone=qp.cone)
    return qps, scaling
