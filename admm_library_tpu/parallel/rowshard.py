"""Intra-problem tensor sharding — P3 (SURVEY.md §2.2).

For a SINGLE QP too large for one chip, shard the constraint matrix A by
ROW blocks across the mesh (the tensor-parallel analog). The x-update
uses the matrix-free CG backend, whose operator

    M v = P v + sigma v + A^T diag(rho) (A v)

decomposes as: local SpMV A_loc v (device-local rows), local weighted
transpose A_loc^T (rho_loc * A_loc v), then one `psum` over the row axis
to assemble the full n-vector — one collective per CG step, riding ICI.
P stays replicated (it is n x n; for the condensed form it is usually
diagonal-dominant and small relative to A's m x n).

The z-update, y-update, and per-row prox are embarrassingly row-local;
global residual inf-norms are `pmax` reductions. rho enters the CG
operator directly, so adaptive rho needs no refactorisation (SURVEY.md
A4: "prefer CG — matrix-free, rho enters trivially"); this first
version runs fixed-rho with the equality boost.

Scaling is handled by the caller (pre-equilibrated or unit-normalised
builders), as in the consensus path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.prox import project_cone
from ..problem import ConeSpec, QPData
from ..settings import Settings
from ..solution import Status
from .. import xprec

_UNSOLVED = jnp.int32(int(Status.UNSOLVED))
_SOLVED = jnp.int32(int(Status.SOLVED))


def _pmax(v, axis):
    return jax.lax.pmax(jnp.max(jnp.abs(v)), axis)


def _cg_rowsharded(P_mat, A_loc, rho_loc, sigma, rhs, axis, tol, max_iter):
    """CG on the condensed operator with row-sharded A (replicated x).

    All devices carry identical copies of the CG vectors (n,); the only
    cross-device op is the psum inside the operator, so the iterates
    stay bitwise replicated.
    """

    def op(v):
        Av = xprec.matmul(A_loc, v)                                   # (m_loc,)
        At = xprec.matmul(rho_loc * Av, A_loc)                      # (n,) partial
        At = jax.lax.psum(At, axis)
        return xprec.matmul(P_mat, v) + sigma * v + At

    x = jnp.zeros_like(rhs)
    r = rhs - op(x)
    p = r
    rs = jnp.sum(r * r)
    tol2 = tol * tol * jnp.maximum(jnp.sum(rhs * rhs), 1.0)

    def cond(c):
        x, r, p, rs, it = c
        return (it < max_iter) & (rs > tol2)

    def body(c):
        x, r, p, rs, it = c
        Mp = op(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Mp), jnp.finfo(rs.dtype).tiny)
        x = x + alpha * p
        r = r - alpha * Mp
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, jnp.finfo(rs.dtype).tiny)) * p
        return x, r, p, rs_new, it + 1

    x, *_ = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0, jnp.int32)))
    return x


class RowShardSolution(NamedTuple):
    x: jax.Array            # (n,) replicated
    z: jax.Array            # (m,) row-assembled
    y: jax.Array            # (m,)
    status: jax.Array
    iters: jax.Array
    r_prim: jax.Array
    r_dual: jax.Array


def solve_rowsharded(qp: QPData, mesh: Mesh, settings: Settings = Settings(),
                     axis: str = "data") -> RowShardSolution:
    """Solve ONE large QP with A/l/u/rho sharded by constraint rows (P3).

    Constraints: the cone must be row-local under the sharding — box and
    L1 rows always are; SOC blocks must not straddle a shard boundary
    (m divisible by mesh size and blocks aligned). P is replicated.
    """
    ndev = mesh.shape[axis]
    m, n = qp.m, qp.n
    if m % ndev != 0:
        raise ValueError(f"m={m} rows not divisible by {ndev} devices")
    m_loc = m // ndev
    cone = qp.cone
    if cone.m_soc:
        # Every SOC block must live inside one shard.
        off = cone.m_box + cone.m_l1
        for d in cone.soc_dims:
            if off // m_loc != (off + d - 1) // m_loc:
                raise ValueError("SOC block straddles a row shard")
            off += d
    dtype = qp.dtype
    s = settings
    eq = (qp.l == qp.u) & jnp.isfinite(qp.l) & (
        jnp.arange(m) < cone.m_box)

    def local_cone(dev_lo):
        """Static per-device cone layout (box/L1/SOC row counts)."""
        lo, hi = dev_lo, dev_lo + m_loc
        nb = max(0, min(hi, cone.m_box) - lo)
        nl = max(0, min(hi, cone.m_box + cone.m_l1)
                 - max(lo, cone.m_box))
        socs = []
        off = cone.m_box + cone.m_l1
        for d in cone.soc_dims:
            if off >= lo and off < hi:
                socs.append(d)
            off += d
        return ConeSpec(m_box=nb, m_l1=nl, soc_dims=tuple(socs))

    # The cone layout must be identical on every device for SPMD; the
    # builders targeting P3 lay rows out so each shard sees the same
    # (box | L1 | SOC) pattern. Verify that here.
    cones = [local_cone(i * m_loc) for i in range(ndev)]
    if any(c != cones[0] for c in cones[1:]):
        raise ValueError(
            "row sharding requires a per-shard-uniform cone layout; "
            f"got {cones}")
    cone_loc = cones[0]

    def device_fn(P_mat, q, A_loc, l_loc, u_loc, lam_loc, rho_mask_loc):
        rho_bar = jnp.asarray(s.rho, dtype)
        x = jnp.zeros((n,), dtype)
        z = jnp.zeros((m_loc,), dtype)
        y = jnp.zeros((m_loc,), dtype)
        big = jnp.asarray(jnp.inf, dtype)
        k = s.check_every

        def rho_of(rb):
            return jnp.where(rho_mask_loc, s.rho_eq_scale * rb, rb)

        def iter_once(_, carry):
            x, z, y = carry
            rho_loc = rho_of(rho_bar)
            rhs_loc = xprec.matmul(rho_loc * z - y, A_loc)
            rhs = (s.sigma * x - q + jax.lax.psum(rhs_loc, axis))
            xt = _cg_rowsharded(P_mat, A_loc, rho_loc, s.sigma, rhs,
                                axis, s.cg_tol, s.cg_max_iter)
            zt = xprec.matmul(A_loc, xt)
            a = s.alpha
            x_new = a * xt + (1 - a) * x
            w = a * zt + (1 - a) * z
            v = w + y / rho_loc
            mb, nl = cone_loc.m_box, cone_loc.m_l1
            lam_r = (lam_loc[mb:mb + nl] / rho_loc[mb:mb + nl]
                     if nl else lam_loc[:0])
            z_new = project_cone(v, l_loc, u_loc, lam_r, cone_loc)
            y_new = y + rho_loc * (w - z_new)
            return x_new, z_new, y_new

        def cond(c):
            x, z, y, it, status, rp, rd = c
            return (status == _UNSOLVED) & (it < s.max_iter)

        def body(c):
            x, z, y, it, status, rp, rd = c
            x, z, y = jax.lax.fori_loop(0, k, iter_once, (x, z, y))
            it = it + k
            Ax = xprec.matmul(A_loc, x)
            Aty = jax.lax.psum(xprec.matmul(y, A_loc), axis)
            Px = xprec.matmul(P_mat, x)
            r_p = _pmax(Ax - z, axis)
            r_d = jnp.max(jnp.abs(Px + q + Aty))
            eps_p = s.eps_abs + s.eps_rel * jnp.maximum(
                _pmax(Ax, axis), _pmax(z, axis))
            eps_d = s.eps_abs + s.eps_rel * jnp.maximum(
                jnp.max(jnp.abs(Px)),
                jnp.maximum(jnp.max(jnp.abs(Aty)), jnp.max(jnp.abs(q))))
            solved = (r_p <= eps_p) & (r_d <= eps_d)
            status = jnp.where(solved, _SOLVED, _UNSOLVED)
            return x, z, y, it, status, r_p, r_d

        init = (x, z, y, jnp.int32(0), _UNSOLVED, big, big)
        x, z, y, it, status, rp, rd = jax.lax.while_loop(cond, body, init)
        status = jnp.where(
            status == _UNSOLVED, jnp.int32(int(Status.MAX_ITER)), status)
        return x, z, y, status, it, rp, rd

    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(axis), P(), P(), P(), P()),
        check_vma=False)
    lam_full = jnp.zeros((m,), dtype)
    if cone.m_l1:
        lam_full = lam_full.at[cone.m_box:cone.m_box + cone.m_l1].set(
            qp.lam)
    with xprec.highest():
        x, z, y, status, it, rp, rd = jax.jit(sharded)(
            qp.P, qp.q, qp.A, qp.l, qp.u, lam_full, eq)
    return RowShardSolution(x=x, z=z, y=y, status=status, iters=it,
                            r_prim=rp, r_dual=rd)
