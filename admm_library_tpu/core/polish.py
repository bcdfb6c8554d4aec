"""Solution polishing — A7 (SURVEY.md §2.2; OSQP §8 style).

First-order ADMM crawls through the last digits (LP-like min-fuel
problems spend tens of thousands of iterations between 1e-4 and 1e-6).
Polishing skips that tail: detect the active set at the current point,
then solve the equality-constrained reduced QP directly in f64.

TPU-static formulation: instead of slicing the active rows (dynamic
shapes), solve the weighted penalty system

    (P + delta I + A^T W A) x = -q_eff + A^T W b,
    W = diag(1/delta on active rows, 0 otherwise)

whose solution approaches the reduced-KKT solution as delta -> 0
(error O(delta * |y|)); two steps of iterative refinement in f64 push
the defect to machine level. L1 rows contribute exactly: rows clamped
at a bound behave like active box rows, rows at the kink (z = 0) are
fixed to zero, and rows in the smooth regime add lam * sign(z) to the
effective gradient with dual y = lam * sign(z). SOC blocks are not
polished (the cone boundary is curved); problems with SOC rows return
unpolished results unless every block is strictly interior.

The polished point is ACCEPTED only if it improves max(r_prim, r_dual)
— evaluated with the ordinary residual functions — so polish can never
make a solution worse.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problem import QPData
from .. import xprec
from ..solution import Solution, Status


def _residuals_unscaled(qp: QPData, x, z, y):
    Ax = xprec.einsum("...ij,...j->...i", qp.A, x)
    Px = xprec.einsum("...ij,...j->...i", qp.P, x)
    Aty = xprec.einsum("...ji,...j->...i", qp.A, y)
    r_p = jnp.max(jnp.abs(Ax - z), axis=-1)
    r_d = jnp.max(jnp.abs(Px + qp.q + Aty), axis=-1)
    return r_p, r_d


def polish(qp: QPData, sol: Solution, eps_abs: float, eps_rel: float,
           act_tol: float = 1e-4, delta: float = 1e-7) -> Solution:
    """Polish `sol` on the (f64) problem `qp`. Static shapes throughout.

    act_tol: relative distance for active-set detection;
    delta: AL penalty weight; multiplier passes push the defect to machine level.
    """
    with xprec.highest():
        return _polish_inner(qp, sol, eps_abs, eps_rel, act_tol, delta)


def _polish_inner(qp: QPData, sol: Solution, eps_abs: float, eps_rel: float,
                  act_tol: float, delta: float) -> Solution:
    cone = qp.cone
    mb, ml = cone.m_box, cone.m_l1
    dtype = qp.dtype
    x0, z0, y0 = sol.x, sol.z, sol.y

    span = jnp.where(
        jnp.isfinite(qp.u) & jnp.isfinite(qp.l), qp.u - qp.l, 1.0)
    tol = act_tol * jnp.maximum(span, 1.0)

    low_act = jnp.isfinite(qp.l) & (z0 - qp.l <= tol)
    up_act = jnp.isfinite(qp.u) & (qp.u - z0 <= tol)
    b = jnp.where(up_act, jnp.where(jnp.isfinite(qp.u), qp.u, 0.0),
                  jnp.where(jnp.isfinite(qp.l), qp.l, 0.0))
    act = low_act | up_act

    q_eff = qp.q
    lam_sign = jnp.zeros_like(z0)
    if ml:
        sl = slice(mb, mb + ml)
        z_l1 = z0[..., sl]
        at_kink = jnp.abs(z_l1) <= tol[..., sl]
        # Kink rows become equalities to 0; smooth rows contribute the
        # fixed subgradient lam*sign(z).
        act = act.at[..., sl].set(act[..., sl] | at_kink)
        b = b.at[..., sl].set(jnp.where(at_kink, 0.0, b[..., sl]))
        sg = jnp.where(at_kink, 0.0, qp.lam * jnp.sign(z_l1))
        lam_sign = lam_sign.at[..., sl].set(sg)
        q_eff = q_eff + xprec.einsum(
            "...ji,...j->...i", qp.A,
            lam_sign)
    if cone.m_soc:
        # Only strictly-interior SOC blocks are safe to ignore; if any
        # block is on the boundary, bail out (return sol unchanged)
        # via the acceptance test naturally failing -> keep it simple:
        # never activate SOC rows; their y is kept, and acceptance
        # decides.
        act = act.at[..., mb + ml:].set(False)

    w = jnp.where(act, 1.0 / delta, 0.0)
    M = (qp.P + delta * jnp.eye(qp.n, dtype=dtype)
         + xprec.einsum("...ji,...j,...jk->...ik", qp.A, w, qp.A))
    L = jnp.linalg.cholesky(M)

    def solve_M(r):
        from jax.scipy.linalg import solve_triangular
        t = solve_triangular(L, r[..., None], lower=True)
        return solve_triangular(L, t, lower=True, trans=1)[..., 0]

    # Augmented-Lagrangian passes on the active rows: each pass reuses
    # the cached factor and shrinks the constraint defect by ~O(delta
    # * kappa), so a moderate delta (stable to factor even when P is
    # singular on the state block, e.g. min-energy MPC) still reaches
    # machine-level defects — a single penalty solve at delta=1e-9
    # had cond(M) ~ 1/delta^2 and was rejected by the acceptance test.
    y_mult = jnp.zeros_like(z0)
    x = jnp.zeros_like(x0)
    for _ in range(3):
        rhs = -q_eff + xprec.einsum(
            "...ji,...j->...i", qp.A, w * b - jnp.where(act, y_mult, 0.0))
        x = solve_M(rhs)
        for _ in range(2):                  # iterative refinement, f64
            r = rhs - xprec.einsum("...ij,...j->...i", M, x)
            x = x + solve_M(r)
        Ax = xprec.einsum("...ij,...j->...i", qp.A, x)
        y_mult = y_mult + w * (Ax - b)

    y = jnp.where(act, y_mult, 0.0) + lam_sign
    if cone.m_soc:
        y = y.at[..., mb + ml:].set(y0[..., mb + ml:])
    z = jnp.where(act, b, Ax)
    if ml:
        sl = slice(mb, mb + ml)
        z = z.at[..., sl].set(jnp.where(act[..., sl], b[..., sl],
                                        Ax[..., sl]))

    from .admm import l1_grad_scale_raw
    nlam = l1_grad_scale_raw(qp)

    def _crit(xc, zc, yc):
        Axc = xprec.einsum("...ij,...j->...i", qp.A, xc)
        Pxc = xprec.einsum("...ij,...j->...i", qp.P, xc)
        Atyc = xprec.einsum("...ji,...j->...i", qp.A, yc)
        r_p = jnp.max(jnp.abs(Axc - zc), axis=-1)
        r_d = jnp.max(jnp.abs(Pxc + qp.q + Atyc), axis=-1)
        eps_p = eps_abs + eps_rel * jnp.maximum(
            jnp.max(jnp.abs(Axc), axis=-1), jnp.max(jnp.abs(zc), axis=-1))
        # eps_d reference matches the solver loop's (incl. the L1
        # gradient scale — core.admm.l1_grad_scale) or polish would
        # veto loop-SOLVED points on min-fuel LPs.
        eps_d = eps_abs + eps_rel * jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(Pxc), axis=-1),
            jnp.max(jnp.abs(Atyc), axis=-1)),
            jnp.maximum(jnp.max(jnp.abs(qp.q), axis=-1), nlam))
        return r_p, r_d, (r_p <= eps_p) & (r_d <= eps_d)

    r_p0, r_d0, solved0 = _crit(x0, z0, y0)
    r_p1, r_d1, solved1 = _crit(x, z, y)
    finite = jnp.all(jnp.isfinite(x), axis=-1)
    # ACCEPT only a polished point that outright satisfies the stopping
    # criterion (and beats an already-solved input). A merely-improved
    # but unconverged polish carries 1/delta-scaled duals from a
    # misidentified active set — poisonous as a warm start (observed:
    # it sent the f64 phase into a 40k-iteration stall on the CW
    # min-fuel problem).
    accepted = finite & solved1 & (
        ~solved0 | (jnp.maximum(r_p1, r_d1) < jnp.maximum(r_p0, r_d0)))

    def pick(a, b_):
        bb = accepted
        while bb.ndim < a.ndim:
            bb = bb[..., None]
        return jnp.where(bb, a, b_)

    x_f, z_f, y_f = pick(x, x0), pick(z, z0), pick(y, y0)
    r_p = jnp.where(accepted, r_p1, r_p0)
    r_d = jnp.where(accepted, r_d1, r_d0)
    solved_now = jnp.where(accepted, solved1, solved0)
    # Status reflects THIS eps, not the caller's earlier (possibly
    # relaxed-phase) criterion: only infeasibility verdicts pass
    # through; an unconverged point reports MAX_ITER.
    passthrough = jnp.isin(
        sol.status, jnp.asarray([int(Status.PRIMAL_INFEASIBLE),
                                 int(Status.DUAL_INFEASIBLE),
                                 int(Status.NUMERICAL_ERROR)], jnp.int32))
    status = jnp.where(
        solved_now, jnp.int32(int(Status.SOLVED)),
        jnp.where(passthrough, sol.status,
                  jnp.int32(int(Status.MAX_ITER))))

    from ..problem import objective
    return Solution(
        x=x_f, z=z_f, y=y_f, status=status, iters=sol.iters,
        r_prim=r_p, r_dual=r_d, obj=objective(qp, x_f, z_f),
        rho=sol.rho, history=sol.history)
