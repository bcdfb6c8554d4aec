"""Consensus ADMM over time-partitioned horizon blocks — P2 (SURVEY.md §3.3).

The long-horizon optimal-control analog of sequence/context parallelism:
the horizon [0, N) is split into B contiguous blocks, each block owns its
segment's controls/states plus a DUPLICATED copy of its left boundary
state, and the duplicates are forced to agree through the ADMM z-update.

The key structural choice (what makes this TPU-native): the constraint
matrix stays BLOCK-LOCAL — consensus never appears in A. Each block's
row space is

    [ local rows (box/L1/SOC) | left-edge rows (ns) | right-edge rows (ns) ]

where the edge rows just read the boundary-copy variables. The agreement
constraint z_i^R == z_{i+1}^L is an indicator of a linear subspace whose
Euclidean projection is the pairwise AVERAGE of the two copies — a valid
prox, evaluated with one `ppermute` neighbor exchange per direction per
iteration. Consequences:

  * the x-update KKT matrix M_b = P_b + sigma I + A_b^T rho A_b is block
    diagonal across the mesh -> each device factors/solves only its own
    blocks (device-local, zero communication);
  * per-iteration cross-chip traffic is exactly two ns-sized `ppermute`s
    (edge exchange) + scalar `pmax` residual reductions over ICI —
    matching BASELINE.json "north_star" ("consensus-ADMM over
    time-partitioned horizon blocks with psum/all-gather residual
    reductions over ICI");
  * both sides of a pair compute average((a, b)) with identical IEEE
    arithmetic, so the duplicates stay bitwise equal — no drift.

Global end conditions close the recursion: block 0's left-edge rows are
an ordinary equality to s0, block B-1's right-edge rows an equality to
s_target (selected by masks, so the per-block program stays uniform SPMD).

Scaling: ONE block-shared Ruiz equilibration (core.scaling.
ruiz_equilibrate_blocks) is computed jointly over all blocks, with the
left/right edge-row factors tied so the duplicated boundary copies live
on identical scales — the averaging projection stays exact. Residuals
and termination are evaluated on UNSCALED quantities.

Precision: the default 'hybrid' runs every hot iteration in f32 and
closes the gap to the target eps with RE-CENTERED f32 refinement rounds
(the same trick as parallel/batch.py): each round re-solves the SAME
block problem with data shifted around the accumulated (x, y) — the
consensus averaging is a linear-subspace projection, which shifts
affinely, so the rounds handle the agreement rows exactly via a z-space
offset. No f64 iteration phase runs (TPU f64 is XLA-emulated AND this
stack cannot lower f64 Max all-reduces at all).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import kkt
from .. import xprec
from ..core.scaling import (Scaling, ruiz_equilibrate_blocks,
                            scale_qp_blocks)
from ..ops.prox import project_cone
from ..problem import ConeSpec, QPData
from ..settings import Settings
from ..solution import Status

_UNSOLVED = np.int32(int(Status.UNSOLVED))
_SOLVED = np.int32(int(Status.SOLVED))


@dataclasses.dataclass(frozen=True)
class ConsensusSpec:
    """Static layout of a block-partitioned consensus problem.

    Every block has the same shapes: nb local variables, mb = m_local +
    2*ns rows laid out [local | left-edge | right-edge]. `cone` describes
    the LOCAL rows only.
    """

    n_blocks: int
    nb: int                 # variables per block
    m_local: int            # local constraint rows per block
    ns: int                 # boundary state dimension
    cone: ConeSpec          # cone of the local rows

    @property
    def mb(self) -> int:
        return self.m_local + 2 * self.ns

    def __hash__(self):
        return hash((self.n_blocks, self.nb, self.m_local, self.ns,
                     self.cone))


class ConsensusCarry(NamedTuple):
    x: jax.Array            # (S, nb) blocks on this device
    z: jax.Array            # (S, mb)
    y: jax.Array            # (S, mb)
    rho_bar: jax.Array
    fac: dict
    it: jax.Array
    status: jax.Array       # scalar (global)
    r_prim: jax.Array
    r_dual: jax.Array
    x_sum: jax.Array        # running iterate sums for restarted
    z_sum: jax.Array        # averaging (Settings.restart_every)
    y_sum: jax.Array
    avg_cnt: jax.Array
    x_chk: jax.Array        # iterates at the previous check (A6 deltas)
    y_chk: jax.Array
    hist: jax.Array         # (slots, 3) residual ring buffer
    hist_ptr: jax.Array


def _neighbor_prev(v_edge, axis: str):
    """Value of `v_edge` from the PREVIOUS block (device-cyclic).

    v_edge: (..., S, ns) per device, blocks contiguous on axis -2.
    Returns the same shape where slot s holds block s-1's value; slot 0
    receives the previous device's last block via ppermute. Cyclic wrap
    is harmless: block 0 masks it.
    """
    ndev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    from_prev_dev = jax.lax.ppermute(v_edge[..., -1:, :], axis, perm)
    return jnp.concatenate(
        [from_prev_dev, v_edge[..., :-1, :]], axis=-2)


def _neighbor_next(v_edge, axis: str):
    """Value of `v_edge` from the NEXT block (device-cyclic)."""
    ndev = jax.lax.axis_size(axis)
    perm = [(i, (i - 1) % ndev) for i in range(ndev)]
    from_next_dev = jax.lax.ppermute(v_edge[..., :1, :], axis, perm)
    return jnp.concatenate(
        [v_edge[..., 1:, :], from_next_dev], axis=-2)


def _pmax(v, axis: str):
    """Cross-device max. This TPU stack lowers only Sum all-reduces in
    f64 (Max is rejected by the AOT compiler), so f64 reductions ride a
    f32 pmax — a 2^-24 relative rounding on a termination threshold."""
    if v.dtype == jnp.float64 and jax.default_backend() == "tpu":
        return jax.lax.pmax(v.astype(jnp.float32), axis).astype(v.dtype)
    return jax.lax.pmax(v, axis)


def _linf_global(v, axis: str):
    return _pmax(jnp.max(jnp.abs(v)), axis)


def _linf_scen(v, axis: str):
    """Per-scenario inf-norm: max over the trailing (blocks, rows) axes
    locally, then pmax over the horizon mesh axis."""
    return _pmax(jnp.max(jnp.abs(v), axis=(-2, -1)), axis)


def infeasibility_blocks(qp_blk: QPData, spec: ConsensusSpec,
                         settings: Settings, axis: str, block_ids,
                         scaling_vecs, dx, dy):
    """OSQP §3.4 infeasibility certificates for the block-partitioned
    problem (A6 on P2; VERDICT r2 item 5). dx (..., S, nb) and dy
    (..., S, mb) are SCALED iterate deltas over a check interval; any
    leading scenario axis broadcasts, and the trailing (block, row)
    axes reduce locally + across the horizon mesh axis, so every device
    returns identical per-scenario verdicts.

    The block problem's constraint set is: local cones on local rows,
    equality bounds on the END edge rows, and the pairwise AGREEMENT
    subspace on interior edge rows. Certificate conditions follow:
      primal (ray dy):  ‖A_bᵀdy_b‖∞ ≈ 0 per block;
                        dy_R(b) + dy_L(b+1) ≈ 0 on agreement pairs
                        (the subspace's dual is its orthogonal
                        complement, the ANTI-diagonal);
                        support over local rows + end equalities < 0.
      dual (ray dx):    ‖P dx‖∞ ≈ 0; qᵀdx < 0;
                        (A dx) in the recession cone of local rows;
                        (A dx) = 0 on end equalities;
                        (A dx)_R(b) = (A dx)_L(b+1) on agreement pairs.
    """
    ml, ns = spec.m_local, spec.ns
    cone = spec.cone
    dtype = dx.dtype
    d_s, e_s, c_s = scaling_vecs
    einv = 1.0 / e_s
    cd_inv = 1.0 / (c_s * d_s)
    eps_pi = jnp.asarray(settings.eps_pinf, dtype)
    eps_di = jnp.asarray(settings.eps_dinf, dtype)
    tiny = jnp.finfo(dtype).tiny
    mbl = cone.m_box + cone.m_l1
    is_first = (block_ids == 0)[:, None]
    is_last = (block_ids == spec.n_blocks - 1)[:, None]

    def linf_g(v):
        return _linf_scen(v, axis)

    def sum_g(v):
        return jax.lax.psum(jnp.sum(v, axis=(-2, -1)), axis)

    # ---- primal infeasibility from dy ----
    dy_u = (e_s / c_s) * dy
    ndy = linf_g(dy_u)
    dyn = dy_u / jnp.maximum(ndy, tiny)[..., None, None]
    Aty = xprec.einsum("...ji,...j->...i", qp_blk.A,
                       (c_s / e_s) * dyn) * cd_inv
    cond_A = linf_g(Aty) <= eps_pi
    # Pair condition on agreement rows (masked on end blocks).
    dyn_L, dyn_R = dyn[..., ml:ml + ns], dyn[..., ml + ns:]
    pair = dyn_R + _neighbor_next(dyn_L, axis)
    pair = jnp.where(is_last, 0.0, pair)
    cond_pair = linf_g(pair) <= eps_pi
    # Support: local box(+L1) rows + END equality edge rows.
    lu_l = qp_blk.l * einv
    lu_u = qp_blk.u * einv
    big = jnp.asarray(jnp.inf, dtype)

    def support(rows_dyn, rows_l, rows_u, mask):
        pos = rows_dyn > eps_pi
        neg = rows_dyn < -eps_pi
        up = jnp.where(pos, jnp.where(jnp.isfinite(rows_u),
                                      rows_u * rows_dyn, big), 0.0)
        lo = jnp.where(neg, jnp.where(jnp.isfinite(rows_l),
                                      rows_l * rows_dyn, big), 0.0)
        return sum_g(jnp.where(mask, up + lo, 0.0))

    sup = support(dyn[..., :mbl], lu_l[..., :mbl], lu_u[..., :mbl], True)
    sup = sup + support(dyn[..., ml:ml + ns], lu_l[..., ml:ml + ns],
                        lu_u[..., ml:ml + ns], is_first)
    sup = sup + support(dyn[..., ml + ns:], lu_l[..., ml + ns:],
                        lu_u[..., ml + ns:], is_last)
    if cone.m_soc:
        d_soc = cone.soc_dims[0]
        soc = dyn[..., mbl:ml]
        blk = soc.reshape(soc.shape[:-1] + (cone.n_soc, d_soc))
        ok = (jnp.linalg.norm(blk[..., 1:], axis=-1)
              <= -blk[..., 0] + eps_pi)
        nbad = jax.lax.psum(
            jnp.sum((~ok).astype(jnp.int32), axis=(-2, -1)), axis)
        sup = jnp.where(nbad > 0, jnp.inf, sup)
    pinf = (ndy > 0) & cond_A & cond_pair & (sup <= eps_pi)

    # ---- dual infeasibility from dx ----
    dx_u = d_s * dx
    ndx = linf_g(dx_u)
    dxn = dx_u / jnp.maximum(ndx, tiny)[..., None, None]
    Pdx = xprec.einsum("...ij,...j->...i", qp_blk.P, dxn / d_s) * cd_inv
    cond_P = linf_g(Pdx) <= eps_di
    Adx = einv * xprec.einsum("...ij,...j->...i", qp_blk.A, dxn / d_s)
    qdx = sum_g((cd_inv * qp_blk.q) * dxn)
    if cone.m_l1:
        sl = slice(cone.m_box, mbl)
        lam_u = qp_blk.lam * e_s[sl] / c_s
        qdx = qdx + sum_g(lam_u * jnp.abs(Adx[..., sl]))
    cond_q = qdx <= -eps_di

    def recession_ok(rows_Adx, rows_l, rows_u, mask):
        ok_up = (rows_Adx <= eps_di) | ~jnp.isfinite(rows_u)
        ok_lo = (rows_Adx >= -eps_di) | ~jnp.isfinite(rows_l)
        nbad = jax.lax.psum(jnp.sum(
            (mask & ~(ok_up & ok_lo)).astype(jnp.int32), axis=(-2, -1)),
            axis)
        return nbad == 0

    cond_box = recession_ok(Adx[..., :mbl], lu_l[..., :mbl],
                            lu_u[..., :mbl], jnp.asarray(True))
    cond_box &= recession_ok(Adx[..., ml:ml + ns], lu_l[..., ml:ml + ns],
                             lu_u[..., ml:ml + ns], is_first)
    cond_box &= recession_ok(Adx[..., ml + ns:], lu_l[..., ml + ns:],
                             lu_u[..., ml + ns:], is_last)
    AdxL, AdxR = Adx[..., ml:ml + ns], Adx[..., ml + ns:]
    dpair = AdxR - _neighbor_next(AdxL, axis)
    dpair = jnp.where(is_last, 0.0, dpair)
    cond_dpair = linf_g(dpair) <= eps_di
    cond_soc = jnp.asarray(True)
    if cone.m_soc:
        d_soc = cone.soc_dims[0]
        soc = Adx[..., mbl:ml]
        blk = soc.reshape(soc.shape[:-1] + (cone.n_soc, d_soc))
        ok = (jnp.linalg.norm(blk[..., 1:], axis=-1)
              <= blk[..., 0] + eps_di)
        cond_soc = jax.lax.psum(jnp.sum(
            (~ok).astype(jnp.int32), axis=(-2, -1)), axis) == 0
    dinf = (ndx > 0) & cond_P & cond_q & cond_box & cond_dpair & cond_soc
    return pinf, dinf


def consensus_body(qp_blk: QPData, spec: ConsensusSpec, settings: Settings,
                   axis: str, block_ids, fac, x, z, y, rho_vec, backend,
                   z_off=None):
    """One consensus-ADMM iteration on this device's S blocks.

    block_ids: (S,) global indices of the local blocks (for end masks).
    Iterates carry a local (S, .) layout, optionally with an extra
    leading scenario axis (B, S, .) — all ops broadcast over it; the
    per-block data (P, A, q, factor, rho_vec) stay shared across
    scenarios (the Monte-Carlo shape: dispersions enter only l/u).

    z_off: optional (..., mb) SCALED re-centering offset (= A x_prev of
    the outer iterate). Local box rows shift through the bounds (the
    caller passes l/u already shifted); the agreement rows shift through
    this offset: the correction's consensus set is {z_c : z_c + off in
    agreement}, an affine subspace whose projection is
    avg((v + off) pairs) - off.
    """
    ml, ns = spec.m_local, spec.ns
    a = settings.alpha
    is_first = (block_ids == 0)[:, None]                    # (S, 1)
    is_last = (block_ids == spec.n_blocks - 1)[:, None]

    rhs = (settings.sigma * x - qp_blk.q
           + xprec.einsum("...ji,...j->...i", qp_blk.A, rho_vec * z - y))
    xt = kkt.solve_condensed(
        fac, rhs, backend, refine_steps=settings.refine_steps,
        cg_tol=settings.cg_tol, cg_max_iter=settings.cg_max_iter)
    zt = xprec.einsum("...ij,...j->...i", qp_blk.A, xt)
    x_new = a * xt + (1.0 - a) * x
    w = a * zt + (1.0 - a) * z
    v = w + y / rho_vec

    # --- z-update ---
    v_loc = v[..., :ml]
    v_left = v[..., ml:ml + ns]
    v_right = v[..., ml + ns:]
    cone = spec.cone
    mb_box = cone.m_box
    lam_over_rho = (qp_blk.lam / rho_vec[..., mb_box:mb_box + cone.m_l1]
                    if cone.m_l1 else qp_blk.lam)
    z_loc = project_cone(
        v_loc, qp_blk.l[..., :ml], qp_blk.u[..., :ml], lam_over_rho, cone)

    # Consensus averaging with neighbors; global ends clamp to the
    # equality bounds stored in l(==u) of the edge rows. Under
    # re-centering the averaging happens in total coordinates (v + off)
    # and the offset is subtracted back out.
    if z_off is not None:
        off_left = z_off[..., ml:ml + ns]
        off_right = z_off[..., ml + ns:]
        v_left = v_left + off_left
        v_right = v_right + off_right
    right_prev = _neighbor_prev(v_right, axis)      # block s-1's right edge
    left_next = _neighbor_next(v_left, axis)        # block s+1's left edge
    avg_left = 0.5 * (v_left + right_prev)
    avg_right = 0.5 * (v_right + left_next)
    if z_off is not None:
        avg_left = avg_left - off_left
        avg_right = avg_right - off_right
    l_left = qp_blk.l[..., ml:ml + ns]
    l_right = qp_blk.l[..., ml + ns:]
    z_left = jnp.where(is_first, l_left, avg_left)
    z_right = jnp.where(is_last, l_right, avg_right)

    z_new = jnp.concatenate([z_loc, z_left, z_right], axis=-1)
    y_new = y + rho_vec * (w - z_new)
    return x_new, z_new, y_new


def run_consensus(qp_blk: QPData, spec: ConsensusSpec, settings: Settings,
                  axis: str, block_ids, x0, z0, y0, backend: str,
                  scaling_vecs, z_off=None, rho0=None) -> ConsensusCarry:
    """Device-local driver (runs INSIDE shard_map). Lockstep while_loop;
    the predicate uses pmax-reduced global residuals so every device
    iterates identically. scaling_vecs = (d, e, c) of the block-shared
    Ruiz scaling; residuals/termination are computed UNSCALED."""
    dtype = qp_blk.dtype
    ml, ns = spec.m_local, spec.ns
    d_s, e_s, c_s = scaling_vecs
    einv = 1.0 / e_s
    cd_inv = 1.0 / (c_s * d_s)

    # Equality boost: local box rows with l == u, plus ALL edge rows
    # (consensus/agreement rows are equality-like).
    idx = jnp.arange(spec.mb)
    box_eq = (qp_blk.l == qp_blk.u) & jnp.isfinite(qp_blk.l) & (
        idx[None, :] < spec.cone.m_box)
    edge = idx[None, :] >= ml
    eq_mask = box_eq | edge

    rho0 = (jnp.asarray(settings.rho, dtype) if rho0 is None
            else rho0.astype(dtype))
    edge_scale = (settings.rho_edge_scale if settings.rho_edge_scale > 0
                  else settings.rho_eq_scale)

    def rho_vec_of(rho_bar):
        return jnp.where(box_eq, settings.rho_eq_scale * rho_bar,
                         jnp.where(edge, edge_scale * rho_bar, rho_bar))

    def factor(rho_bar):
        rv = rho_vec_of(rho_bar)
        return kkt.factor_condensed(
            qp_blk.P, qp_blk.A, settings.sigma, rv, backend,
            settings.band_block), rv

    fac0, _ = factor(rho0)
    # L1 gradient scale for the dual-norm reference (see
    # core.admm.l1_grad_scale — prevents the rho-balancing collapse on
    # min-fuel LPs). Block-local L1 rows live at [m_box, m_box+m_l1) of
    # the local segment; pmax over the horizon axis for the global max.
    cone_loc = spec.cone
    if cone_loc.m_l1:
        mb_box = cone_loc.m_box
        lamA = jnp.max(
            qp_blk.lam[..., :, None]
            * jnp.abs(qp_blk.A[..., mb_box:mb_box + cone_loc.m_l1, :]),
            axis=(-3, -2))
        nlam = _pmax(jnp.max(jnp.abs(cd_inv * lamA)), axis)
    else:
        nlam = jnp.zeros((), dtype)
    big = jnp.asarray(jnp.inf, dtype)
    slots = max(settings.history, 0)
    carry0 = ConsensusCarry(
        x=x0, z=z0, y=y0, rho_bar=rho0, fac=fac0, it=jnp.int32(0),
        status=_UNSOLVED, r_prim=big, r_dual=big,
        x_sum=jnp.zeros_like(x0), z_sum=jnp.zeros_like(z0),
        y_sum=jnp.zeros_like(y0), avg_cnt=jnp.int32(0),
        x_chk=x0, y_chk=y0,
        hist=jnp.full((slots, 3), -1.0, dtype), hist_ptr=jnp.int32(0))
    use_cert = settings.eps_pinf > 0 or settings.eps_dinf > 0

    k = settings.check_every
    interval_checks = max(1, settings.adaptive_rho_interval // k)
    restart_checks = settings.restart_every and max(
        1, settings.restart_every // k)

    def global_res(x, z, y):
        """Globally-reduced unscaled residual norms (7-tuple)."""
        Ax = xprec.einsum("sij,sj->si", qp_blk.A, x)
        Px = xprec.einsum("sij,sj->si", qp_blk.P, x)
        Aty = xprec.einsum("sji,sj->si", qp_blk.A, y)
        r_prim = _linf_global(einv * (Ax - z), axis)
        r_dual = _linf_global(cd_inv * (Px + qp_blk.q + Aty), axis)
        nAx = _linf_global(einv * Ax, axis)
        nz = _linf_global(einv * z, axis)
        nPx = _linf_global(cd_inv * Px, axis)
        nAty = _linf_global(cd_inv * Aty, axis)
        nq = jnp.maximum(_linf_global(cd_inv * qp_blk.q, axis), nlam)
        return r_prim, r_dual, nAx, nz, nPx, nAty, nq

    def scaled_ratio(res):
        r_prim, r_dual, nAx, nz, nPx, nAty, nq = res
        eps_p = settings.eps_abs + settings.eps_rel * jnp.maximum(nAx, nz)
        eps_d = settings.eps_abs + settings.eps_rel * jnp.maximum(
            jnp.maximum(nPx, nAty), nq)
        return jnp.maximum(r_prim / eps_p, r_dual / eps_d), eps_p, eps_d

    def cond(c: ConsensusCarry):
        return (c.status == _UNSOLVED) & (c.it < settings.max_iter)

    def body(c: ConsensusCarry) -> ConsensusCarry:
        rho_vec = rho_vec_of(c.rho_bar)

        def inner(_, xyz):
            return consensus_body(
                qp_blk, spec, settings, axis, block_ids, c.fac,
                *xyz, rho_vec, backend, z_off=z_off)

        x, z, y = jax.lax.fori_loop(0, k, inner, (c.x, c.z, c.y))
        it = c.it + k

        res = global_res(x, z, y)

        # Certificates use PRE-restart deltas (a restart replaces the
        # iterate with a window average, which wrecks the delta ray of
        # a divergent run) — computed here, applied to status below.
        if use_cert:
            pinf, dinf = infeasibility_blocks(
                qp_blk, spec, settings, axis, block_ids,
                (d_s, e_s, c_s), x - c.x_chk, y - c.y_chk)
        x_chk_new, y_chk_new = x, y

        # Restarted averaging (Settings.restart_every; cf. core.admm.
        # run_admm). The scaled-ratio comparison uses globally-reduced
        # norms, so every device computes the identical take decision —
        # the restart stays bitwise-replicated across the mesh. The
        # average preserves the agreement-row pairing (both copies
        # averaged identically on both devices).
        x_sum = c.x_sum + x
        z_sum = c.z_sum + z
        y_sum = c.y_sum + y
        cnt = c.avg_cnt + 1
        if restart_checks:
            boundary = (c.it // k) % restart_checks == restart_checks - 1

            def try_restart(args):
                x, z, y, res, xs, zs, ys, cnt = args
                denom = jnp.maximum(cnt, 1).astype(dtype)
                xa, za, ya = xs / denom, zs / denom, ys / denom
                res_a = global_res(xa, za, ya)
                take = scaled_ratio(res_a)[0] < scaled_ratio(res)[0]
                pick = lambda a, b: jnp.where(take, a, b)
                res_o = tuple(pick(ra, rc)
                              for ra, rc in zip(res_a[:6], res[:6])
                              ) + (res[6],)
                zero = lambda v: jnp.zeros_like(v)
                return (pick(xa, x), pick(za, z), pick(ya, y), res_o,
                        zero(xs), zero(zs), zero(ys), jnp.int32(0))

            x, z, y, res, x_sum, z_sum, y_sum, cnt = jax.lax.cond(
                boundary, try_restart, lambda a: a,
                (x, z, y, res, x_sum, z_sum, y_sum, cnt))

        r_prim, r_dual, nAx, nz, nPx, nAty, nq = res
        eps_p = settings.eps_abs + settings.eps_rel * jnp.maximum(nAx, nz)
        eps_d = settings.eps_abs + settings.eps_rel * jnp.maximum(
            jnp.maximum(nPx, nAty), nq)
        solved = (r_prim <= eps_p) & (r_dual <= eps_d)
        numerr = ~(jnp.isfinite(r_prim) & jnp.isfinite(r_dual))
        status = jnp.where(
            numerr, jnp.int32(int(Status.NUMERICAL_ERROR)),
            jnp.where(solved, _SOLVED, _UNSOLVED))
        if use_cert:
            status = jnp.where(
                status == _UNSOLVED,
                jnp.where(pinf, jnp.int32(int(Status.PRIMAL_INFEASIBLE)),
                          jnp.where(dinf,
                                    jnp.int32(int(Status.DUAL_INFEASIBLE)),
                                    status)), status)

        rho_bar, fac = c.rho_bar, c.fac
        if settings.adaptive_rho:
            adapt_now = (c.it // k) % interval_checks == (interval_checks - 1)
            tiny = jnp.finfo(dtype).tiny
            sp = r_prim / jnp.maximum(jnp.maximum(nAx, nz), tiny)
            sd = r_dual / jnp.maximum(
                jnp.maximum(jnp.maximum(nPx, nAty), nq), tiny)
            ratio = jnp.sqrt(sp / jnp.maximum(sd, tiny))
            new_rho = jnp.clip(
                rho_bar * ratio, settings.rho_min, settings.rho_max)
            tol = settings.adaptive_rho_tol
            changed = (ratio > tol) | (ratio < 1.0 / tol)
            do = adapt_now & changed & (status == _UNSOLVED)
            if backend == "cg":
                rho_bar = jnp.where(do, new_rho, rho_bar)
                fac = dict(c.fac, rho=rho_vec_of(rho_bar))
            else:
                fac = jax.lax.cond(
                    do, lambda r: factor(r)[0], lambda r: fac, new_rho)
                rho_bar = jnp.where(do, new_rho, rho_bar)

        if slots > 0:
            entry = jnp.stack([it.astype(dtype), r_prim, r_dual])
            hist = jax.lax.dynamic_update_slice(
                c.hist, entry[None, :], (c.hist_ptr % slots, jnp.int32(0)))
            hist_ptr = c.hist_ptr + 1
        else:
            hist, hist_ptr = c.hist, c.hist_ptr

        return ConsensusCarry(
            x=x, z=z, y=y, rho_bar=rho_bar, fac=fac, it=it, status=status,
            r_prim=r_prim, r_dual=r_dual,
            x_sum=x_sum, z_sum=z_sum, y_sum=y_sum, avg_cnt=cnt,
            x_chk=x_chk_new, y_chk=y_chk_new,
            hist=hist, hist_ptr=hist_ptr)

    final = jax.lax.while_loop(cond, body, carry0)
    status = jnp.where(
        final.status == _UNSOLVED, jnp.int32(int(Status.MAX_ITER)),
        final.status)
    return final._replace(status=status)


class ConsensusSolution(NamedTuple):
    """Result of a consensus solve; x/z/y keep the (B, .) block layout
    and are UNSCALED. history is the (slots, 3) residual ring buffer
    [(iter, r_prim, r_dual)] when settings.history > 0."""

    x: jax.Array
    z: jax.Array
    y: jax.Array
    status: jax.Array
    iters: jax.Array
    r_prim: jax.Array
    r_dual: jax.Array
    rho: jax.Array
    history: jax.Array


@partial(jax.jit, static_argnames=("spec", "settings", "axis", "backend",
                                   "mesh", "has_off"))
def _phase_jit(qp_blk, x0, z0, y0, z_off, rho0, scaling, spec, settings,
               axis, backend, mesh, has_off):
    """Jitted phase: scale warm starts, run the shard_map'd device loop,
    unscale outputs. Module-level jit => retraces only per (shapes,
    settings, mesh) combination, so staged drivers and benches reuse the
    compiled program across phases/rounds."""
    B = spec.n_blocks
    dtype = qp_blk.dtype
    block_ids = jnp.arange(B, dtype=jnp.int32)
    d_s = scaling.d.astype(dtype)
    e_s = scaling.e.astype(dtype)
    c_s = scaling.c.astype(dtype)

    xs = (x0 / d_s).astype(dtype)
    zs = (e_s * z0).astype(dtype)
    ys = ((c_s / e_s) * y0).astype(dtype)
    offs = (e_s * z_off).astype(dtype) if has_off else jnp.zeros(
        (), dtype)

    def device_fn(qp_loc, ids, x, z, y, d_v, e_v, c_v, off, r0):
        carry = run_consensus(
            qp_loc, spec, settings, axis, ids, x, z, y, backend,
            (d_v, e_v, c_v), z_off=(off if has_off else None), rho0=r0)
        return (carry.x, carry.z, carry.y, carry.status, carry.it,
                carry.r_prim, carry.r_dual, carry.rho_bar, carry.hist)

    PH = P(axis)
    off_spec = PH if has_off else P()
    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: PH, qp_blk),
                  PH, PH, PH, PH, P(), P(), P(), off_spec, P()),
        out_specs=(PH, PH, PH, P(), P(), P(), P(), P(), P()),
        check_vma=False)
    with xprec.highest():
        x, z, y, status, it, rp, rd, rho, hist = sharded(
            qp_blk, block_ids, xs, zs, ys, d_s, e_s, c_s, offs, rho0)
    return (d_s * x, z / e_s, (e_s / c_s) * y, status, it, rp, rd, rho,
            hist)


def _consensus_phase(qp_blk: QPData, spec: ConsensusSpec, mesh: Mesh,
                     settings: Settings, axis: str, scaling: Scaling,
                     backend: str, x0, z0, y0, z_off=None, rho0=None
                     ) -> ConsensusSolution:
    """One scaled solve phase over the mesh. Inputs and outputs are
    UNSCALED; `qp_blk` is the scaled problem, `scaling` its factors.
    rho0: optional traced initial penalty (warm rho across phases)."""
    has_off = z_off is not None
    if z_off is None:
        z_off = jnp.zeros((), qp_blk.dtype)
    if rho0 is None:
        rho0 = jnp.asarray(settings.rho, qp_blk.dtype)
    out = _phase_jit(qp_blk, x0, z0, y0, z_off, rho0, scaling, spec,
                     settings, axis, backend, mesh, has_off)
    x, z, y, status, it, rp, rd, rho, hist = out
    return ConsensusSolution(
        x=x, z=z, y=y, status=status,
        iters=it, r_prim=rp, r_dual=rd, rho=rho, history=hist)


def recentered_rounds_blocks(qp_blk: QPData, spec: ConsensusSpec,
                             settings: Settings, sol32, phase_fn):
    """Re-centered f32 refinement rounds for box-cone consensus problems
    (cf. parallel/batch._solve_shared_recentered; VERDICT r1 item 4).
    Shared by consensus_solve and consensus_solve_mc — sol32 only needs
    .x/.y/.z/.iters fields; any leading scenario axis broadcasts.

    Each round re-solves the SAME block problem with f64-shifted data:
    bounds shift by Ax on finite rows; the agreement rows shift exactly
    via the z-space offset (consensus averaging is a linear-subspace
    projection — it shifts affinely); and BOTH primal and dual are
    re-centered: the correction's linear term is the true dual residual

        g_c = P x + q + A' y_base,

    with y_base the accumulated dual MASKED to active/equality/agreement
    rows (strictly-inactive rows get exact-0 duals, so complementarity
    junk cannot accumulate across rounds — the failure mode documented
    in api._recentered_rounds when duals are summed). The correction
    solves for the dual CORRECTION dy, warm-started at 0, and the total
    dual is y_base + dy. Dual re-centering is what beats the f32 dual
    floor: with full dual replacement the correction's stationarity must
    cancel an O(|Px+q|) linear term to eps in f32 (floor ~6e-8*|g|;
    measured 2.5e-6 on the MPC set), whereas here every correction
    quantity is O(residual) — f32 carries ~1e-12 absolute at that scale,
    so eps 1e-8 is reachable with ZERO f64 iterations.

    Host-synced round loop (these drivers are staged, like api.solve).

    Returns (x, z, y, status, iters, r_p, r_d) in f64.
    """
    f32, f64 = jnp.float32, jnp.float64
    qp64 = qp_blk.astype(f64)
    ml = spec.m_local

    def clean(v):
        v = v.astype(f64)
        return jnp.where(jnp.isfinite(v), v, 0.0)

    x_t, y_t, z_t = clean(sol32.x), clean(sol32.y), clean(sol32.z)
    iters = sol32.iters
    rho_w = sol32.rho                   # phase-1's adapted rho: the
    # correction shares the original's curvature, so starting there
    # saves the rho random-walk (measured 8350 -> ~1500 iters/round).
    # No recenter_max_iter cap here: api.solve's cap exists because its
    # staged polish usually lands from a partial round; consensus has no
    # polish stage, so a truncated round just returns a worse iterate.
    # With dual re-centering the round criterion is reachable in f32, so
    # rounds terminate on convergence, not on the cap.
    s_c = settings.replace(
        precision="single",
        sigma=max(settings.sigma, 1e-5),
        rho_eq_scale=min(settings.rho_eq_scale, 1e2),
        rho_edge_scale=(min(settings.rho_edge_scale, 1e2)
                        if settings.rho_edge_scale > 0 else -1.0),
        # Correction problems are feasible by construction; their rows
        # mix shifted and original domains, so certificates there are
        # meaningless — disable (cf. api._recentered_rounds).
        eps_pinf=0.0, eps_dinf=0.0)

    # Active-set mask for the dual baseline: edge rows are equality-like
    # (dual unconstrained — always kept); local rows keep their dual
    # only within act_tol of a bound. The tolerance must exceed the
    # phase-1 primal resolution (hybrid_eps); rows near-active within it
    # carry near-zero phase-1 duals anyway, so kept junk is harmless.
    edge = jnp.arange(spec.mb) >= ml
    act_tol = 10.0 * max(settings.hybrid_eps, settings.eps_abs)

    def mask_dual(y, z):
        scale = 1.0 + jnp.abs(z)
        near_l = jnp.where(jnp.isfinite(qp64.l),
                           z - qp64.l <= act_tol * scale, False)
        near_u = jnp.where(jnp.isfinite(qp64.u),
                           qp64.u - z <= act_tol * scale, False)
        return jnp.where(near_l | near_u | edge, y, 0.0)

    from ..core.admm import l1_grad_scale_raw
    nlam64 = l1_grad_scale_raw(qp64)

    def true_resid(x_t, y_t, z_t):
        Ax = xprec.einsum("...ij,...j->...i", qp64.A, x_t)
        Px = xprec.einsum("...ij,...j->...i", qp64.P, x_t)
        Aty = xprec.einsum("...ji,...j->...i", qp64.A, y_t)
        # Global norms over (blocks, rows) — plain ops outside shard_map;
        # XLA inserts the reductions (keeps any scenario axis).
        linf = lambda v: jnp.max(jnp.abs(v), axis=(-2, -1))
        r_p = linf(Ax - z_t)
        r_d = linf(Px + qp64.q + Aty)
        eps_p = settings.eps_abs + settings.eps_rel * jnp.maximum(
            linf(Ax), linf(z_t))
        # eps_d reference incl. the L1 gradient scale (matches the
        # solver loop — core.admm.l1_grad_scale).
        eps_d = settings.eps_abs + settings.eps_rel * jnp.maximum(
            jnp.maximum(linf(Px), linf(Aty)),
            jnp.maximum(jnp.max(jnp.abs(qp64.q)), nlam64))
        solved = (r_p <= eps_p) & (r_d <= eps_d)
        return Ax, Px, r_p, r_d, solved

    solved_all = False
    r_p = r_d = solved = None
    for _ in range(max(settings.recenter_rounds, 0)):
        y_t = mask_dual(y_t, z_t)
        Ax, Px, r_p, r_d, solved = true_resid(x_t, y_t, z_t)
        solved_all = bool(jnp.all(solved))          # host sync per round
        if solved_all:
            break
        Aty = xprec.einsum("...ji,...j->...i", qp64.A, y_t)
        g = Px + qp64.q + Aty                       # O(residual) linear term
        l_c = jnp.where(jnp.isfinite(qp64.l), qp64.l - Ax, qp64.l)
        u_c = jnp.where(jnp.isfinite(qp64.u), qp64.u - Ax, qp64.u)
        qp_c = QPData(
            P=qp_blk.P.astype(f32), q=g.astype(f32),
            A=qp_blk.A.astype(f32), l=l_c.astype(f32),
            u=u_c.astype(f32), lam=qp_blk.lam.astype(f32),
            cone=qp_blk.cone)
        # Offsets only matter on the agreement rows (local box rows
        # shift through the bounds). The averaging uses only the
        # DIFFERENCE of the pair offsets (z_R = mean + (off_L-off_R)/2),
        # so pass the pair-ANTISYMMETRIZED part: off'_R(b) = -off'_L(b+1)
        # = (Ax_R(b) - Ax_L(b+1))/2. Mathematically identical to raw Ax
        # offsets, numerically decisive: raw Ax is O(1) boundary state
        # whose f32 rounding (~6e-8) poisons the agreement constraint (a
        # measured 1e-7 primal plateau); the antisymmetric part is
        # O(current disagreement) ~ r_p, f32-exact to ~1e-11. End-block
        # outer edges are equality rows (offset masked by is_first/last).
        AxL = Ax[..., ml:ml + spec.ns]
        AxR = Ax[..., ml + spec.ns:]
        delta = AxL[..., 1:, :] - AxR[..., :-1, :]   # pair gaps (Bb-1,)
        zpad = jnp.zeros_like(delta[..., :1, :])
        off_L = jnp.concatenate([zpad, 0.5 * delta], axis=-2)
        off_R = jnp.concatenate([-0.5 * delta, zpad], axis=-2)
        off = jnp.concatenate(
            [jnp.zeros_like(Ax[..., :ml]), off_L, off_R], axis=-1)
        solc = phase_fn(
            qp_c, s_c, jnp.zeros_like(x_t, dtype=f32),
            (z_t - Ax).astype(f32), jnp.zeros_like(y_t, dtype=f32),
            off.astype(f32), rho_w.astype(f32))
        rho_w = solc.rho                # warm rho into the next round
        x_t = x_t + clean(solc.x)
        y_t = y_t + clean(solc.y)       # dual CORRECTION on masked base
        z_t = Ax + clean(solc.z)
        iters = iters + solc.iters
    if not solved_all:
        y_t = mask_dual(y_t, z_t)
        _, _, r_p, r_d, solved = true_resid(x_t, y_t, z_t)
    status = jnp.where(
        solved, _SOLVED, jnp.int32(int(Status.MAX_ITER)))
    return x_t, z_t, y_t, status, iters, r_p, r_d


def _recentered_consensus(qp_blk: QPData, spec: ConsensusSpec, mesh: Mesh,
                          settings: Settings, axis: str, scaling: Scaling,
                          backend: str, sol32: ConsensusSolution,
                          phase_fn):
    x_t, z_t, y_t, status, iters, r_p, r_d = recentered_rounds_blocks(
        qp_blk, spec, settings, sol32, phase_fn)
    dtype = qp_blk.dtype
    return ConsensusSolution(
        x=x_t.astype(dtype), z=z_t.astype(dtype), y=y_t.astype(dtype),
        status=status, iters=iters,
        r_prim=r_p.astype(dtype), r_dual=r_d.astype(dtype),
        rho=sol32.rho, history=sol32.history)


def consensus_solve(qp_blk: QPData, spec: ConsensusSpec, mesh: Mesh,
                    settings: Settings = Settings(),
                    x0=None, z0=None, y0=None, rho0=None,
                    axis: str = "horizon") -> ConsensusSolution:
    """Solve a block-partitioned problem over a 1-D device mesh (P2).

    qp_blk: per-block problem data stacked on a leading (B,) axis — P
    (B, nb, nb), A (B, mb, nb), q/l/u accordingly (rows per the
    ConsensusSpec layout). B must be divisible by the mesh axis size.
    Optional UNSCALED (x0, z0, y0) warm start in the (B, .) block layout
    and rho0 penalty warm start (A5 — also the elastic-recovery resume
    path; pass the previous Solution's .rho: a warm iterate with a cold
    rho makes the refinement rounds re-run the rho random walk). Hybrid
    precision runs f32 iterations + re-centered refinement (box cones;
    no f64 loop).
    """
    B = spec.n_blocks
    ndev = mesh.shape[axis]
    if B % ndev != 0:
        raise ValueError(f"n_blocks={B} not divisible by mesh axis {ndev}")
    # 'auto' prefers the explicit-inverse factor on TPU: the per-block
    # x-update becomes one (scenarios*blocks, nb) @ (nb, nb) MXU matmul
    # instead of 2 sequential triangular solves (VERDICT r2 item 3 —
    # the consensus x-update ran plain-XLA solves at ~2x the flat
    # batch's per-iteration cost). Off-TPU keep Cholesky (f64 tests).
    if settings.backend == "auto":
        backend = "inv" if jax.default_backend() == "tpu" else "chol"
    else:
        backend = settings.backend

    dtype = qp_blk.dtype
    if x0 is None:
        x0 = jnp.zeros((B, spec.nb), dtype)
    if z0 is None:
        z0 = jnp.zeros((B, spec.mb), dtype)
    if y0 is None:
        y0 = jnp.zeros((B, spec.mb), dtype)

    blk_sharding = NamedSharding(mesh, P(axis))
    qp_blk = jax.device_put(qp_blk, jax.tree.map(
        lambda _: blk_sharding, qp_blk))

    # Block-shared Ruiz scaling, computed once in the input dtype and
    # reused by every phase/round (the correction problems keep P, A).
    qp_s, scaling = ruiz_equilibrate_blocks(
        qp_blk, spec, settings.scaling_iters)

    if rho0 is not None:
        rho0 = jnp.asarray(rho0)

    def phase(qp_p, s, x_p, z_p, y_p, off=None, rho0=rho0):
        return _consensus_phase(qp_p, spec, mesh, s, axis, scaling,
                                backend, x_p, z_p, y_p, z_off=off,
                                rho0=rho0)

    precision = settings.precision
    if precision == "hybrid" and not jax.config.jax_enable_x64:
        precision = "single"
    if precision == "single":
        return phase(qp_s, settings, x0, z0, y0)
    if precision == "double":
        f = jnp.float64
        return phase(qp_s.astype(f), settings,
                     x0.astype(f), z0.astype(f), y0.astype(f))

    # --- hybrid: f32 phase + re-centered f32 refinement ---
    f32, f64 = jnp.float32, jnp.float64
    s32 = settings.replace(
        precision="single",
        eps_abs=max(settings.hybrid_eps, settings.eps_abs),
        eps_rel=max(settings.hybrid_eps, settings.eps_rel),
        sigma=max(settings.sigma, 1e-5),
        rho_eq_scale=min(settings.rho_eq_scale, 1e2),
        rho_edge_scale=(min(settings.rho_edge_scale, 1e2)
                        if settings.rho_edge_scale > 0 else -1.0))
    sol32 = phase(qp_s.astype(f32), s32,
                  x0.astype(f32), z0.astype(f32), y0.astype(f32))

    cone = spec.cone
    if cone.m_l1 == 0 and cone.m_soc == 0 and settings.recenter_rounds > 0:
        def phase_scaled_c(qp_c, s_c, x_c, z_c, y_c, off_c, rho0):
            # Correction problems reuse the ORIGINAL scaling (same P, A).
            qp_cs = scale_qp_blocks(qp_c, scaling.astype(f32), spec)
            return _consensus_phase(
                qp_cs, spec, mesh, s_c, axis, scaling.astype(f32),
                backend, x_c, z_c, y_c, z_off=off_c, rho0=rho0)

        return _recentered_consensus(
            qp_blk, spec, mesh, settings, axis, scaling, backend, sol32,
            phase_scaled_c)

    # Fallback for L1/SOC local cones: warm-started f64 phase (XLA
    # emulates f64 on TPU; residual pmax reductions ride f32 there).
    def clean(v):
        v = v.astype(f64)
        return jnp.where(jnp.isfinite(v), v, 0.0)

    sol64 = phase(qp_s.astype(f64), settings.replace(precision="single"),
                  clean(sol32.x), clean(sol32.z), clean(sol32.y))
    return ConsensusSolution(
        x=sol64.x.astype(dtype), z=sol64.z.astype(dtype),
        y=sol64.y.astype(dtype), status=sol64.status,
        iters=sol32.iters + sol64.iters,
        r_prim=sol64.r_prim.astype(dtype),
        r_dual=sol64.r_dual.astype(dtype), rho=sol64.rho.astype(dtype),
        history=sol64.history)
