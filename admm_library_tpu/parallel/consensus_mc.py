"""Monte-Carlo consensus ADMM over a 2-D (data x horizon) mesh —
P1 x P2 combined (BASELINE.json configs[4]: "Consensus ADMM over 1024
Monte-Carlo dispersed scenarios, horizon-block partitioned").

Topology (parallel/runtime.make_mesh): scenarios shard over the 'data'
axis, horizon blocks over the 'horizon' axis. Per device: (B_loc, S,
...) iterates. Per-block matrices (P, A, q) and their KKT factors are
SHARED across scenarios (dispersions enter only the bounds), so the
x-update is a factor-reuse batched solve; per-iteration cross-chip
traffic is the ns-sized `ppermute` edge exchange along 'horizon' plus
scalar reductions ('horizon' pmax for residuals, 'data' psum for the
shared-rho statistics and the loop predicate) — everything rides ICI
(SURVEY.md §3.3).

Per-scenario convergence masking freezes finished scenarios lockstep,
with honest per-scenario iteration counts, exactly like
parallel.batch.run_admm_batch_shared.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import kkt
from ..problem import QPData
from ..settings import Settings
from ..solution import Status
from .consensus import ConsensusSpec, consensus_body, _linf_scen
from .. import xprec

_UNSOLVED = jnp.int32(int(Status.UNSOLVED))
_SOLVED = jnp.int32(int(Status.SOLVED))


class ConsensusMCSolution(NamedTuple):
    """x/z/y keep the (B, n_blocks, .) scenario-x-block layout."""

    x: jax.Array
    z: jax.Array
    y: jax.Array
    status: jax.Array       # (B,)
    iters: jax.Array        # (B,) honest per-scenario counts
    r_prim: jax.Array       # (B,)
    r_dual: jax.Array       # (B,)
    rho: jax.Array


def _geomean_masked_sharded(v, mask, data_axis):
    logv = jnp.where(mask, jnp.log(jnp.maximum(v, 1e-30)), 0.0)
    tot = jax.lax.psum(jnp.sum(logv), data_axis)
    cnt = jax.lax.psum(jnp.sum(mask), data_axis)
    return jnp.exp(tot / jnp.maximum(cnt, 1))


def run_consensus_mc(qp_blk: QPData, spec: ConsensusSpec,
                     settings: Settings, data_axis: str, horizon_axis: str,
                     block_ids, x0, z0, y0, backend: str):
    """Device-local driver (runs INSIDE shard_map over both axes).

    qp_blk: block-local data with SCENARIO-BATCHED l/u — l, u have shape
    (B_loc, S, mb); P (S, nb, nb), A (S, mb, nb), q (S, nb) shared.
    x0/z0/y0: (B_loc, S, .).
    """
    dtype = qp_blk.dtype
    ml, ns = spec.m_local, spec.ns
    B_loc = x0.shape[0]

    idx = jnp.arange(spec.mb)
    # Equality boost from lane-0 bounds (dispersions change values, not
    # the equality pattern) + all edge rows.
    l0, u0 = qp_blk.l[0], qp_blk.u[0]
    box_eq = (l0 == u0) & jnp.isfinite(l0) & (
        idx[None, :] < spec.cone.m_box)
    edge = idx[None, :] >= ml
    eq_mask = box_eq | edge                                 # (S, mb)

    rho0 = jnp.asarray(settings.rho, dtype)

    def rho_vec_of(rb):
        return jnp.where(eq_mask, settings.rho_eq_scale * rb, rb)

    def factor(rb):
        rv = rho_vec_of(rb)
        return kkt.factor_condensed(
            qp_blk.P, qp_blk.A, settings.sigma, rv, backend,
            settings.band_block)

    fac0 = factor(rho0)
    big = jnp.full((B_loc,), jnp.inf, dtype)
    k = settings.check_every
    interval_checks = max(1, settings.adaptive_rho_interval // k)

    carry0 = (x0, z0, y0, rho0, fac0, jnp.int32(0),
              jnp.zeros((B_loc,), jnp.int32),
              jnp.full((B_loc,), _UNSOLVED), big, big,
              jnp.asarray(True))

    def cond(c):
        # `alive` is the psum-reduced liveness computed in the BODY —
        # collectives are not allowed in a while_loop predicate under
        # shard_map, so the body stores the reduction in the carry.
        it, alive = c[5], c[10]
        return alive & (it < settings.max_iter)

    def body(c):
        (x, z, y, rho_bar, fac, it, iters_sc, status, r_p_old, r_d_old,
         _alive) = c
        rho_vec = rho_vec_of(rho_bar)
        active = status == _UNSOLVED

        def inner(_, xyz):
            return consensus_body(
                qp_blk, spec, settings, horizon_axis, block_ids, fac,
                *xyz, rho_vec, backend)

        xn, zn, yn = jax.lax.fori_loop(0, k, inner, (x, z, y))
        am = active[:, None, None]
        x = jnp.where(am, xn, x)
        z = jnp.where(am, zn, z)
        y = jnp.where(am, yn, y)
        it = it + k
        iters_sc = iters_sc + jnp.where(active, k, 0)

        Ax = xprec.einsum("...ij,...j->...i", qp_blk.A, x)
        Px = xprec.einsum("...ij,...j->...i", qp_blk.P, x)
        Aty = xprec.einsum("...ji,...j->...i", qp_blk.A, y)
        r_p = _linf_scen(Ax - z, horizon_axis)              # (B_loc,)
        r_d = _linf_scen(Px + qp_blk.q + Aty, horizon_axis)
        nAx = _linf_scen(Ax, horizon_axis)
        nz = _linf_scen(z, horizon_axis)
        nPx = _linf_scen(Px, horizon_axis)
        nAty = _linf_scen(Aty, horizon_axis)
        nq = jax.lax.pmax(jnp.max(jnp.abs(qp_blk.q)), horizon_axis)
        eps_p = settings.eps_abs + settings.eps_rel * jnp.maximum(nAx, nz)
        eps_d = settings.eps_abs + settings.eps_rel * jnp.maximum(
            jnp.maximum(nPx, nAty), nq)
        solved = (r_p <= eps_p) & (r_d <= eps_d)
        status = jnp.where(active & solved, _SOLVED, status)
        r_p = jnp.where(active, r_p, r_p_old)
        r_d = jnp.where(active, r_d, r_d_old)

        if settings.adaptive_rho:
            adapt_now = (it // k - 1) % interval_checks == (
                interval_checks - 1)
            tiny = jnp.finfo(dtype).tiny
            still = status == _UNSOLVED
            sp = r_p / jnp.maximum(jnp.maximum(nAx, nz), tiny)
            sd = r_d / jnp.maximum(
                jnp.maximum(jnp.maximum(nPx, nAty), nq), tiny)
            gp = _geomean_masked_sharded(sp, still, data_axis)
            gd = _geomean_masked_sharded(sd, still, data_axis)
            ratio = jnp.sqrt(gp / jnp.maximum(gd, tiny))
            new_rho = jnp.clip(
                rho_bar * ratio, settings.rho_min, settings.rho_max)
            tol = settings.adaptive_rho_tol
            changed = (ratio > tol) | (ratio < 1.0 / tol)
            any_still = jax.lax.psum(
                jnp.sum(still.astype(jnp.int32)), data_axis) > 0
            do = adapt_now & changed & any_still
            if backend == "cg":
                rho_bar = jnp.where(do, new_rho, rho_bar)
                fac = dict(fac, rho=rho_vec_of(rho_bar))
            else:
                fac = jax.lax.cond(
                    do, lambda r: factor(r), lambda r: fac, new_rho)
                rho_bar = jnp.where(do, new_rho, rho_bar)

        alive = jax.lax.psum(
            jnp.sum((status == _UNSOLVED).astype(jnp.int32)),
            data_axis) > 0
        return (x, z, y, rho_bar, fac, it, iters_sc, status, r_p, r_d,
                alive)

    final = jax.lax.while_loop(cond, body, carry0)
    (x, z, y, rho_bar, _, it, iters_sc, status, r_p, r_d, _) = final
    status = jnp.where(
        status == _UNSOLVED, jnp.int32(int(Status.MAX_ITER)), status)
    return x, z, y, status, iters_sc, r_p, r_d, rho_bar


def consensus_solve_mc(qp_blk: QPData, spec: ConsensusSpec, mesh: Mesh,
                       settings: Settings = Settings(),
                       data_axis: str = "data",
                       horizon_axis: str = "horizon"
                       ) -> ConsensusMCSolution:
    """Solve B dispersed scenarios of a block-partitioned problem over a
    2-D (data, horizon) mesh.

    qp_blk: P (n_blocks, nb, nb), A, q per-block shared; l, u
    scenario-batched (B, n_blocks, mb); lam (n_blocks, m_l1) shared.
    B must divide by mesh[data_axis], n_blocks by mesh[horizon_axis].
    Hybrid precision as elsewhere.
    """
    Bb = spec.n_blocks
    B = qp_blk.l.shape[0]
    nd, nh = mesh.shape[data_axis], mesh.shape[horizon_axis]
    if B % nd != 0 or Bb % nh != 0:
        raise ValueError(
            f"batch {B} x blocks {Bb} not divisible by mesh "
            f"({nd} x {nh})")
    backend = "chol" if settings.backend == "auto" else settings.backend

    def one_phase(qp_p: QPData, x0, z0, y0, s: Settings):
        block_ids = jnp.arange(Bb, dtype=jnp.int32)

        def device_fn(P_b, q_b, A_b, lam_b, l_b, u_b, ids, x, z, y):
            from ..problem import QPData as QD
            qp_loc = QD(P=P_b, q=q_b, A=A_b, l=l_b, u=u_b, lam=lam_b,
                        cone=qp_p.cone)
            return run_consensus_mc(
                qp_loc, spec, s, data_axis, horizon_axis, ids,
                x, z, y, backend)

        PH = P(horizon_axis)
        PDH = P(data_axis, horizon_axis)
        PD = P(data_axis)
        sharded = shard_map(
            device_fn, mesh=mesh,
            in_specs=(PH, PH, PH, PH, PDH, PDH, PH,
                      PDH, PDH, PDH),
            out_specs=(PDH, PDH, PDH, PD, PD, PD, PD, P()),
            check_vma=False)
        with xprec.highest():
            return jax.jit(sharded)(
                qp_p.P, qp_p.q, qp_p.A, qp_p.lam, qp_p.l, qp_p.u,
                block_ids, x0, z0, y0)

    dtype = qp_blk.dtype
    x0 = jnp.zeros((B, Bb, spec.nb), dtype)
    z0 = jnp.zeros((B, Bb, spec.mb), dtype)
    y0 = jnp.zeros((B, Bb, spec.mb), dtype)

    precision = settings.precision
    if precision == "hybrid" and not jax.config.jax_enable_x64:
        precision = "single"
    if precision == "single":
        out = one_phase(qp_blk, x0, z0, y0, settings)
        return ConsensusMCSolution(*out)
    if precision == "double":
        f = jnp.float64
        out = one_phase(qp_blk.astype(f), x0.astype(f), z0.astype(f),
                        y0.astype(f), settings)
        return ConsensusMCSolution(*out)
    f32, f64 = jnp.float32, jnp.float64
    s32 = settings.replace(
        precision="single",
        eps_abs=max(settings.hybrid_eps, settings.eps_abs),
        eps_rel=max(settings.hybrid_eps, settings.eps_rel),
        sigma=max(settings.sigma, 1e-5),
        rho_eq_scale=min(settings.rho_eq_scale, 1e2))
    o32 = one_phase(qp_blk.astype(f32), x0.astype(f32), z0.astype(f32),
                    y0.astype(f32), s32)
    sol32 = ConsensusMCSolution(*o32)

    def clean(v):
        v = v.astype(f64)
        return jnp.where(jnp.isfinite(v), v, 0.0)

    o64 = one_phase(
        qp_blk.astype(f64), clean(sol32.x), clean(sol32.z),
        clean(sol32.y), settings.replace(precision="single"))
    sol64 = ConsensusMCSolution(*o64)
    return ConsensusMCSolution(
        x=sol64.x.astype(dtype), z=sol64.z.astype(dtype),
        y=sol64.y.astype(dtype), status=sol64.status,
        iters=sol32.iters + sol64.iters,
        r_prim=sol64.r_prim.astype(dtype),
        r_dual=sol64.r_dual.astype(dtype), rho=sol64.rho.astype(dtype))
