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

Scaling note: Ruiz equilibration is intentionally NOT applied here —
per-block diagonal scalings would scale the two copies of a boundary
state differently and corrupt the averaging projection. Builders
normalise units instead (see partition_mpc).
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
from ..ops.prox import project_cone
from ..problem import ConeSpec, QPData
from ..settings import Settings
from ..solution import Status

_UNSOLVED = jnp.int32(int(Status.UNSOLVED))
_SOLVED = jnp.int32(int(Status.SOLVED))


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


def _linf_global(v, axis: str):
    return jax.lax.pmax(jnp.max(jnp.abs(v)), axis)


def _linf_scen(v, axis: str):
    """Per-scenario inf-norm: max over the trailing (blocks, rows) axes
    locally, then pmax over the horizon mesh axis."""
    return jax.lax.pmax(jnp.max(jnp.abs(v), axis=(-2, -1)), axis)


def consensus_body(qp_blk: QPData, spec: ConsensusSpec, settings: Settings,
                   axis: str, block_ids, fac, x, z, y, rho_vec, backend):
    """One consensus-ADMM iteration on this device's S blocks.

    block_ids: (S,) global indices of the local blocks (for end masks).
    Iterates carry a local (S, .) layout, optionally with an extra
    leading scenario axis (B, S, .) — all ops broadcast over it; the
    per-block data (P, A, q, factor, rho_vec) stay shared across
    scenarios (the Monte-Carlo shape: dispersions enter only l/u).
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
    # equality bounds stored in l(==u) of the edge rows.
    right_prev = _neighbor_prev(v_right, axis)      # block s-1's right edge
    left_next = _neighbor_next(v_left, axis)        # block s+1's left edge
    avg_left = 0.5 * (v_left + right_prev)
    avg_right = 0.5 * (v_right + left_next)
    l_left = qp_blk.l[..., ml:ml + ns]
    l_right = qp_blk.l[..., ml + ns:]
    z_left = jnp.where(is_first, l_left, avg_left)
    z_right = jnp.where(is_last, l_right, avg_right)

    z_new = jnp.concatenate([z_loc, z_left, z_right], axis=-1)
    y_new = y + rho_vec * (w - z_new)
    return x_new, z_new, y_new


def run_consensus(qp_blk: QPData, spec: ConsensusSpec, settings: Settings,
                  axis: str, block_ids, x0, z0, y0,
                  backend: str) -> ConsensusCarry:
    """Device-local driver (runs INSIDE shard_map). Lockstep while_loop;
    the predicate uses pmax-reduced global residuals so every device
    iterates identically."""
    dtype = qp_blk.dtype
    ml, ns = spec.m_local, spec.ns

    # Equality boost: local box rows with l == u, plus ALL edge rows
    # (consensus/agreement rows are equality-like).
    idx = jnp.arange(spec.mb)
    box_eq = (qp_blk.l == qp_blk.u) & jnp.isfinite(qp_blk.l) & (
        idx[None, :] < spec.cone.m_box)
    edge = idx[None, :] >= ml
    eq_mask = box_eq | edge

    rho0 = jnp.asarray(settings.rho, dtype)

    def rho_vec_of(rho_bar):
        return jnp.where(eq_mask, settings.rho_eq_scale * rho_bar, rho_bar)

    def factor(rho_bar):
        rv = rho_vec_of(rho_bar)
        return kkt.factor_condensed(
            qp_blk.P, qp_blk.A, settings.sigma, rv, backend,
            settings.band_block), rv

    fac0, _ = factor(rho0)
    big = jnp.asarray(jnp.inf, dtype)
    carry0 = ConsensusCarry(
        x=x0, z=z0, y=y0, rho_bar=rho0, fac=fac0, it=jnp.int32(0),
        status=_UNSOLVED, r_prim=big, r_dual=big)

    k = settings.check_every
    interval_checks = max(1, settings.adaptive_rho_interval // k)

    def cond(c: ConsensusCarry):
        return (c.status == _UNSOLVED) & (c.it < settings.max_iter)

    def body(c: ConsensusCarry) -> ConsensusCarry:
        rho_vec = rho_vec_of(c.rho_bar)

        def inner(_, xyz):
            return consensus_body(
                qp_blk, spec, settings, axis, block_ids, c.fac,
                *xyz, rho_vec, backend)

        x, z, y = jax.lax.fori_loop(0, k, inner, (c.x, c.z, c.y))
        it = c.it + k

        Ax = xprec.einsum("sij,sj->si", qp_blk.A, x)
        Px = xprec.einsum("sij,sj->si", qp_blk.P, x)
        Aty = xprec.einsum("sji,sj->si", qp_blk.A, y)
        r_prim = _linf_global(Ax - z, axis)
        r_dual = _linf_global(Px + qp_blk.q + Aty, axis)
        nAx = _linf_global(Ax, axis)
        nz = _linf_global(z, axis)
        nPx = _linf_global(Px, axis)
        nAty = _linf_global(Aty, axis)
        nq = _linf_global(qp_blk.q, axis)
        eps_p = settings.eps_abs + settings.eps_rel * jnp.maximum(nAx, nz)
        eps_d = settings.eps_abs + settings.eps_rel * jnp.maximum(
            jnp.maximum(nPx, nAty), nq)
        solved = (r_prim <= eps_p) & (r_dual <= eps_d)
        status = jnp.where(solved, _SOLVED, _UNSOLVED)

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

        return ConsensusCarry(
            x=x, z=z, y=y, rho_bar=rho_bar, fac=fac, it=it, status=status,
            r_prim=r_prim, r_dual=r_dual)

    final = jax.lax.while_loop(cond, body, carry0)
    status = jnp.where(
        final.status == _UNSOLVED, jnp.int32(int(Status.MAX_ITER)),
        final.status)
    return final._replace(status=status)


class ConsensusSolution(NamedTuple):
    """Result of a consensus solve; x/z/y keep the (B, .) block layout."""

    x: jax.Array
    z: jax.Array
    y: jax.Array
    status: jax.Array
    iters: jax.Array
    r_prim: jax.Array
    r_dual: jax.Array
    rho: jax.Array


def consensus_solve(qp_blk: QPData, spec: ConsensusSpec, mesh: Mesh,
                    settings: Settings = Settings(),
                    axis: str = "horizon") -> ConsensusSolution:
    """Solve a block-partitioned problem over a 1-D device mesh (P2).

    qp_blk: per-block problem data stacked on a leading (B,) axis — P
    (B, nb, nb), A (B, mb, nb), q/l/u accordingly (rows per the
    ConsensusSpec layout). B must be divisible by the mesh axis size.
    Hybrid precision follows settings.precision exactly like `solve`.
    """
    B = spec.n_blocks
    ndev = mesh.shape[axis]
    if B % ndev != 0:
        raise ValueError(f"n_blocks={B} not divisible by mesh axis {ndev}")
    backend = "chol" if settings.backend == "auto" else settings.backend

    blk_sharding = NamedSharding(mesh, P(axis))

    def one_phase(qp_phase: QPData, x0, z0, y0, s: Settings):
        dtype = qp_phase.dtype
        block_ids = jnp.arange(B, dtype=jnp.int32)

        def device_fn(qp_loc, ids, x, z, y):
            carry = run_consensus(
                qp_loc, spec, s, axis, ids, x, z, y, backend)
            return (carry.x, carry.z, carry.y, carry.status, carry.it,
                    carry.r_prim, carry.r_dual, carry.rho_bar)

        sharded = shard_map(
            device_fn, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(axis), qp_phase),
                      P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(), P()),
            check_vma=False)
        with xprec.highest():
            x, z, y, status, it, rp, rd, rho = jax.jit(sharded)(
                qp_phase, block_ids, x0, z0, y0)
        return ConsensusSolution(
            x=x, z=z, y=y, status=status, iters=it,
            r_prim=rp, r_dual=rd, rho=rho)

    dtype = qp_blk.dtype
    x0 = jnp.zeros((B, spec.nb), dtype)
    z0 = jnp.zeros((B, spec.mb), dtype)
    y0 = jnp.zeros((B, spec.mb), dtype)
    qp_blk = jax.device_put(qp_blk, jax.tree.map(
        lambda _: blk_sharding, qp_blk))

    precision = settings.precision
    if precision == "hybrid" and not jax.config.jax_enable_x64:
        precision = "single"
    if precision == "single":
        return one_phase(qp_blk, x0, z0, y0, settings)
    if precision == "double":
        f = jnp.float64
        return one_phase(qp_blk.astype(f), x0.astype(f), z0.astype(f),
                         y0.astype(f), settings)
    f32, f64 = jnp.float32, jnp.float64
    s32 = settings.replace(
        precision="single",
        eps_abs=max(settings.hybrid_eps, settings.eps_abs),
        eps_rel=max(settings.hybrid_eps, settings.eps_rel),
        sigma=max(settings.sigma, 1e-5),
        rho_eq_scale=min(settings.rho_eq_scale, 1e2))
    sol32 = one_phase(qp_blk.astype(f32), x0.astype(f32), z0.astype(f32),
                      y0.astype(f32), s32)

    def clean(v):
        v = v.astype(f64)
        return jnp.where(jnp.isfinite(v), v, 0.0)

    sol64 = one_phase(
        qp_blk.astype(f64), clean(sol32.x), clean(sol32.z),
        clean(sol32.y), settings.replace(precision="single"))
    return ConsensusSolution(
        x=sol64.x.astype(dtype), z=sol64.z.astype(dtype),
        y=sol64.y.astype(dtype), status=sol64.status,
        iters=sol32.iters + sol64.iters,
        r_prim=sol64.r_prim.astype(dtype),
        r_dual=sol64.r_dual.astype(dtype), rho=sol64.rho.astype(dtype))
