"""Pallas TPU fused ADMM iteration kernel (K3/A1 fusion, SURVEY.md §2.2).

Runs `k` complete ADMM iterations of the SHARED-MATRIX batch path in one
kernel launch with every operand resident in VMEM:

    A (m, n), At (n, m), Minv (n, n), M (n, n), q, rho, bounds — shared
    x (B, n), z (B, m), y (B, m)                                — per lane

Per iteration: 3 MXU matmuls (rhs assembly, Minv apply, A apply) plus 2
per iterative-refinement step, with the prox and dual updates on the
VPU. A lane tile of 128 with the flagship shapes (n=450, m=456, f32)
uses ~4 MB of VMEM — the whole `check_every` block runs without
touching HBM, which is what "fused on-device kernels inside a jit'd
lax.while_loop" [BASELINE.json north_star] means at the hardware level.
Larger batches are chunked over lane tiles with a Python-unrolled loop
(the chunks would serialise on the MXU anyway); the kernel itself is
single-program (no pallas grid) because this remote Mosaic build
rejects the grid/index-map lowering AND the implicit grid that
lax.map/scan batching would add ('func.return' legalization failure).

L1 rows use the composite clip(soft-threshold) prox. SOC blocks are
projected WITHOUT reshapes via selector matmuls: with S the (m_soc,
n_soc) 0/1 block-membership matrix and H the head-row indicator, tail
norms are sqrt((v*v) @ (S-H)) and per-block scale factors broadcast back
through (S-H)^T — everything stays in the (B, lanes) layout the VPU
wants.

Falls back to interpret mode off-TPU so CPU tests exercise the exact
same kernel code path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..problem import ConeSpec


def soc_selectors(cone: ConeSpec, dtype):
    """Static (m_soc, n_soc) membership / head 0-1 selector matrices."""
    m_soc, n_soc = cone.m_soc, cone.n_soc
    S = np.zeros((m_soc, n_soc), np.float32)
    H = np.zeros((m_soc, n_soc), np.float32)
    off = 0
    for b, d in enumerate(cone.soc_dims):
        S[off:off + d, b] = 1.0
        H[off, b] = 1.0
        off += d
    return jnp.asarray(S, dtype), jnp.asarray(H, dtype)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=a.dtype)


def _project_cone_mm(v, l, u, lam_r, cone: ConeSpec, S, H):
    """project_cone via elementwise + matmul ops only (kernel-safe).

    S/H: (m_soc, n_soc) block-membership / head selectors; lam_r:
    (1, m_l1) soft-threshold levels (already divided by rho).
    """
    mb, ml = cone.m_box, cone.m_l1
    parts = []
    if mb:
        parts.append(jnp.clip(v[:, :mb], l[:, :mb], u[:, :mb]))
    if ml:
        sl = v[:, mb:mb + ml]
        soft = jnp.sign(sl) * jnp.maximum(jnp.abs(sl) - lam_r, 0.0)
        parts.append(jnp.clip(soft, l[:, mb:mb + ml], u[:, mb:mb + ml]))
    if cone.m_soc:
        vs = v[:, mb + ml:]
        T = S - H                                       # tail selector
        t = _mm(vs, H)                                  # (B, n_soc) heads
        nu2 = _mm(vs * vs, T)
        nu = jnp.sqrt(jnp.maximum(nu2, 0.0))
        safe = jnp.where(nu > 0, nu, 1.0)
        c = 0.5 * (t + nu)
        in_cone = nu <= t
        in_polar = nu <= -t
        t_out = jnp.where(in_cone, t, jnp.where(in_polar, 0.0, c))
        scal = jnp.where(in_cone, 1.0, jnp.where(in_polar, 0.0, c / safe))
        # Tails: scale broadcast back through T^T; heads: t_out via H^T.
        z_soc = (vs * _mm(scal, jnp.swapaxes(T, 0, 1))
                 + _mm(t_out, jnp.swapaxes(H, 0, 1)))
        parts.append(z_soc)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _iter_math(A, At, Minv, M, q, rho, lam_r, l, u, x, z, y, *, cone,
               S, H, sigma, alpha, k, refine_steps):
    """The k-iteration loop, written once for kernel AND fallback."""

    def one(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + _mm(rho * z - y, A)       # (B, n)
        xt = _mm(rhs, Minv)
        for _ in range(refine_steps):
            r = rhs - _mm(xt, M)
            xt = xt + _mm(r, Minv)
        zt = _mm(xt, At)
        x_new = alpha * xt + (1.0 - alpha) * x
        w = alpha * zt + (1.0 - alpha) * z
        v = w + y / rho
        z_new = _project_cone_mm(v, l, u, lam_r, cone, S, H)
        y_new = y + rho * (w - z_new)
        return x_new, z_new, y_new

    return jax.lax.fori_loop(0, k, one, (x, z, y))


def _make_kernel(cone, sigma, alpha, k, refine_steps, has_l1, has_soc):
    """Kernel with exact arity for the cone layout (no dummy operands)."""

    def kernel(*refs):
        it = iter(refs)
        A = next(it)[:]
        At = next(it)[:]
        Minv = next(it)[:]
        M = next(it)[:]
        q = next(it)[:]
        rho = next(it)[:]
        lam_r = next(it)[:] if has_l1 else None
        S = next(it)[:] if has_soc else None
        H = next(it)[:] if has_soc else None
        l = next(it)[:]
        u = next(it)[:]
        x = next(it)[:]
        z = next(it)[:]
        y = next(it)[:]
        xo, zo, yo = next(it), next(it), next(it)
        xn, zn, yn = _iter_math(
            A, At, Minv, M, q, rho, lam_r, l, u, x, z, y, cone=cone,
            S=S, H=H, sigma=sigma, alpha=alpha, k=k,
            refine_steps=refine_steps)
        xo[:] = xn
        zo[:] = zn
        yo[:] = yn

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cone", "sigma", "alpha", "k", "refine_steps",
                     "interpret", "lane_tile"))
def fused_iterate_shared(A, Minv, M, q, rho_vec, lam, l, u, x, z, y,
                         cone: ConeSpec, sigma: float, alpha: float,
                         k: int, refine_steps: int = 1,
                         interpret: bool = False, lane_tile: int = 256):
    """Run k fused ADMM iterations on the shared-matrix batch.

    Shared operands are unbatched; x/z/y and l/u carry the (B,) lane
    axis. B is processed in `lane_tile` chunks via lax.map; each chunk
    is one single-program pallas launch with everything in VMEM.
    Returns (x, z, y).
    """
    dt = x.dtype
    B, n = x.shape
    m = z.shape[-1]
    ml = cone.m_l1
    if cone.m_soc and not cone.soc_uniform:
        raise ValueError("fused kernel requires uniform SOC block dims")
    has_l1 = ml > 0
    has_soc = cone.m_soc > 0

    q2 = q.reshape(1, n)
    rho2 = rho_vec.reshape(1, m)
    if l.ndim == 1:
        l = jnp.broadcast_to(l, (B, m))
        u = jnp.broadcast_to(u, (B, m))

    shared = [A, A.T, Minv, M, q2, rho2]
    if has_l1:
        lam_r = (lam / rho_vec[cone.m_box:cone.m_box + ml]).reshape(1, ml)
        shared.append(lam_r)
    if has_soc:
        S, H = soc_selectors(cone, dt)
        shared += [S, H]

    kern = _make_kernel(cone, float(sigma), float(alpha), int(k),
                        int(refine_steps), has_l1, has_soc)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run_tile(tile_args):
        lt, ut, xt, zt, yt = tile_args
        nb = xt.shape[0]
        return pl.pallas_call(
            kern,
            in_specs=[vspec] * (len(shared) + 5),
            out_specs=(vspec, vspec, vspec),
            out_shape=(
                jax.ShapeDtypeStruct((nb, n), dt),
                jax.ShapeDtypeStruct((nb, m), dt),
                jax.ShapeDtypeStruct((nb, m), dt),
            ),
            interpret=interpret,
        )(*shared, lt, ut, xt, zt, yt)

    tile = min(lane_tile, B)
    if B % tile != 0:
        tile = B
    if tile == B:
        return run_tile((l, u, x, z, y))
    # Python-unrolled chunk loop: wrapping pallas_call in lax.map/scan
    # re-introduces an implicit grid whose index maps this remote Mosaic
    # build rejects ('func.return' legalization); the unrolled calls all
    # share one compiled kernel and serialise on the MXU regardless.
    nchunk = B // tile
    outs = []
    for i in range(nchunk):
        sl = slice(i * tile, (i + 1) * tile)
        outs.append(run_tile((l[sl], u[sl], x[sl], z[sl], y[sl])))
    xo = jnp.concatenate([o[0] for o in outs], axis=0)
    zo = jnp.concatenate([o[1] for o in outs], axis=0)
    yo = jnp.concatenate([o[2] for o in outs], axis=0)
    return xo, zo, yo
