"""Pallas TPU fused ADMM iteration kernel (K3/A1 fusion, SURVEY.md §2.2).

Runs `k` complete ADMM iterations of the SHARED-MATRIX batch path in one
kernel launch with every operand resident in VMEM:

    A (m, n), At (n, m), Minv (n, n), M (n, n), q, rho, bounds — shared
    x (B, n), z (B, m), y (B, m)                                — per lane

Per iteration: 3 MXU matmuls (rhs assembly, Minv apply, A apply) plus 2
per iterative-refinement step, with the prox and dual updates on the
VPU. For the flagship config (B=128 lanes/chip, n=450, m=456, f32) the
working set is ~3.3 MB — far under the ~16 MB VMEM budget — so a whole
`check_every` block runs without touching HBM: this is what "fused
on-device kernels inside a jit'd lax.while_loop" [BASELINE.json
north_star] means at the hardware level.

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


def _kernel(A_ref, At_ref, Minv_ref, M_ref, q_ref, rho_ref, lam_ref,
            S_ref, H_ref, l_ref, u_ref, x_ref, z_ref, y_ref,
            xo_ref, zo_ref, yo_ref, *, cone, sigma, alpha, k,
            refine_steps):
    x, z, y = _iter_math(
        A_ref[:], At_ref[:], Minv_ref[:], M_ref[:], q_ref[:], rho_ref[:],
        lam_ref[:], l_ref[:], u_ref[:], x_ref[:], z_ref[:], y_ref[:],
        cone=cone, S=S_ref[:], H=H_ref[:], sigma=sigma, alpha=alpha,
        k=k, refine_steps=refine_steps)
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("cone", "sigma", "alpha", "k", "refine_steps",
                     "interpret", "lane_tile"))
def fused_iterate_shared(A, Minv, M, q, rho_vec, lam, l, u, x, z, y,
                         cone: ConeSpec, sigma: float, alpha: float,
                         k: int, refine_steps: int = 1,
                         interpret: bool = False, lane_tile: int = 128):
    """Run k fused ADMM iterations on the shared-matrix batch.

    Shared operands are unbatched; x/z/y and l/u carry the (B,) lane
    axis. B is tiled by `lane_tile` over the pallas grid; shared
    operands are re-presented to every tile and stay VMEM-resident.
    Returns (x, z, y).
    """
    dt = x.dtype
    B, n = x.shape
    m = z.shape[-1]
    ml = cone.m_l1
    if cone.m_soc and not cone.soc_uniform:
        raise ValueError("fused kernel requires uniform SOC block dims")
    S, H = (soc_selectors(cone, dt) if cone.m_soc else
            (jnp.zeros((1, 1), dt), jnp.zeros((1, 1), dt)))
    q2 = q.reshape(1, n)
    rho2 = rho_vec.reshape(1, m)
    if ml:
        lam_r = (lam / rho_vec[cone.m_box:cone.m_box + ml]).reshape(1, ml)
    else:
        lam_r = jnp.zeros((1, 1), dt)
    if l.ndim == 1:
        l = jnp.broadcast_to(l, (B, m))
        u = jnp.broadcast_to(u, (B, m))

    tile = min(lane_tile, B)
    if B % tile != 0:
        tile = B
    grid = (B // tile,)

    def bspec(cols):
        return pl.BlockSpec((tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def sspec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, cone=cone, sigma=float(sigma), alpha=float(alpha),
        k=int(k), refine_steps=int(refine_steps))
    xo, zo, yo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            sspec(m, n), sspec(n, m),            # A, At
            sspec(n, n), sspec(n, n),            # Minv, M
            sspec(1, n), sspec(1, m),            # q, rho
            sspec(*lam_r.shape),                 # lam/rho
            sspec(*S.shape), sspec(*H.shape),    # SOC selectors
            bspec(m), bspec(m),                  # l, u
            bspec(n), bspec(m), bspec(m),        # x, z, y
        ],
        out_specs=(bspec(n), bspec(m), bspec(m)),
        out_shape=(
            jax.ShapeDtypeStruct((B, n), dt),
            jax.ShapeDtypeStruct((B, m), dt),
            jax.ShapeDtypeStruct((B, m), dt),
        ),
        interpret=interpret,
    )(A, A.T, Minv, M, q2, rho2, lam_r, S, H, l, u, x, z, y)
    return xo, zo, yo
