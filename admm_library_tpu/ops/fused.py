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
Larger batches run as a 1-D pallas grid over lane tiles sized to the
VMEM budget (auto_lane_tile): shared operands use constant index maps
and stay resident; Mosaic double-buffers the per-lane tiles so the next
tile's HBM->VMEM DMA overlaps the current tile's compute.

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

# (np is used for static VMEM byte accounting at trace time.)


# TPU VMEM is ~16 MiB/core; budget 10 MiB for kernel operands — Mosaic
# double-buffers every gridded block and the kernel body's temporaries
# live on the same scoped stack, so the per-lane estimates below must
# stay conservative (measured: a 12 MiB budget with a thin per-lane
# estimate overflowed the 16 MiB scoped limit by 288K on the flagship
# shapes).
VMEM_BUDGET_BYTES = 10 * 2 ** 20


def auto_lane_tile(shared_bytes: int, per_lane_bytes: int,
                   B: int, requested: int | None) -> int:
    """Largest lane tile that fits the VMEM budget (VERDICT r1 item 8).

    shared_bytes: operands resident regardless of tile (matrices etc);
    per_lane_bytes: bytes per batch lane (iterates + temporaries).
    Refuses (ValueError) when even an 8-lane tile cannot fit — callers
    should fall back to a non-Pallas backend rather than hit a Mosaic
    OOM mid-solve.
    """
    avail = VMEM_BUDGET_BYTES - shared_bytes
    if avail < 8 * per_lane_bytes:
        raise ValueError(
            f"problem too large for the fused Pallas kernel: shared "
            f"operands {shared_bytes / 2**20:.1f} MiB + 8 lanes x "
            f"{per_lane_bytes} B exceed the {VMEM_BUDGET_BYTES / 2**20:.0f}"
            f" MiB VMEM budget")
    tile = min(int(avail // per_lane_bytes), B)
    if requested is not None:
        tile = min(tile, requested)
    # Round down to the f32 sublane multiple; keep at least 8 lanes.
    return max(8, (tile // 8) * 8)


def fused_fits(n: int, m: int, cone: ConeSpec, dtype) -> bool:
    """True when the fused kernel's shared operands + an 8-lane tile fit
    the VMEM budget — callers fall back to the plain-XLA iteration body
    instead of raising mid-trace (e.g. the N=200 low-thrust SOCP's
    2000x2000 inverse alone is 16 MiB)."""
    itemsize = jnp.dtype(dtype).itemsize
    shared = 2 * m * n + 2 * n * n + n + m           # A, At, Minv, M, q, rho
    if cone.m_l1:
        shared += cone.m_l1
    if cone.m_soc:
        shared += 2 * cone.m_soc * cone.n_soc        # S, H selectors
    per_lane = (8 * n + 16 * m) * itemsize
    return VMEM_BUDGET_BYTES - shared * itemsize >= 8 * per_lane


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
                         interpret: bool = False,
                         lane_tile: int | None = None):
    """Run k fused ADMM iterations on the shared-matrix batch.

    Shared operands are unbatched; x/zy and l/u carry the (B,) lane
    axis. B is processed as a 1-D pallas grid over lane tiles (Mosaic
    pipelines the next tile's HBM->VMEM DMA behind the current tile's
    compute); the tile size is auto-fitted to the VMEM budget
    (auto_lane_tile) unless `lane_tile` pins it. Returns (x, z, y).
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

    itemsize = jnp.dtype(dt).itemsize
    shared_bytes = sum(int(np.prod(a.shape)) for a in shared) * itemsize
    # Per lane: double-buffered grid blocks (2x: l/u/z/y in + z/y out =
    # 6m; x in + x out = 2n -> 4n + 12m) plus body temporaries
    # (rhs/xt/refine-r ~ 4n; zt/w/v/z_new ~ 4m).
    per_lane = (8 * n + 16 * m) * itemsize
    tile = auto_lane_tile(shared_bytes, per_lane, B, lane_tile)

    # Pad the lane axis up to a tile multiple (duplicated work on <8%
    # of lanes in the worst case; outputs sliced back).
    Bp = ((B + tile - 1) // tile) * tile
    if Bp != B:
        pad = [(0, Bp - B), (0, 0)]
        l, u, x, z, y = (jnp.pad(a, pad, mode="edge")
                         for a in (l, u, x, z, y))

    kern = _make_kernel(cone, float(sigma), float(alpha), int(k),
                        int(refine_steps), has_l1, has_soc)

    # Index maps cast to i32: under jax_enable_x64 the grid index math
    # traces as i64, which this Mosaic build cannot legalize (measured:
    # 'func.return' legalization failure on any x64 gridded kernel).
    i32 = jnp.int32

    def const_spec(a):
        zero = lambda i: tuple(i32(0) for _ in a.shape)
        return pl.BlockSpec(a.shape, zero, memory_space=pltpu.VMEM)

    lane_n = pl.BlockSpec((tile, n), lambda i: (i32(i), i32(0)),
                          memory_space=pltpu.VMEM)
    lane_m = pl.BlockSpec((tile, m), lambda i: (i32(i), i32(0)),
                          memory_space=pltpu.VMEM)

    xo, zo, yo = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[const_spec(a) for a in shared]
        + [lane_m, lane_m, lane_n, lane_m, lane_m],
        out_specs=(lane_n, lane_m, lane_m),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, n), dt),
            jax.ShapeDtypeStruct((Bp, m), dt),
            jax.ShapeDtypeStruct((Bp, m), dt),
        ),
        interpret=interpret,
    )(*shared, l, u, x, z, y)
    if Bp != B:
        xo, zo, yo = xo[:B], zo[:B], yo[:B]
    return xo, zo, yo
