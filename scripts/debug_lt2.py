"""Eager re-centered rounds on the LT SOCP: where does the 1e-4 floor
come from? Replicates parallel.batch._solve_shared_recentered's round
construction outside lax.cond so every round's true residuals print."""
import os
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
from admm_library_tpu import Settings, Status
from admm_library_tpu.models import low_thrust as lt
from admm_library_tpu.problem import QPData
from admm_library_tpu.parallel import batch as B
from admm_library_tpu import xprec
from admm_library_tpu.core.scaling import ruiz_equilibrate

s0 = np.array([200.0, -1500.0, 50.0, 0.0, 0.8, -0.05])
qp, spec = lt.build_low_thrust_socp(s0, N=25, dt=240.0, u_max=0.05)
key = jax.random.PRNGKey(0)
disp = jax.random.normal(key, (2, 6)) * jnp.array([20., 20., 20., .02, .02, .02])
l, u = lt.lt_bounds_for_s0(qp, spec, jnp.asarray(s0) + disp)
qpb = QPData(P=qp.P, q=qp.q, A=qp.A, l=l, u=u, lam=qp.lam, cone=qp.cone)
s = Settings(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000,
             band_block=spec.block)
f32, f64 = jnp.float32, jnp.float64
cone = qp.cone
mb, ml = cone.m_box, cone.m_l1
B_ = 2

s1 = B._s32_of_shared(s)
qp32 = qpb.astype(f32)
qp64 = qpb.astype(f64)
_, scaling1 = ruiz_equilibrate(qp32, s1.scaling_iters)
sol = B._phase(qp32, jnp.zeros((B_, qp.n), f32), jnp.zeros((B_, qp.m), f32),
               jnp.zeros((B_, qp.m), f32), s1, "inv", scaling=scaling1)
x_t = np.asarray(sol.x, np.float64)
y_t = np.asarray(sol.y, np.float64)
z_t = np.asarray(sol.z, np.float64)
rho = sol.rho
act_tol = 10.0 * max(s.hybrid_eps, s.eps_abs)
A64 = np.asarray(qp64.A); P64 = np.asarray(qp64.P); q64 = np.asarray(qp64.q)
l64 = np.asarray(qp64.l); u64 = np.asarray(qp64.u)

def true_res(x, y, z):
    Ax = x @ A64.T
    r_p = np.max(np.abs(Ax - z))
    r_d = np.max(np.abs(x @ P64.T + q64 + y @ A64))
    return r_p, r_d

print("after phase1:", true_res(x_t, y_t, z_t))
s_c = s1.replace(eps_abs=s.eps_abs, eps_rel=s.eps_rel)

for r in range(4):
    scale = 1.0 + np.abs(z_t)
    near_l = np.where(np.isfinite(l64), z_t - l64 <= act_tol * scale, False)
    near_u = np.where(np.isfinite(u64), u64 - z_t <= act_tol * scale, False)
    y_base = np.zeros_like(y_t)
    yb_box = (np.where(near_l, np.minimum(y_t, 0.0), 0.0)
              + np.where(near_u, np.maximum(y_t, 0.0), 0.0))
    y_base[..., :mb] = yb_box[..., :mb]
    # SOC base: projection of y onto N_SOC(z) (ray / polar / 0).
    d = cone.soc_dims[0]
    shp = z_t[..., mb + ml:].shape[:-1] + (cone.n_soc, d)
    zb = z_t[..., mb + ml:].reshape(shp)
    yb = y_t[..., mb + ml:].reshape(shp)
    t, uu = zb[..., 0], zb[..., 1:]
    yt, yu = yb[..., 0], yb[..., 1:]
    nu = np.linalg.norm(uu, axis=-1)
    sc = act_tol * (1.0 + np.abs(t) + nu)
    interior = nu <= t - sc
    tip = (nu <= sc) & (t <= sc)
    safe = np.maximum(nu, 1e-300)
    cross = np.sum(yu * uu, axis=-1) / safe - yt
    s_ray = 0.5 * np.maximum(cross, 0.0)
    ray_t = -s_ray
    ray_u = s_ray[..., None] * (uu / safe[..., None])
    nyu = np.linalg.norm(yu, axis=-1)
    # Moreau polar part of y
    insoc = nyu <= yt
    inpolar = nyu <= -yt
    cc = 0.5 * (yt + nyu)
    safy = np.maximum(nyu, 1e-300)
    pt = np.where(insoc, yt, np.where(inpolar, 0.0, cc))
    pscale = np.where(insoc, 1.0, np.where(inpolar, 0.0, cc / safy))
    pu = yu * pscale[..., None]
    tip_t, tip_u = yt - pt, yu - pu
    bt = tip_t
    bu = tip_u
    base = np.concatenate([bt[..., None], bu], axis=-1)
    y_base[..., mb + ml:] = base.reshape(z_t[..., mb + ml:].shape)
    drop = y_t - y_base
    ib = np.unravel_index(np.argmax(np.abs(drop[..., :mb])), drop[..., :mb].shape)
    print(f"  worst box drop at row {ib}: y={y_t[ib]:.3e} z={z_t[ib]:.3e} "
          f"l={l64[ib]:.3e} u={u64[ib]:.3e} "
          f"near_l={near_l[ib]} near_u={near_u[ib]}")
    print(f"  base drop: box={np.max(np.abs(drop[..., :mb])):.3e} "
          f"soc={np.max(np.abs(drop[..., mb+ml:])):.3e} "
          f"|y_box|={np.max(np.abs(y_t[..., :mb])):.3e} "
          f"|y_soc|={np.max(np.abs(y_t[..., mb+ml:])):.3e} "
          f"n_int={int(np.sum(interior))} n_tip={int(np.sum(tip))} "
          f"n_bnd={int(np.sum(~interior & ~tip))}")
    Ax = x_t @ A64.T
    Px = x_t @ P64.T
    g = Px + q64 + y_base @ A64
    l_c = np.concatenate([l64[..., :mb] - Ax[..., :mb], l64[..., mb:]], -1)
    u_c = np.concatenate([u64[..., :mb] - Ax[..., :mb], u64[..., mb:]], -1)
    off = np.concatenate([np.zeros_like(Ax[..., :mb]), Ax[..., mb:]], -1)
    qp_c = QPData(P=qp.P.astype(f32), q=jnp.asarray(g, f32),
                  A=qp.A.astype(f32), l=jnp.asarray(l_c, f32),
                  u=jnp.asarray(u_c, f32), lam=qp.lam.astype(f32),
                  cone=cone)
    zc0 = jnp.asarray(z_t - Ax, f32)
    yw = jnp.asarray(y_t - y_base, f32)
    import os
    rho_mode = os.environ.get("RHO_MODE", "warm")
    r0 = {"warm": rho.astype(f32), "cold": None,
          "phase1": sol.rho.astype(f32)}[rho_mode]
    solc = B._phase(qp_c, jnp.zeros((B_, qp.n), f32), zc0, yw, s_c,
                    "inv", scaling=scaling1, rho0=r0,
                    z_off=jnp.asarray(off))
    jax.block_until_ready(solc)
    dx = np.asarray(solc.x, np.float64)
    dy = np.asarray(solc.y, np.float64)
    dz = np.asarray(solc.z, np.float64)
    print(f"round {r}: rho_in={float(np.asarray(rho)):.2e} "
          f"rho_out={float(np.asarray(solc.rho)):.2e}")
    print(f"round {r}: iters={np.asarray(solc.iters).tolist()} "
          f"status={[Status(int(v)).name for v in np.asarray(solc.status)]} "
          f"corr r_p={np.max(np.asarray(solc.r_prim)):.2e} "
          f"r_d={np.max(np.asarray(solc.r_dual)):.2e} "
          f"|dx|={np.max(np.abs(dx)):.2e} |dy|={np.max(np.abs(dy)):.2e}")
    x_t = x_t + dx
    y_t = y_base + dy
    z_t = Ax + dz
    rho = solc.rho
    print(f"  total true: r_p={true_res(x_t, y_t, z_t)[0]:.3e} "
          f"r_d={true_res(x_t, y_t, z_t)[1]:.3e}")
