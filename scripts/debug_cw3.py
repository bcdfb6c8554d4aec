"""Reproduce the CW f32 phase stall exactly (s32 settings, f32 data)."""
import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.models.clohessy_wiltshire import build_cw_rendezvous
from admm_library_tpu import api
from admm_library_tpu.solution import Status

rng = np.random.default_rng(0)
s0 = np.array([100.0, -1000.0, 20.0, 0.1, 0.5, -0.05])
s0[:3] += rng.uniform(-20, 20, 3)
qp, spec = build_cw_rendezvous(s0, N=20)

base = Settings(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000)
s32 = api._s32_of(base).replace(history=60, max_iter=20000)
print("s32:", {k: getattr(s32, k) for k in
               ("eps_abs", "eps_rel", "sigma", "rho_eq_scale", "alpha",
                "rho", "adaptive_rho_tol")})

qp32 = qp.astype(jnp.float32)
x0 = jnp.zeros(qp.n, jnp.float32)
z0 = jnp.zeros(qp.m, jnp.float32)
y0 = jnp.zeros(qp.m, jnp.float32)

def show(tag, sol):
    print(f"[{tag}] iters={int(sol.iters)} status="
          f"{Status(int(sol.status)).name} r_p={float(sol.r_prim):.2e} "
          f"r_d={float(sol.r_dual):.2e} rho={float(sol.rho):.3e}",
          flush=True)
    h = np.asarray(sol.history)
    h = h[h[:, 0] > 0]
    h = h[np.argsort(h[:, 0])]
    for row in h[::3][-15:]:
        print(f"  it={int(row[0]):6d} r_p={row[1]:.3e} r_d={row[2]:.3e}")

sol = api._phase_jit(qp32, x0, z0, y0, s32, "inv")
show("f32-inv", sol)
sol = api._phase_jit(qp32, x0, z0, y0, s32, "chol")
show("f32-chol", sol)
sol = api._phase_jit(qp32, x0, z0, y0, s32.replace(adaptive_rho=False,
                                                   rho=3.34), "inv")
show("f32-inv-fixedrho3.3", sol)

qp64 = qp.astype(jnp.float64)
x064 = jnp.zeros(qp.n, jnp.float64)
z064 = jnp.zeros(qp.m, jnp.float64)
y064 = jnp.zeros(qp.m, jnp.float64)
sol = api._phase_jit(qp64, x064, z064, y064, s32, "inv")
show("f64-s32settings", sol)
sol = api._phase_jit(qp32, x0, z0, y0,
                     s32.replace(sigma=1e-6, rho_eq_scale=1e3), "inv")
show("f32-origsigma", sol)
sol = api._phase_jit(qp32, x0, z0, y0, s32.replace(refine_steps=3), "inv")
show("f32-refine3", sol)
sol = api._phase_jit(qp32, x0, z0, y0, s32.replace(alpha=1.0), "inv")
show("f32-alpha1", sol)
