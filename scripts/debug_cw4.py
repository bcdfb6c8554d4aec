"""Can an act_tol ladder polish land from a chattering f32 iterate?"""
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
from admm_library_tpu.core.polish import polish
from admm_library_tpu.solution import Solution, Status

rng = np.random.default_rng(0)
s0 = np.array([100.0, -1000.0, 20.0, 0.1, 0.5, -0.05])
s0[:3] += rng.uniform(-20, 20, 3)
qp, spec = build_cw_rendezvous(s0, N=20)

base = Settings(eps_abs=1e-6, eps_rel=1e-6)
qp32 = qp.astype(jnp.float32)
qp64 = qp.astype(jnp.float64)
x0 = jnp.zeros(qp.n, jnp.float32)
z0 = jnp.zeros(qp.m, jnp.float32)
y0 = jnp.zeros(qp.m, jnp.float32)

for it_cap in (500, 1000, 2000, 4000):
    s32 = api._s32_of(base).replace(max_iter=it_cap)
    sol32 = api._phase_jit(qp32, x0, z0, y0, s32, "inv")
    sol64 = Solution(
        x=sol32.x.astype(jnp.float64), z=sol32.z.astype(jnp.float64),
        y=sol32.y.astype(jnp.float64), status=sol32.status,
        iters=sol32.iters, r_prim=sol32.r_prim.astype(jnp.float64),
        r_dual=sol32.r_dual.astype(jnp.float64),
        obj=sol32.obj.astype(jnp.float64), rho=sol32.rho.astype(jnp.float64),
        history=sol32.history.astype(jnp.float64))
    print(f"--- phase1 iters={int(sol32.iters)} r_p="
          f"{float(sol32.r_prim):.2e} r_d={float(sol32.r_dual):.2e}")
    for act_tol in (3e-1, 1e-1, 3e-2, 1e-2, 3e-3, 1e-3, 1e-4):
        pol = polish(qp64, sol64, 1e-6, 1e-6, act_tol=act_tol)
        st = Status(int(pol.status)).name
        print(f"  act_tol={act_tol:8.0e} -> {st:10s} "
              f"r_p={float(pol.r_prim):.2e} r_d={float(pol.r_dual):.2e}")

# also: what does the true solution look like (impulse magnitudes)?
sol = api.solve(qp, base.replace(max_iter=50000))
x = np.asarray(sol.x, np.float64)
print("true dv magnitudes (per axis entries):")
print(np.array2string(np.sort(np.abs(x))[::-1][:20], precision=3))
print("n nonzero (>1e-6):", int(np.sum(np.abs(x) > 1e-6)))
