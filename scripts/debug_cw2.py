"""Sweep settings on the CW min-fuel f32 phase to find the stall cause."""
import os, time, sys
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

def run(tag, **kw):
    s = Settings(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000,
                 precision="double", polish=False, recenter_rounds=0,
                 history=40, **kw)
    t0 = time.perf_counter()
    sol = api.solve(qp, s)
    jax.block_until_ready(sol)
    dt = time.perf_counter() - t0
    print(f"[{tag}] iters={int(sol.iters)} status="
          f"{Status(int(sol.status)).name} r_p={float(sol.r_prim):.2e} "
          f"r_d={float(sol.r_dual):.2e} rho={float(sol.rho):.2e} "
          f"dt={dt:.2f}s", flush=True)
    return sol

sol = run("default-f64")
h = np.asarray(sol.history)
h = h[h[:, 0] > 0]
h = h[np.argsort(h[:, 0])]
for row in h[-20:]:
    print(f"  it={int(row[0]):6d} r_p={row[1]:.3e} r_d={row[2]:.3e}")

run("alpha1.0", alpha=1.0)
run("rho10", rho=10.0)
run("rhoeq1", rho_eq_scale=1.0)
run("rhoeq10", rho_eq_scale=10.0)
run("adapt-fast", adaptive_rho_interval=25, adaptive_rho_tol=2.0)
run("rho_max1e8", rho_max=1e8)
run("alpha1.8", alpha=1.8)
