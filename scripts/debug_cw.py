"""Diagnose config-3 (CW min-fuel) polish miss: why does the active-set
polish not land on the bench config (N=20, seed 0)? Runs on CPU f64."""
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
from admm_library_tpu.core import polish as polish_mod
from admm_library_tpu.solution import Status

rng = np.random.default_rng(0)
s0 = np.array([100.0, -1000.0, 20.0, 0.1, 0.5, -0.05])
s0[:3] += rng.uniform(-20, 20, 3)
qp, spec = build_cw_rendezvous(s0, N=20)
settings = Settings(eps_abs=1e-6, eps_rel=1e-6, max_iter=50000)
print("n,m:", qp.n, qp.m, "cone:", qp.cone)

orig_phase_jit = api._phase_jit
orig_phase_off_jit = api._phase_off_jit
orig_polish = polish_mod._polish_inner

def wrap(name, f):
    def g(*a, **k):
        t0 = time.perf_counter()
        out = f(*a, **k)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        it = int(np.asarray(out.iters))
        st = int(np.asarray(out.status))
        rp = float(np.max(np.asarray(out.r_prim)))
        rd = float(np.max(np.asarray(out.r_dual)))
        print(f"[{name}] dt={dt:.3f}s iters={it} status={Status(st).name} "
              f"r_p={rp:.2e} r_d={rd:.2e}", flush=True)
        return out
    return g

api._phase_jit = wrap("phase", orig_phase_jit)
api._phase_off_jit = wrap("phase_off", orig_phase_off_jit)

def polish_dbg(qp_, sol, eps_abs, eps_rel, act_tol, delta):
    out = orig_polish(qp_, sol, eps_abs, eps_rel, act_tol, delta)
    rp = float(np.max(np.asarray(out.r_prim)))
    rd = float(np.max(np.asarray(out.r_dual)))
    st = int(np.asarray(out.status))
    print(f"[polish act_tol={act_tol:g}] -> status={Status(st).name} "
          f"r_p={rp:.2e} r_d={rd:.2e}", flush=True)
    return out

polish_mod._polish_inner = polish_dbg
# api imported polish_fn by value; re-point it
api.polish_fn = lambda qp_, sol, ea, er, act_tol=1e-4, delta=1e-7: \
    polish_dbg(qp_, sol, ea, er, act_tol, delta)

t0 = time.perf_counter()
sol = api.solve(qp, settings)
jax.block_until_ready(sol)
print(f"TOTAL: {time.perf_counter()-t0:.2f}s")
print("final:", Status(int(sol.status)).name, "iters", int(sol.iters),
      "r_p", float(sol.r_prim), "r_d", float(sol.r_dual))
