"""Diagnose config-4 (low-thrust SOCP) staging: which phases run, cost of
each, residuals after each. Run on the chip."""
import os, time
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.models.low_thrust import build_low_thrust_socp
from admm_library_tpu import api
from admm_library_tpu.solution import Status

s0 = np.array([500.0, -2000.0, 100.0, 0.0, 1.0, -0.1])
qp, spec = build_low_thrust_socp(s0, N=200)
settings = Settings(eps_abs=1e-6, eps_rel=1e-6, band_block=spec.block,
                    max_iter=50000)

# monkeypatch stage tracing
orig_phase_jit = api._phase_jit
orig_phase_off_jit = api._phase_off_jit
orig_polish_jit = api._polish_jit

def wrap(name, f):
    def g(*a, **k):
        t0 = time.perf_counter()
        out = f(*a, **k)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        it = int(np.asarray(out.iters)) if hasattr(out, "iters") else -1
        st = int(np.asarray(out.status)) if hasattr(out, "status") else -1
        rp = float(np.max(np.asarray(out.r_prim)))
        rd = float(np.max(np.asarray(out.r_dual)))
        dt_arg = a[0].P.dtype if hasattr(a[0], "P") else "?"
        print(f"[{name}] dt={dt:.3f}s dtype={dt_arg} iters={it} "
              f"status={Status(st).name} r_p={rp:.2e} r_d={rd:.2e}",
              flush=True)
        return out
    return g

api._phase_jit = wrap("phase", orig_phase_jit)
api._phase_off_jit = wrap("phase_off", orig_phase_off_jit)
api._polish_jit = wrap("polish", orig_polish_jit)

t0 = time.perf_counter()
sol = api.solve(qp, settings)
jax.block_until_ready(sol)
print(f"TOTAL first call (incl compile): {time.perf_counter()-t0:.3f}s")
t0 = time.perf_counter()
sol = api.solve(qp, settings)
jax.block_until_ready(sol)
print(f"TOTAL second call: {time.perf_counter()-t0:.3f}s")
print("final:", Status(int(sol.status)).name, "iters", int(sol.iters),
      "r_p", float(sol.r_prim), "r_d", float(sol.r_dual))
