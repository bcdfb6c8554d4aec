"""Post-precision-fix measurement: MC-1024 benchmark by precision mode."""
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("ADMM_TPU_NO_AOT", "1")

import jax
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.parallel.batch import solve_batch_shared


def timed1(fn):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def report(tag, sol, dt):
    iters = int(np.max(np.asarray(sol.iters)))
    st = np.bincount(np.asarray(sol.status), minlength=8)
    print(f"{tag:18s}: {dt*1e3:8.1f} ms  iters={iters:5d} "
          f"({iters/dt:7.0f} it/s) status={st.tolist()} "
          f"r_p={float(np.max(np.asarray(sol.r_prim))):.2e} "
          f"r_d={float(np.max(np.asarray(sol.r_dual))):.2e}")


def main():
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=1024, N=50, dim=3)
    for tag, s in (
        ("single fused", Settings(eps_abs=1e-6, eps_rel=1e-6,
                                  precision="single")),
        ("single xla", Settings(eps_abs=1e-6, eps_rel=1e-6,
                                precision="single", fused="off")),
        ("hybrid fused", Settings(eps_abs=1e-6, eps_rel=1e-6)),
    ):
        sol, dt = timed1(lambda s=s: solve_batch_shared(qp, s))
        report(tag, sol, dt)


if __name__ == "__main__":
    main()
