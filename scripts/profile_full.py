"""Verify the full-solve timing anomaly: did the while loop really run
max_iter iterations, and where do the bench's 480 ms go (AOT wrapper vs
in-process jit vs phases)?"""
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.parallel.batch import (
    run_admm_batch_shared, solve_batch_shared)


def timed1(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    settings = Settings(precision="single")
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=1024, N=50, dim=3, dtype=jnp.float32)
    qps, scaling = ruiz_equilibrate(qp, settings.scaling_iters)
    B, n, m = 1024, qps.n, qps.m
    x = jnp.zeros((B, n), jnp.float32)
    z = jnp.zeros((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)

    for mi in (200, 800):
        st = settings.replace(max_iter=mi, eps_abs=0.0, eps_rel=0.0,
                              eps_pinf=0.0, eps_dinf=0.0)
        f = jax.jit(lambda x, z, y, st=st: run_admm_batch_shared(
            qps, scaling, st, x, z, y, "inv"))
        out, dt = timed1(f, x, z, y)
        st_cnt = np.bincount(np.asarray(out.status), minlength=8)
        print(f"max_iter={mi}: {dt*1e3:.2f} ms  it={int(out.it)} "
              f"status_counts={st_cnt.tolist()} "
              f"-> {int(out.it)/dt:.0f} iters/s")

    # the bench path, in-process jit (no AOT)
    os.environ["ADMM_TPU_NO_AOT"] = "1"
    s = Settings(eps_abs=1e-6, eps_rel=1e-6)
    sol, dt = timed1(lambda: solve_batch_shared(qp, s))
    print(f"bench path NO_AOT: {dt*1e3:.2f} ms iters={int(np.max(np.asarray(sol.iters)))} "
          f"r_p={float(np.max(np.asarray(sol.r_prim))):.2e}")

    del os.environ["ADMM_TPU_NO_AOT"]
    sol, dt = timed1(lambda: solve_batch_shared(qp, s))
    print(f"bench path AOT   : {dt*1e3:.2f} ms iters={int(np.max(np.asarray(sol.iters)))} "
          f"r_p={float(np.max(np.asarray(sol.r_prim))):.2e}")


if __name__ == "__main__":
    main()
