"""Isolate the r3 headline regression: batch-128 solve-to-1e-6 went
22.7k it/s (r2) -> 10.3k (post restart-averaging/safeguard commit).
Times the full solve under setting variants to find the cost.
"""
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
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.parallel.batch import solve_batch_shared


def timed(fn, reps=12):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts)), float(np.min(ts))


def main():
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=128, N=50, dim=3)
    base = Settings(eps_abs=1e-6, eps_rel=1e-6)
    variants = {
        "default": base,
        "phase1_only_1e-4": base.replace(precision="single",
                                         eps_abs=1e-4, eps_rel=1e-4),
        "no_restart_no_stall": base.replace(restart_every=0,
                                            stall_checks=0),
        "recenter_1": base.replace(recenter_rounds=1),
    }
    for name, s in variants.items():
        t0 = time.perf_counter()
        sol, med, mn = timed(lambda s=s: solve_batch_shared(qp, s))
        compile_s = time.perf_counter() - t0
        it = int(np.max(np.asarray(sol.iters)))
        ok = bool(np.all(np.asarray(sol.status) == 1))
        print(f"{name:22s} iters={it:5d} med={med*1e3:7.2f}ms "
              f"min={mn*1e3:7.2f}ms it/s={it/med:8.0f} solved={ok} "
              f"rp={float(np.max(np.asarray(sol.r_prim))):.2e} "
              f"(first+reps={compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
