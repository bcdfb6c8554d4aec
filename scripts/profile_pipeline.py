"""Decompose solve_batch_shared wall-clock at batch=128 (headline gap).

The while_loop itself runs ~66k iters/s; the bench reports 8.6k. This
times each stage of the hybrid pipeline to find where the other ~43 ms
goes: Ruiz, factorisation, the f32 phase, each recenter round, the f64
true-residual accounting.
"""
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
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import kkt
from admm_library_tpu.parallel import batch as pb


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


def main():
    B = 128
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=B, N=50, dim=3)
    x0 = jnp.zeros((B, qp.n), qp.dtype)
    z0 = jnp.zeros((B, qp.m), qp.dtype)
    y0 = jnp.zeros_like(z0)
    base = Settings(eps_abs=1e-6, eps_rel=1e-6)

    qp32 = qp.astype(jnp.float32)
    # Stage: Ruiz alone.
    f = jax.jit(lambda q: ruiz_equilibrate(q, base.scaling_iters))
    (_, dt) = timed(f, qp32)
    print(f"ruiz_equilibrate        : {dt*1e3:8.2f} ms")

    # Stage: factor alone (inv backend, f32).
    qps, scaling = ruiz_equilibrate(qp32, base.scaling_iters)
    from admm_library_tpu.core import admm
    eq = admm.is_equality_row_shared(qps)
    rv = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq, base)
    f = jax.jit(lambda: kkt.factor_condensed(
        qps.P, qps.A, base.sigma, rv, "inv"))
    (_, dt) = timed(f)
    print(f"factor inv (f32)        : {dt*1e3:8.2f} ms")

    # Whole-pipeline variants.
    for tag, s in (
        ("f32 phase only 1e-4", base.replace(
            precision="single", eps_abs=1e-4, eps_rel=1e-4)),
        ("single fused 1e-6", base.replace(precision="single")),
        ("hybrid rounds=2", base),
        ("hybrid rounds=1", base.replace(recenter_rounds=1)),
    ):
        sol, dt = timed(lambda s=s: pb.solve_batch_shared(qp, s, x0, z0, y0),
                        reps=5)
        it = int(np.max(np.asarray(sol.iters)))
        print(f"{tag:22s}: {dt*1e3:8.2f} ms  iters={it:5d} "
              f"({it/dt:7.0f} it/s) r_p={float(np.max(np.asarray(sol.r_prim))):.1e}"
              f" r_d={float(np.max(np.asarray(sol.r_dual))):.1e} "
              f"solved={bool(np.all(np.asarray(sol.status)==1))}")


if __name__ == "__main__":
    main()
