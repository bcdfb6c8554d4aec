"""Stage-level timing of the staged hybrid solve on the MPC benchmark."""
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
from admm_library_tpu.api import (
    _phase_jit, _polish_jit, _s32_of, resolve_backend)
from admm_library_tpu.models.double_integrator import build_mpc_qp

EPS = 1e-6


def t1(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    s0 = np.concatenate([rng.uniform(-2, 2, 3), rng.uniform(-0.2, 0.2, 3)])
    qp, spec = build_mpc_qp(s0, np.zeros(6), N=50, dim=3)
    settings = Settings(eps_abs=EPS, eps_rel=EPS, band_block=spec.block)
    backend = resolve_backend(settings, qp_n=qp.n)
    print("backend:", backend)

    f32, f64 = jnp.float32, jnp.float64
    qp32 = qp.astype(f32)
    n, m = qp.n, qp.m
    z32 = jnp.zeros((m,), f32)
    x32 = jnp.zeros((n,), f32)
    s32 = _s32_of(settings)

    sol32, dt = t1(_phase_jit, qp32, x32, z32, z32, s32, backend)
    print(f"f32 phase: {dt*1e3:8.1f} ms iters={int(sol32.iters)} "
          f"r_p={float(sol32.r_prim):.2e} r_d={float(sol32.r_dual):.2e}")

    qp64 = qp.astype(f64)
    from admm_library_tpu.solution import Solution
    sol32_64 = Solution(
        x=sol32.x.astype(f64), z=sol32.z.astype(f64),
        y=sol32.y.astype(f64), status=sol32.status, iters=jnp.int32(0),
        r_prim=sol32.r_prim.astype(f64), r_dual=sol32.r_dual.astype(f64),
        obj=sol32.obj.astype(f64), rho=sol32.rho.astype(f64),
        history=sol32.history.astype(f64))
    pol, dt = t1(_polish_jit, qp64, sol32_64, EPS, EPS, 10.0 * 1e-4)
    print(f"polish   : {dt*1e3:8.1f} ms status={int(pol.status)} "
          f"r_p={float(pol.r_prim):.2e} r_d={float(pol.r_dual):.2e}")

    s64 = settings.replace(precision="single", warm_start=True,
                           polish=False)
    for b64 in ("cg", "inv", "banded"):
        sol64, dt = t1(_phase_jit, qp64, sol32_64.x, sol32_64.z,
                       sol32_64.y, s64, b64)
        print(f"f64 phase [{b64:6s}]: {dt*1e3:8.1f} ms "
              f"iters={int(sol64.iters)} r_p={float(sol64.r_prim):.2e}")


if __name__ == "__main__":
    main()
