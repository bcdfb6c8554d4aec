"""Decompose per-iteration cost at the v5e-8 per-chip share (batch=128).

Headline gap: measured 8651 it/s vs the 1e4 north star. This times the
fused k-iteration block, the residual/infeasibility check, and the full
driver at several check_every values and lane tiles to find the knob.
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

from admm_library_tpu import Settings
from admm_library_tpu.core import admm
from admm_library_tpu.core.scaling import ruiz_equilibrate
from admm_library_tpu.models import monte_carlo as mc
from admm_library_tpu.ops import fused as fused_ops
from admm_library_tpu.ops import kkt
from admm_library_tpu import xprec


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    B = 128
    settings = Settings(precision="single")
    qp, spec, _ = mc.monte_carlo_mpc(
        jax.random.PRNGKey(0), batch=B, N=50, dim=3, dtype=jnp.float32)
    qps, scaling = ruiz_equilibrate(qp, settings.scaling_iters)
    eq = admm.is_equality_row_shared(qps)
    rho_vec = admm.rho_vec_of(jnp.asarray(0.1, jnp.float32), eq, settings)
    fac = kkt.factor_condensed(qps.P, qps.A, settings.sigma, rho_vec, "inv")
    n, m = qps.n, qps.m
    print(f"shapes: B={B} n={n} m={m}")
    x = jnp.zeros((B, n), jnp.float32)
    z = jnp.zeros((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)

    for k in (25, 50, 100):
        for refine in (0, 1):
            f = jax.jit(lambda x, z, y, k=k, r=refine:
                        fused_ops.fused_iterate_shared(
                            qps.A, fac["Minv"], fac["M"], qps.q, rho_vec,
                            qps.lam, qps.l, qps.u, x, z, y, cone=qps.cone,
                            sigma=settings.sigma, alpha=settings.alpha,
                            k=k, refine_steps=r, interpret=False))
            dt = timed(f, x, z, y)
            print(f"fused k={k:4d} refine={refine}: {dt*1e3:8.2f} ms/block"
                  f" = {dt/k*1e6:7.1f} us/iter -> {k/dt:8.0f} iters/s")

    def check_res(x, z, y):
        with xprec.highest():
            res = admm.residuals(qps, scaling, x, z, y)
            eps_p, eps_d = admm.eps_thresholds(res, settings)
            pinf, dinf = admm.infeasibility(qps, scaling, x, y, settings)
        return res[0], res[1], eps_p, eps_d, pinf, dinf

    h = jax.jit(check_res)
    dt = timed(h, x, z, y)
    print(f"residual+infeas check   : {dt*1e3:8.2f} ms/check")

    # Full driver at check_every variants.
    from admm_library_tpu.parallel.batch import run_admm_batch_shared
    for k in (25, 50, 100):
        st = settings.replace(max_iter=400, eps_abs=0.0, eps_rel=0.0,
                              check_every=k)
        f = jax.jit(lambda x, z, y, st=st: run_admm_batch_shared(
            qps, scaling, st, x, z, y, "inv"))
        dt = timed(f, x, z, y, reps=5)
        print(f"full 400 iters k={k:4d}  : {dt*1e3:8.2f} ms "
              f"-> {400/dt:8.0f} iters/s")


if __name__ == "__main__":
    main()
